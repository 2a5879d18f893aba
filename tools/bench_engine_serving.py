"""END-TO-END serving benchmark on the real chip: the actual BatchEngine
(continuous batching, paged KV, PA kernel, fused sampling, scheduler)
under concurrent load — includes every host-side overhead the
model-level bench (bench.py) excludes.

Usage: python tools/bench_engine_serving.py [n_requests] [max_batch]
           [--horizon N] [--draft] [--spec K]
  --draft: batched draft-MODEL speculation with a small synthetic draft
  --spec K: speculative depth (with --draft) or prompt-lookup otherwise
"""
import asyncio, json, sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() in ("tpu", "axon")
print("alive:", float(jnp.sum(jnp.ones((8, 8)))), flush=True)

from blazr_tpu.config import AppConfig, GenerationConfig
from blazr_tpu.config.inference import SpeculativeDecodingConfig
from blazr_tpu.engine.batch_engine import BatchEngine
from blazr_tpu.utils.synthetic import mistral_7b_config, synth_model
from tests_helpers import ByteTok

def _flag(name, default=None, cast=int):
    if f"--{name}" in sys.argv:
        i = sys.argv.index(f"--{name}")
        if i + 1 < len(sys.argv) and not sys.argv[i + 1].startswith("--"):
            return cast(sys.argv[i + 1])
        return True
    return default


# Positionals must precede flags (flag values would otherwise be
# mistaken for positionals).
args = []
for a in sys.argv[1:]:
    if a.startswith("--"):
        break
    args.append(a)
N_REQ = int(args[0]) if len(args) > 0 else 64
MAX_BATCH = int(args[1]) if len(args) > 1 else 32
PROMPT_LEN = _flag("prompt", 128)
GEN = _flag("gen", 64)


cfg = mistral_7b_config()
t0 = time.time()
model = synth_model(cfg, quant="awq", dtype=jnp.bfloat16)
print(f"model synthesized {time.time()-t0:.1f}s", flush=True)

app = AppConfig(model=cfg)
# --ctx: KV budget per row. B=64 serving targets ctx<=512 (B=64@ctx1024
# KV is ~8.6 GB + 4.5 GB weights — over the compile helper's cap; the
# wave-flat sweep showed B=64@ctx512 reaches 1.8x the B=32 aggregate).
app.inference.max_seq_len = _flag("ctx", 1024)
# --block-size: KV block granularity. The PA decode kernel's cost is
# per-grid-step overhead (grid = rows x blocks-per-row), so bigger
# blocks cut kernel invocations linearly (r4 ablation: fwd+argmax at
# b32/bs64 = 25.8 ms/step vs 16.2 contiguous).
bs_flag = _flag("block-size")
if bs_flag:
    app.inference.block_size = int(bs_flag)
first_flag = _flag("first")
if first_flag is not None:
    app.inference.prefill_first_group = int(first_flag)
kv_flag = _flag("kv", cast=str)
if kv_flag:
    # --kv int8: quantized paged KV (halves the per-step KV read bytes
    # AND the pool footprint; the PA kernel's int8 scale path).
    # A bare `--kv` (flag without value) would reach here as True and
    # silently run UNQUANTIZED (batch_engine only checks for
    # "int8"/"int4"), misattributing the bench — fail loudly instead.
    if str(kv_flag) not in ("int8", "int4", "auto"):
        sys.exit(f"--kv requires a value in int8|int4|auto, got {kv_flag!r}")
    app.inference.kv_cache_dtype = str(kv_flag)
app.inference.max_batch_size = MAX_BATCH
app.inference.prefill_chunk_size = 512
horizon = _flag("horizon")
if horizon:
    app.inference.decode_horizon = int(horizon)
depth = _flag("depth")
if depth:
    app.inference.decode_pipe_depth = int(depth)
spec_k = _flag("spec")
draft = None
if _flag("draft") or spec_k:
    app.inference.speculative = SpeculativeDecodingConfig(
        draft_model="synthetic" if _flag("draft") else None,
        num_speculative_tokens=int(spec_k or 5))
    if _flag("draft"):
        dcfg = mistral_7b_config()
        dcfg.num_layers = 4              # ~8x smaller draft
        draft = synth_model(dcfg, quant="awq", dtype=jnp.bfloat16)
        print("draft model synthesized (4 layers)", flush=True)
eng = BatchEngine(model, ByteTok(), app, draft_model=draft)

rng = np.random.default_rng(0)
prompts = [[int(t) for t in rng.integers(1, 250, PROMPT_LEN)]
           for _ in range(N_REQ)]


wt0 = time.time()
# Fixed 128-token prompts: warm exactly the used prefill bucket (the full
# grid is minutes of wall through the remote link and irrelevant here).
eng.warmup(t_buckets=[PROMPT_LEN])
print(f"warmup (bucket {PROMPT_LEN}) {time.time()-wt0:.1f}s", flush=True)


PASSES = _flag("passes", 2)


async def main():
    # Spec eligibility needs pure greedy (repeat_penalty 1.0).
    gen_kw = dict(max_tokens=GEN, temperature=0.0)
    if spec_k or _flag("draft"):
        gen_kw["repeat_penalty"] = 1.0

    # Reference methodology (cli/bench.rs:24-34): 1 warmup run + measured
    # runs. Pass 0 washes out any residual one-time cost (first paged-KV
    # buffer materialization, allocator high-water growth); the LAST pass
    # is the reported steady state.
    for p_i in range(PASSES):
        eng.perf.clear()           # phase walls are per-pass, not cumulative
        task = asyncio.create_task(eng.run())
        ttfts = []
        itls = []
        done_tokens = [0]

        async def drive(p):
            t0 = time.time()
            h = eng.submit(p, GenerationConfig(**gen_kw))
            first = None
            prev = None
            async for tok in h.tokens():
                now = time.time()
                if first is None:
                    first = now - t0
                else:
                    itls.append(now - prev)
                prev = now
                done_tokens[0] += 1
            ttfts.append(first)

        t0 = time.time()
        await asyncio.gather(*[asyncio.wait_for(drive(p), timeout=1200)
                               for p in prompts])
        dt = time.time() - t0
        eng.stop()
        await task
        # run() clears _stop on entry, so repeated passes need no reset.
        if p_i < PASSES - 1:
            print(f"pass {p_i}: wall {dt:.1f}s "
                  f"AGG {done_tokens[0]/dt:.1f} tok/s (warmup pass)",
                  flush=True)
    agg = done_tokens[0] / dt
    print(f"requests={N_REQ} max_batch={MAX_BATCH} prompt={PROMPT_LEN} "
          f"gen={GEN}", flush=True)
    print(f"wall {dt:.1f}s  decoded {done_tokens[0]} tok  "
          f"AGG {agg:.1f} tok/s  req/s {N_REQ/dt:.2f}", flush=True)
    print(f"TTFT p50 {np.percentile(ttfts, 50)*1e3:.0f} ms  "
          f"p95 {np.percentile(ttfts, 95)*1e3:.0f} ms", flush=True)
    if itls:
        # NOTE: horizon batching delivers tokens in bursts of up to
        # decode_horizon, so p50 ITL reads near-zero; p95+ shows the
        # inter-burst cadence.
        print(f"ITL p50 {np.percentile(itls, 50)*1e3:.1f} ms  "
              f"p95 {np.percentile(itls, 95)*1e3:.1f} ms  "
              f"p99 {np.percentile(itls, 99)*1e3:.1f} ms", flush=True)
    if eng.spec_drafted:
        print(f"spec drafted {eng.spec_drafted} accepted "
              f"{eng.spec_accepted} "
              f"({100*eng.spec_accepted/eng.spec_drafted:.0f}%)", flush=True)
    if eng.perf:
        parts = []
        for k in sorted(eng.perf):
            if k.endswith("_n"):
                continue
            n = eng.perf.get(k + "_n")
            parts.append(f"{k}={eng.perf[k]*1e3:.0f}ms"
                         + (f"/{int(n)}" if n else ""))
        print("PERF " + "  ".join(parts), flush=True)

    # ONE machine-readable line for bench.py (VERDICT r3 #1a: the phase
    # breakdown + ITL percentiles must LAND IN THE BENCH ARTIFACT).
    phases = {k: round(v * 1e3, 1) for k, v in sorted(eng.perf.items())
              if not k.endswith("_n")}
    # Decode-phase rate: generated tokens over the host wall spent in the
    # decode phase — the steady-state figure the burst AGG (which mixes
    # 2 prompt tokens per generated token) cannot show. h_fetch/h_emit
    # are NESTED inside the decode wall (the horizon round fetches from
    # within _process_decode_batch), so "decode" alone is the phase wall.
    dec_wall = eng.perf.get("decode", 0.0)
    stats = {
        "requests": N_REQ, "max_batch": MAX_BATCH,
        "prompt_len": PROMPT_LEN, "gen": GEN,
        "wall_s": round(dt, 2), "decoded_tokens": done_tokens[0],
        "agg_tok_s": round(agg, 1),
        "req_per_s": round(N_REQ / dt, 2),
        "ttft_ms": {"p50": round(float(np.percentile(ttfts, 50)) * 1e3, 1),
                    "p95": round(float(np.percentile(ttfts, 95)) * 1e3, 1)},
        "itl_ms": ({"p50": round(float(np.percentile(itls, 50)) * 1e3, 2),
                    "p95": round(float(np.percentile(itls, 95)) * 1e3, 2),
                    "p99": round(float(np.percentile(itls, 99)) * 1e3, 2)}
                   if itls else {}),
        "phase_ms": phases,
        "decode_phase_tok_s": (round(done_tokens[0] / dec_wall, 1)
                               if dec_wall > 0 else None),
        "horizon": {"dispatches": eng.horizon_dispatches,
                    "steps": eng.horizon_steps},
        "deferred_prefill_rows": int(eng.perf.get("p_deferred_n", 0)),
    }
    if eng.spec_drafted:
        stats["spec"] = {"drafted": eng.spec_drafted,
                         "accepted": eng.spec_accepted,
                         "acceptance": round(
                             eng.spec_accepted / eng.spec_drafted, 3),
                         "depth": eng._spec_depth}
    print("STATS " + json.dumps(stats), flush=True)

asyncio.run(main())
print("done", flush=True)
