"""Profile where serving wall-clock goes: wraps BatchEngine phases with
timers and runs the bench_engine_serving workload (32 req x 128->64).

Buckets: schedule, prefill (dispatch vs fetch), decode (itab build,
dispatch, fetch, emit), loop overhead (asyncio hops).
"""
import asyncio, sys, time, collections
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
print("backend:", jax.default_backend(), flush=True)

from blazr_tpu.config import AppConfig, GenerationConfig
from blazr_tpu.engine import batch_engine as be_mod
from blazr_tpu.engine.batch_engine import BatchEngine
from blazr_tpu.utils.synthetic import mistral_7b_config, synth_model
from tests_helpers import ByteTok

N_REQ, MAX_BATCH, PROMPT_LEN, GEN = 32, 32, 128, 64

cfg = mistral_7b_config()
t0 = time.time()
model = synth_model(cfg, quant="awq", dtype=jnp.bfloat16)
print(f"model synthesized {time.time()-t0:.1f}s", flush=True)

app = AppConfig(model=cfg)
app.inference.max_seq_len = 1024
app.inference.max_batch_size = MAX_BATCH
app.inference.prefill_chunk_size = 512
eng = BatchEngine(model, ByteTok(), app)

T = collections.defaultdict(float)
C = collections.defaultdict(int)


def wrap(obj, name, key):
    orig = getattr(obj, name)
    def f(*a, **kw):
        t = time.perf_counter()
        r = orig(*a, **kw)
        T[key] += time.perf_counter() - t
        C[key] += 1
        return r
    setattr(obj, name, f)

wrap(eng.scheduler, "schedule", "schedule")
wrap(eng, "_process_prefills", "prefill_total")
wrap(eng, "_process_decode_batch", "decode_total")
wrap(eng, "_emit", "emit")
wrap(eng, "_to_host", "to_host_fetch")
wrap(eng, "_horizon_step", "horizon_dispatch")
wrap(eng, "_decode_step", "decode_dispatch")
wrap(eng, "_prefill_step", "prefill_dispatch")
# time step_once at the async level to get asyncio overhead
orig_step = eng.step_once
async def step_once():
    t = time.perf_counter()
    r = await orig_step()
    T["step_once"] += time.perf_counter() - t
    C["step_once"] += 1
    return r
eng.step_once = step_once

wt0 = time.time()
eng.warmup()
print(f"warmup {time.time()-wt0:.1f}s", flush=True)

rng = np.random.default_rng(0)
prompts = [[int(t) for t in rng.integers(1, 250, PROMPT_LEN)]
           for _ in range(N_REQ)]


async def main():
    task = asyncio.create_task(eng.run())
    done_tokens = [0]
    ttfts = []

    async def drive(p):
        t0 = time.time()
        h = eng.submit(p, GenerationConfig(max_tokens=GEN, temperature=0.0))
        first = None
        async for tok in h.tokens():
            if first is None:
                first = time.time() - t0
            done_tokens[0] += 1
        ttfts.append(first)

    t0 = time.time()
    await asyncio.gather(*[asyncio.wait_for(drive(p), timeout=1200)
                           for p in prompts])
    dt = time.time() - t0
    eng.stop()
    await task
    print(f"\nwall {dt:.2f}s decoded {done_tokens[0]} AGG "
          f"{done_tokens[0]/dt:.1f} tok/s TTFT p50 "
          f"{np.percentile(ttfts,50)*1e3:.0f} ms", flush=True)
    print(f"{'bucket':24s} {'total_s':>8s} {'calls':>6s} {'ms/call':>8s}")
    for k in sorted(T, key=lambda k: -T[k]):
        print(f"{k:24s} {T[k]:8.2f} {C[k]:6d} {1e3*T[k]/max(C[k],1):8.1f}")
    acc = T["step_once"]
    print(f"unaccounted (wall - step_once): {dt - acc:.2f}s")

asyncio.run(main())
