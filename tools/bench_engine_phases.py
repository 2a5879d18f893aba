"""Instrumented engine bench: wraps the BatchEngine's phase methods with
wall-clock accounting to locate where serving time goes on the real chip.

Usage: python tools/bench_engine_phases.py [n_requests] [max_batch]
"""
import asyncio, sys, time
from collections import defaultdict
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/tests")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() in ("tpu", "axon")
print("alive:", float(jnp.sum(jnp.ones((8, 8)))), flush=True)

from blazr_tpu.config import AppConfig, GenerationConfig
from blazr_tpu.engine.batch_engine import BatchEngine
from blazr_tpu.utils.synthetic import mistral_7b_config, synth_model
from tests_helpers import ByteTok

N_REQ = int(sys.argv[1]) if len(sys.argv) > 1 else 64
MAX_BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 32
PROMPT_LEN, GEN = 128, 64

cfg = mistral_7b_config()
model = synth_model(cfg, quant="awq", dtype=jnp.bfloat16)

app = AppConfig(model=cfg)
app.inference.max_seq_len = 1024
app.inference.max_batch_size = MAX_BATCH
app.inference.prefill_chunk_size = 512
eng = BatchEngine(model, ByteTok(), app)

stats = defaultdict(lambda: [0, 0.0])   # name -> [calls, secs]


def wrap(name, fn):
    def inner(*a, **kw):
        t0 = time.time()
        r = fn(*a, **kw)
        d = time.time() - t0
        stats[name][0] += 1
        stats[name][1] += d
        return r
    return inner


eng._prefill_group = wrap("prefill_group", eng._prefill_group)
eng._sample_first_tokens = wrap("sample_first", eng._sample_first_tokens)
eng._process_decode_batch_plain = wrap("decode_plain",
                                       eng._process_decode_batch_plain)
sched = eng.scheduler.schedule
eng.scheduler.schedule = wrap("schedule", sched)

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
    print(f"wall {dt:.1f}s AGG {done_tokens[0]/dt:.1f} tok/s "
          f"TTFT p50 {np.percentile(ttfts, 50)*1e3:.0f} ms", flush=True)
    for name, (n, s) in sorted(stats.items(), key=lambda kv: -kv[1][1]):
        print(f"  {name:16s} calls={n:5d} total={s:7.2f}s "
              f"avg={1e3*s/max(n,1):8.1f} ms", flush=True)

asyncio.run(main())
print("done", flush=True)
