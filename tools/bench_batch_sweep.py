"""Batched decode sweep on the real chip: full Mistral-7B AWQ-INT4 decode
step (forward + greedy sample) at B = 1/8/16/32, ctx 1024.

The tile sweep showed single-stream decode is MXU-wave-bound (~120 us
fixed per big matmul regardless of weight feed); MXU waves are ~constant
in B ≤ 128, so aggregate tok/s should scale near-linearly until KV
attention or something else binds. This locates the binding constraint.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() in ("tpu", "axon")
print("alive:", float(jnp.sum(jnp.ones((8, 8)))), flush=True)

from bench import _Flagship, _config_by_name

fl = _Flagship(_config_by_name("mistral-7b-awq-int4"))
for b in (1, 8, 16, 32):
    r = fl.bench_decode(batch=b, steps=32, warmup=3, ctx=1024,
                        prompt_len=128)
    print(f"B={b:3d}  {r['toks_per_s']:8.1f} tok/s aggregate  "
          f"({r['toks_per_s']/b:6.1f} /seq)", flush=True)
print("done", flush=True)
