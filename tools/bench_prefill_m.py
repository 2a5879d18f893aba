"""Prefill-regime quant matmul: fused Pallas kernel vs dequant+XLA-dot.

At large m the fused kernel re-dequantizes the weight tile for every
m-tile pass, spending VPU cycles m/bm times per weight element, while a
one-shot dequantize-to-bf16 + plain XLA dot pays one extra HBM round
trip for the dense weight but runs the matmul at XLA's tuned peak.
This measures both at serving prefill shapes to pick a dispatch
threshold for quant_matmul.

Measurement rules (tools/README.md): chained fori_loop, sync by fetch.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() in ("tpu", "axon")
t0 = time.time()
print("alive:", float(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128)))),
      f"{time.time()-t0:.1f}s", flush=True)

from blazr_tpu.quant.matmul import quant_matmul
from blazr_tpu.quant.qtensor import dequantize_jnp
from blazr_tpu.utils.synthetic import _rand_awq_qt

K, N = 4096, 14336
ITERS = 64


def timeit(name, fn, x, flops):
    y = fn(x)
    float(np.asarray(y).reshape(-1)[0])          # compile + settle
    t0 = time.time()
    y = fn(x)
    float(np.asarray(y).reshape(-1)[0])
    dt = (time.time() - t0) / ITERS
    print(f"{name:22s} {dt*1e3:8.2f} ms  {flops/dt/1e12:6.1f} TFLOP/s",
          flush=True)
    return dt


qt = _rand_awq_qt(jax.random.key(0), K, N, group_size=128)


@jax.jit
def pallas_chain(x):
    def body(i, x):
        y = quant_matmul(x, qt)
        return x + y[:, :K].astype(x.dtype) * 1e-30
    return jax.lax.fori_loop(0, ITERS, body, x)


@jax.jit
def dequant_dot_chain(x):
    def body(i, x):
        w = dequantize_jnp(qt, dtype=jnp.bfloat16)
        y = jnp.dot(x, w, preferred_element_type=jnp.float32)
        return x + y[:, :K].astype(x.dtype) * 1e-30
    return jax.lax.fori_loop(0, ITERS, body, x)


for m in (256, 1024, 4096, 8192):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((m, K)),
                    dtype=jnp.bfloat16)
    flops = 2.0 * m * K * N
    print(f"-- m={m} --", flush=True)
    timeit("pallas fused", pallas_chain, x, flops)
    timeit("dequant + XLA dot", dequant_dot_chain, x, flops)
print("done", flush=True)
