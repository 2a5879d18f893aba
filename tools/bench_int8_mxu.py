"""Round-2 kernel shootout at the 7B decode shape (real chip).

Compares, at K=4096 N=14336 (Mistral-7B gate/up) and the transposed down
shape:
  dense bf16           — streaming ceiling
  pallas w4a16         — round-1 default (int4 → bf16 convert chain)
  pallas w4a8          — int4 HBM stream, int4→int8 convert, int8 MXU
  pallas w8a8          — int8-widened stream, FREE bitcast feed, int8 MXU
  xla w8a8 (per-N s)   — XLA streaming upper bound for int8 weights

Measurement rules (memory: axon tunnel): chained fori_loop ≥256 iters,
sync by data fetch, one compile per variant.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
_t0 = time.time()
print("alive:", float(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128)))),
      f"{time.time()-_t0:.1f}s", flush=True)

ITERS = 256
rng = np.random.default_rng(0)

def chain(fn, K):
    @jax.jit
    def run(x):
        def body(i, x):
            y = fn(x)
            w = min(K, y.shape[-1])
            return x.at[:, :w].add(y[:, :w].astype(x.dtype) * 1e-30)
        return jax.lax.fori_loop(0, ITERS, body, x)
    return run

def timeit(name, fn, m, K, bytes_per):
    x = jnp.asarray(rng.standard_normal((m, K)), dtype=jnp.bfloat16)
    r = chain(fn, K)
    try:
        y = r(x); float(jnp.sum(y.astype(jnp.float32)))
    except Exception as e:
        print(f"{name:28s} m={m:3d} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    t0 = time.time(); y = r(x); float(jnp.sum(y.astype(jnp.float32)))
    dt = (time.time() - t0) / ITERS
    print(f"{name:28s} m={m:3d} {dt*1e6:8.1f} us  {bytes_per/dt/1e9:7.1f} GB/s",
          flush=True)
    return dt

from blazr_tpu.utils.synthetic import _rand_awq_qt
from blazr_tpu.quant.matmul import quant_matmul
from blazr_tpu.quant.pallas.int_matmul import quant_matmul_int8mxu
from blazr_tpu.quant.qtensor import mark_act_quant, widen_to_int8

for (K, N) in ((4096, 14336), (14336, 4096)):
    print(f"=== K={K} N={N} ===", flush=True)
    qt = _rand_awq_qt(jax.random.key(0), K, N, group_size=128)
    qt48 = mark_act_quant(qt)
    qt88 = widen_to_int8(qt)
    wd = jnp.asarray(rng.standard_normal((K, N)), dtype=jnp.bfloat16)
    w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), dtype=jnp.int8)
    s_row = jnp.asarray(rng.standard_normal((N,)).astype(np.float32) * 0.01)

    def xla_w8a8(x):
        xs = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
        xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs.astype(jnp.float32)
                * s_row).astype(jnp.bfloat16)

    for m in (1, 16):
        timeit("dense bf16 (ceiling)", lambda x: x @ wd, m, K, wd.size * 2)
        timeit("pallas w4a16 (r1 default)", lambda x: quant_matmul(x, qt),
               m, K, qt.qweight.size * 4)
        timeit("pallas w4a8", lambda x: quant_matmul_int8mxu(x, qt48),
               m, K, qt.qweight.size * 4)
        timeit("pallas w8a8", lambda x: quant_matmul_int8mxu(x, qt88),
               m, K, qt88.qweight.size * 4)
        timeit("xla w8a8 perN (probe)", xla_w8a8, m, K, w8.size)
print("done", flush=True)
