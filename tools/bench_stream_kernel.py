import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() == "tpu"

# quick compute liveness check (the light probe can pass while real work hangs)
import time as _t; _t0=_t.time()
print("alive: compute", float(jnp.sum(jnp.ones((128,128)) @ jnp.ones((128,128)))), f"{_t.time()-_t0:.1f}s", flush=True)

from blazr_tpu.utils.synthetic import _rand_awq_qt
from blazr_tpu.quant.pallas import int_matmul as im

K, N = 4096, 14336
ITERS = 512
qt = _rand_awq_qt(jax.random.key(0), K, N, group_size=128)
qbytes = qt.qweight.size * 4 + qt.scales.size * 4 + qt.mins.size * 4

def chain(fn):
    @jax.jit
    def run(x):
        def body(i, x):
            y = fn(x)
            # true data dependency, loop-VARIANT input
            return x + y[:, :K] * 1e-30 + i * 0e0
        return jax.lax.fori_loop(0, ITERS, body, x)
    return run

def timeit(name, fn, m, bytes_per):
    x = jnp.asarray(np.random.default_rng(0).standard_normal((m, K)), dtype=jnp.bfloat16)
    r = chain(fn)
    y = r(x); float(jnp.sum(y.astype(jnp.float32)))  # warm + sync
    t0 = time.time(); y = r(x); float(jnp.sum(y.astype(jnp.float32)))
    dt = (time.time() - t0) / ITERS
    print(f"{name:28s} m={m}  {dt*1e6:8.1f} us  {bytes_per/dt/1e9:7.1f} GB/s")
    return dt

# ceiling: dense bf16
wd = jnp.asarray(np.random.default_rng(1).standard_normal((K, N)), dtype=jnp.bfloat16)
timeit("dense bf16", lambda x: (x @ wd).astype(jnp.bfloat16)[:, :K*0+N], 16, wd.size*2)

# old auto-pipelined kernel (force via _qmm)
tiles = im._choose_tiles(16, K, N, 4, 128)
bm, bk, bn = tiles
def old_path(x):
    return im._qmm(x, qt.qweight, qt.scales.astype(jnp.float32),
                   qt.mins.astype(jnp.float32), bits=4, signed=True,
                   group_size=128, in_features=K, out_features=N,
                   bm=bm, bk=bk, bn=bn, out_dtype=x.dtype)
timeit(f"auto-pipe bk={bk} bn={bn}", old_path, 16, qbytes)

# new stream kernel — trimmed to the decision-critical configs (each case
# is a separate Mosaic compile through the flaky tunnel; keep it short).
for nbuf in (4,):
    for sbk in (512, 1024):
        if K % sbk: continue
        def sp(x, nbuf=nbuf, sbk=sbk):
            return im._qmm_stream(x, qt.qweight, qt.scales.astype(jnp.float32),
                                  qt.mins.astype(jnp.float32), bits=4,
                                  group_size=128, in_features=K, out_features=N,
                                  bm=16, bk=sbk, nbuf=nbuf, out_dtype=x.dtype)
        try:
            timeit(f"stream nbuf={nbuf} bk={sbk}", sp, 16, qbytes)
        except Exception as e:
            print(f"stream nbuf={nbuf} bk={sbk} FAILED: {str(e)[:120]}")
