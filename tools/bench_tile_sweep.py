"""Tile/structure sweep for the int8-MXU kernel: is the ~150-180us floor
per-grid-step overhead (fix: bigger bk tiles) or the batched per-group dot
(fix: gpb=1 single dot)? K=4096 N=14336, m=16."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() in ("tpu", "axon")
t0 = time.time()
print("alive:", float(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128)))),
      f"{time.time()-t0:.1f}s", flush=True)

from blazr_tpu.quant.pallas.int_matmul import _qmm_int8, _qmm

K, N = 4096, 14336
M = 16
ITERS = 256
rng = np.random.default_rng(0)

xq = jnp.asarray(rng.integers(-127, 127, (M, K)), dtype=jnp.int8)
xs = jnp.ones((M, 1), dtype=jnp.float32)
qw8 = jnp.asarray(rng.integers(0, 2**32, (K // 4, N), dtype=np.uint64)
                  .astype(np.uint32))
qw4 = jnp.asarray(rng.integers(0, 2**32, (K // 8, N), dtype=np.uint64)
                  .astype(np.uint32))
x16 = jnp.asarray(rng.standard_normal((M, K)), dtype=jnp.bfloat16)

def timeit(name, fn, bytes_per):
    @jax.jit
    def run(x):
        def body(i, x):
            y = fn()
            return x + jnp.sum(y).astype(x.dtype) * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, x)
    try:
        z = run(jnp.zeros(())); float(z)
        t0 = time.time(); float(run(jnp.zeros(())))
        dt = (time.time() - t0) / ITERS
        print(f"{name:36s} {dt*1e6:8.1f} us  {bytes_per/dt/1e9:7.1f} GB/s",
              flush=True)
    except Exception as e:
        print(f"{name:36s} FAILED {type(e).__name__}: {str(e)[:160]}",
              flush=True)

# w8a8 structure sweep
for gs, bk, bn in ((128, 512, 7168), (128, 1024, 7168), (128, 2048, 7168),
                   (128, 2048, 3584), (128, 4096, 3584), (128, 1024, 14336),
                   (512, 512, 7168), (1024, 1024, 7168), (2048, 2048, 7168),
                   (4096, 4096, 3584), (4096, 4096, 14336)):
    G = K // gs
    s = jnp.ones((G, N), dtype=jnp.float32)
    m_ = jnp.zeros((G, N), dtype=jnp.float32)
    timeit(f"w8a8 gs={gs} bk={bk} bn={bn}",
           lambda s=s, m_=m_, gs=gs, bk=bk, bn=bn: _qmm_int8(
               xq, xs, qw8, s, m_, bits=8, group_size=gs, in_features=K,
               out_features=N, bm=16, bk=bk, bn=bn, out_dtype=jnp.bfloat16),
           qw8.size * 4)

# w4a8 with bigger tiles
for gs, bk, bn in ((128, 1024, 7168), (128, 2048, 7168)):
    G = K // gs
    s = jnp.ones((G, N), dtype=jnp.float32)
    m_ = jnp.zeros((G, N), dtype=jnp.float32)
    timeit(f"w4a8 gs={gs} bk={bk} bn={bn}",
           lambda s=s, m_=m_, gs=gs, bk=bk, bn=bn: _qmm_int8(
               xq, xs, qw4, s, m_, bits=4, group_size=gs, in_features=K,
               out_features=N, bm=16, bk=bk, bn=bn, out_dtype=jnp.bfloat16),
           qw4.size * 4)

# w4a16 (bf16 MXU) with bigger tiles for comparison
for bk, bn in ((512, 7168), (1024, 7168), (2048, 7168)):
    G = K // 128
    s = jnp.ones((G, N), dtype=jnp.float32)
    m_ = jnp.zeros((G, N), dtype=jnp.float32)
    timeit(f"w4a16 bk={bk} bn={bn}",
           lambda s=s, m_=m_, bk=bk, bn=bn: _qmm(
               x16, qw4, s, m_, bits=4, signed=True, group_size=128,
               in_features=K, out_features=N, bm=16, bk=bk, bn=bn,
               out_dtype=jnp.bfloat16),
           qw4.size * 4)
print("done", flush=True)
