"""Round-3 validation of the MXU wave-floor model (VERDICT r2 #6).

The int_matmul.py PERF LOG model: at m=16 the fixed cost is the MXU
systolic output-wave count,

    F(K, N) = (K/128)(N/128) * 128 cycles / 4 MXUs / 940 MHz,

batch-invariant to B ~ 128 output rows. Two testable predictions on the
real chip:

  1. F scales LINEARLY in N at fixed K (sweep N in {3584, 7168, 14336}
     at K=4096, m=16): predicted ~30.5 / 61 / 122 us.
  2. F is ~flat in m up to the 128-row output wave (sweep
     m in {1, 16, 32, 64, 128, 256} at K=4096 N=14336): wall time ~flat
     to m=128, ~2x at m=256.

Measurement rules (axon tunnel): chained fori_loop >=256 iters, sync by
data fetch, one compile per shape.
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

from blazr_tpu.quant.matmul import quant_matmul
from blazr_tpu.utils.synthetic import _rand_awq_qt


def chain(fn, K):
    @jax.jit
    def run(x):
        def body(i, x):
            y = fn(x)
            w = min(K, y.shape[-1])
            return x.at[:, :w].add(y[:, :w].astype(x.dtype) * 1e-30)
        return jax.lax.fori_loop(0, ITERS, body, x)
    return run


def timeit(name, fn, m, K):
    x = jnp.asarray(rng.standard_normal((m, K)), dtype=jnp.bfloat16)
    r = chain(fn, K)
    y = r(x); float(jnp.sum(y.astype(jnp.float32)))      # compile
    t0 = time.time(); y = r(x); float(jnp.sum(y.astype(jnp.float32)))
    dt = (time.time() - t0) / ITERS
    print(f"{name:24s} m={m:3d} {dt*1e6:8.1f} us", flush=True)
    return dt


def wave_floor_us(K, N):
    return (K / 128) * (N / 128) * 128 / 4 / 940e6 * 1e6


print("=== prediction 1: F linear in N (K=4096, m=16, w4a16) ===",
      flush=True)
K = 4096
for N in (3584, 7168, 14336):
    qt = _rand_awq_qt(jax.random.key(0), K, N, group_size=128)
    dt = timeit(f"w4a16 N={N}", lambda x, qt=qt: quant_matmul(x, qt), 16, K)
    print(f"    predicted wave floor {wave_floor_us(K, N):7.1f} us  "
          f"measured/pred = {dt*1e6/wave_floor_us(K, N):.2f}", flush=True)

print("=== prediction 2: F flat in m to the 128-row wave "
      "(K=4096 N=14336, w4a16) ===", flush=True)
N = 14336
qt = _rand_awq_qt(jax.random.key(0), K, N, group_size=128)
base = None
for m in (1, 16, 32, 64, 128, 256):
    dt = timeit(f"w4a16 m sweep", lambda x: quant_matmul(x, qt), m, K)
    if m == 16:
        base = dt
    if base:
        print(f"    vs m=16: {dt/base:.2f}x", flush=True)
print("done", flush=True)
