"""Locate the binding constraint of BATCHED decode (round-2).

r1 measured B=8 aggregate at only 2.8x B=1 (281 vs 99.5 tok/s), but the
MXU-wave analysis says the weight-side floor is ~constant in B<=128 rows,
so near-linear aggregate scaling should be possible. Decompose:

  1. quant-matmul chain at the 7B hot shape, m in {1, 8, 16, 32}
     -> does the matmul wall grow with batch?
  2. attention over a [B, ctx] contiguous cache, B sweep
     -> does attention bind?
  3. full fused decode step per B (model-level, from bench._Flagship)
     -> end-to-end per-step wall for comparison.

Measurement rules (tools/README.md): chained fori_loop >= 256 iters, one
data fetch, params as jit args.
"""
import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() in ("tpu", "axon")
t0 = time.time()
print("alive:", float(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128)))),
      f"{time.time()-t0:.1f}s", flush=True)

from blazr_tpu.utils.synthetic import _rand_awq_qt
from blazr_tpu.quant.matmul import quant_matmul

K, N = 4096, 14336
ITERS = 256


def timed(fn, *args):
    fn(*args)                        # compile
    r = fn(*args)
    float(np.asarray(r).reshape(-1)[0])
    t0 = time.time()
    r = fn(*args)
    float(np.asarray(r).reshape(-1)[0])
    return (time.time() - t0) / ITERS


# -- 1. quant matmul chain, m sweep -----------------------------------------
qt = _rand_awq_qt(jax.random.PRNGKey(0), K, N, group_size=128)


@jax.jit
def mm_chain(qw, sc, mn, x):
    import dataclasses
    w = dataclasses.replace(qt, qweight=qw, scales=sc, mins=mn)

    def body(i, x):
        y = quant_matmul(x, w)
        return x + y[:, :K].astype(x.dtype) * 1e-30
    return jax.lax.fori_loop(0, ITERS, body, x)


print("\n-- quant matmul [m,4096]x[4096,14336] --", flush=True)
for m in (1, 8, 16, 32, 64):
    x = jnp.ones((m, K), dtype=jnp.bfloat16)
    us = timed(mm_chain, qt.qweight, qt.scales, qt.mins, x) * 1e6
    print(f"m={m:3d}  {us:7.1f} us/matmul", flush=True)

# -- 2. attention over contiguous cache, B sweep ----------------------------
from blazr_tpu.models.layers import attend

CTX, HEADS, KVH, D = 1024, 32, 8, 128


def make_attend(b):
    kc = jnp.ones((b, CTX, KVH, D), dtype=jnp.bfloat16)
    vc = jnp.ones((b, CTX, KVH, D), dtype=jnp.bfloat16)

    @jax.jit
    def att_chain(kc, vc, q):
        def body(i, q):
            pos = jnp.full((b, 1), CTX - 2, dtype=jnp.int32)
            o = attend(q, kc, vc, q_positions=pos,
                       kv_len=jnp.full((b,), CTX - 1, dtype=jnp.int32))
            return q + o.astype(q.dtype) * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, q)

    q = jnp.ones((b, 1, HEADS, D), dtype=jnp.bfloat16)
    return att_chain, (kc, vc, q)


print("\n-- attend 1 layer, ctx=1024, 32 q-heads / 8 kv-heads --", flush=True)
for b in (1, 8, 16, 32):
    fn, args = make_attend(b)
    us = timed(fn, *args) * 1e6
    print(f"B={b:3d}  {us:7.1f} us/layer", flush=True)

# -- 3. full decode step, per B ---------------------------------------------
from bench import _Flagship, _config_by_name

print("\n-- full fused decode step (32 layers) --", flush=True)
fl = _Flagship(_config_by_name("mistral-7b-awq-int4"))
for b in (1, 8, 16, 32):
    r = fl.bench_decode(batch=b, steps=32, warmup=3)
    ms = 1e3 * b / r["toks_per_s"]
    print(f"B={b:3d}  {r['toks_per_s']:8.1f} tok/s agg  "
          f"{ms:6.2f} ms/step", flush=True)
print("done", flush=True)
