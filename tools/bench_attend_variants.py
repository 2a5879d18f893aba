"""Attention decode-step variants: find the ~100us/layer fixed overhead.

bench_decode_breakdown measured attend at ~100us/layer at B=1 ctx=1024
(roofline ~5us): ~3.2 ms of the 9.6 ms B=1 decode step and the dominant
B-scaling term. Variants:

  v0: current attend (cache [B, S, G, D], grouped einsum btgrd,bsgd)
  v1: cache pre-transposed [B, G, S, D] (is the transpose the cost?)
  v2: v1 + t=1 squeezed (bgrd,bgsd->bgrs)
  v3: v2 with fp32 QK^T via preferred_element_type only (no astype)
  v4: repeat_kv materialization (r1 path, for reference)
"""
import sys, time, math
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() in ("tpu", "axon")
t0 = time.time()
print("alive:", float(jnp.sum(jnp.ones((128, 128)) @ jnp.ones((128, 128)))),
      f"{time.time()-t0:.1f}s", flush=True)

CTX, H, G, D = 1024, 32, 8, 128
R = H // G
ITERS = 256
SCALE = 1.0 / math.sqrt(D)


def timed(fn, *args):
    fn(*args)
    r = fn(*args)
    float(np.asarray(r).reshape(-1)[0])
    t0 = time.time()
    r = fn(*args)
    float(np.asarray(r).reshape(-1)[0])
    return (time.time() - t0) / ITERS * 1e6


def chain(body, q0, *kv):
    @jax.jit
    def run(q, *kv):
        def step(i, q):
            o = body(q, *kv)
            return q + o * 1e-30
        return jax.lax.fori_loop(0, ITERS, step, q)
    return run, (q0, *kv)


def mask_for(b):
    kv_pos = jnp.arange(CTX, dtype=jnp.int32)[None, :]
    kv_len = jnp.full((b,), CTX - 1, dtype=jnp.int32)
    qpos = jnp.full((b, 1), CTX - 2, dtype=jnp.int32)
    valid = kv_pos < kv_len[:, None]
    causal = kv_pos[:, None, :] <= qpos[:, :, None]
    return (valid[:, None, :] & causal)[:, 0, :]        # [B, S]


for b in (1, 8, 32):
    q = jnp.ones((b, 1, H, D), dtype=jnp.bfloat16)
    k_bsgd = jnp.ones((b, CTX, G, D), dtype=jnp.bfloat16)
    v_bsgd = jnp.ones((b, CTX, G, D), dtype=jnp.bfloat16)
    k_bgsd = jnp.ones((b, G, CTX, D), dtype=jnp.bfloat16)
    v_bgsd = jnp.ones((b, G, CTX, D), dtype=jnp.bfloat16)
    m = mask_for(b)

    def v0(q, k, v):
        from blazr_tpu.models.layers import attend

        return attend(q, k, v,
                      q_positions=jnp.full((b, 1), CTX - 2, dtype=jnp.int32),
                      kv_len=jnp.full((b,), CTX - 1, dtype=jnp.int32))

    def v1(q, k, v):
        qg = (q * SCALE).reshape(b, 1, G, R, D)
        logits = jnp.einsum("btgrd,bgsd->bgrts", qg, k,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(m[:, None, None, None, :], logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        o = jnp.einsum("bgrts,bgsd->btgrd", p, v,
                       preferred_element_type=jnp.float32)
        return o.reshape(b, 1, H, D).astype(q.dtype)

    def v2(q, k, v):
        qg = (q * SCALE).reshape(b, G, R, D)  # q [b,1,H,D]
        logits = jnp.einsum("bgrd,bgsd->bgrs", qg, k,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(m[:, None, None, :], logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        o = jnp.einsum("bgrs,bgsd->bgrd", p, v,
                       preferred_element_type=jnp.float32)
        return o.reshape(b, 1, H, D).astype(q.dtype)

    def v4(q, k, v):
        kk = jnp.repeat(k, R, axis=2)
        vv = jnp.repeat(v, R, axis=2)
        logits = jnp.einsum("bthd,bshd->bhts", (q * SCALE), kk,
                            preferred_element_type=jnp.float32)
        logits = jnp.where(m[:, None, None, :], logits, -1e30)
        p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        o = jnp.einsum("bhts,bshd->bthd", p, vv,
                       preferred_element_type=jnp.float32)
        return o.astype(q.dtype)

    fn, a = chain(v0, q, k_bsgd, v_bsgd)
    t_v0 = timed(fn, *a)
    fn, a = chain(v1, q, k_bgsd, v_bgsd)
    t_v1 = timed(fn, *a)
    fn, a = chain(lambda q, k, v: v2(q, k, v), q, k_bgsd, v_bgsd)
    t_v2 = timed(fn, *a)
    fn, a = chain(v4, q, k_bsgd, v_bsgd)
    t_v4 = timed(fn, *a)
    kv_mb = 2 * b * CTX * G * D * 2 / 1e6
    print(f"B={b:3d} ({kv_mb:.0f} MB KV)  v0 {t_v0:6.1f}  v1 {t_v1:6.1f}  "
          f"v2 {t_v2:6.1f}  v4 {t_v4:6.1f} us/layer", flush=True)
print("done", flush=True)
