"""PA kernel variants: eliminate the in-kernel f32 transposes.

  cur : shipped kernel (grid (B,T), [BS,G,D] blocks, explicit transposes
        + batched dot over the head axis)
  nt  : same but dot_general batching the MIDDLE dim directly (Mosaic
        picks the relayout)
  wide: KV block viewed [BS, G*D] (sublane=BS, lanes=G*D tiles — the
        natural HBM order, zero relayout); QK^T is ONE gemm against a
        block-diagonal-masked wide Q [H_q, G*D]; AV is one [H_q,BS] x
        [BS,G*D] gemm folded back per group.

Usage: python tools/bench_pa_wide.py [B ...]
"""
import sys, time, math, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() in ("tpu", "axon")
print("alive:", float(jnp.sum(jnp.ones((8, 8)))), flush=True)

G, HPG, D = 8, 4, 128
H = G * HPG
CTX = 1024
ITERS = 128


def wide_kernel(bt_ref, sl_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
                acc_ref, *, block_size, max_blocks, scale):
    b = pl.program_id(0)
    t = pl.program_id(1)
    seq_len = sl_ref[b]

    @pl.when(t == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when((t * block_size) < seq_len)
    def _attend():
        # q block [1, H, GD_wide] is PRE-masked block-diagonal outside the
        # kernel (constant per step) — just load it.
        qw = q_ref[0].astype(jnp.float32) * scale          # [H, G*D]
        kw = k_ref[0].astype(jnp.float32)                  # [BS, G*D]
        vw = v_ref[0].astype(jnp.float32)
        # ONE gemm: [H, G*D] x [BS, G*D]^T -> [H, BS]
        logits = jax.lax.dot_general(
            qw, kw, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        pos = t * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, block_size), 1)
        mask = pos < seq_len
        logits = jnp.where(mask, logits, -1e30)
        m_prev = m_ref[...]
        l_prev = l_ref[...]
        m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.where(mask, jnp.exp(logits - m_new), 0.0)
        l_ref[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[...] = m_new
        # ONE gemm: [H, BS] x [BS, G*D] -> [H, G*D]; fold per-group cols
        # happens once at the end (acc stays wide).
        av = jnp.dot(p, vw, preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + av

    @pl.when(t == max_blocks - 1)
    def _done():
        accw = acc_ref[...] / jnp.maximum(l_ref[...], 1e-30)   # [H, G*D]
        # fold: row h takes its own group's column block
        a3 = accw.reshape(H, G, D)
        row_g = jax.lax.broadcasted_iota(jnp.int32, (H, G, D), 0) // HPG
        col_g = jax.lax.broadcasted_iota(jnp.int32, (H, G, D), 1)
        o_ref[0] = jnp.sum(jnp.where(row_g == col_g, a3, 0.0),
                           axis=1).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_size", "num_blocks"))
def pa_wide(q, k_flat, v_flat, block_tables, seq_lens, *, block_size,
            num_blocks):
    b, h_q, d = q.shape
    g = k_flat.shape[1]
    gd = g * d
    mb = block_tables.shape[1]
    k3 = k_flat[: num_blocks * block_size].reshape(num_blocks, block_size, gd)
    v3 = v_flat[: num_blocks * block_size].reshape(num_blocks, block_size, gd)
    # Block-diagonal wide Q: row h holds q[h] in its group's column block.
    hpg = h_q // g
    q3 = q.reshape(b, h_q, 1, d)
    qw = jnp.tile(q3, (1, 1, g, 1)).reshape(b, h_q, gd)
    row_g = jnp.arange(h_q)[:, None] // hpg
    col_g = jnp.arange(gd)[None, :] // d
    qw = qw * (row_g == col_g)[None].astype(qw.dtype)
    bt = block_tables.astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, mb),
        in_specs=[
            pl.BlockSpec((1, h_q, gd), lambda b, t, bt, sl: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_size, gd),
                         lambda b, t, bt, sl: (bt[b, t], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_size, gd),
                         lambda b, t, bt, sl: (bt[b, t], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h_q, d), lambda b, t, bt, sl: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h_q, 1), jnp.float32),
            pltpu.VMEM((h_q, 1), jnp.float32),
            pltpu.VMEM((h_q, gd), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(wide_kernel, block_size=block_size, max_blocks=mb,
                          scale=1.0 / math.sqrt(d)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h_q, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(bt, seq_lens.astype(jnp.int32), *[qw, k3, v3])
    return out


def timed_chain(step, q0, *rest):
    @jax.jit
    def run(q, *rest):
        def body(i, q):
            o = step(q, *rest)
            return q + o * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, q)
    run(q0, *rest)
    r = run(q0, *rest)
    float(np.asarray(r).reshape(-1)[0])
    t0 = time.time()
    r = run(q0, *rest)
    float(np.asarray(r).reshape(-1)[0])
    return (time.time() - t0) / ITERS * 1e6


from blazr_tpu.attention.paged_attention import paged_attention_decode

for bs in (64, 128):
    for B in [int(a) for a in sys.argv[1:]] or (8, 32):
        mb = CTX // bs
        nb = B * mb
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((B, H, D)), dtype=jnp.bfloat16)
        kf = jnp.asarray(rng.standard_normal((nb * bs + 1, G, D)),
                         dtype=jnp.bfloat16)
        vf = jnp.asarray(rng.standard_normal((nb * bs + 1, G, D)),
                         dtype=jnp.bfloat16)
        bt = jnp.asarray(np.arange(nb, dtype=np.int32).reshape(B, mb))
        sl = jnp.full((B,), CTX - 1, dtype=jnp.int32)

        o_cur = paged_attention_decode(q, kf, vf, bt, sl, block_size=bs,
                                       num_blocks=nb)
        o_w = pa_wide(q, kf, vf, bt, sl, block_size=bs, num_blocks=nb)
        err = float(jnp.max(jnp.abs(o_cur.astype(jnp.float32)
                                    - o_w.astype(jnp.float32))))
        t_cur = timed_chain(
            lambda q, kf, vf: paged_attention_decode(
                q, kf, vf, bt, sl, block_size=bs, num_blocks=nb),
            q, kf, vf)
        t_w = timed_chain(
            lambda q, kf, vf: pa_wide(q, kf, vf, bt, sl, block_size=bs,
                                      num_blocks=nb),
            q, kf, vf)
        print(f"bs={bs:3d} B={B:3d}  cur {t_cur:7.1f}  wide {t_w:7.1f} "
              f"us/call  (maxerr {err:.3e})", flush=True)
print("done", flush=True)
