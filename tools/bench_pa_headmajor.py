"""A/B: paged-attention kernel with HEAD-MAJOR KV layout.

Current flat cache [NB*BS, G, D] tiles (G, D) — every kernel block must
relayout [BS, G, D] → per-head [BS, D] (f32 VREG shuffles that rival the
DMA cost). Head-major [G, NB*BS, D] gives (BS, D) tiles directly:
grid (B, G, T), block (1, BS, D), zero transposes.

Usage: python tools/bench_pa_headmajor.py [B ...]
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


def hm_kernel(bt_ref, sl_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
              acc_ref, *, block_size, max_blocks, scale):
    b = pl.program_id(0)
    t = pl.program_id(2)
    seq_len = sl_ref[b]

    @pl.when(t == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    @pl.when((t * block_size) < seq_len)
    def _attend():
        q = q_ref[0, 0].astype(jnp.float32) * scale        # [Hg, D]
        k = k_ref[0, 0].astype(jnp.float32)                # [BS, D]
        v = v_ref[0, 0].astype(jnp.float32)
        logits = jnp.dot(q, k.T, preferred_element_type=jnp.float32)
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
        acc_ref[...] = acc_ref[...] * alpha + jnp.dot(
            p, v, preferred_element_type=jnp.float32)

    @pl.when(t == max_blocks - 1)
    def _done():
        o_ref[0, 0] = (acc_ref[...] /
                       jnp.maximum(l_ref[...], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_size", "num_blocks"))
def pa_headmajor(q, k_hm, v_hm, block_tables, seq_lens, *, block_size,
                 num_blocks):
    b, h_q, d = q.shape
    g = k_hm.shape[0]
    hpg = h_q // g
    mb = block_tables.shape[1]
    k3 = k_hm[:, : num_blocks * block_size].reshape(g, num_blocks,
                                                    block_size, d)
    v3 = v_hm[:, : num_blocks * block_size].reshape(g, num_blocks,
                                                    block_size, d)
    qg = q.reshape(b, g, hpg, d)
    bt = block_tables.astype(jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, g, mb),
        in_specs=[
            pl.BlockSpec((1, 1, hpg, d), lambda b, g, t, bt, sl: (b, g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_size, d),
                         lambda b, g, t, bt, sl: (g, bt[b, t], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_size, d),
                         lambda b, g, t, bt, sl: (g, bt[b, t], 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, hpg, d),
                               lambda b, g, t, bt, sl: (b, g, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((hpg, 1), jnp.float32),
            pltpu.VMEM((hpg, 1), jnp.float32),
            pltpu.VMEM((hpg, d), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(hm_kernel, block_size=block_size, max_blocks=mb,
                          scale=1.0 / math.sqrt(d)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, g, hpg, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
    )(bt, seq_lens.astype(jnp.int32), *[qg, k3, v3])
    return out.reshape(b, h_q, d)


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
        k_hm = jnp.transpose(kf[:-1], (1, 0, 2)).copy()
        v_hm = jnp.transpose(vf[:-1], (1, 0, 2)).copy()
        bt = jnp.asarray(np.arange(nb, dtype=np.int32).reshape(B, mb))
        sl = jnp.full((B,), CTX - 1, dtype=jnp.int32)

        # parity check
        o_cur = paged_attention_decode(q, kf, vf, bt, sl, block_size=bs,
                                       num_blocks=nb)
        o_hm = pa_headmajor(q, k_hm, v_hm, bt, sl, block_size=bs,
                            num_blocks=nb)
        err = float(jnp.max(jnp.abs(o_cur.astype(jnp.float32)
                                    - o_hm.astype(jnp.float32))))
        t_cur = timed_chain(
            lambda q, kf, vf: paged_attention_decode(
                q, kf, vf, bt, sl, block_size=bs, num_blocks=nb),
            q, kf, vf)
        t_hm = timed_chain(
            lambda q, k, v: pa_headmajor(q, k, v, bt, sl, block_size=bs,
                                         num_blocks=nb),
            q, k_hm, v_hm)
        print(f"bs={bs:3d} B={B:3d}  cur {t_cur:7.1f}  headmajor {t_hm:7.1f} "
              f"us/layer-call  (maxerr {err:.3e})", flush=True)
print("done", flush=True)
