"""Pallas paged-attention decode kernel.

TPU-native replacement for the gather-based fallback in
``models/llama_paged.py``: instead of materializing every sequence's pages
into a contiguous [B, S, H, D] buffer (2× HBM traffic), the kernel walks
the padded block table with scalar prefetch and streams each KV block
HBM→VMEM once, accumulating flash-style online softmax per (sequence,
kv-head) grid cell.

Layout contract (matches ``kvcache.paged.PagedKVCache``):
    k, v   : [NB, BS, H_kv, D]   (the flat cache minus its trash slot,
                                  reshaped — a free view)
    q      : [B, H_q, D]         one decode token per sequence
    block_tables : [B, MB] int32 (PAD_BLOCK beyond each sequence)
    seq_lens     : [B]     int32 valid tokens (incl. the current one)
Output: [B, H_q, D].
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..kvcache.paged import PAD_BLOCK


def _pa_kernel(bt_ref, sl_ref, q_ref, *rest,
               block_size: int, max_blocks: int, heads_per_group: int,
               num_kv_heads: int, scale: float, quantized: bool = False,
               sliding_window: int | None = None,
               logit_softcap: float | None = None,
               has_alibi: bool = False, fan: int = 1):
    """Grid (B, ⌈MB/fan⌉): each program streams ``fan`` KV blocks for ALL
    kv heads.

    ``fan`` > 1 amortizes the per-grid-step Mosaic overhead — the decode
    regime's actual bind (B=64 × MB=8 = 512 grid steps of ~20-30 µs fixed
    cost dwarf the ~0.2 ms of KV bytes; measured 25.8 ms/step engine vs
    16.2 contiguous at b32/bs64). Each of the ``fan`` block-table slots
    rides its own scalar-prefetch-indexed operand, so the unroll keeps
    the allocator's block granularity while cutting grid steps fan×.

    Mosaic's block-shape rule requires the last two block dims to be
    8/128-divisible or full — so blocks carry the full [BS, H_kv, D]
    slice (the r1 per-head (…, 1, D) blocks only lowered in interpret
    mode) and the head axis is handled with an in-kernel batched dot.

    Attention variants (semantics identical to models/layers.attend with
    a decode query at q_pos = seq_len-1):
      sliding_window — keys below ``seq_len - window`` are masked AND the
        grid walks only the in-window block-table slots (the index maps
        offset by the per-row first in-window block, so out-of-window KV
        is never streamed from HBM);
      logit_softcap — Gemma-2 style ``tanh(logits/cap)*cap`` on the f32
        logits, after the int8-KV scale fold, before mask/bias;
      has_alibi — an extra [H_q, 1] slopes operand adds
        ``slope * (kv_pos - q_pos)`` to the logits (falcon).
    """
    k_refs = rest[:fan]
    v_refs = rest[fan : 2 * fan]
    rest = rest[2 * fan :]
    if quantized:
        ks_refs = rest[:fan]
        vs_refs = rest[fan : 2 * fan]
        rest = rest[2 * fan :]
    if has_alibi:
        alibi_ref = rest[0]
        rest = rest[1:]
    o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    t = pl.program_id(1)            # grid step (≠ block-table slot if windowed)
    g_all = num_kv_heads
    hpg = heads_per_group
    h_q = g_all * hpg

    seq_len = sl_ref[b]
    if sliding_window is not None:
        # First block-table slot that holds any in-window key.
        lo = jnp.maximum(seq_len - sliding_window, 0) // block_size
    else:
        lo = 0

    @pl.when(t == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -1e30)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for f in range(fan):
        _pa_attend_block(
            lo + (t * fan + f), seq_len,
            q_ref, k_refs[f], v_refs[f],
            ks_refs[f] if quantized else None,
            vs_refs[f] if quantized else None,
            alibi_ref if has_alibi else None,
            m_ref, l_ref, acc_ref,
            block_size=block_size, heads_per_group=hpg,
            num_kv_heads=g_all, scale=scale,
            sliding_window=sliding_window, logit_softcap=logit_softcap)

    @pl.when(t == max_blocks - 1)
    def _done():
        denom = jnp.maximum(l_ref[...], 1e-30)
        o_ref[0] = (acc_ref[...] / denom).reshape(
            g_all, hpg, -1).astype(o_ref.dtype)


def _pa_attend_block(tt, seq_len, q_ref, k_ref, v_ref, ks_ref, vs_ref,
                     alibi_ref, m_ref, l_ref, acc_ref, *,
                     block_size: int, heads_per_group: int,
                     num_kv_heads: int, scale: float,
                     sliding_window: int | None,
                     logit_softcap: float | None):
    """Online-softmax update for ONE streamed KV block (table slot tt)."""
    g_all = num_kv_heads
    hpg = heads_per_group
    h_q = g_all * hpg
    quantized = ks_ref is not None
    valid_block = (tt * block_size) < seq_len

    @pl.when(valid_block)
    def _attend():
        # Compute dtype follows Q (bf16 on chip → bf16 MXU rate, half the
        # VMEM per streamed block); accumulation stays f32 via
        # preferred_element_type — the attend fallback's exact policy.
        # int8 KV converts to the compute dtype (its scales follow).
        q = q_ref[0]                                    # [G, Hg, D]
        k = k_ref[0].astype(q.dtype)                    # [BS, G, D]
        v = v_ref[0].astype(q.dtype)
        kt = jnp.transpose(k, (1, 0, 2))                # [G, BS, D]
        vt = jnp.transpose(v, (1, 0, 2))

        # [G, Hg, BS] — one batched dot over the kv-head axis; the f32
        # scale multiplies the f32 logits (not the bf16 operands).
        logits = jax.lax.dot_general(
            q, kt, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if quantized:
            # int8 KV: per-key scales [BS, G] → [G, 1, BS].
            ks = jnp.transpose(ks_ref[0], (1, 0))
            logits = logits * ks[:, None, :]
        if logit_softcap is not None:
            logits = jnp.tanh(logits / logit_softcap) * logit_softcap
        pos = tt * block_size + jax.lax.broadcasted_iota(
            jnp.int32, (1, 1, block_size), 2)
        if alibi_ref is not None:
            # slope * (kv_pos - q_pos); q_pos = seq_len-1 for decode.
            rel = (pos - (seq_len - 1)).astype(jnp.float32)  # [1, 1, BS]
            logits = logits + (alibi_ref[...].reshape(g_all, hpg, 1)
                               * rel)
        mask = pos < seq_len                            # [1, 1, BS]
        if sliding_window is not None:
            mask = mask & (pos > seq_len - 1 - sliding_window)
        logits = jnp.where(mask, logits, -1e30)

        # Flat [H_q, *] running stats (8-divisible sublane count).
        logits2 = logits.reshape(h_q, block_size)
        m_prev = m_ref[...]                             # [H_q, 1]
        l_prev = l_ref[...]
        m_new = jnp.maximum(m_prev,
                            jnp.max(logits2, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(logits2 - m_new)
        p = jnp.where(mask.reshape(1, block_size), p, 0.0)
        l_ref[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        m_ref[...] = m_new
        p3 = p.reshape(g_all, hpg, block_size)
        if quantized:
            vs = jnp.transpose(vs_ref[0], (1, 0))       # [G, BS]
            p3 = p3 * vs[:, None, :]
        # [G, Hg, D] weighted values, batched over the kv-head axis —
        # probabilities drop to the compute dtype (attend does the same).
        av = jax.lax.dot_general(
            p3.astype(q.dtype), vt, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        acc_ref[...] = acc_ref[...] * alpha + av.reshape(h_q, -1)


def default_fan(block_size: int, h_kv: int, d: int, itemsize: int,
                mb_eff: int) -> int:
    """Default block-table fan-out, VMEM-guarded (ADVICE r4): each fan
    unit streams K+V double-buffered (2·2·BS·H_kv·D·itemsize bytes);
    large block sizes would otherwise scale fan=4's footprint past the
    compiler's VMEM budget. The KV streaming window is capped at ~4 MB —
    at the default bs=16/7B-GQA geometry fan=4 is untouched; bs=256
    degrades to fan=2 and bs=512 to fan=1 instead of failing to
    compile."""
    kv_bytes_per_fan = 2 * 2 * block_size * h_kv * d * itemsize
    return min(4, max(1, mb_eff), max(1, (4 << 20) // kv_bytes_per_fan))


@functools.partial(
    jax.jit,
    static_argnames=("block_size", "num_blocks", "interpret",
                     "sliding_window", "logit_softcap", "fan"),
)
def paged_attention_decode(
    q: jax.Array,                 # [B, H_q, D]
    k_cache: jax.Array,           # [NB*BS(+1 trash), H_kv, D] flat
    v_cache: jax.Array,
    block_tables: jax.Array,      # [B, MB]
    seq_lens: jax.Array,          # [B]
    *,
    block_size: int,
    num_blocks: int,
    interpret: bool = False,
    k_scale=None,                 # [NB*BS(+1), H_kv] f32 (int8 KV mode)
    v_scale=None,
    sliding_window: int | None = None,
    logit_softcap: float | None = None,
    alibi=None,                   # [H_q] f32 slopes (falcon)
    fan: int | None = None,       # block-table slots streamed per grid step
) -> jax.Array:
    b, h_q, d = q.shape
    h_kv = k_cache.shape[1]
    hpg = h_q // h_kv
    mb = block_tables.shape[1]
    scale = 1.0 / math.sqrt(d)

    k4 = k_cache[: num_blocks * block_size].reshape(num_blocks, block_size,
                                                    h_kv, d)
    v4 = v_cache[: num_blocks * block_size].reshape(num_blocks, block_size,
                                                    h_kv, d)
    # Group queries by kv head: [B, H_kv, Hg, D]
    qg = q.reshape(b, h_kv, hpg, d)

    # Padded table entries point at block 0 (never read: masked by seq_len
    # AND skipped by the valid_block guard since padded slots only occur
    # past the sequence's last block).
    bt = jnp.where(block_tables == PAD_BLOCK, 0, block_tables).astype(jnp.int32)

    quantized = k_scale is not None

    # A window of W keys ending at seq_len-1 straddles at most
    # W//BS + 2 block-table slots — the grid never walks more than that.
    mb_eff = mb if sliding_window is None else min(
        mb, sliding_window // block_size + 2)

    # Fan-out: stream `fan` table slots per grid step (each as its own
    # scalar-prefetch-indexed operand). The decode regime is bound by
    # per-grid-step fixed overhead, not KV bytes — B=64 × MB=8 is 512
    # steps of ~20-30 µs; fan=4 cuts that 4× at ~1 MB extra VMEM.
    if fan is None:
        env_fan = os.environ.get("BLAZR_TPU_PA_FAN")
        fan = (int(env_fan) if env_fan
               else default_fan(block_size, h_kv, d, k4.dtype.itemsize,
                                mb_eff))
    fan = max(1, min(fan, mb_eff))
    grid_t = -(-mb_eff // fan)

    # Sliding window: grid walks block-table slots lo(b)..lo(b)+t where
    # lo is the first slot holding in-window keys — out-of-window blocks
    # are never streamed from HBM (the index map does the offset; the
    # kernel recomputes lo for its position math). Slot indices past the
    # table clamp to mb-1; the kernel's seq_len guard ignores their data.
    def _slot(f):
        if sliding_window is None:
            def _m(b, t, bt, sl):
                return bt[b, jnp.minimum(t * fan + f, mb - 1)]
        else:
            def _m(b, t, bt, sl):
                lo = jnp.maximum(sl[b] - sliding_window, 0) // block_size
                return bt[b, jnp.minimum(lo + t * fan + f, mb - 1)]
        return _m

    # Blocks carry FULL trailing dims ([BS, H_kv, D] per KV block) — the
    # Mosaic block-shape rule; the kernel batches the head axis in-register.
    def _kv_spec(f):
        m = _slot(f)
        return pl.BlockSpec((1, block_size, h_kv, d),
                            lambda b, t, bt, sl, _m=m: (_m(b, t, bt, sl),
                                                        0, 0, 0),
                            memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((1, h_kv, hpg, d), lambda b, t, bt, sl: (b, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        *[_kv_spec(f) for f in range(fan)],
        *[_kv_spec(f) for f in range(fan)],
    ]
    operands = [qg, *([k4] * fan), *([v4] * fan)]
    if quantized:
        ks3 = k_scale[: num_blocks * block_size].reshape(
            num_blocks, block_size, h_kv)
        vs3 = v_scale[: num_blocks * block_size].reshape(
            num_blocks, block_size, h_kv)

        # whole [BS, H_kv] scale tile per block (lane dim full: H_kv < 128)
        def _sc_spec(f):
            m = _slot(f)
            return pl.BlockSpec((1, block_size, h_kv),
                                lambda b, t, bt, sl, _m=m: (
                                    _m(b, t, bt, sl), 0, 0),
                                memory_space=pltpu.VMEM)

        in_specs += [_sc_spec(f) for f in range(fan)]
        in_specs += [_sc_spec(f) for f in range(fan)]
        operands += [*([ks3] * fan), *([vs3] * fan)]
    if alibi is not None:
        in_specs.append(pl.BlockSpec((h_q, 1),
                                     lambda b, t, bt, sl: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(jnp.asarray(alibi, jnp.float32).reshape(h_q, 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,          # block tables + seq lens
        grid=(b, grid_t),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h_kv, hpg, d),
                               lambda b, t, bt, sl: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h_q, 1), jnp.float32),     # running max
            pltpu.VMEM((h_q, 1), jnp.float32),     # denominator
            pltpu.VMEM((h_q, d), jnp.float32),     # accumulator
        ],
    )
    kernel = functools.partial(
        _pa_kernel, block_size=block_size, max_blocks=grid_t,
        heads_per_group=hpg, num_kv_heads=h_kv, scale=scale,
        quantized=quantized, sliding_window=sliding_window,
        logit_softcap=logit_softcap, has_alibi=alibi is not None,
        fan=fan,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, h_kv, hpg, d), q.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(bt, seq_lens.astype(jnp.int32), *operands)
    return out.reshape(b, h_q, d)


def paged_attention_reference(q, k_cache, v_cache, block_tables, seq_lens,
                              *, block_size: int,
                              sliding_window: int | None = None,
                              logit_softcap: float | None = None,
                              alibi=None) -> jax.Array:
    """Dense gather reference (same math as llama_paged gather path)."""
    from ..kvcache.paged import page_slot_index

    b, h_q, d = q.shape
    h_kv = k_cache.shape[1]
    mb = block_tables.shape[1]
    slot_idx = page_slot_index(block_size, block_tables)
    k = jnp.take(k_cache, slot_idx, axis=0)      # [B, S, H_kv, D]
    v = jnp.take(v_cache, slot_idx, axis=0)
    n_rep = h_q // h_kv
    k = jnp.repeat(k, n_rep, axis=2)
    v = jnp.repeat(v, n_rep, axis=2)
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bhd,bshd->bhs", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    if logit_softcap is not None:
        logits = jnp.tanh(logits / logit_softcap) * logit_softcap
    kv_pos = jnp.arange(mb * block_size, dtype=jnp.int32)[None, :]
    if alibi is not None:
        rel = (kv_pos - (seq_lens[:, None] - 1)).astype(jnp.float32)
        logits = logits + jnp.asarray(alibi, jnp.float32)[None, :, None] \
            * rel[:, None, :]
    mask = kv_pos < seq_lens[:, None]
    if sliding_window is not None:
        mask = mask & (kv_pos > seq_lens[:, None] - 1 - sliding_window)
    logits = jnp.where(mask[:, None, :], logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhs,bshd->bhd", p,
                      v.astype(jnp.float32)).astype(q.dtype)
