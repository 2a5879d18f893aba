"""Continuous-batching forwards for every architecture family.

TPU-native equivalent of the reference serving every attention arch through
``forward_with_paged_kv_cache`` and Mamba via ``forward_with_ssm_state``
(/root/reference/src/engine/executor_generate.rs:123-340): the batch engine
dispatches ONE uniform step signature

    fwd(params, cfg, tokens, cache, positions, slots, block_tables,
        seq_lens, state_rows) -> (logits, cache)

to a per-family implementation:

  * llama family — ``llama_paged.forward_paged`` (paged KV; state_rows unused)
  * MLA          — paged COMPRESSED-latent cache (this module): the 4-8×
                   smaller latent pages ride the same block allocator /
                   block tables as regular KV
  * mamba2       — O(1) per-sequence state SLOTS: each running sequence owns
                   a row of a [L, max_batch+1, ...] state pool (last row =
                   trash for batch padding); no pages at all
  * hybrid       — paged KV for attention layers + state slots for mamba
                   layers, combined in one pytree

All shapes static (padded batch / block tables / slot rows) so each step
compiles once.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config.model_config import LAYER_MAMBA2, UniversalConfig
from ..kvcache.paged import PagedKVCache, init_paged_cache
from ..kvcache.ssm_state import SSMState, init_ssm_state
from .layers import (
    layer_norm,
    linear,
    plain_mlp,
    rms_norm,
    rope_cos_sin,
    rope_frequencies,
    swiglu_mlp,
)


# ---------------------------------------------------------------------------
# Family resolution
# ---------------------------------------------------------------------------

def resolve_paged_kind(cfg: UniversalConfig) -> str:
    """'llama' | 'mla' | 'mamba2' | 'hybrid' — which continuous-batching
    forward a model uses (mirror of registry.build_model's dispatch)."""
    types = set(cfg.layer_types())
    if types == {LAYER_MAMBA2}:
        return "mamba2"
    if LAYER_MAMBA2 in types:
        return "hybrid"
    if cfg.attention is not None and cfg.attention.is_mla:
        return "mla"
    return "llama"


# ---------------------------------------------------------------------------
# Paged MLA latent cache
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedMLACache:
    """Compressed-latent pages: flat slot layout like PagedKVCache but the
    per-token payload is (c_kv [kv_lora], k_rope [d_rope]) instead of
    per-head K/V — the same 4-8× compression the contiguous MLA cache
    carries (reference docs/architecture.md:89), now block-paged."""

    latent: jax.Array                 # [L, NB*BS + 1, kv_lora]
    k_rope: jax.Array                 # [L, NB*BS + 1, d_rope]
    block_size: int = dataclasses.field(metadata=dict(static=True))
    num_blocks: int = dataclasses.field(metadata=dict(static=True))
    latent_scale: Optional[jax.Array] = None   # [L, NB*BS + 1] f32 (int8 mode)
    k_rope_scale: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.latent_scale is not None

    @property
    def trash_slot(self) -> int:
        return self.latent.shape[1] - 1


def init_paged_mla_cache(cfg: UniversalConfig, num_blocks: int,
                         block_size: int, dtype=jnp.bfloat16,
                         quantized: bool = False) -> PagedMLACache:
    att = cfg.attention
    ns = num_blocks * block_size + 1
    if quantized:
        return PagedMLACache(
            latent=jnp.zeros((cfg.num_layers, ns, att.kv_latent_dim),
                             dtype=jnp.int8),
            k_rope=jnp.zeros((cfg.num_layers, ns, att.d_rope), dtype=jnp.int8),
            block_size=block_size, num_blocks=num_blocks,
            latent_scale=jnp.zeros((cfg.num_layers, ns), dtype=jnp.float32),
            k_rope_scale=jnp.zeros((cfg.num_layers, ns), dtype=jnp.float32),
        )
    return PagedMLACache(
        latent=jnp.zeros((cfg.num_layers, ns, att.kv_latent_dim), dtype=dtype),
        k_rope=jnp.zeros((cfg.num_layers, ns, att.d_rope), dtype=dtype),
        block_size=block_size, num_blocks=num_blocks,
    )


def _gather_latent_pages(cache: PagedMLACache, layer: int,
                         block_tables: jax.Array):
    """[B, MB] → (latent [B, MB*BS, r], k_rope [B, MB*BS, d],
    scales or None)."""
    from ..kvcache.paged import page_slot_index

    slot_idx = page_slot_index(cache.block_size, block_tables)
    c = jnp.take(cache.latent[layer], slot_idx, axis=0)
    r = jnp.take(cache.k_rope[layer], slot_idx, axis=0)
    if cache.quantized:
        cs = jnp.take(cache.latent_scale[layer], slot_idx, axis=0)
        rs = jnp.take(cache.k_rope_scale[layer], slot_idx, axis=0)
        return c, r, cs, rs
    return c, r, None, None


def _paged_mla_block(p, cfg, x, cache: PagedMLACache, layer, positions,
                     slot_mapping, block_tables, seq_lens, cos, sin):
    from .layers import apply_rope, apply_rope_interleaved

    att = cfg.attention
    b, t, _ = x.shape
    h = att.num_heads
    d_nope, d_rope, v_dim = att.d_nope, att.d_rope, att.v_head_dim
    kv_lora = att.kv_latent_dim

    if p.get("q_a") is not None:
        q = linear(rms_norm(linear(x, p["q_a"]), p["q_a_norm"],
                            cfg.rms_norm_eps), p["q_b"])
    else:
        q = linear(x, p["q"])
    q = q.reshape(b, t, h, d_nope + d_rope)
    q_nope, q_rope = q[..., :d_nope], q[..., d_nope:]
    rope_fn = apply_rope_interleaved if att.rope_interleave else apply_rope
    q_rope = rope_fn(q_rope, cos, sin)

    ckv = linear(x, p["kv_a"])
    c = rms_norm(ckv[..., :kv_lora], p["kv_a_norm"], cfg.rms_norm_eps)
    k_rope = rope_fn(ckv[..., kv_lora:][:, :, None, :], cos, sin)[:, :, 0, :]

    flat = slot_mapping.reshape(-1)
    if cache.quantized:
        def _q(v):
            vf = v.astype(jnp.float32)
            sc = jnp.maximum(jnp.max(jnp.abs(vf), axis=-1), 1e-8) / 127.0
            return (jnp.clip(jnp.round(vf / sc[..., None]), -127, 127)
                    .astype(jnp.int8), sc)

        cq, csc = _q(c)
        rq, rsc = _q(k_rope)
        cache = dataclasses.replace(
            cache,
            latent=cache.latent.at[layer, flat].set(cq.reshape(b * t, -1)),
            k_rope=cache.k_rope.at[layer, flat].set(rq.reshape(b * t, -1)),
            latent_scale=cache.latent_scale.at[layer, flat].set(
                csc.reshape(b * t)),
            k_rope_scale=cache.k_rope_scale.at[layer, flat].set(
                rsc.reshape(b * t)),
        )
    else:
        cache = dataclasses.replace(
            cache,
            latent=cache.latent.at[layer, flat].set(
                c.reshape(b * t, -1).astype(cache.latent.dtype)),
            k_rope=cache.k_rope.at[layer, flat].set(
                k_rope.reshape(b * t, -1).astype(cache.k_rope.dtype)),
        )

    c_all, kr_all, c_sc, r_sc = _gather_latent_pages(cache, layer,
                                                     block_tables)
    c_all = c_all.astype(jnp.float32)
    kr_all = kr_all.astype(jnp.float32)

    # Absorbed attention (same math as mla.mla_attention_block).
    q_eff = jnp.einsum("bthd,rhd->bthr", q_nope.astype(jnp.float32),
                       p["kv_b_k"].astype(jnp.float32))
    sc_c = jnp.einsum("bthr,bsr->bhts", q_eff, c_all)
    sc_r = jnp.einsum("bthd,bsd->bhts", q_rope.astype(jnp.float32), kr_all)
    if cache.quantized:
        sc_c = sc_c * c_sc[:, None, None, :]
        sc_r = sc_r * r_sc[:, None, None, :]
    scale = p.get("softmax_scale", 1.0 / math.sqrt(d_nope + d_rope))
    scores = (sc_c + sc_r) * scale

    s_pad = c_all.shape[1]
    kv_pos = jnp.arange(s_pad, dtype=jnp.int32)[None, :]
    mask = (kv_pos < seq_lens[:, None])[:, None, :] & \
        (kv_pos[:, None, :] <= positions[:, :, None])
    scores = jnp.where(mask[:, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    if cache.quantized:
        probs = probs * c_sc[:, None, None, :]
    out_latent = jnp.einsum("bhts,bsr->bthr", probs, c_all)
    out = jnp.einsum("bthr,rhv->bthv", out_latent,
                     p["kv_b_v"].astype(jnp.float32))
    out = out.reshape(b, t, h * v_dim).astype(x.dtype)
    return linear(out, p["o"]), cache


def mla_forward_paged(params, cfg, tokens, cache: PagedMLACache, positions,
                      slot_mapping, block_tables, seq_lens,
                      state_rows=None, last_idx=None):
    from .moe import moe_ffn

    x = jnp.take(params["embed"], tokens, axis=0)
    att = cfg.attention
    inv_freq = rope_frequencies(att, 2 * (att.d_rope // 2))
    cos, sin = rope_cos_sin(positions, inv_freq)

    for i, p in enumerate(params["layers"]):
        h = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
        attn_out, cache = _paged_mla_block(
            p, cfg, h, cache, i, positions, slot_mapping, block_tables,
            seq_lens, cos, sin)
        x = x + attn_out
        h = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
        if p.get("moe") is not None:
            x = x + moe_ffn(h, p["moe"], cfg.moe)
        else:
            x = x + swiglu_mlp(h, p["gate"], p["up"], p["down"])

    if last_idx is not None:
        # head on the last position only (see llama_paged.forward_paged)
        x = jnp.take_along_axis(x, last_idx[:, None, None], axis=1)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    lm_head = params.get("lm_head")
    if lm_head is None:
        logits = jnp.dot(x, params["embed"].T.astype(x.dtype),
                         preferred_element_type=jnp.float32)
    else:
        logits = linear(x, lm_head)
    return logits.astype(jnp.float32), cache


# ---------------------------------------------------------------------------
# Mamba2 state slots
# ---------------------------------------------------------------------------

def init_ssm_slots(cfg: UniversalConfig, max_batch: int,
                   num_layers: Optional[int] = None) -> SSMState:
    """State pool with max_batch+1 rows; the LAST row is the trash row
    batch padding points at (mirrors the paged cache's trash slot)."""
    return init_ssm_state(cfg, max_batch + 1, dtype=jnp.float32,
                          num_layers=num_layers)


def zero_ssm_row(state: SSMState, row: int) -> SSMState:
    """Reset one sequence's state row (new admission / preemption restart)."""
    return SSMState(
        conv=state.conv.at[:, row].set(0.0),
        ssm=state.ssm.at[:, row].set(0.0),
        length=state.length.at[row].set(0),
    )


def _gather_rows(state: SSMState, rows: jax.Array) -> SSMState:
    return SSMState(conv=state.conv[:, rows], ssm=state.ssm[:, rows],
                    length=state.length[rows])


def _scatter_rows(pool: SSMState, batch_state: SSMState,
                  rows: jax.Array) -> SSMState:
    return SSMState(
        conv=pool.conv.at[:, rows].set(batch_state.conv),
        ssm=pool.ssm.at[:, rows].set(batch_state.ssm),
        length=pool.length.at[rows].set(batch_state.length),
    )


def mamba2_forward_slots(params, cfg, tokens, pool: SSMState, positions,
                         slot_mapping, block_tables, seq_lens,
                         state_rows=None, last_idx=None):
    """Pure-Mamba2 batch step over state slots (pages unused — O(1) state,
    reference executor_generate.rs:123-181 forward_with_ssm_state)."""
    from . import mamba2

    batch_state = _gather_rows(pool, state_rows)
    logits, batch_state = mamba2.forward(params, cfg, tokens, batch_state,
                                         positions, seq_lens,
                                         last_idx=last_idx)
    return logits, _scatter_rows(pool, batch_state, state_rows)


# ---------------------------------------------------------------------------
# Hybrid: paged KV (attention layers) + state slots (mamba layers)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HybridPagedState:
    kv: PagedKVCache
    ssm: SSMState                     # slot pool [L_mamba, max_batch+1, ...]

    # Engine-facing aliases so BatchEngine can treat any cache uniformly.
    @property
    def block_size(self) -> int:
        return self.kv.block_size

    @property
    def trash_slot(self) -> int:
        return self.kv.trash_slot

    @property
    def quantized(self) -> bool:
        return self.kv.quantized


def init_hybrid_paged_state(cfg: UniversalConfig, num_blocks: int,
                            block_size: int, max_batch: int,
                            dtype=jnp.bfloat16,
                            quantized: bool = False) -> HybridPagedState:
    types = cfg.layer_types()
    n_attn = sum(1 for t in types if t != LAYER_MAMBA2)
    n_mamba = sum(1 for t in types if t == LAYER_MAMBA2)
    att = cfg.attention
    kv = init_paged_cache(max(n_attn, 1), num_blocks, block_size,
                          att.kv_heads(),
                          att.resolved_head_dim(cfg.hidden_size),
                          dtype=dtype, quantized=quantized)
    return HybridPagedState(
        kv=kv, ssm=init_ssm_slots(cfg, max_batch, num_layers=max(n_mamba, 1)))


def hybrid_forward_paged(params, cfg, tokens, state: HybridPagedState,
                         positions, slot_mapping, block_tables, seq_lens,
                         state_rows=None, last_idx=None):
    from ..models.llama_paged import _paged_attention_block
    from .mamba2 import mamba2_block

    x = jnp.take(params["embed"], tokens, axis=0)
    att = cfg.attention
    head_dim = att.resolved_head_dim(cfg.hidden_size)
    inv_freq = rope_frequencies(att, head_dim)
    cos, sin = rope_cos_sin(positions, inv_freq)

    kv = state.kv
    ssm = _gather_rows(state.ssm, state_rows)

    types = cfg.layer_types()
    attn_i = mamba_i = 0
    for i, p in enumerate(params["layers"]):
        h = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
        if types[i] == LAYER_MAMBA2:
            out, ssm = mamba2_block(p, cfg, h, ssm, mamba_i)
            mamba_i += 1
        else:
            out, kv = _paged_attention_block(
                p, cfg, h, kv, attn_i, positions, slot_mapping,
                block_tables, seq_lens, cos, sin)
            attn_i += 1
        x = x + out
        # Separate FFN sub-block: present on attention layers in ANY of
        # its variants (dense swiglu, MoE, fused gate+up, plain MLP) —
        # gating on "gate" alone silently dropped the FFN for MoE /
        # fused / plain layers (pure-Mamba layers have none).
        if any(p.get(k) is not None for k in ("gate", "moe", "gateup",
                                              "fc")):
            h = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
            if p.get("moe") is not None:
                from .moe import moe_forward

                x = x + moe_forward(h, p["moe"], cfg.moe)
            elif p.get("fc") is not None:
                x = x + plain_mlp(h, p["fc"], p.get("fc_bias"), p["down"],
                                  p.get("down_bias"), act=cfg.hidden_act)
            elif p.get("gateup") is not None:
                gu = linear(h, p["gateup"])
                inter = gu.shape[-1] // 2
                x = x + linear(
                    jax.nn.silu(gu[..., :inter]) * gu[..., inter:],
                    p["down"])
            else:
                x = x + swiglu_mlp(h, p["gate"], p["up"], p["down"])

    ssm = SSMState(conv=ssm.conv, ssm=ssm.ssm,
                   length=ssm.length + tokens.shape[1])
    if last_idx is not None:
        # head on the last position only (see llama_paged.forward_paged)
        x = jnp.take_along_axis(x, last_idx[:, None, None], axis=1)
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    lm_head = params.get("lm_head")
    if lm_head is None:
        logits = jnp.dot(x, params["embed"].T.astype(x.dtype),
                         preferred_element_type=jnp.float32)
    else:
        logits = linear(x, lm_head)
    return logits.astype(jnp.float32), HybridPagedState(
        kv=kv, ssm=_scatter_rows(state.ssm, ssm, state_rows))


# ---------------------------------------------------------------------------
# Engine-facing dispatch
# ---------------------------------------------------------------------------

def make_paged_forward(cfg: UniversalConfig):
    """Return fwd(params, cfg, tokens, cache, positions, slots,
    block_tables, seq_lens, state_rows) for the model's family."""
    kind = resolve_paged_kind(cfg)
    if kind == "llama":
        from .llama_paged import forward_paged

        def fwd(params, cfg, tokens, cache, positions, slots, bts, seq_lens,
                state_rows=None, last_idx=None):
            return forward_paged(params, cfg, tokens, cache, positions,
                                 slots, bts, seq_lens, last_idx=last_idx)
        return fwd
    if kind == "mla":
        return mla_forward_paged
    if kind == "mamba2":
        return mamba2_forward_slots
    return hybrid_forward_paged


def init_engine_cache(cfg: UniversalConfig, num_blocks: int, block_size: int,
                      max_batch: int, dtype=jnp.bfloat16,
                      quantized: bool = False):
    """(cache, needs_state_rows) for the model's family."""
    kind = resolve_paged_kind(cfg)
    if kind == "llama":
        att = cfg.attention
        return init_paged_cache(
            cfg.num_layers, num_blocks, block_size, att.kv_heads(),
            att.resolved_head_dim(cfg.hidden_size), dtype=dtype,
            quantized=quantized), False
    if kind == "mla":
        return init_paged_mla_cache(cfg, num_blocks, block_size, dtype=dtype,
                                    quantized=quantized), False
    if kind == "mamba2":
        return init_ssm_slots(cfg, max_batch), True
    return init_hybrid_paged_state(cfg, num_blocks, block_size, max_batch,
                                   dtype=dtype, quantized=quantized), True


def zero_state_rows(cache, row: int):
    """Reset a sequence's SSM slot in whatever cache pytree holds it."""
    if isinstance(cache, SSMState):
        return zero_ssm_row(cache, row)
    if isinstance(cache, HybridPagedState):
        return HybridPagedState(kv=cache.kv, ssm=zero_ssm_row(cache.ssm, row))
    return cache
