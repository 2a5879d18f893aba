"""Llama-family forward over the paged KV cache.

TPU-native equivalent of boostr ``forward_with_paged_kv_cache`` (SURVEY
§2.9 "Model layer" row). Same math as ``llama.forward`` but K/V live in
block pages: writes scatter to flat slots, attention gathers each
sequence's pages to a padded [B, MB*BS] view (the XLA fallback; the Pallas
paged-attention kernel replaces the gather on TPU).

All shapes static (padded batch + padded block tables), so the batched
decode step compiles once — the pattern the reference uses for its padded
[N, max_blocks] decode batches (batch_decode.rs:107-131).
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

import os

import jax as _jax

from ..config.model_config import UniversalConfig


def _use_pa_kernel(head_dim: int, cfg: UniversalConfig) -> bool:
    if os.environ.get("BLAZR_TPU_FORCE_XLA_ATTN", "0") == "1":
        return False
    if head_dim % 128 != 0:
        return False
    # Sliding window (Mistral), logit softcap (Gemma-2) and ALiBi
    # (falcon) are all implemented inside the kernel with attend-exact
    # semantics (parity-tested in test_paged_attention_kernel.py), so
    # none of them gates it off anymore.
    from ..quant.matmul import _on_tpu

    try:
        return _on_tpu()
    except Exception:  # pragma: no cover
        return False
from ..kvcache.paged import PagedKVCache, gather_pages, write_paged_layer
from .layers import (apply_rope, layer_norm, linear, plain_mlp,
                     rms_norm, rope_cos_sin, rope_frequencies, swiglu_mlp)


def _paged_attention_block(
    p: dict[str, Any],
    cfg: UniversalConfig,
    x: jax.Array,                  # [B, T, H]
    cache: PagedKVCache,
    layer: int,
    positions: jax.Array,          # [B, T]
    slot_mapping: jax.Array,       # [B, T]
    block_tables: jax.Array,       # [B, MB]
    seq_lens: jax.Array,           # [B] total valid tokens (incl. this step)
    cos: jax.Array,
    sin: jax.Array,
    alibi: Optional[jax.Array] = None,   # [H] slopes (falcon; replaces RoPE)
) -> tuple[jax.Array, PagedKVCache]:
    att = cfg.attention
    b, t, _ = x.shape
    head_dim = att.resolved_head_dim(cfg.hidden_size)
    n_heads = att.num_heads
    n_kv = att.kv_heads()

    if p.get("qkv") is not None:
        # Fused QKV projection (one wide matmul — single-chip layout;
        # under TP the loader unfuses, parallel/tp.unfuse_projections).
        qkv = linear(x, p["qkv"], p.get("qkv_bias"))
        q_dim = n_heads * head_dim
        kv_dim = n_kv * head_dim
        q = qkv[..., :q_dim].reshape(b, t, n_heads, head_dim)
        k = qkv[..., q_dim : q_dim + kv_dim].reshape(b, t, n_kv, head_dim)
        v = qkv[..., q_dim + kv_dim :].reshape(b, t, n_kv, head_dim)
    else:
        q = linear(x, p["q"], p.get("q_bias")).reshape(b, t, n_heads, head_dim)
        k = linear(x, p["k"], p.get("k_bias")).reshape(b, t, n_kv, head_dim)
        v = linear(x, p["v"], p.get("v_bias")).reshape(b, t, n_kv, head_dim)
    if p.get("q_norm") is not None:
        q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps)
    if alibi is None:
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    cache = write_paged_layer(cache, layer, k, v, slot_mapping)

    ring_mesh = getattr(cfg, "_sp_ring_mesh", None)
    if ring_mesh is not None and t > 1:
        # Sequence-parallel prefill under continuous batching: the whole
        # prompt is one chunk from position 0, so attention is pure
        # in-chunk causal — ring attention over the ``sp`` axis instead
        # of the page gather (K/V were still written to their pages above
        # for the decode steps that follow). The engine only installs
        # _sp_ring_mesh on its dedicated sp-prefill jit (llama family,
        # no softcap / ALiBi, start_pos == 0); sliding-window configs
        # ride the window-aware ring (fewer hops, VERDICT r3 #3). Same
        # design as the single-stream path (llama.py:82-95).
        from ..parallel.ring_attention import ring_attention
        from .layers import repeat_kv

        rep = n_heads // n_kv
        out = ring_attention(q, repeat_kv(k, rep), repeat_kv(v, rep),
                             ring_mesh, axis_name="sp",
                             sliding_window=att.sliding_window or None)
        out = out.reshape(b, t, n_heads * head_dim).astype(x.dtype)
        return linear(out, p["o"], p.get("o_bias")), cache

    # Decode fast path: the Pallas paged-attention kernel streams KV blocks
    # directly (no page gather materialization) on TPU.
    if t == 1 and _use_pa_kernel(head_dim, cfg):
        from ..attention.paged_attention import paged_attention_decode

        out = paged_attention_decode(
            q[:, 0], cache.k[layer], cache.v[layer], block_tables, seq_lens,
            block_size=cache.block_size, num_blocks=cache.num_blocks,
            k_scale=cache.k_scale[layer] if cache.quantized else None,
            v_scale=cache.v_scale[layer] if cache.quantized else None,
            sliding_window=att.sliding_window or None,
            logit_softcap=cfg.attn_logit_softcapping or None,
            alibi=alibi,
        )[:, None]                                  # [B, 1, H_q, D]
        out = out.reshape(b, t, n_heads * head_dim).astype(x.dtype)
        return linear(out, p["o"], p.get("o_bias")), cache

    # Gather fallback (prefill chunks + non-kernel configs): grouped-GQA
    # attend over the materialized pages — K/V are NEVER repeat_kv'd
    # (n_rep× the gathered bytes was the r1 fallback's dominant cost).
    from .layers import attend

    k_all, v_all = gather_pages(cache, layer, block_tables)   # [B, S_pad, ...]
    ks_all = vs_all = None
    if cache.quantized:
        from ..kvcache.paged import gather_page_scales

        ks_all, vs_all = gather_page_scales(cache, layer, block_tables)
    out = attend(
        q, k_all, v_all,
        q_positions=positions,
        kv_len=seq_lens,
        sliding_window=att.sliding_window,
        logit_softcap=cfg.attn_logit_softcapping,
        k_scale=ks_all,
        v_scale=vs_all,
        alibi=alibi,
    )
    out = out.reshape(b, t, n_heads * head_dim).astype(x.dtype)
    return linear(out, p["o"], p.get("o_bias")), cache


def forward_paged(
    params: dict[str, Any],
    cfg: UniversalConfig,
    tokens: jax.Array,            # [B, T]
    cache: PagedKVCache,
    positions: jax.Array,         # [B, T]
    slot_mapping: jax.Array,      # [B, T]
    block_tables: jax.Array,      # [B, MB]
    seq_lens: jax.Array,          # [B]
    last_idx: Optional[jax.Array] = None,   # [B] — head on this pos only
) -> tuple[jax.Array, PagedKVCache]:
    x = jnp.take(params["embed"], tokens, axis=0)
    if cfg.scale_embeddings:
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, dtype=x.dtype)

    att = cfg.attention
    head_dim = att.resolved_head_dim(cfg.hidden_size)
    inv_freq = rope_frequencies(att, head_dim)
    cos, sin = rope_cos_sin(positions, inv_freq)
    from .layers import alibi_slopes

    # HF falcon scales the ALiBi bias by 1/sqrt(head_dim) along with
    # the scores (modeling_falcon.py eager + sdpa paths) - the
    # semantics the falcon-rw checkpoints were trained with.
    alibi = (alibi_slopes(att.num_heads) * head_dim ** -0.5
             if att.use_alibi else None)

    ln = cfg.norm_type == "layernorm"
    # Gemma-family norms carry the (1 + w) offset; MLP act is GELU. Same
    # policy as llama.forward — the single-stream and continuous-batching
    # paths must be numerically identical per family.
    norm_offset = 1.0 if cfg.model_type in ("gemma", "gemma2") else 0.0

    def norm(h, w, bias=None):
        if ln:
            return layer_norm(h, w, bias, cfg.rms_norm_eps)
        return rms_norm(h, w, cfg.rms_norm_eps, norm_offset)

    def mlp(p, h):
        if p.get("moe") is not None:
            from .moe import moe_forward

            return moe_forward(h, p["moe"], cfg.moe)
        if p.get("fc") is not None:          # starcoder2/falcon plain MLP
            return plain_mlp(h, p["fc"], p.get("fc_bias"), p["down"],
                             p.get("down_bias"), act=cfg.hidden_act)
        if p.get("gateup") is not None:      # fused gate+up matmul
            gu = linear(h, p["gateup"])
            inter = gu.shape[-1] // 2
            return linear(jax.nn.silu(gu[..., :inter]) * gu[..., inter:],
                          p["down"])
        return swiglu_mlp(h, p["gate"], p["up"], p["down"],
                          act="gelu" if norm_offset else "silu")

    for i, p in enumerate(params["layers"]):
        h = norm(x, p["input_norm"], p.get("input_norm_bias"))
        attn_out, cache = _paged_attention_block(
            p, cfg, h, cache, i, positions, slot_mapping, block_tables,
            seq_lens, cos, sin, alibi,
        )
        if cfg.parallel_residual:            # falcon parallel blocks
            if p.get("post_norm") is not None:
                h = norm(x, p["post_norm"], p.get("post_norm_bias"))
            x = x + attn_out + mlp(p, h)
            continue
        if p.get("post_attn_norm") is not None:    # Gemma2 sandwich norms
            attn_out = rms_norm(attn_out, p["post_attn_norm"],
                                cfg.rms_norm_eps, norm_offset)
        x = x + attn_out
        h = norm(x, p["post_norm"], p.get("post_norm_bias"))
        mlp_out = mlp(p, h)
        if p.get("post_ffw_norm") is not None:
            mlp_out = rms_norm(mlp_out, p["post_ffw_norm"],
                               cfg.rms_norm_eps, norm_offset)
        x = x + mlp_out

    if last_idx is not None:
        # Prefill only needs the last position's logits: slice the hidden
        # state BEFORE the head so the [B,T,V] f32 logits buffer (the
        # reason prefill groups were memory-capped) never materializes.
        x = jnp.take_along_axis(x, last_idx[:, None, None], axis=1)
    if ln:
        x = layer_norm(x, params["final_norm"], params.get("final_norm_bias"),
                       cfg.rms_norm_eps)
    else:
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps, norm_offset)
    lm_head = params.get("lm_head")
    if lm_head is None:
        logits = jnp.dot(x, params["embed"].T.astype(x.dtype),
                         preferred_element_type=jnp.float32)
    else:
        logits = linear(x, lm_head)
    logits = logits.astype(jnp.float32)
    if cfg.final_logit_softcapping:
        c = cfg.final_logit_softcapping
        logits = jnp.tanh(logits / c) * c
    return logits, cache
