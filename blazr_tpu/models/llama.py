"""Llama-family decoder (Llama/Mistral/Qwen2/Qwen3/Phi3/Gemma variants).

TPU-native equivalent of the reference's standard-transformer forward
passes inside boostr ``LoadedModel`` (SURVEY §2.9 "Model layer" row:
``forward_with_kv_cache`` / GQA+RoPE+SwiGLU). Pure functional: one
``forward`` over a param pytree and a fixed-shape KV cache.

Param tree (per layer ``p``):
  input_norm, post_norm                          [H]
  q, k, v, o                                     [in, out] or QuantTensor
  q_bias, k_bias, v_bias                         optional [out] (Qwen2)
  q_norm, k_norm                                 optional [D] (Qwen3)
  gate, up, down                                 MLP weights
Top level: embed [V, H], final_norm [H], lm_head [H, V] (None → tied).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config.model_config import UniversalConfig
from ..kvcache.contiguous import KVCache, advance, write_layer
from .layers import (
    alibi_slopes,
    layer_norm,
    plain_mlp,
    apply_rope,
    attend,
    linear,
    repeat_kv,
    rms_norm,
    rope_cos_sin,
    rope_frequencies,
    swiglu_mlp,
)


def attention_block(
    p: dict[str, Any],
    cfg: UniversalConfig,
    x: jax.Array,                 # [B, T, H]
    cache: KVCache,
    layer: int,
    positions: jax.Array,         # [B, T]
    kv_len: jax.Array,            # [B] valid length AFTER this block's write
    cos: jax.Array,
    sin: jax.Array,
    alibi: Optional[jax.Array] = None,   # [H] slopes (falcon; replaces RoPE)
) -> tuple[jax.Array, KVCache]:
    att = cfg.attention
    b, t, _ = x.shape
    head_dim = att.resolved_head_dim(cfg.hidden_size)
    n_heads = att.num_heads
    n_kv = att.kv_heads()

    if p.get("qkv") is not None:
        # Fused QKV projection (one wide matmul).
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

    if p.get("q_norm") is not None:  # Qwen3 per-head QK norm
        q = rms_norm(q, p["q_norm"], cfg.rms_norm_eps)
        k = rms_norm(k, p["k_norm"], cfg.rms_norm_eps)

    if alibi is None:
        q = apply_rope(q, cos, sin)
        k = apply_rope(k, cos, sin)

    cache = write_layer(cache, layer, k, v, positions)

    ring_mesh = getattr(cfg, "_sp_ring_mesh", None)
    if ring_mesh is not None and t > 1:
        # Sequence-parallel prefill: the whole prompt is one chunk from
        # position 0, so attention is pure in-chunk causal — ring
        # attention over the ``sp`` mesh axis (parallel/ring_attention.py)
        # instead of attending against the cache. K/V were still written
        # above for the decode steps that follow. The executor only
        # installs _sp_ring_mesh on its dedicated ring-prefill jit
        # (no softcap models, start_pos == 0); sliding-window configs
        # ride the window-aware ring (fewer hops, VERDICT r3 #3).
        from ..parallel.ring_attention import ring_attention

        rep = n_heads // n_kv
        out = ring_attention(q, repeat_kv(k, rep), repeat_kv(v, rep),
                             ring_mesh, axis_name="sp",
                             sliding_window=att.sliding_window or None)
    else:
        out = attend(
            q,
            cache.k[layer],
            cache.v[layer],
            q_positions=positions,
            kv_len=kv_len,
            sliding_window=att.sliding_window,
            logit_softcap=cfg.attn_logit_softcapping,
            k_scale=cache.k_scale[layer] if cache.quantized else None,
            v_scale=cache.v_scale[layer] if cache.quantized else None,
            alibi=alibi,
        )
    out = out.reshape(b, t, n_heads * head_dim)
    return linear(out, p["o"], p.get("o_bias")), cache


def forward(
    params: dict[str, Any],
    cfg: UniversalConfig,
    tokens: jax.Array,            # [B, T] int32
    cache: KVCache,
    positions: jax.Array,         # [B, T]
    seq_lens: Optional[jax.Array] = None,   # [B] valid length after write
) -> tuple[jax.Array, KVCache]:
    """Full forward: embeddings → L decoder layers → final norm → logits.

    Returns (logits [B, T, V], updated cache). The same compiled function
    serves prefill (T = prompt len) and decode (T = 1). For bucketed
    prefill, pad positions point at the cache trash slot and ``seq_lens``
    carries the true lengths.
    """
    x = jnp.take(params["embed"], tokens, axis=0)
    if cfg.scale_embeddings:  # Gemma
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, dtype=x.dtype)

    att = cfg.attention
    head_dim = att.resolved_head_dim(cfg.hidden_size)
    inv_freq = rope_frequencies(att, head_dim)
    cos, sin = rope_cos_sin(positions, inv_freq)
    # HF falcon scales the ALiBi bias by 1/sqrt(head_dim) along with
    # the scores (modeling_falcon.py eager + sdpa paths) - the
    # semantics the falcon-rw checkpoints were trained with.
    alibi = (alibi_slopes(att.num_heads) * head_dim ** -0.5
             if att.use_alibi else None)

    if seq_lens is not None:
        kv_len = jnp.maximum(cache.length, seq_lens)
    else:
        kv_len = jnp.maximum(cache.length, jnp.max(positions, axis=-1) + 1)

    norm_offset = 1.0 if cfg.model_type in ("gemma", "gemma2") else 0.0
    ln = cfg.norm_type == "layernorm"

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
        if p.get("gateup") is not None:
            gu = linear(h, p["gateup"])
            inter = gu.shape[-1] // 2
            act = jax.nn.silu(gu[..., :inter]) * gu[..., inter:]
            return linear(act, p["down"])
        return swiglu_mlp(h, p["gate"], p["up"], p["down"],
                          act="gelu" if norm_offset else "silu")

    for i, p in enumerate(params["layers"]):
        h = norm(x, p["input_norm"], p.get("input_norm_bias"))
        attn_out, cache = attention_block(
            p, cfg, h, cache, i, positions, kv_len, cos, sin, alibi
        )
        if cfg.parallel_residual:
            # Falcon parallel blocks: attention and MLP both read the
            # normed input; one residual add. Old arch (single norm) feeds
            # the MLP the SAME normed h; new arch has its own ln_mlp in
            # the post_norm slot.
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

    cache = advance(cache, positions, seq_lens)
    if ln:
        x = layer_norm(x, params["final_norm"], params.get("final_norm_bias"),
                       cfg.rms_norm_eps)
    else:
        x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps,
                     1.0 if cfg.model_type in ("gemma", "gemma2") else 0.0)

    lm_head = params.get("lm_head")
    if lm_head is None:  # tied embeddings
        logits = jnp.dot(x, params["embed"].T.astype(x.dtype),
                         preferred_element_type=jnp.float32)
    else:
        logits = linear(x, lm_head).astype(jnp.float32)
    logits = logits.astype(jnp.float32)
    if cfg.final_logit_softcapping:
        c = cfg.final_logit_softcapping
        logits = jnp.tanh(logits / c) * c
    return logits, cache


def forward_embed(params: dict[str, Any], cfg: UniversalConfig,
                  tokens: jax.Array) -> jax.Array:
    """Token embeddings only (reference LoadedModel::forward_embed)."""
    x = jnp.take(params["embed"], tokens, axis=0)
    if cfg.scale_embeddings:
        x = x * jnp.asarray(cfg.hidden_size ** 0.5, dtype=x.dtype)
    return x


def forward_layers_range(
    params: dict[str, Any],
    cfg: UniversalConfig,
    hidden: jax.Array,            # [B, T, H]
    cache: KVCache,
    positions: jax.Array,
    start: int,
    end: int,
    seq_lens: Optional[jax.Array] = None,
    cache_layer_offset: int = 0,
) -> tuple[jax.Array, KVCache]:
    """Run decoder layers [start, end) over hidden states (reference
    LoadedModel::forward_layers_range — the pipeline-stage forward,
    swarm_forward.rs:77-272). ``cache`` holds only this stage's layers;
    ``cache_layer_offset`` maps model layer index → cache slot."""
    att = cfg.attention
    head_dim = att.resolved_head_dim(cfg.hidden_size)
    inv_freq = rope_frequencies(att, head_dim)
    cos, sin = rope_cos_sin(positions, inv_freq)
    # HF falcon scales the ALiBi bias by 1/sqrt(head_dim) along with
    # the scores (modeling_falcon.py eager + sdpa paths) - the
    # semantics the falcon-rw checkpoints were trained with.
    alibi = (alibi_slopes(att.num_heads) * head_dim ** -0.5
             if att.use_alibi else None)
    if seq_lens is not None:
        kv_len = jnp.maximum(cache.length, seq_lens)
    else:
        kv_len = jnp.maximum(cache.length, jnp.max(positions, axis=-1) + 1)

    ln = cfg.norm_type == "layernorm"

    def norm(h, w, bias=None):
        if ln:
            return layer_norm(h, w, bias, cfg.rms_norm_eps)
        return rms_norm(h, w, cfg.rms_norm_eps)

    def mlp(p, h):
        if p.get("moe") is not None:
            from .moe import moe_forward

            return moe_forward(h, p["moe"], cfg.moe)
        if p.get("fc") is not None:
            return plain_mlp(h, p["fc"], p.get("fc_bias"), p["down"],
                             p.get("down_bias"), act=cfg.hidden_act)
        if p.get("gateup") is not None:
            gu = linear(h, p["gateup"])
            inter = gu.shape[-1] // 2
            act = jax.nn.silu(gu[..., :inter]) * gu[..., inter:]
            return linear(act, p["down"])
        return swiglu_mlp(h, p["gate"], p["up"], p["down"])

    x = hidden
    for li in range(start, end):
        p = params["layers"][li]
        h = norm(x, p["input_norm"], p.get("input_norm_bias"))
        attn_out, cache = attention_block(
            p, cfg, h, cache, li - start + cache_layer_offset, positions,
            kv_len, cos, sin, alibi)
        if cfg.parallel_residual:
            if p.get("post_norm") is not None:
                h = norm(x, p["post_norm"], p.get("post_norm_bias"))
            x = x + attn_out + mlp(p, h)
            continue
        x = x + attn_out
        h = norm(x, p["post_norm"], p.get("post_norm_bias"))
        x = x + mlp(p, h)
    cache = advance(cache, positions, seq_lens)
    return x, cache


def forward_head(params: dict[str, Any], cfg: UniversalConfig,
                 hidden: jax.Array) -> jax.Array:
    """Final norm + LM head (reference LoadedModel::forward_head)."""
    if cfg.norm_type == "layernorm":
        x = layer_norm(hidden, params["final_norm"],
                       params.get("final_norm_bias"), cfg.rms_norm_eps)
    else:
        x = rms_norm(hidden, params["final_norm"], cfg.rms_norm_eps)
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
    return logits
