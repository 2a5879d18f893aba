"""DeepSeek MLA (multi-head latent attention) decoder, optional MoE FFN.

TPU-native equivalent of boostr's DeepSeek MLA forward passes (SURVEY §2.9
"Model layer" row; MLA detect via kv_lora_rank, loader/gguf.rs:188-196).

The cache stores the COMPRESSED latent (c_kv [kv_lora] + shared k_rope
[d_rope] per token) — the 4-8× KV saving the reference cites
(docs/architecture.md:89) — and attention runs in ABSORBED form for both
prefill and decode:

    score[t,s] = (W_kbᵏᵀ q_nope[t]) · c[s] + q_rope[t] · k_rope[s]
    out[t]     = W_kbᵛᵀ (Σ_s p[t,s] c[s])

so the per-head K/V are never materialized. Numerics match HF
DeepseekV2/V3 (interleaved rope on the decoupled dims, qk_head_dim^-0.5
scaling).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config.model_config import UniversalConfig
from .layers import (
    apply_rope,
    apply_rope_interleaved,
    linear,
    rms_norm,
    rope_cos_sin,
    rope_frequencies,
    swiglu_mlp,
)
from .moe import moe_forward


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MLACache:
    """Compressed latent cache: [L, B, S+1, kv_lora] + [L, B, S+1, d_rope]
    (+1 trash slot for padded prefill)."""

    latent: jax.Array
    k_rope: jax.Array
    length: jax.Array   # [B]
    # int8 latent mode: per-token absmax scales (None = float mode).
    latent_scale: Optional[jax.Array] = None    # [L, B, S+1] f32
    k_rope_scale: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.latent_scale is not None

    @property
    def capacity(self) -> int:
        return self.latent.shape[2] - 1

    @property
    def trash_position(self) -> int:
        return self.latent.shape[2] - 1

    def reset(self) -> "MLACache":
        return dataclasses.replace(self, length=jnp.zeros_like(self.length))


def init_mla_cache(cfg: UniversalConfig, batch: int, capacity: int,
                   dtype=jnp.bfloat16, quantized: bool = False) -> MLACache:
    att = cfg.attention
    shape_c = (cfg.num_layers, batch, capacity + 1, att.kv_latent_dim)
    shape_r = (cfg.num_layers, batch, capacity + 1, att.d_rope)
    if quantized:
        return MLACache(
            latent=jnp.zeros(shape_c, dtype=jnp.int8),
            k_rope=jnp.zeros(shape_r, dtype=jnp.int8),
            length=jnp.zeros((batch,), dtype=jnp.int32),
            latent_scale=jnp.zeros(shape_c[:3], dtype=jnp.float32),
            k_rope_scale=jnp.zeros(shape_r[:3], dtype=jnp.float32),
        )
    return MLACache(
        latent=jnp.zeros(shape_c, dtype=dtype),
        k_rope=jnp.zeros(shape_r, dtype=dtype),
        length=jnp.zeros((batch,), dtype=jnp.int32),
    )


def mla_attention_block(
    p: dict[str, Any],
    cfg: UniversalConfig,
    x: jax.Array,                  # [B, T, H]
    cache: MLACache,
    layer: int,
    positions: jax.Array,          # [B, T]
    kv_len: jax.Array,             # [B]
    cos: jax.Array,
    sin: jax.Array,
) -> tuple[jax.Array, MLACache]:
    att = cfg.attention
    b, t, _ = x.shape
    h = att.num_heads
    d_nope = att.d_nope
    d_rope = att.d_rope
    v_dim = att.v_head_dim

    # --- queries ---------------------------------------------------------
    if p.get("q_a") is not None:
        q = linear(rms_norm(linear(x, p["q_a"]), p["q_a_norm"],
                            cfg.rms_norm_eps), p["q_b"])
    else:
        q = linear(x, p["q"])
    q = q.reshape(b, t, h, d_nope + d_rope)
    q_nope = q[..., :d_nope]
    q_rope = q[..., d_nope:]
    rope_fn = apply_rope_interleaved if att.rope_interleave else apply_rope
    q_rope = rope_fn(q_rope, cos, sin)

    # --- compressed KV ---------------------------------------------------
    ckv = linear(x, p["kv_a"])                       # [B, T, kv_lora+d_rope]
    kv_lora = att.kv_latent_dim
    c = rms_norm(ckv[..., :kv_lora], p["kv_a_norm"], cfg.rms_norm_eps)
    k_rope = ckv[..., kv_lora:][:, :, None, :]       # [B, T, 1, d_rope]
    k_rope = rope_fn(k_rope, cos, sin)[:, :, 0, :]

    batch_idx = jnp.arange(b, dtype=jnp.int32)[:, None]
    if cache.quantized:
        def _q(x):
            xf = x.astype(jnp.float32)
            sc = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / 127.0
            return (jnp.clip(jnp.round(xf / sc[..., None]), -127, 127)
                    .astype(jnp.int8), sc)

        cq, csc = _q(c)
        rq, rsc = _q(k_rope)
        cache = dataclasses.replace(
            cache,
            latent=cache.latent.at[layer, batch_idx, positions].set(cq),
            k_rope=cache.k_rope.at[layer, batch_idx, positions].set(rq),
            latent_scale=cache.latent_scale.at[
                layer, batch_idx, positions].set(csc),
            k_rope_scale=cache.k_rope_scale.at[
                layer, batch_idx, positions].set(rsc),
        )
    else:
        latent = cache.latent.at[layer, batch_idx, positions].set(
            c.astype(cache.latent.dtype))
        kr = cache.k_rope.at[layer, batch_idx, positions].set(
            k_rope.astype(cache.k_rope.dtype))
        cache = dataclasses.replace(cache, latent=latent, k_rope=kr)

    # --- absorbed attention ---------------------------------------------
    # W_kb_k: [kv_lora, h, d_nope]; W_kb_v: [kv_lora, h, v_dim]
    q_eff = jnp.einsum("bthd,rhd->bthr", q_nope.astype(jnp.float32),
                       p["kv_b_k"].astype(jnp.float32))
    c_all = cache.latent[layer].astype(jnp.float32)      # [B, S+1, kv_lora]
    kr_all = cache.k_rope[layer].astype(jnp.float32)     # [B, S+1, d_rope]
    sc_c = jnp.einsum("bthr,bsr->bhts", q_eff, c_all)
    sc_r = jnp.einsum("bthd,bsd->bhts", q_rope.astype(jnp.float32), kr_all)
    if cache.quantized:
        # fold per-token dequant scales into each score term
        sc_c = sc_c * cache.latent_scale[layer][:, None, None, :]
        sc_r = sc_r * cache.k_rope_scale[layer][:, None, None, :]
    scores = sc_c + sc_r
    scale = p.get("softmax_scale", 1.0 / math.sqrt(d_nope + d_rope))
    scores = scores * scale

    s_tot = c_all.shape[1]
    kv_pos = jnp.arange(s_tot, dtype=jnp.int32)[None, :]
    valid = kv_pos < kv_len[:, None]
    causal = kv_pos[:, None, :] <= positions[:, :, None]
    mask = valid[:, None, :] & causal
    scores = jnp.where(mask[:, None, :, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)

    if cache.quantized:
        probs = probs * cache.latent_scale[layer][:, None, None, :]
    out_latent = jnp.einsum("bhts,bsr->bthr", probs, c_all)
    out = jnp.einsum("bthr,rhv->bthv", out_latent,
                     p["kv_b_v"].astype(jnp.float32))
    out = out.reshape(b, t, h * v_dim).astype(x.dtype)
    return linear(out, p["o"]), cache


def forward(
    params: dict[str, Any],
    cfg: UniversalConfig,
    tokens: jax.Array,
    cache: MLACache,
    positions: jax.Array,
    seq_lens: Optional[jax.Array] = None,
) -> tuple[jax.Array, MLACache]:
    x = jnp.take(params["embed"], tokens, axis=0)
    att = cfg.attention
    inv_freq = rope_frequencies(att, 2 * (att.d_rope // 2))
    cos, sin = rope_cos_sin(positions, inv_freq)

    if seq_lens is not None:
        kv_len = jnp.maximum(cache.length, seq_lens)
    else:
        kv_len = jnp.maximum(cache.length, jnp.max(positions, axis=-1) + 1)

    for i, p in enumerate(params["layers"]):
        h = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
        attn_out, cache = mla_attention_block(p, cfg, h, cache, i, positions,
                                              kv_len, cos, sin)
        x = x + attn_out
        h = rms_norm(x, p["post_norm"], cfg.rms_norm_eps)
        if p.get("moe") is not None:
            x = x + moe_forward(h, p["moe"], cfg.moe)
        else:
            x = x + swiglu_mlp(h, p["gate"], p["up"], p["down"])

    cache = dataclasses.replace(
        cache, length=jnp.maximum(
            cache.length,
            seq_lens if seq_lens is not None
            else jnp.max(positions, axis=-1) + 1).astype(jnp.int32))
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    lm_head = params.get("lm_head")
    if lm_head is None:
        logits = jnp.dot(x, params["embed"].T.astype(x.dtype),
                         preferred_element_type=jnp.float32)
    else:
        logits = linear(x, lm_head)
    return logits.astype(jnp.float32), cache


# ---------------------------------------------------------------------------
# Param building (HF DeepseekV2/V3 names)
# ---------------------------------------------------------------------------

def build_mla_params(cfg: UniversalConfig, vm, dtype=jnp.bfloat16) -> dict:
    from .moe import build_moe_params
    from .registry import ParamBuilder

    att = cfg.attention
    pb = ParamBuilder(vm, dtype)
    h = att.num_heads
    d_nope = att.d_nope
    v_dim = att.v_head_dim

    layers = []
    types = cfg.layer_types()
    for i in range(cfg.num_layers):
        pfx = f"model.layers.{i}."
        p: dict[str, Any] = {
            "input_norm": pb.get(pfx + "input_layernorm.weight"),
            "post_norm": pb.get(pfx + "post_attention_layernorm.weight"),
            "kv_a": pb.get(pfx + "self_attn.kv_a_proj_with_mqa.weight",
                           transpose=True),
            "kv_a_norm": pb.get(pfx + "self_attn.kv_a_layernorm.weight"),
            "o": pb.get(pfx + "self_attn.o_proj.weight", transpose=True),
        }
        qa = pb.get(pfx + "self_attn.q_a_proj.weight", transpose=True,
                    required=False)
        if qa is not None:
            p["q_a"] = qa
            p["q_a_norm"] = pb.get(pfx + "self_attn.q_a_layernorm.weight")
            p["q_b"] = pb.get(pfx + "self_attn.q_b_proj.weight", transpose=True)
        else:
            p["q"] = pb.get(pfx + "self_attn.q_proj.weight", transpose=True)
        # kv_b [heads*(d_nope+v_dim), kv_lora] → absorbed split
        kv_b = pb.get(pfx + "self_attn.kv_b_proj.weight", dtype=jnp.float32)
        kv_b = kv_b.reshape(h, d_nope + v_dim, att.kv_latent_dim)
        p["kv_b_k"] = jnp.transpose(kv_b[:, :d_nope, :], (2, 0, 1))   # [r,h,d]
        p["kv_b_v"] = jnp.transpose(kv_b[:, d_nope:, :], (2, 0, 1))   # [r,h,v]

        if types[i] == "mla_moe" and cfg.moe is not None:
            p["moe"] = build_moe_params(pb, pfx, cfg)
        else:
            p["gate"] = pb.get(pfx + "mlp.gate_proj.weight", transpose=True)
            p["up"] = pb.get(pfx + "mlp.up_proj.weight", transpose=True)
            p["down"] = pb.get(pfx + "mlp.down_proj.weight", transpose=True)
        layers.append(p)

    return {
        "embed": pb.get("model.embed_tokens.weight"),
        "final_norm": pb.get("model.norm.weight"),
        "layers": layers,
        "lm_head": pb.get("lm_head.weight", transpose=True, required=False),
    }
