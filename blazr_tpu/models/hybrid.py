"""Hybrid Mamba2 + attention models.

TPU-native equivalent of boostr's hybrid layer mixing (SURVEY §2.9
"Model layer" row: ``hybrid_layers``; reference LayerType::{Mamba2,
StandardTransformer}). Per-layer dispatch over a combined state carry
(KV cache for attention layers + SSM state for mamba layers — each sized
only for its own layer count).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config.model_config import LAYER_ATTENTION, LAYER_MAMBA2, UniversalConfig
from ..kvcache.contiguous import KVCache, advance, init_kv_cache
from ..kvcache.ssm_state import SSMState, init_ssm_state
from .layers import (linear, plain_mlp, rms_norm, rope_cos_sin,
                     rope_frequencies, swiglu_mlp)
from .llama import attention_block
from .mamba2 import mamba2_block


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class HybridState:
    kv: KVCache
    ssm: SSMState

    @property
    def length(self) -> jax.Array:
        return self.kv.length

    @property
    def trash_position(self) -> int:
        return self.kv.trash_position

    def reset(self) -> "HybridState":
        return HybridState(kv=self.kv.reset(), ssm=self.ssm.reset())


def init_hybrid_state(cfg: UniversalConfig, batch: int, capacity: int,
                      dtype=jnp.bfloat16) -> HybridState:
    types = cfg.layer_types()
    n_attn = sum(1 for t in types if t != LAYER_MAMBA2)
    n_mamba = sum(1 for t in types if t == LAYER_MAMBA2)
    att = cfg.attention
    kv = init_kv_cache(max(n_attn, 1), batch, capacity, att.kv_heads(),
                       att.resolved_head_dim(cfg.hidden_size), dtype=dtype)
    ssm = init_ssm_state(cfg, batch, dtype=jnp.float32,
                         num_layers=max(n_mamba, 1))
    return HybridState(kv=kv, ssm=ssm)


def forward(
    params: dict[str, Any],
    cfg: UniversalConfig,
    tokens: jax.Array,
    state: HybridState,
    positions: jax.Array,
    seq_lens: Optional[jax.Array] = None,
) -> tuple[jax.Array, HybridState]:
    x = jnp.take(params["embed"], tokens, axis=0)
    att = cfg.attention
    head_dim = att.resolved_head_dim(cfg.hidden_size)
    inv_freq = rope_frequencies(att, head_dim)
    cos, sin = rope_cos_sin(positions, inv_freq)

    kv = state.kv
    ssm = state.ssm
    if seq_lens is not None:
        kv_len = jnp.maximum(kv.length, seq_lens)
    else:
        kv_len = jnp.maximum(kv.length, jnp.max(positions, axis=-1) + 1)

    types = cfg.layer_types()
    attn_i = mamba_i = 0
    for i, p in enumerate(params["layers"]):
        h = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
        if types[i] == LAYER_MAMBA2:
            out, ssm = mamba2_block(p, cfg, h, ssm, mamba_i)
            mamba_i += 1
            x = x + out
        else:
            out, kv = attention_block(p, cfg, h, kv, attn_i, positions,
                                      kv_len, cos, sin)
            attn_i += 1
            x = x + out
        # Separate FFN sub-block in any of its variants (dense swiglu,
        # MoE, fused gate+up, plain MLP) — gating on "gate" alone
        # silently dropped the FFN on MoE/fused/plain attention layers.
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

    kv = advance(kv, positions, seq_lens)
    ssm = SSMState(conv=ssm.conv, ssm=ssm.ssm,
                   length=ssm.length + tokens.shape[1])
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    lm_head = params.get("lm_head")
    if lm_head is None:
        logits = jnp.dot(x, params["embed"].T.astype(x.dtype),
                         preferred_element_type=jnp.float32)
    else:
        logits = linear(x, lm_head)
    return logits.astype(jnp.float32), HybridState(kv=kv, ssm=ssm)


def build_hybrid_params(cfg: UniversalConfig, vm, dtype=jnp.bfloat16) -> dict:
    """Build from HF-style names: attention layers use self_attn.*, mamba
    layers use mixer.*; both may carry an mlp block."""
    from .mamba2 import build_mamba2_params
    from .registry import ParamBuilder, build_llama_layer_params

    pb = ParamBuilder(vm, dtype)
    types = cfg.layer_types()
    layers = []
    for i, t in enumerate(types):
        pfx = f"model.layers.{i}."
        if t == LAYER_MAMBA2:
            conv_w = pb.get(pfx + "mixer.conv1d.weight",
                            pfx + "mamba.conv1d.weight")
            if conv_w is not None and conv_w.ndim == 3:
                conv_w = conv_w[:, 0, :]
            p = {
                "input_norm": pb.get(pfx + "input_layernorm.weight",
                                     pfx + "norm.weight"),
                "in_proj": pb.get(pfx + "mixer.in_proj.weight",
                                  pfx + "mamba.in_proj.weight", transpose=True),
                "conv_w": conv_w,
                "conv_b": pb.get(pfx + "mixer.conv1d.bias",
                                 pfx + "mamba.conv1d.bias", required=False),
                "A_log": pb.get(pfx + "mixer.A_log", pfx + "mamba.A_log",
                                dtype=jnp.float32),
                "D": pb.get(pfx + "mixer.D", pfx + "mamba.D", dtype=jnp.float32),
                "dt_bias": pb.get(pfx + "mixer.dt_bias", pfx + "mamba.dt_bias",
                                  dtype=jnp.float32),
                "norm": pb.get(pfx + "mixer.norm.weight",
                               pfx + "mamba.norm.weight"),
                "out_proj": pb.get(pfx + "mixer.out_proj.weight",
                                   pfx + "mamba.out_proj.weight", transpose=True),
            }
            # optional separate FFN sub-block
            g = pb.get(pfx + "mlp.gate_proj.weight", transpose=True,
                       required=False)
            if g is not None:
                p["post_norm"] = pb.get(pfx + "post_attention_layernorm.weight",
                                        pfx + "pre_ff_layernorm.weight")
                p["gate"] = g
                p["up"] = pb.get(pfx + "mlp.up_proj.weight", transpose=True)
                p["down"] = pb.get(pfx + "mlp.down_proj.weight", transpose=True)
        else:
            p = build_llama_layer_params(pb, i, cfg)
        layers.append(p)
    return {
        "embed": pb.get("model.embed_tokens.weight"),
        "final_norm": pb.get("model.norm.weight", "model.final_layernorm.weight"),
        "layers": layers,
        "lm_head": pb.get("lm_head.weight", transpose=True, required=False),
    }
