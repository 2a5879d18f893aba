"""Tensor-name mapping: GGUF convention ↔ HF convention.

The reference does this inside boostr's ``VarMap::from_gguf`` ("names
auto-mapped from GGUF to HF convention", src/loader/gguf.rs:32-34). Our
canonical in-memory naming is the HF convention; every loader normalizes
to it before the model builders consume the weights.
"""

from __future__ import annotations

import re

# Non-layer (global) tensors.
_GLOBAL_GGUF_TO_HF = {
    "token_embd.weight": "model.embed_tokens.weight",
    "output_norm.weight": "model.norm.weight",
    "output_norm.bias": "model.norm.bias",
    "output.weight": "lm_head.weight",
    "output.bias": "lm_head.bias",
    "rope_freqs.weight": "rope_freqs.weight",
}

# Per-layer suffix mapping: gguf suffix → hf suffix.
_LAYER_GGUF_TO_HF = {
    # attention
    "attn_norm": "input_layernorm",
    "attn_norm_2": "pre_feedforward_layernorm",
    "attn_qkv": "self_attn.query_key_value",   # falcon fused MQA/GQA
    "attn_q": "self_attn.q_proj",
    "attn_k": "self_attn.k_proj",
    "attn_v": "self_attn.v_proj",
    "attn_output": "self_attn.o_proj",
    "attn_q_norm": "self_attn.q_norm",
    "attn_k_norm": "self_attn.k_norm",
    # MLP
    "ffn_norm": "post_attention_layernorm",
    "ffn_gate": "mlp.gate_proj",
    "ffn_up": "mlp.up_proj",
    "ffn_down": "mlp.down_proj",
    # MoE
    "ffn_gate_inp": "mlp.gate",
    "ffn_gate_exps": "mlp.experts.gate_proj",   # stacked [E, ...]
    "ffn_up_exps": "mlp.experts.up_proj",
    "ffn_down_exps": "mlp.experts.down_proj",
    "ffn_gate_shexp": "mlp.shared_experts.gate_proj",
    "ffn_up_shexp": "mlp.shared_experts.up_proj",
    "ffn_down_shexp": "mlp.shared_experts.down_proj",
    "exp_probs_b": "mlp.gate.e_score_correction_bias",
    # DeepSeek MLA
    "attn_q_a": "self_attn.q_a_proj",
    "attn_q_b": "self_attn.q_b_proj",
    "attn_kv_a_mqa": "self_attn.kv_a_proj_with_mqa",
    "attn_kv_b": "self_attn.kv_b_proj",
    "attn_k_b": "self_attn.k_b_proj",
    "attn_v_b": "self_attn.v_b_proj",
    "attn_q_a_norm": "self_attn.q_a_layernorm",
    "attn_kv_a_norm": "self_attn.kv_a_layernorm",
    # Mamba2 SSM
    "ssm_in": "mixer.in_proj",
    "ssm_conv1d": "mixer.conv1d",
    "ssm_x": "mixer.x_proj",
    "ssm_dt": "mixer.dt_proj",
    "ssm_a": "mixer.A_log",
    "ssm_d": "mixer.D",
    "ssm_norm": "mixer.norm",
    "ssm_out": "mixer.out_proj",
}

_HF_TO_LAYER_GGUF = {v: k for k, v in _LAYER_GGUF_TO_HF.items()}
_HF_TO_GLOBAL_GGUF = {v: k for k, v in _GLOBAL_GGUF_TO_HF.items()}

_BLK_RE = re.compile(r"^blk\.(\d+)\.(.+?)(\.(weight|bias))?$")
_HF_LAYER_RE = re.compile(r"^model\.layers\.(\d+)\.(.+?)(\.(weight|bias))?$")


def gguf_to_hf_name(name: str) -> str:
    """Map one GGUF tensor name to the HF convention (identity if unknown)."""
    if name in _GLOBAL_GGUF_TO_HF:
        return _GLOBAL_GGUF_TO_HF[name]
    m = _BLK_RE.match(name)
    if not m:
        return name
    idx, mid, _, leaf = m.group(1), m.group(2), m.group(3), m.group(4)
    hf_mid = _LAYER_GGUF_TO_HF.get(mid)
    if hf_mid is None:
        return name
    leaf = leaf or "weight"
    return f"model.layers.{idx}.{hf_mid}.{leaf}"


def hf_to_gguf_name(name: str) -> str:
    """Inverse mapping (used by the convert CLI)."""
    if name in _HF_TO_GLOBAL_GGUF:
        return _HF_TO_GLOBAL_GGUF[name]
    m = _HF_LAYER_RE.match(name)
    if not m:
        return name
    idx, mid, _, leaf = m.group(1), m.group(2), m.group(3), m.group(4)
    g_mid = _HF_TO_LAYER_GGUF.get(mid)
    if g_mid is None:
        return name
    leaf = leaf or "weight"
    return f"blk.{idx}.{g_mid}.{leaf}"
