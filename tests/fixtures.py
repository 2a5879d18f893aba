"""Shared test fixtures: synthetic tiny checkpoints in every format.

No real model weights exist in this environment (zero egress), so parity
is established structurally: HF-convention random checkpoints run through
both our engine and torch/transformers (golden logits), and quantized
variants are synthesized with the reference encoders.
"""

from __future__ import annotations

import json
from pathlib import Path

import numpy as np

from blazr_tpu.config import AttentionConfig, UniversalConfig
from blazr_tpu.formats import write_safetensors

TINY_LLAMA_HF_CONFIG = {
    "architectures": ["LlamaForCausalLM"],
    "model_type": "llama",
    "hidden_size": 64,
    "intermediate_size": 128,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "vocab_size": 256,
    "max_position_embeddings": 512,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    "tie_word_embeddings": False,
    "torch_dtype": "float32",
}


def tiny_llama_weights(rng: np.random.Generator, cfg: dict | None = None,
                       scale: float = 0.05) -> dict[str, np.ndarray]:
    """Random HF-named float32 weights for a tiny Llama."""
    c = dict(TINY_LLAMA_HF_CONFIG)
    if cfg:
        c.update(cfg)
    h = c["hidden_size"]
    inter = c["intermediate_size"]
    heads = c["num_attention_heads"]
    kv = c["num_key_value_heads"]
    head_dim = c.get("head_dim", h // heads)
    v = c["vocab_size"]

    def w(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    weights = {
        "model.embed_tokens.weight": w(v, h),
        "model.norm.weight": np.ones(h, dtype=np.float32),
        "lm_head.weight": w(v, h),
    }
    for i in range(c["num_hidden_layers"]):
        p = f"model.layers.{i}."
        weights.update({
            p + "input_layernorm.weight": np.ones(h, np.float32),
            p + "post_attention_layernorm.weight": np.ones(h, np.float32),
            p + "self_attn.q_proj.weight": w(heads * head_dim, h),
            p + "self_attn.k_proj.weight": w(kv * head_dim, h),
            p + "self_attn.v_proj.weight": w(kv * head_dim, h),
            p + "self_attn.o_proj.weight": w(h, heads * head_dim),
            p + "mlp.gate_proj.weight": w(inter, h),
            p + "mlp.up_proj.weight": w(inter, h),
            p + "mlp.down_proj.weight": w(h, inter),
        })
    return weights


def write_tiny_llama_checkpoint(path: Path, rng: np.random.Generator,
                                cfg: dict | None = None) -> dict[str, np.ndarray]:
    """Write a tiny HF-style Llama checkpoint dir (config.json + safetensors)."""
    c = dict(TINY_LLAMA_HF_CONFIG)
    if cfg:
        c.update(cfg)
    path.mkdir(parents=True, exist_ok=True)
    weights = tiny_llama_weights(rng, c)
    write_safetensors(path / "model.safetensors", weights)
    (path / "config.json").write_text(json.dumps(c))
    return weights


TINY_VISION_CONFIG = {
    "hidden_size": 32,
    "num_hidden_layers": 2,
    "num_attention_heads": 4,
    "image_size": 32,
    "patch_size": 8,
    "intermediate_size": 64,
}


def tiny_vision_weights(rng: np.random.Generator, text_hidden: int = 64,
                        vc: dict | None = None, scale: float = 0.05
                        ) -> dict[str, np.ndarray]:
    """Random HF-named (LLaVA-style) vision tower + projector weights."""
    c = dict(TINY_VISION_CONFIG)
    if vc:
        c.update(vc)
    h = c["hidden_size"]
    ps = c["patch_size"]
    inter = c["intermediate_size"]
    n_pos = (c["image_size"] // ps) ** 2 + 1

    def w(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    P = "vision_tower.vision_model."
    weights = {
        P + "embeddings.patch_embedding.weight": w(h, 3, ps, ps),
        P + "embeddings.class_embedding": w(h),
        P + "embeddings.position_embedding.weight": w(n_pos, h),
        P + "pre_layrnorm.weight": np.ones(h, np.float32),
        P + "pre_layrnorm.bias": np.zeros(h, np.float32),
        "multi_modal_projector.linear_1.weight": w(text_hidden, h),
        "multi_modal_projector.linear_1.bias": np.zeros(text_hidden, np.float32),
        "multi_modal_projector.linear_2.weight": w(text_hidden, text_hidden),
        "multi_modal_projector.linear_2.bias": np.zeros(text_hidden, np.float32),
    }
    for i in range(c["num_hidden_layers"]):
        p = P + f"encoder.layers.{i}."
        weights.update({
            p + "layer_norm1.weight": np.ones(h, np.float32),
            p + "layer_norm1.bias": np.zeros(h, np.float32),
            p + "layer_norm2.weight": np.ones(h, np.float32),
            p + "layer_norm2.bias": np.zeros(h, np.float32),
            p + "self_attn.q_proj.weight": w(h, h),
            p + "self_attn.q_proj.bias": np.zeros(h, np.float32),
            p + "self_attn.k_proj.weight": w(h, h),
            p + "self_attn.k_proj.bias": np.zeros(h, np.float32),
            p + "self_attn.v_proj.weight": w(h, h),
            p + "self_attn.v_proj.bias": np.zeros(h, np.float32),
            p + "self_attn.out_proj.weight": w(h, h),
            p + "self_attn.out_proj.bias": np.zeros(h, np.float32),
            p + "mlp.fc1.weight": w(inter, h),
            p + "mlp.fc1.bias": np.zeros(inter, np.float32),
            p + "mlp.fc2.weight": w(h, inter),
            p + "mlp.fc2.bias": np.zeros(h, np.float32),
        })
    return weights


def write_tiny_llava_checkpoint(path: Path, rng: np.random.Generator
                                ) -> dict[str, np.ndarray]:
    """Tiny LLaVA-style multimodal checkpoint: language_model.* +
    vision_tower.* + multi_modal_projector.* with a nested HF config."""
    path.mkdir(parents=True, exist_ok=True)
    lm = {f"language_model.{k}": v for k, v in tiny_llama_weights(rng).items()}
    weights = {**lm, **tiny_vision_weights(rng)}
    write_safetensors(path / "model.safetensors", weights)
    cfg = {
        "architectures": ["LlavaForConditionalGeneration"],
        "model_type": "llava",
        "text_config": dict(TINY_LLAMA_HF_CONFIG),
        "vision_config": dict(TINY_VISION_CONFIG),
    }
    (path / "config.json").write_text(json.dumps(cfg))
    return weights


def write_byte_tokenizer_json(path: Path) -> None:
    """Write a byte-level tokenizer.json (full 256-byte vocab + eos) so
    server tests can load a real tokenizer from the checkpoint dir."""
    import json as _json

    from blazr_tpu.tokenizer.bpe import gpt2_byte_encoder

    enc = gpt2_byte_encoder()
    vocab = {enc[b]: b for b in range(256)}
    eos_id = 256
    data = {
        "version": "1.0",
        "model": {"type": "BPE", "vocab": vocab, "merges": []},
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False,
                          "trim_offsets": True, "use_regex": True},
        "decoder": {"type": "ByteLevel", "add_prefix_space": False,
                    "trim_offsets": True, "use_regex": True},
        "added_tokens": [{"id": eos_id, "content": "<|eos|>", "special": True}],
    }
    (path / "tokenizer.json").write_text(_json.dumps(data))
    (path / "tokenizer_config.json").write_text(_json.dumps({
        "eos_token": "<|eos|>",
    }))
