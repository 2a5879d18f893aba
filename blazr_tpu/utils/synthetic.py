"""Synthetic model synthesis (no checkpoints exist in this environment).

Builds llama-family param trees with random weights — dense or AWQ-INT4
quantized — directly on device. Used by bench.py (flagship Mistral-7B
AWQ-INT4 decode benchmark), __graft_entry__, and tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.model_config import AttentionConfig, UniversalConfig
from ..quant.qtensor import QuantTensor


def mistral_7b_config() -> UniversalConfig:
    """Mistral-7B-v0.1 geometry (public config)."""
    return UniversalConfig(
        model_type="mistral",
        vocab_size=32000,
        hidden_size=4096,
        num_layers=32,
        max_seq_len=4096,
        intermediate_size=14336,
        rms_norm_eps=1e-5,
        attention=AttentionConfig(num_heads=32, num_kv_heads=8, head_dim=128,
                                  rope_theta=10000.0,
                                  # Real Mistral-7B-v0.1 config.json sets
                                  # sliding_window=4096 — the bench must
                                  # run the windowed attention path.
                                  sliding_window=4096),
    )


def llama_3_2_1b_config() -> UniversalConfig:
    """Llama-3.2-1B geometry (public config)."""
    from ..config.model_config import RopeScaling

    return UniversalConfig(
        model_type="llama",
        vocab_size=128256,
        hidden_size=2048,
        num_layers=16,
        max_seq_len=8192,
        intermediate_size=8192,
        rms_norm_eps=1e-5,
        attention=AttentionConfig(
            num_heads=32, num_kv_heads=8, head_dim=64, rope_theta=500000.0,
            rope_scaling=RopeScaling(rope_type="llama3", factor=32.0),
        ),
        tie_word_embeddings=True,
    )


def tiny_llama_config(vocab: int = 256) -> UniversalConfig:
    return UniversalConfig(
        model_type="llama", vocab_size=vocab, hidden_size=64, num_layers=2,
        max_seq_len=512, intermediate_size=128,
        attention=AttentionConfig(num_heads=4, num_kv_heads=2, head_dim=16),
    )


def _rand_awq_qt(key, k: int, n: int, group_size: int = 128,
                 scale_dtype=jnp.float32) -> QuantTensor:
    """Random AWQ-style canonical QuantTensor directly on device.

    signed=True matches what the real loaders produce after load-time sign
    biasing — the layout the fast bitcast kernel path expects.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    qweight = jax.random.randint(k1, (k * 4 // 32, n), 0, np.iinfo(np.int32).max,
                                 dtype=jnp.int32).astype(jnp.uint32)
    scales = (jax.random.uniform(k2, (k // group_size, n)) * 0.01 + 0.001
              ).astype(scale_dtype)
    zeros = jax.random.randint(k3, (k // group_size, n), 0, 16).astype(scale_dtype)
    return QuantTensor(
        qweight=qweight, scales=scales, mins=scales * zeros, perm=None,
        bits=4, group_size=group_size, signed=True,
        in_features=k, out_features=n, fmt="awq",
    )


def _rand_dense(key, k: int, n: int, dtype) -> jax.Array:
    return (jax.random.normal(key, (k, n), dtype=jnp.float32) * 0.02).astype(dtype)


def synth_llama_params(cfg: UniversalConfig, quant: str = "awq",
                       dtype=jnp.bfloat16, group_size: int = 128,
                       seed: int = 0, fuse: bool = True) -> dict:
    """Random llama-family params matching ``cfg`` ('awq' or 'dense').

    ``fuse=True`` emits fused qkv / gateup projections (the serving
    layout)."""
    att = cfg.attention
    h = cfg.hidden_size
    hd = att.resolved_head_dim(h)
    q_out = att.num_heads * hd
    kv_out = att.kv_heads() * hd
    inter = cfg.resolved_intermediate_size()
    key = jax.random.PRNGKey(seed)
    keys = iter(jax.random.split(key, cfg.num_layers * 8 + 4))

    def lin(k_dim, n_dim):
        if quant == "awq":
            return _rand_awq_qt(next(keys), k_dim, n_dim, group_size)
        return _rand_dense(next(keys), k_dim, n_dim, dtype)

    layers = []
    for _ in range(cfg.num_layers):
        layer = {
            "input_norm": jnp.ones((h,), dtype=dtype),
            "post_norm": jnp.ones((h,), dtype=dtype),
            "o": lin(q_out, h),
            "down": lin(inter, h),
        }
        if fuse:
            layer["qkv"] = lin(h, q_out + 2 * kv_out)
            layer["gateup"] = lin(h, 2 * inter)
        else:
            layer.update({"q": lin(h, q_out), "k": lin(h, kv_out),
                          "v": lin(h, kv_out), "gate": lin(h, inter),
                          "up": lin(h, inter)})
        layers.append(layer)
    params = {
        "embed": _rand_dense(next(keys), cfg.vocab_size, h, dtype),
        "final_norm": jnp.ones((h,), dtype=dtype),
        "layers": layers,
        "lm_head": None if cfg.tie_word_embeddings
        else _rand_dense(next(keys), h, cfg.vocab_size, dtype),
    }
    return params


def synth_model(cfg: UniversalConfig, quant: str = "awq", dtype=jnp.bfloat16,
                seed: int = 0):
    """Synthetic Model handle over random weights."""
    from ..models import llama
    from ..models.registry import Model

    params = synth_llama_params(cfg, quant=quant, dtype=dtype, seed=seed)
    return Model(cfg, params, dtype, llama.forward)


def write_synth_hf_checkpoint(path, cfg: UniversalConfig, seed: int = 0,
                              scale: float = 0.05) -> None:
    """Write a random HF-named float32 Llama-family checkpoint directory
    (config.json + model.safetensors) matching ``cfg``.

    Lets path-based consumers — the swarm/disagg workers (which load from
    a model path per reference swarm.rs:180-203) and the convert CLI — be
    exercised without any real checkpoint in the environment."""
    import json
    from pathlib import Path

    from ..formats.safetensors import write_safetensors

    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    att = cfg.attention
    h = cfg.hidden_size
    hd = att.resolved_head_dim(h)
    q_out, kv_out = att.num_heads * hd, att.kv_heads() * hd
    inter = cfg.intermediate_size
    rng = np.random.default_rng(seed)

    def w(*shape):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    tensors = {
        "model.embed_tokens.weight": w(cfg.vocab_size, h),
        "model.norm.weight": np.ones(h, dtype=np.float32),
    }
    if not cfg.tie_word_embeddings:
        tensors["lm_head.weight"] = w(cfg.vocab_size, h)
    for i in range(cfg.num_layers):
        p = f"model.layers.{i}."
        tensors.update({
            p + "input_layernorm.weight": np.ones(h, np.float32),
            p + "post_attention_layernorm.weight": np.ones(h, np.float32),
            p + "self_attn.q_proj.weight": w(q_out, h),
            p + "self_attn.k_proj.weight": w(kv_out, h),
            p + "self_attn.v_proj.weight": w(kv_out, h),
            p + "self_attn.o_proj.weight": w(h, q_out),
            p + "mlp.gate_proj.weight": w(inter, h),
            p + "mlp.up_proj.weight": w(inter, h),
            p + "mlp.down_proj.weight": w(h, inter),
        })
    write_safetensors(path / "model.safetensors", tensors)
    hf_cfg = {
        "architectures": ["LlamaForCausalLM"],
        "model_type": "llama",
        "hidden_size": h,
        "intermediate_size": inter,
        "num_hidden_layers": cfg.num_layers,
        "num_attention_heads": att.num_heads,
        "num_key_value_heads": att.kv_heads(),
        "head_dim": hd,
        "vocab_size": cfg.vocab_size,
        "max_position_embeddings": cfg.max_seq_len,
        "rms_norm_eps": cfg.rms_norm_eps,
        "rope_theta": att.rope_theta,
        "tie_word_embeddings": bool(cfg.tie_word_embeddings),
        "torch_dtype": "float32",
    }
    (path / "config.json").write_text(json.dumps(hf_cfg))
