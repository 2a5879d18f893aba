"""Config serde tests (ports the reference's config unit tier,
src/config/blazr.rs:152-424 and src/config/generation.rs presets)."""

import json

import pytest

from blazr_tpu.config import (
    AppConfig,
    AttentionConfig,
    GenerationConfig,
    InferenceConfig,
    MoeConfig,
    ServerConfig,
    SsmConfig,
    UniversalConfig,
    parse_dtype,
    universal_from_hf_config,
)


def test_generation_defaults():
    g = GenerationConfig()
    assert g.max_tokens == 2048
    assert g.temperature == 1.0
    assert g.top_p == 1.0
    assert g.top_k == 0
    assert g.min_p == 0.05
    assert g.repeat_penalty == 1.1
    assert g.repeat_last_n == 64
    assert g.mirostat == 0
    assert g.mirostat_tau == 5.0
    assert g.typical_p == 1.0
    assert not g.is_greedy


def test_generation_presets():
    assert GenerationConfig.greedy().is_greedy
    assert GenerationConfig.greedy().top_k == 1
    c = GenerationConfig.creative()
    assert c.temperature == 1.2 and c.top_p == 0.95
    b = GenerationConfig.balanced()
    assert b.temperature == 0.7 and b.top_k == 40


def test_generation_validation():
    GenerationConfig(temperature=0.5).validate()
    with pytest.raises(ValueError):
        GenerationConfig(temperature=3.0).validate()
    with pytest.raises(ValueError):
        GenerationConfig(top_p=1.5).validate()
    with pytest.raises(ValueError):
        GenerationConfig(max_tokens=0).validate()


def test_generation_top_logprobs_clamp():
    assert GenerationConfig(top_logprobs=50).top_logprobs == 20


def test_inference_defaults():
    i = InferenceConfig()
    assert i.block_size == 64  # TPU default; 1.7x decode at B=32 vs 16
    assert i.max_cached_blocks == 10000
    assert i.tensor_parallel_size == 1
    assert i.paged_attention


def test_server_defaults():
    s = ServerConfig()
    assert s.port == 8080
    assert s.host == "0.0.0.0"
    assert s.max_concurrent_requests == 16
    assert s.request_timeout_secs == 300.0
    assert s.max_body_bytes == 10 * 1024 * 1024
    assert not s.slo.any_set()


def test_parse_dtype():
    import jax.numpy as jnp

    assert parse_dtype("bf16") == jnp.bfloat16
    assert parse_dtype("f32") == jnp.float32
    assert parse_dtype("f16") == jnp.float16
    with pytest.raises(ValueError):
        parse_dtype("int7")


def test_universal_roundtrip():
    cfg = UniversalConfig(
        model_type="mistral",
        vocab_size=32000,
        hidden_size=4096,
        num_layers=32,
        intermediate_size=14336,
        attention=AttentionConfig(num_heads=32, num_kv_heads=8, sliding_window=4096),
    )
    d = cfg.to_dict()
    back = UniversalConfig.from_dict(d)
    assert back.attention.num_kv_heads == 8
    assert back.attention.sliding_window == 4096
    assert back.model_type == "mistral"


def test_layer_types_hybrid():
    cfg = UniversalConfig(
        num_layers=4,
        ssm=SsmConfig(),
        attention=AttentionConfig(),
        hybrid_layers=["mamba2", "attention", "mamba2", "attention"],
    )
    assert cfg.needs_ssm_state and cfg.needs_kv_cache


def test_layer_types_mla_moe():
    cfg = UniversalConfig(
        num_layers=4,
        attention=AttentionConfig(kv_latent_dim=512, d_rope=64),
        moe=MoeConfig(num_experts=8, num_dense_layers=1),
    )
    assert cfg.layer_types() == ["mla", "mla_moe", "mla_moe", "mla_moe"]


def test_app_config_yaml_roundtrip(tmp_path):
    cfg = AppConfig()
    cfg.model.model_type = "llama"
    cfg.inference.dtype = "bf16"
    cfg.server.port = 9999
    cfg.generation.temperature = 0.3
    p = tmp_path / "config.yaml"
    cfg.save(p)
    back = AppConfig.from_file(p)
    assert back.server.port == 9999
    assert back.generation.temperature == 0.3
    assert back.model.model_type == "llama"


def test_app_config_flattened_model():
    """The model config is flattened at the top level like the reference's
    serde(flatten) (src/config/blazr.rs:36-52)."""
    d = AppConfig().to_dict()
    assert "hidden_size" in d and "model" not in d
    assert "inference" in d and "server" in d and "generation" in d


def test_max_seq_len_override():
    cfg = AppConfig()
    cfg.model.max_seq_len = 8192
    assert cfg.effective_max_seq_len() == 8192
    cfg.inference.max_seq_len = 2048
    assert cfg.effective_max_seq_len() == 2048


def test_hf_config_llama():
    hf = {
        "model_type": "llama",
        "hidden_size": 2048,
        "num_hidden_layers": 16,
        "num_attention_heads": 32,
        "num_key_value_heads": 8,
        "vocab_size": 128256,
        "intermediate_size": 8192,
        "rope_theta": 500000.0,
        "rms_norm_eps": 1e-5,
        "tie_word_embeddings": True,
        "rope_scaling": {
            "rope_type": "llama3",
            "factor": 32.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 8192,
        },
        "max_position_embeddings": 131072,
    }
    cfg = universal_from_hf_config(hf)
    assert cfg.model_type == "llama"
    assert cfg.hidden_size == 2048
    assert cfg.attention.num_kv_heads == 8
    assert cfg.attention.rope_theta == 500000.0
    assert cfg.attention.rope_scaling.rope_type == "llama3"
    assert cfg.tie_word_embeddings


def test_hf_config_deepseek_mla_moe():
    hf = {
        "model_type": "deepseek_v2",
        "hidden_size": 5120,
        "num_hidden_layers": 60,
        "num_attention_heads": 128,
        "kv_lora_rank": 512,
        "q_lora_rank": 1536,
        "qk_rope_head_dim": 64,
        "qk_nope_head_dim": 128,
        "v_head_dim": 128,
        "n_routed_experts": 160,
        "num_experts_per_tok": 6,
        "n_shared_experts": 2,
        "moe_intermediate_size": 1536,
        "first_k_dense_replace": 1,
        "vocab_size": 102400,
    }
    cfg = universal_from_hf_config(hf)
    assert cfg.model_type == "deepseek"
    assert cfg.attention.is_mla
    assert cfg.attention.kv_latent_dim == 512
    assert cfg.moe.num_experts == 160
    assert cfg.moe.shared_expert == 2
    assert cfg.layer_types()[0] == "mla"
    assert cfg.layer_types()[1] == "mla_moe"


def test_hf_config_mamba2():
    hf = {
        "model_type": "mamba2",
        "hidden_size": 2048,
        "num_hidden_layers": 48,
        "state_size": 128,
        "conv_kernel": 4,
        "expand": 2,
        "head_dim": 64,
        "vocab_size": 50288,
    }
    cfg = universal_from_hf_config(hf)
    assert cfg.ssm is not None
    assert cfg.ssm.state_size == 128
    assert cfg.needs_ssm_state and not cfg.needs_kv_cache
