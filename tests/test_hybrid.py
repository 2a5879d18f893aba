"""Hybrid Mamba2+attention model tests (BASELINE family: 'hybrid
Mamba+Attn'): layer-type dispatch, combined KV+SSM state, incremental
decode parity, end-to-end generate."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from blazr_tpu.loader import load_model
from blazr_tpu.formats import write_safetensors
from tests_helpers import ByteTok

HYBRID_CFG = {
    "model_type": "bamba",            # hybrid family marker
    "architectures": ["HybridForCausalLM"],
    "hidden_size": 64,
    "num_hidden_layers": 4,
    "layer_types": ["mamba", "attention", "mamba", "attention"],
    "num_attention_heads": 4,
    "num_key_value_heads": 2,
    "intermediate_size": 128,
    "vocab_size": 256,
    "max_position_embeddings": 256,
    "rms_norm_eps": 1e-5,
    "rope_theta": 10000.0,
    # mamba2 geometry
    "state_size": 16,
    "conv_kernel": 4,
    "expand": 2,
    "head_dim": 16,
    "num_heads": 8,
    "n_groups": 2,
    "tie_word_embeddings": False,
}


def _write_hybrid(tmp_path, rng):
    h = 64
    inner = 128                       # expand * h
    g_state = 2 * 16                  # n_groups * state
    conv_dim = inner + 2 * g_state
    d_inproj = 2 * inner + 2 * g_state + 8   # z,x,B,C,dt

    def w(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    weights = {
        "model.embed_tokens.weight": w(256, h),
        "model.norm.weight": np.ones(h, np.float32),
        "lm_head.weight": w(256, h),
    }
    for i, t in enumerate(HYBRID_CFG["layer_types"]):
        p = f"model.layers.{i}."
        weights[p + "input_layernorm.weight"] = np.ones(h, np.float32)
        weights[p + "post_attention_layernorm.weight"] = np.ones(h, np.float32)
        weights[p + "mlp.gate_proj.weight"] = w(128, h)
        weights[p + "mlp.up_proj.weight"] = w(128, h)
        weights[p + "mlp.down_proj.weight"] = w(h, 128)
        if t == "mamba":
            weights.update({
                p + "mixer.in_proj.weight": w(d_inproj, h),
                p + "mixer.conv1d.weight": w(conv_dim, 1, 4),
                p + "mixer.conv1d.bias": w(conv_dim, scale=0.01),
                p + "mixer.A_log": np.log(np.linspace(1, 8, 8)).astype(np.float32),
                p + "mixer.D": np.ones(8, np.float32),
                p + "mixer.dt_bias": w(8, scale=0.1),
                p + "mixer.norm.weight": np.ones(inner, np.float32),
                p + "mixer.out_proj.weight": w(h, inner),
            })
        else:
            weights.update({
                p + "self_attn.q_proj.weight": w(h, h),
                p + "self_attn.k_proj.weight": w(32, h),
                p + "self_attn.v_proj.weight": w(32, h),
                p + "self_attn.o_proj.weight": w(h, h),
            })
    write_safetensors(tmp_path / "model.safetensors", weights)
    (tmp_path / "config.json").write_text(json.dumps(HYBRID_CFG))


@pytest.fixture(scope="module")
def hybrid_model(tmp_path_factory):
    path = tmp_path_factory.mktemp("hybrid")
    _write_hybrid(path, np.random.default_rng(8))
    model, app_cfg = load_model(path, dtype="f32")
    return model, app_cfg


def test_hybrid_detection(hybrid_model):
    model, app_cfg = hybrid_model
    cfg = app_cfg.model
    assert cfg.hybrid_layers == ["mamba2", "attention", "mamba2", "attention"]
    assert cfg.needs_ssm_state and cfg.needs_kv_cache
    assert cfg.ssm is not None and cfg.attention is not None


def test_hybrid_state_shapes(hybrid_model):
    model, _ = hybrid_model
    state = model.init_cache(2, 32)
    assert state.kv.k.shape[0] == 2        # 2 attention layers
    assert state.ssm.conv.shape[0] == 2    # 2 mamba layers


def test_hybrid_incremental_matches_full(hybrid_model):
    model, _ = hybrid_model
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 256, (1, 12)).astype(np.int32)
    pos = np.arange(12, dtype=np.int32)[None, :]

    full, _ = model.forward(jnp.asarray(tokens), model.init_cache(1, 32),
                            jnp.asarray(pos))

    state = model.init_cache(1, 32)
    out, state = model.forward(jnp.asarray(tokens[:, :7]), state,
                               jnp.asarray(pos[:, :7]))
    pieces = [np.asarray(out)]
    for t in range(7, 12):
        out, state = model.forward(jnp.asarray(tokens[:, t:t+1]), state,
                                   jnp.asarray(pos[:, t:t+1]))
        pieces.append(np.asarray(out))
    inc = np.concatenate(pieces, axis=1)
    np.testing.assert_allclose(inc, np.asarray(full), rtol=2e-3, atol=2e-3)


def test_hybrid_ffn_variant_dispatch(hybrid_model):
    """Fusing an attention layer's gate+up into a 'gateup' weight must
    give IDENTICAL logits (same math, different param layout) — the
    regression was the FFN sub-block keying on 'gate' alone, silently
    skipping MoE/gateup/fc FFN variants on both hybrid forwards."""
    model, _ = hybrid_model
    rng = np.random.default_rng(2)
    tokens = jnp.asarray(rng.integers(0, 256, (1, 8)).astype(np.int32))
    pos = jnp.asarray(np.arange(8, dtype=np.int32)[None, :])

    ref, _ = model.forward(tokens, model.init_cache(1, 32), pos)

    import copy
    fused_params = {k: v for k, v in model.params.items()}
    fused_params["layers"] = [dict(p) for p in model.params["layers"]]
    for p in fused_params["layers"]:
        if p.get("gate") is not None:
            p["gateup"] = jnp.concatenate([p["gate"], p["up"]], axis=-1)
            p["gate"] = None
            p["up"] = None

    orig = model.params
    try:
        model.params = fused_params
        got, _ = model.forward(tokens, model.init_cache(1, 32), pos)
    finally:
        model.params = orig
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_hybrid_generate_end_to_end(hybrid_model):
    from blazr_tpu.config import GenerationConfig
    from blazr_tpu.engine.executor import Executor

    model, app_cfg = hybrid_model
    app_cfg.inference.max_seq_len = 64
    ex = Executor(model, ByteTok(), app_cfg)
    toks = [t.token_id for t in ex.generate(
        [5, 10, 15], GenerationConfig(max_tokens=6, temperature=0.0))]
    assert 1 <= len(toks) <= 6
    # deterministic
    toks2 = [t.token_id for t in ex.generate(
        [5, 10, 15], GenerationConfig(max_tokens=6, temperature=0.0))]
    assert toks == toks2
