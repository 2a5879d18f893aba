"""Additional model-family goldens: Phi3 (fused qkv/gate_up), Gemma2
(sandwich norms, softcaps, GeGLU), Qwen3 (QK-norm) vs transformers."""

import numpy as np
import pytest

import jax.numpy as jnp

from blazr_tpu.loader import load_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _golden(tmp_path, hf_model, vocab, rtol=5e-4, seq=8):
    hf_model.eval()
    hf_model.save_pretrained(tmp_path, safe_serialization=True)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, vocab, (1, seq)).astype(np.int64)
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(tokens)).logits.numpy()
    model, _ = load_model(tmp_path, dtype="f32")
    cache = model.init_cache(1, 32)
    pos = np.arange(seq, dtype=np.int32)[None, :]
    logits, _ = model.forward(jnp.asarray(tokens.astype(np.int32)), cache,
                              jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=rtol, atol=rtol)
    return model


def test_phi3_fused_projections(tmp_path):
    from transformers import Phi3Config, Phi3ForCausalLM

    torch.manual_seed(0)
    cfg = Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, pad_token_id=0, eos_token_id=1,
        bos_token_id=2,
    )
    model = _golden(tmp_path, Phi3ForCausalLM(cfg), 128)
    # fused weights landed on the fused fast path
    assert "qkv" in model.params["layers"][0]
    assert "gateup" in model.params["layers"][0]


def test_gemma2_sandwich_norms_and_softcaps(tmp_path):
    from transformers import Gemma2Config, Gemma2ForCausalLM

    torch.manual_seed(1)
    cfg = Gemma2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        query_pre_attn_scalar=16,
        sliding_window=64, tie_word_embeddings=True,
    )
    model = _golden(tmp_path, Gemma2ForCausalLM(cfg), 128, rtol=2e-3)
    assert model.params["layers"][0].get("post_attn_norm") is not None


def test_gemma1_scaled_embeddings_geglu(tmp_path):
    """Gemma (v1): sqrt(hidden)-scaled embeddings, GeGLU MLP, tied head,
    zero-centered RMSNorm weights (1+w) — reference arch table gguf.rs:137-149
    maps `gemma`."""
    from transformers import GemmaConfig, GemmaForCausalLM

    torch.manual_seed(4)
    cfg = GemmaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
        tie_word_embeddings=True,
    )
    model = _golden(tmp_path, GemmaForCausalLM(cfg), 128, rtol=1e-3)
    assert model.cfg.scale_embeddings
    assert model.params["layers"][0].get("post_attn_norm") is None


def test_qwen3_qk_norm(tmp_path):
    from transformers import Qwen3Config, Qwen3ForCausalLM

    torch.manual_seed(2)
    cfg = Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    model = _golden(tmp_path, Qwen3ForCausalLM(cfg), 128)
    assert model.params["layers"][0].get("q_norm") is not None


def test_starcoder2_matches_transformers(tmp_path):
    """Starcoder2 (LayerNorm + plain GELU MLP + full biases) golden parity
    vs transformers (reference supports starcoder2: gguf.rs arch table)."""
    torch = pytest.importorskip("torch")
    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from blazr_tpu.loader import load_model

    torch.manual_seed(0)
    cfg = Starcoder2Config(
        vocab_size=256, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        use_bias=True, sliding_window=None, tie_word_embeddings=True,
        norm_epsilon=1e-5,
    )
    hf = Starcoder2ForCausalLM(cfg)
    hf.eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)

    model, app_cfg = load_model(tmp_path, dtype="f32")
    assert model.cfg.model_type == "starcoder2"
    assert model.cfg.norm_type == "layernorm"
    assert model.cfg.mlp_type == "plain"

    ids = np.random.default_rng(7).integers(0, 255, size=(1, 12))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    cache = model.init_cache(1, 32)
    pos = np.arange(12, dtype=np.int32)[None, :]
    logits, cache = model.forward(jnp.asarray(ids, dtype=jnp.int32), cache,
                                  jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3, rtol=2e-3)

    # incremental decode continues correctly over LayerNorm + biases
    nxt = int(np.asarray(logits)[0, -1].argmax())
    with torch.no_grad():
        ref2 = hf(torch.tensor(np.concatenate(
            [ids, [[nxt]]], axis=1))).logits.numpy()[:, -1]
    l2, _ = model.forward(jnp.asarray([[nxt]], dtype=jnp.int32), cache,
                          jnp.asarray([[12]], dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(l2)[:, -1], ref2, atol=2e-3,
                               rtol=2e-3)


def test_starcoder2_batch_engine(tmp_path):
    """Starcoder2 through the paged continuous-batching path matches the
    contiguous executor."""
    torch = pytest.importorskip("torch")
    import asyncio

    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    import jax

    jax.config.update("jax_platforms", "cpu")

    from blazr_tpu.config import AppConfig
    from blazr_tpu.config.generation import GenerationConfig
    from blazr_tpu.engine.batch_engine import BatchEngine
    from blazr_tpu.engine.executor import Executor
    from blazr_tpu.loader import load_model
    from tests_helpers import ByteTok

    torch.manual_seed(1)
    cfg = Starcoder2Config(
        vocab_size=256, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        use_bias=True, sliding_window=None, tie_word_embeddings=True)
    Starcoder2ForCausalLM(cfg).save_pretrained(tmp_path,
                                               safe_serialization=True)
    model, _ = load_model(tmp_path, dtype="f32")

    ref_ex = Executor(model, ByteTok())
    gcfg = GenerationConfig(max_tokens=6, temperature=0.0)
    prompt = [5, 9, 42, 17]
    ref = [e.token_id for e in ref_ex.generate(prompt, gcfg)
           if e.token_id is not None]

    app = AppConfig(model=model.cfg)
    app.inference.max_seq_len = 64
    app.inference.max_batch_size = 2
    eng = BatchEngine(model, ByteTok(), app)

    async def go():
        task = asyncio.create_task(eng.run())
        h = eng.submit(prompt, gcfg)
        toks = [t.token_id async for t in h.tokens()]
        eng.stop(); await task
        return toks

    assert asyncio.run(go()) == ref
