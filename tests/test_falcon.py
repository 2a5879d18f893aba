"""Falcon family: ALiBi attention, fused MQA/GQA query_key_value
de-interleave, parallel-residual blocks — golden-tested vs transformers.

Reference support surface: GGUF arch table maps falcon and detects ALiBi
(/root/reference/src/loader/gguf.rs:137-149, :199-202); the forward lived
in boostr. All three released falcon layouts are covered:
  * falcon-rw style  — alibi, per-head interleaved qkv, biases, sequential
  * falcon-7b style  — rope, multi_query (MQA), parallel single-norm block
  * falcon-40b style — rope, GQA grouped qkv, ln_attn + ln_mlp parallel
"""

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


def _falcon(**kw):
    from transformers import FalconConfig, FalconForCausalLM

    torch.manual_seed(3)
    # ALiBi goldens use the sdpa path: transformers 4.57's falcon EAGER
    # path applies the ALiBi bias twice (folded into the causal mask as
    # alibi/sqrt(d) in _update_causal_mask AND added to the raw scores
    # before inv_norm_factor), doubling the effective slope. The sdpa
    # path applies it once, as (qk + alibi)/sqrt(d) — the falcon-rw
    # training semantics this framework implements (slopes pre-scaled by
    # 1/sqrt(head_dim); see models/llama.py:136-138). Note this differs
    # from Press-et-al/ggml, which add slope*distance to already-scaled
    # scores.
    impl = "sdpa" if kw.get("alibi") else "eager"
    cfg = FalconConfig(
        vocab_size=128, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, layer_norm_epsilon=1e-5,
        tie_word_embeddings=False, attn_implementation=impl, **kw,
    )
    return FalconForCausalLM(cfg)


def test_falcon_rw_alibi_sequential(tmp_path):
    """alibi + interleaved per-head qkv + qkv/dense biases + sequential
    residual (falcon-rw-1b layout)."""
    model = _golden(tmp_path, _falcon(
        alibi=True, multi_query=False, parallel_attn=False, bias=True,
        new_decoder_architecture=False), 128)
    assert model.cfg.attention.use_alibi
    assert not model.cfg.parallel_residual
    assert model.params["layers"][0].get("q_bias") is not None


def test_falcon_7b_mqa_parallel(tmp_path):
    """rope + multi_query (one kv head) + parallel block sharing one norm
    (falcon-7b layout)."""
    model = _golden(tmp_path, _falcon(
        alibi=False, multi_query=True, parallel_attn=True, bias=False,
        new_decoder_architecture=False), 128)
    assert model.cfg.parallel_residual
    assert model.cfg.attention.kv_heads() == 1
    assert model.params["layers"][0].get("post_norm") is None


def test_falcon_40b_gqa_two_norms(tmp_path):
    """rope + grouped GQA qkv + ln_attn/ln_mlp parallel block (falcon-40b
    new_decoder_architecture layout)."""
    model = _golden(tmp_path, _falcon(
        alibi=False, new_decoder_architecture=True, num_kv_heads=2,
        bias=False), 128)
    assert model.cfg.parallel_residual
    assert model.cfg.attention.kv_heads() == 2
    assert model.params["layers"][0].get("post_norm") is not None


def test_falcon_decode_matches_hf_greedy(tmp_path):
    """Greedy decode parity (prefill + per-token decode through the cache)
    for the ALiBi variant — exercises decode-time ALiBi where q_position
    advances while cached keys stay put."""
    hf = _falcon(alibi=True, multi_query=False, parallel_attn=False,
                 bias=True, new_decoder_architecture=False)
    hf.eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    prompt = np.array([[5, 17, 9, 44]], dtype=np.int64)
    with torch.no_grad():
        ref = hf.generate(torch.from_numpy(prompt), max_new_tokens=6,
                          do_sample=False).numpy()[0, prompt.shape[1]:]
    model, _ = load_model(tmp_path, dtype="f32")
    cache = model.init_cache(1, 32)
    toks = jnp.asarray(prompt.astype(np.int32))
    pos = jnp.arange(prompt.shape[1], dtype=jnp.int32)[None, :]
    logits, cache = model.forward(toks, cache, pos)
    out = []
    tok = int(np.argmax(np.asarray(logits[0, -1])))
    out.append(tok)
    for step in range(5):
        p = prompt.shape[1] + step
        logits, cache = model.forward(
            jnp.asarray([[tok]], dtype=jnp.int32), cache,
            jnp.asarray([[p]], dtype=jnp.int32))
        tok = int(np.argmax(np.asarray(logits[0, -1])))
        out.append(tok)
    assert out == list(ref)


def test_falcon_batch_engine_matches_executor(tmp_path):
    """Continuous batching (paged path: ALiBi fallback attend) matches the
    single-stream executor token-for-token."""
    from test_paged_multi import _engine_tokens, _executor_tokens

    hf = _falcon(alibi=True, multi_query=True, parallel_attn=True,
                 bias=False, new_decoder_architecture=False)
    hf.eval()
    hf.save_pretrained(tmp_path, safe_serialization=True)
    prompts = [[1, 2, 3, 4, 5], [7, 9, 11]]
    model, _ = load_model(tmp_path, dtype="f32")
    ref = _executor_tokens(model, prompts)
    model2, _ = load_model(tmp_path, dtype="f32")
    got = _engine_tokens(model2, prompts)
    assert got == ref


def test_falcon_gguf_config_flags():
    """GGUF falcon metadata → UniversalConfig: layernorm + plain exact-GELU
    MLP + parallel residual + ALiBi flag (reference gguf.rs:199-202)."""
    from blazr_tpu.loader.gguf_config import universal_from_gguf_metadata

    class MD:
        def architecture(self):
            return "falcon"

        def embedding_length(self):
            return 64

        def block_count(self):
            return 2

        def context_length(self):
            return 2048

        def get_u32(self, key):
            return {
                "falcon.attention.head_count": 4,
                "falcon.attention.head_count_kv": 1,
                "falcon.attention.use_alibi": 1,
            }.get(key)

        def get_f32(self, key):
            return {"falcon.attention.layer_norm_epsilon": 1e-5}.get(key)

        def get_str(self, key):
            return None

        def get_array(self, key):
            return None

    cfg = universal_from_gguf_metadata(MD())
    assert cfg.model_type == "falcon"
    assert cfg.norm_type == "layernorm"
    assert cfg.mlp_type == "plain"
    assert cfg.hidden_act == "gelu_exact"
    assert cfg.parallel_residual
    assert cfg.attention.use_alibi
    assert cfg.attention.kv_heads() == 1
