"""Golden-logit parity: our Llama forward vs torch/transformers on an
identical random checkpoint (the golden-token test tier SURVEY §4 says the
reference lacks and the TPU build must add)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from blazr_tpu.loader import load_model
from fixtures import TINY_LLAMA_HF_CONFIG, write_tiny_llama_checkpoint

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def checkpoint(tmp_path_factory):
    rng = np.random.default_rng(42)
    path = tmp_path_factory.mktemp("tiny_llama")
    weights = write_tiny_llama_checkpoint(path, rng)
    return path, weights


def _hf_logits(path, tokens: np.ndarray) -> np.ndarray:
    from transformers import AutoModelForCausalLM

    model = AutoModelForCausalLM.from_pretrained(path, torch_dtype=torch.float32)
    model.eval()
    with torch.no_grad():
        out = model(torch.from_numpy(tokens.astype(np.int64)))
    return out.logits.numpy()


def test_forward_matches_transformers(checkpoint):
    path, _ = checkpoint
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 256, (2, 12)).astype(np.int32)

    ref = _hf_logits(path, tokens)

    model, app_cfg = load_model(path, dtype="f32")
    cache = model.init_cache(batch=2, capacity=32)
    positions = np.broadcast_to(np.arange(12, dtype=np.int32), (2, 12))
    logits, _ = model.forward(jnp.asarray(tokens), cache, jnp.asarray(positions))
    got = np.asarray(logits)

    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_incremental_decode_matches_full_forward(checkpoint):
    """prefill + per-token decode must produce the same logits as one full
    forward (KV cache correctness)."""
    path, _ = checkpoint
    model, _ = load_model(path, dtype="f32")
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 256, (1, 10)).astype(np.int32)

    # Full forward
    cache = model.init_cache(1, 16)
    pos = np.arange(10, dtype=np.int32)[None, :]
    full_logits, _ = model.forward(jnp.asarray(tokens), cache, jnp.asarray(pos))

    # Prefill 6 then decode 4 tokens one at a time
    cache = model.init_cache(1, 16)
    logits_p, cache = model.forward(
        jnp.asarray(tokens[:, :6]), cache,
        jnp.asarray(np.arange(6, dtype=np.int32)[None, :]),
    )
    pieces = [np.asarray(logits_p)]
    for t in range(6, 10):
        logits_t, cache = model.forward(
            jnp.asarray(tokens[:, t : t + 1]), cache,
            jnp.asarray(np.array([[t]], dtype=np.int32)),
        )
        pieces.append(np.asarray(logits_t))
    inc = np.concatenate(pieces, axis=1)
    np.testing.assert_allclose(inc, np.asarray(full_logits), rtol=1e-4, atol=1e-4)


def test_greedy_decode_matches_transformers(checkpoint):
    """End-to-end greedy token parity over 8 generated tokens."""
    path, _ = checkpoint
    from transformers import AutoModelForCausalLM

    hf = AutoModelForCausalLM.from_pretrained(path, torch_dtype=torch.float32)
    hf.eval()
    prompt = np.array([[5, 9, 42, 7]], dtype=np.int64)
    with torch.no_grad():
        hf_out = hf.generate(
            torch.from_numpy(prompt), max_new_tokens=8, do_sample=False,
            pad_token_id=0,
        ).numpy()[0, 4:]

    model, _ = load_model(path, dtype="f32")
    cache = model.init_cache(1, 32)
    toks = jnp.asarray(prompt.astype(np.int32))
    pos = jnp.asarray(np.arange(4, dtype=np.int32)[None, :])
    logits, cache = model.forward(toks, cache, pos)
    out_tokens = []
    cur = int(np.asarray(logits)[0, -1].argmax())
    for step in range(8):
        out_tokens.append(cur)
        if step == 7:
            break
        logits, cache = model.forward(
            jnp.asarray([[cur]], dtype=jnp.int32), cache,
            jnp.asarray([[4 + step]], dtype=jnp.int32),
        )
        cur = int(np.asarray(logits)[0, -1].argmax())

    np.testing.assert_array_equal(np.array(out_tokens), hf_out)


def test_qwen2_bias_and_gqa(tmp_path):
    """Qwen2-style attention biases flow through (parity vs transformers)."""
    rng = np.random.default_rng(3)
    cfg = {
        "architectures": ["Qwen2ForCausalLM"],
        "model_type": "qwen2",
        "hidden_size": 64,
        "intermediate_size": 128,
        "num_hidden_layers": 2,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "vocab_size": 128,
        "max_position_embeddings": 256,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "tie_word_embeddings": False,
        "torch_dtype": "float32",
    }
    from fixtures import tiny_llama_weights
    from blazr_tpu.formats import write_safetensors

    weights = tiny_llama_weights(rng, cfg)
    for i in range(2):
        p = f"model.layers.{i}.self_attn."
        weights[p + "q_proj.bias"] = (rng.standard_normal(64) * 0.02).astype(np.float32)
        weights[p + "k_proj.bias"] = (rng.standard_normal(32) * 0.02).astype(np.float32)
        weights[p + "v_proj.bias"] = (rng.standard_normal(32) * 0.02).astype(np.float32)
    write_safetensors(tmp_path / "model.safetensors", weights)
    (tmp_path / "config.json").write_text(json.dumps(cfg))

    tokens = rng.integers(0, 128, (1, 8)).astype(np.int32)
    ref = _hf_logits(tmp_path, tokens)

    model, _ = load_model(tmp_path, dtype="f32")
    cache = model.init_cache(1, 16)
    pos = jnp.asarray(np.arange(8, dtype=np.int32)[None, :])
    logits, _ = model.forward(jnp.asarray(tokens), cache, pos)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-4, atol=2e-4)
