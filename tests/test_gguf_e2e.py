"""End-to-end GGUF path: BASELINE.md milestone config (1) —
'Llama GGUF Q8_0, single prompt greedy decode (CPU-runnable)'.

A tiny Llama is written as BOTH an f32 safetensors checkpoint and a Q8_0
GGUF (same weights, quantized); greedy decode from the GGUF must track the
f32 reference closely, and quantized layers must actually stay quantized
(QuantTensor) in memory.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from blazr_tpu.formats import GgmlType, hf_to_gguf_name, quantize_ggml, write_gguf
from blazr_tpu.loader import load_model
from blazr_tpu.quant import QuantTensor
from fixtures import TINY_LLAMA_HF_CONFIG, tiny_llama_weights, write_tiny_llama_checkpoint


def write_tiny_llama_gguf(path, weights: dict[str, np.ndarray],
                          quant=GgmlType.Q8_0) -> None:
    c = TINY_LLAMA_HF_CONFIG
    meta = {
        "general.architecture": "llama",
        "general.name": "tiny-test",
        "general.vocab_size": c["vocab_size"],
        "llama.embedding_length": c["hidden_size"],
        "llama.block_count": c["num_hidden_layers"],
        "llama.context_length": c["max_position_embeddings"],
        "llama.feed_forward_length": c["intermediate_size"],
        "llama.attention.head_count": c["num_attention_heads"],
        "llama.attention.head_count_kv": c["num_key_value_heads"],
        "llama.attention.layer_norm_rms_epsilon": c["rms_norm_eps"],
        "llama.rope.freq_base": c["rope_theta"],
    }
    tensors = {}
    for hf_name, w in weights.items():
        gname = hf_to_gguf_name(hf_name)
        # Quantize 2-D linear weights; keep embeddings/norms dense.
        if w.ndim == 2 and "embed" not in hf_name and "norm" not in hf_name:
            tensors[gname] = (quantize_ggml(w, quant), quant, w.shape)
        else:
            tensors[gname] = (w.astype(np.float32), GgmlType.F32, w.shape)
    write_gguf(path, meta, tensors)


def _greedy(model, prompt: np.ndarray, n: int) -> list[int]:
    cache = model.init_cache(1, 64)
    pos = jnp.asarray(np.arange(prompt.shape[1], dtype=np.int32)[None, :])
    logits, cache = model.forward(jnp.asarray(prompt), cache, pos)
    cur = int(np.asarray(logits)[0, -1].argmax())
    out = [cur]
    p = prompt.shape[1]
    for step in range(n - 1):
        logits, cache = model.forward(
            jnp.asarray([[cur]], dtype=jnp.int32), cache,
            jnp.asarray([[p + step]], dtype=jnp.int32),
        )
        cur = int(np.asarray(logits)[0, -1].argmax())
        out.append(cur)
    return out


@pytest.fixture(scope="module")
def both_checkpoints(tmp_path_factory):
    rng = np.random.default_rng(11)
    st_dir = tmp_path_factory.mktemp("st")
    weights = write_tiny_llama_checkpoint(st_dir, rng)
    gguf_dir = tmp_path_factory.mktemp("gguf")
    write_tiny_llama_gguf(gguf_dir / "tiny.gguf", weights)
    return st_dir, gguf_dir


def test_gguf_config_from_metadata(both_checkpoints):
    _, gguf_dir = both_checkpoints
    model, app_cfg = load_model(gguf_dir, dtype="f32")
    cfg = app_cfg.model
    assert cfg.model_type == "llama"
    assert cfg.hidden_size == 64
    assert cfg.num_layers == 2
    assert cfg.attention.num_heads == 4
    assert cfg.attention.num_kv_heads == 2
    assert cfg.vocab_size == 256


def test_gguf_keeps_linear_weights_quantized(both_checkpoints):
    _, gguf_dir = both_checkpoints
    model, _ = load_model(gguf_dir, dtype="f32")
    l0 = model.params["layers"][0]
    assert isinstance(l0["q"], QuantTensor)
    assert l0["q"].fmt == "ggml_q8_0"
    assert isinstance(model.params["embed"], jnp.ndarray)


def test_gguf_q8_greedy_decode_tracks_f32(both_checkpoints):
    st_dir, gguf_dir = both_checkpoints
    model_f32, _ = load_model(st_dir, dtype="f32")
    model_q8, _ = load_model(gguf_dir, dtype="f32")

    prompt = np.array([[5, 9, 42, 7, 100, 3]], dtype=np.int32)
    ref = _greedy(model_f32, prompt, 8)
    got = _greedy(model_q8, prompt, 8)
    # Q8_0 is near-lossless; greedy paths should agree on a tiny model.
    assert got == ref


def test_gguf_logits_close_to_f32(both_checkpoints):
    st_dir, gguf_dir = both_checkpoints
    model_f32, _ = load_model(st_dir, dtype="f32")
    model_q8, _ = load_model(gguf_dir, dtype="f32")
    tokens = jnp.asarray(np.array([[1, 2, 3, 4]], dtype=np.int32))
    pos = jnp.asarray(np.arange(4, dtype=np.int32)[None, :])
    lf, _ = model_f32.forward(tokens, model_f32.init_cache(1, 8), pos)
    lq, _ = model_q8.forward(tokens, model_q8.init_cache(1, 8), pos)
    # Relative error bounded by Q8_0 quantization noise.
    err = np.abs(np.asarray(lf) - np.asarray(lq)).max()
    assert err < 0.05, f"Q8_0 logit deviation too large: {err}"
