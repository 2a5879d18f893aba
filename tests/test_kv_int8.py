"""int8 KV cache: quality + decode-consistency tests.

Per-token-per-head absmax quantization of cache K/V (halves KV HBM
traffic at decode — a TPU-side improvement; the reference keeps KV at
f16 only). Scales fold into the attention matmuls.
"""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def test_int8_kv_close_to_float(tmp_path, rng):
    import jax.numpy as jnp

    from blazr_tpu.loader import load_model
    from fixtures import write_tiny_llama_checkpoint

    write_tiny_llama_checkpoint(tmp_path, np.random.default_rng(41))
    model, _ = load_model(tmp_path, dtype="f32")

    prompt = rng.integers(0, 250, size=(1, 24)).astype(np.int32)
    pos = np.arange(24, dtype=np.int32)[None, :]

    cf = model.init_cache(1, 64)
    lf, cf = model.forward(jnp.asarray(prompt), cf, jnp.asarray(pos))
    cq = model.init_cache(1, 64, kv_quant=True)
    assert cq.quantized and cq.k.dtype == jnp.int8
    lq, cq = model.forward(jnp.asarray(prompt), cq, jnp.asarray(pos))

    a, b = np.asarray(lf)[0, -1], np.asarray(lq)[0, -1]
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999, cos
    # greedy decisions agree on a clear-margin distribution
    assert a.argmax() == b.argmax()


def test_int8_kv_incremental_matches_prefill(tmp_path, rng):
    """Token-by-token decode over an int8 cache must equal one-shot
    prefill (write/read roundtrip with running scales)."""
    import jax.numpy as jnp

    from blazr_tpu.loader import load_model
    from fixtures import write_tiny_llama_checkpoint

    write_tiny_llama_checkpoint(tmp_path, np.random.default_rng(42))
    model, _ = load_model(tmp_path, dtype="f32")
    toks = rng.integers(0, 250, size=12).astype(np.int32)

    cq = model.init_cache(1, 32, kv_quant=True)
    pos = np.arange(12, dtype=np.int32)[None, :]
    full, _ = model.forward(jnp.asarray(toks[None, :]), cq, jnp.asarray(pos))

    cq2 = model.init_cache(1, 32, kv_quant=True)
    for i in range(12):
        li, cq2 = model.forward(jnp.asarray([[toks[i]]], dtype=jnp.int32),
                                cq2, jnp.asarray([[i]], dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(li)[0, -1], np.asarray(full)[0, -1],
                               atol=1e-3, rtol=1e-3)


def test_int8_kv_through_executor(tmp_path):
    """Executor honors inference.kv_cache_dtype=int8 and generates."""
    import dataclasses

    from blazr_tpu.config.generation import GenerationConfig
    from blazr_tpu.engine.executor import Executor
    from blazr_tpu.loader import load_model
    from blazr_tpu.tokenizer import load_tokenizer
    from fixtures import write_byte_tokenizer_json, write_tiny_llama_checkpoint

    write_tiny_llama_checkpoint(tmp_path, np.random.default_rng(43))
    write_byte_tokenizer_json(tmp_path)
    model, app_cfg = load_model(tmp_path, dtype="f32")
    app_cfg.inference.kv_cache_dtype = "int8"
    ex = Executor(model, load_tokenizer(tmp_path), app_cfg)
    cfg = GenerationConfig(max_tokens=6, temperature=0.0)
    out = [e.token_id for e in ex.generate(ex.tokenizer.encode("hi"), cfg)
           if e.token_id is not None]
    assert len(out) == 6
