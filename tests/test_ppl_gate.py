"""Δppl quality gate (BASELINE.md): quantized models must track the fp32
reference with error ordered by bit-width — 8-bit near-lossless, 4-bit
small, 2-bit worst."""

import numpy as np
import pytest

from blazr_tpu.loader import load_model
from blazr_tpu.formats import GgmlType
from blazr_tpu.utils.ppl import delta_ppl, perplexity
from fixtures import write_tiny_llama_checkpoint
from test_gguf_e2e import write_tiny_llama_gguf


@pytest.fixture(scope="module")
def models(tmp_path_factory):
    rng = np.random.default_rng(31)
    st = tmp_path_factory.mktemp("ppl_st")
    weights = write_tiny_llama_checkpoint(st, rng)
    out = {"f32": load_model(st, dtype="f32")[0]}
    for name, gt in [("q8_0", GgmlType.Q8_0), ("q4_k", GgmlType.Q4_K),
                     ("q2_k", GgmlType.Q2_K)]:
        d = tmp_path_factory.mktemp(f"ppl_{name}")
        write_tiny_llama_gguf(d / "m.gguf", weights, quant=gt)
        out[name] = load_model(d, dtype="f32")[0]
    return out


@pytest.fixture(scope="module")
def stream():
    # synthetic "text": structured token stream with repetition
    rng = np.random.default_rng(7)
    base = rng.integers(1, 250, 64).tolist()
    return (base * 4)[:200]


def test_ppl_finite_and_reasonable(models, stream):
    p = perplexity(models["f32"], stream, window=64)
    assert np.isfinite(p) and 1.0 < p < 1e6


def test_delta_ppl_ordering(models, stream):
    p0 = perplexity(models["f32"], stream, window=64)
    deltas = {}
    for name in ("q8_0", "q4_k", "q2_k"):
        pq = perplexity(models[name], stream, window=64)
        deltas[name] = abs(pq - p0)
    # 8-bit near-lossless; ordering by bit-width
    assert deltas["q8_0"] < 0.02 * p0
    assert deltas["q8_0"] <= deltas["q4_k"] <= deltas["q2_k"]


def test_delta_ppl_helper(models, stream):
    p0, p1, d = delta_ppl(models["f32"], models["q8_0"], stream, window=64)
    assert abs((p1 - p0) - d) < 1e-9
