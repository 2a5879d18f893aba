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


# ---------------------------------------------------------------------------
# Per-format ABSOLUTE Δppl gates (VERDICT r2 #5; BASELINE.md quality gate:
# Δppl vs fp16 bounded by the reference CPU kernels' dequant error at the
# same bit-width). The codecs are bit-exact vs their numpy goldens, so the
# measured delta IS the quantization error of the format — gated here per
# format with ~2x headroom over measured values (rng=31 fixture):
#   q8_0 6e-5 | q6_k 2.4e-4 | q4_k 1.1e-3 | awq/gptq-int4-g32 7.5e-4 |
#   q2_k 8.3e-3 | iq2_xxs 1.7e-2 | iq3_s 1.7e-2
# ---------------------------------------------------------------------------

_QKEYS = {"q", "k", "v", "o", "gate", "up", "down", "qkv", "gateup", "fc"}


def _int4_group_roundtrip(w: np.ndarray, gs: int = 32) -> np.ndarray:
    """Asymmetric per-group int4 round-trip along the K axis — the exact
    error model of AWQ and GPTQ storage ((q - z) * s with 4-bit q/z and
    per-[gs, N] group scales; qtensor.from_awq/from_gptq decode to this)."""
    k, n = w.shape
    gs = min(gs, k)
    if k % gs:
        return w
    g = w.reshape(k // gs, gs, n)
    mn, mx = g.min(1), g.max(1)
    s = np.maximum((mx - mn) / 15.0, 1e-10)
    z = np.clip(np.round(-mn / s), 0, 15)
    q = np.clip(np.round(g / s[:, None, :] + z[:, None, :]), 0, 15)
    return ((q - z[:, None, :]) * s[:, None, :]).reshape(k, n).astype(
        np.float32)


def _ggml_roundtrip(w: np.ndarray, gt) -> np.ndarray:
    from blazr_tpu.formats.ggml_quants import dequantize_ggml, quantize_ggml

    flat = np.asarray(w, np.float32)
    return dequantize_ggml(quantize_ggml(flat, gt), gt, flat.shape)


def _quantized_weights_model(model, fn):
    """Clone ``model`` with every linear projection passed through the
    format's encode→decode round trip (embeddings/norms stay fp32, the
    layout real quantized checkpoints use)."""
    import copy

    import jax.numpy as jnp

    m2 = copy.copy(model)
    params = dict(model.params)
    layers = []
    for lp in params["layers"]:
        lp2 = dict(lp)
        for key in _QKEYS & set(lp):
            w = lp.get(key)
            if w is not None:
                lp2[key] = jnp.asarray(fn(np.asarray(w, np.float32)))
        layers.append(lp2)
    params["layers"] = layers
    if params.get("lm_head") is not None:
        params["lm_head"] = jnp.asarray(
            fn(np.asarray(params["lm_head"], np.float32)))
    m2.params = params
    return m2


@pytest.mark.parametrize("fmt,limit", [
    ("q8_0", 0.001), ("q6_k", 0.003), ("q4_k", 0.008),
    ("awq_int4_g32", 0.008), ("gptq_int4_g32", 0.008),
    ("q2_k", 0.04), ("iq2_xxs", 0.08), ("iq3_s", 0.08),
])
def test_delta_ppl_absolute_per_format(models, stream, fmt, limit):
    p0 = perplexity(models["f32"], stream, window=64)
    if fmt in ("awq_int4_g32", "gptq_int4_g32"):
        fn = _int4_group_roundtrip
    else:
        fn = lambda w: _ggml_roundtrip(w, getattr(GgmlType, fmt.upper()))
    mq = _quantized_weights_model(models["f32"], fn)
    pq = perplexity(mq, stream, window=64)
    assert abs(pq - p0) / p0 < limit, (
        f"{fmt}: |dppl|/ppl = {abs(pq - p0) / p0:.5f} exceeds {limit}")


# ---------------------------------------------------------------------------
# quant_compute tiers (VERDICT r4 #7): the int8-activation compute modes —
# including "auto", which silently resolves to w4a8-prefill on TPU and
# changes prefill numerics for every large prompt — must stay within the
# AWQ int4 budget. The only error the tier adds on top of the storage
# error gated above is ~1/254-relative dynamic activation quant.
# ---------------------------------------------------------------------------

def _awq_qt_from_float(w: np.ndarray, gs: int = 32):
    """Quantize a float [K, N] weight to a canonical AWQ QuantTensor
    (asymmetric per-group int4 along K — the exact storage model
    qtensor.from_awq produces)."""
    from blazr_tpu.quant.qtensor import _finish

    k, n = w.shape
    g = w.reshape(k // gs, gs, n)
    mn, mx = g.min(1), g.max(1)
    s = np.maximum((mx - mn) / 15.0, 1e-10)
    z = np.clip(np.round(-mn / s), 0, 15)
    q = np.clip(np.round(g / s[:, None, :] + z[:, None, :]), 0, 15)
    return _finish(q.astype(np.uint8).reshape(k, n).astype(np.uint8),
                   s.astype(np.float32), (s * z).astype(np.float32),
                   bits=4, group_size=gs, signed=False, fmt="awq")


@pytest.mark.parametrize("mode", ["auto", "w4a8"])
def test_quant_compute_ppl_gate(models, mode, monkeypatch):
    import copy

    from blazr_tpu.quant import matmul as qm
    from blazr_tpu.quant.pallas import int_matmul as im
    from blazr_tpu.quant.qtensor import QuantTensor, apply_quant_compute

    base = models["f32"]
    m2 = copy.copy(base)
    params = dict(base.params)
    layers = []
    for lp in params["layers"]:
        lp2 = dict(lp)
        for key in _QKEYS & set(lp):
            w = lp.get(key)
            if w is not None:
                lp2[key] = _awq_qt_from_float(np.asarray(w, np.float32))
        layers.append(lp2)
    params["layers"] = layers
    if params.get("lm_head") is not None:
        params["lm_head"] = _awq_qt_from_float(
            np.asarray(params["lm_head"], np.float32))

    # "auto" must resolve exactly as it does on TPU (w4a8-prefill tags).
    with monkeypatch.context() as mp:
        if mode == "auto":
            mp.setattr(qm, "_on_tpu", lambda: True)
        params = apply_quant_compute(params, mode)
    tagged = [v for lp in params["layers"] for v in lp.values()
              if isinstance(v, QuantTensor)]
    assert tagged and all(t.act_quant for t in tagged)
    if mode == "auto":
        assert all(t.act_quant_min_m > 0 for t in tagged)
    m2.params = params

    # Run the real int8-MXU kernel (interpret mode off-TPU) and require
    # the route to ENGAGE — a silently-untagged tree must not pass.
    monkeypatch.setenv("BLAZR_TPU_FORCE_PALLAS_QUANT", "1")
    calls = []
    real = im.quant_matmul_int8mxu
    monkeypatch.setattr(im, "quant_matmul_int8mxu",
                        lambda x, q: calls.append(x.shape) or real(x, q))

    rng = np.random.default_rng(7)
    long_stream = (rng.integers(1, 250, 64).tolist() * 8)[:512]
    # 256-token windows: rows >= _PREFILL_A8_MIN_M, so "auto"'s
    # prefill-only tags route these forwards through the int8 MXU.
    p0 = perplexity(models["f32"], long_stream, window=256)
    pq = perplexity(m2, long_stream, window=256)
    assert calls, "int8-MXU route must engage for 256-row windows"
    # Same absolute budget as the awq_int4_g32 storage gate above.
    assert abs(pq - p0) / p0 < 0.008, (
        f"quant_compute={mode}: |dppl|/ppl = {abs(pq - p0) / p0:.5f}")
