"""int8-MXU quant compute (W4A8 / W8A8): widening, kernel numerics,
config-driven engine wiring.

Reference behavior anchor: the reference's fast CUDA tier is dp4a int8
dot-product kernels for Q4_K/Q6_K/Q8_0 (/root/reference/README.md "Model
Formats"); blazr_tpu's TPU analogue is dynamic per-row int8 activation
quant feeding the int8 MXU (quant/pallas/int_matmul.py).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blazr_tpu.quant.qtensor import (
    QuantTensor,
    apply_quant_compute,
    dequantize_np,
    mark_act_quant,
    widen_to_int8,
)


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _awq_qt(key, k, n, gs):
    from blazr_tpu.utils.synthetic import _rand_awq_qt

    return _rand_awq_qt(jax.random.key(key), k, n, group_size=gs)


def test_widen_to_int8_exact(rng):
    """Widening must preserve the integers and the affine exactly."""
    qt = _awq_qt(0, 512, 256, 128)
    wide = widen_to_int8(qt)
    assert wide.bits == 8 and wide.act_quant
    assert wide.qweight.shape[0] == 2 * qt.qweight.shape[0]
    np.testing.assert_array_equal(dequantize_np(wide), dequantize_np(qt))


def test_mark_act_quant_rejects_unsigned():
    import dataclasses

    qt = _awq_qt(1, 256, 128, 64)
    unsigned = dataclasses.replace(qt, signed=False)
    with pytest.raises(NotImplementedError):
        mark_act_quant(unsigned)


@pytest.mark.parametrize("mode", ["w4a8", "w8a8"])
def test_int8_mxu_matmul_close_to_dequant(rng, mode):
    """Kernel (interpret mode) vs exact f32 dequant reference. The only
    error source is the per-row int8 activation quant (~1/254 relative),
    so a 2% tolerance is generous but format-independent."""
    from blazr_tpu.quant.pallas.int_matmul import quant_matmul_int8mxu

    qt = _awq_qt(2, 512, 256, 128)
    qt = widen_to_int8(qt) if mode == "w8a8" else mark_act_quant(qt)
    ref_w = dequantize_np(qt)
    for m in (1, 5, 17):
        x = rng.standard_normal((m, 512)).astype(np.float32)
        got = np.asarray(quant_matmul_int8mxu(jnp.asarray(x), qt))
        ref = x @ ref_w
        scale = np.maximum(np.abs(ref).max(), 1.0)
        assert np.max(np.abs(got - ref)) / scale < 2e-2


def test_int8_mxu_dispatch_via_quant_matmul(rng, monkeypatch):
    """quant_matmul routes act_quant-tagged tensors through the int8-MXU
    kernel when the Pallas path is forced."""
    from blazr_tpu.quant import matmul as qm

    monkeypatch.setenv("BLAZR_TPU_FORCE_PALLAS_QUANT", "1")
    qt = widen_to_int8(_awq_qt(3, 256, 128, 64))
    x = jnp.asarray(rng.standard_normal((2, 256)), dtype=jnp.float32)
    got = np.asarray(qm.quant_matmul(x, qt))
    ref = np.asarray(x) @ dequantize_np(qt)
    scale = np.maximum(np.abs(ref).max(), 1.0)
    assert np.max(np.abs(got - ref)) / scale < 2e-2


def test_apply_quant_compute_tree(rng):
    """Tree-mapping tags QuantTensors, leaves dense + None leaves alone."""
    qt = _awq_qt(4, 256, 128, 64)
    params = {
        "layers": [{"q": qt, "q_bias": None, "norm": jnp.ones((4,))}],
        "lm_head": None,
    }
    out = apply_quant_compute(params, "w8a8")
    assert out["layers"][0]["q"].bits == 8
    assert out["layers"][0]["q"].act_quant
    assert out["layers"][0]["q_bias"] is None
    assert out["layers"][0]["norm"].shape == (4,)
    # w4a16/auto are identity
    assert apply_quant_compute(params, "auto") is params
    with pytest.raises(ValueError):
        apply_quant_compute(params, "w9a9")


def test_executor_quant_compute_e2e(rng):
    """Executor with inference.quant_compute=w8a8 generates tokens from a
    quantized synthetic model; logits stay close to the w4a16 path."""
    from blazr_tpu.config import AppConfig, GenerationConfig
    from blazr_tpu.engine.executor import Executor
    from blazr_tpu.models import llama
    from blazr_tpu.models.registry import Model
    from blazr_tpu.utils.synthetic import synth_llama_params, tiny_llama_config

    cfg = tiny_llama_config()
    params = synth_llama_params(cfg, quant="awq", dtype=jnp.float32,
                                group_size=32)
    model_a = Model(cfg, params, jnp.float32, llama.forward)
    params_b = synth_llama_params(cfg, quant="awq", dtype=jnp.float32,
                                  group_size=32)
    model_b = Model(cfg, params_b, jnp.float32, llama.forward)

    class _Tok:
        eos_token_id = 0

        def is_eos(self, t):
            return False

        def decode(self, ids):
            return "x"

    app = AppConfig(model=cfg)
    ex_a = Executor(model_a, _Tok(), app_cfg=app)

    app8 = AppConfig(model=cfg)
    app8.inference.quant_compute = "w8a8"
    ex_b = Executor(model_b, _Tok(), app_cfg=app8)
    # Params were widened in place by the executor.
    any_qt = next(l for l in jax.tree.leaves(
        model_b.params,
        is_leaf=lambda x: isinstance(x, QuantTensor))
        if isinstance(l, QuantTensor))
    assert any_qt.bits == 8 and any_qt.act_quant

    gen = GenerationConfig(max_tokens=4, temperature=0.0)
    out_a = [t.token_id for t in ex_a.generate([1, 2, 3], gen)]
    out_b = [t.token_id for t in ex_b.generate([1, 2, 3], gen)]
    assert len(out_a) == len(out_b) == 4
    # Greedy argmax on a tiny random model is not guaranteed stable under
    # activation quant; assert the first token agrees (dominant logit).
    assert out_a[0] == out_b[0]


def test_prefill_a8_min_m_routing(rng, monkeypatch):
    """w4a8-prefill tags route ONLY prefill-shaped matmuls (rows >=
    _PREFILL_A8_MIN_M) through the int8 MXU; decode-shaped calls stay on
    the bit-exact dequant path."""
    from blazr_tpu.quant import matmul as qm
    from blazr_tpu.quant.pallas import int_matmul as im
    from blazr_tpu.quant.qtensor import _PREFILL_A8_MIN_M, apply_quant_compute

    qt = _awq_qt(5, 256, 128, 64)
    tagged = apply_quant_compute({"w": qt}, "w4a8-prefill")["w"]
    assert tagged.act_quant and tagged.act_quant_min_m == _PREFILL_A8_MIN_M

    monkeypatch.setenv("BLAZR_TPU_FORCE_PALLAS_QUANT", "1")
    calls = []
    real = im.quant_matmul_int8mxu
    monkeypatch.setattr(im, "quant_matmul_int8mxu",
                        lambda x, q: calls.append(x.shape) or real(x, q))

    x_dec = jnp.asarray(rng.standard_normal((8, 256)), dtype=jnp.float32)
    y_dec = np.asarray(qm.quant_matmul(x_dec, tagged))
    assert not calls, "decode-shaped matmul must not take the int8 route"
    # decode path is IDENTICAL to the untagged (w4a16) route
    np.testing.assert_array_equal(y_dec, np.asarray(qm.quant_matmul(x_dec, qt)))

    m = _PREFILL_A8_MIN_M
    x_pre = jnp.asarray(rng.standard_normal((m, 256)), dtype=jnp.float32)
    y_pre = np.asarray(qm.quant_matmul(x_pre, tagged))
    assert calls and calls[0][0] == m
    ref = np.asarray(x_pre) @ dequantize_np(tagged)
    scale = np.maximum(np.abs(ref).max(), 1.0)
    assert np.max(np.abs(y_pre - ref)) / scale < 2e-2


def test_quant_compute_auto_resolves_by_platform(monkeypatch):
    """auto -> w4a8-prefill on TPU, identity elsewhere (CPU CI)."""
    from blazr_tpu.quant import matmul as qm
    from blazr_tpu.quant.qtensor import apply_quant_compute

    qt = _awq_qt(6, 256, 128, 64)
    params = {"w": qt}
    assert apply_quant_compute(params, "auto") is params   # CPU: no-op

    monkeypatch.setattr(qm, "_on_tpu", lambda: True)
    out = apply_quant_compute(params, "auto")
    assert out["w"].act_quant and out["w"].act_quant_min_m > 0


def test_prefill_a8_ppl_gate(rng, monkeypatch):
    """End-to-end Δppl gate for the w4a8-prefill mode (BASELINE.md
    quality gate): teacher-forced windows of 256 rows engage the int8
    route; perplexity must track the bit-exact w4a16 path closely (the
    only error source is ~1/254-relative dynamic activation quant)."""
    import copy

    from blazr_tpu.config import UniversalConfig, AttentionConfig
    from blazr_tpu.models import llama
    from blazr_tpu.models.registry import Model
    from blazr_tpu.quant.pallas import int_matmul as im
    from blazr_tpu.quant.qtensor import apply_quant_compute
    from blazr_tpu.utils.ppl import perplexity
    from blazr_tpu.utils.synthetic import synth_llama_params

    cfg = UniversalConfig(
        model_type="llama", vocab_size=256, hidden_size=256, num_layers=2,
        max_seq_len=512, intermediate_size=512,
        attention=AttentionConfig(num_heads=4, num_kv_heads=2, head_dim=64))
    params = synth_llama_params(cfg, quant="awq", dtype=jnp.float32,
                                group_size=128)
    model_a = Model(cfg, params, jnp.float32, llama.forward)
    model_b = Model(cfg, apply_quant_compute(copy.copy(params),
                                             "w4a8-prefill"),
                    jnp.float32, llama.forward)

    monkeypatch.setenv("BLAZR_TPU_FORCE_PALLAS_QUANT", "1")
    calls = []
    real = im.quant_matmul_int8mxu
    monkeypatch.setattr(im, "quant_matmul_int8mxu",
                        lambda x, q: calls.append(x.shape) or real(x, q))

    stream = (rng.integers(1, 250, 64).tolist() * 8)[:512]
    p_a = perplexity(model_a, stream, window=256)
    assert not calls, "w4a16 model must not touch the int8 route"
    p_b = perplexity(model_b, stream, window=256)
    assert calls, "256-row windows must engage the prefill-a8 route"
    assert np.isfinite(p_a) and np.isfinite(p_b)
    assert abs(p_b - p_a) / p_a < 0.02, (p_a, p_b)
