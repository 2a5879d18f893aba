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
