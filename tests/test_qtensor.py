"""Canonical QuantTensor tests: every checkpoint quant format must map to
the grouped-affine layout EXACTLY (same integers, same affine math as the
format's reference dequant). This is the golden gate the Pallas kernels
are later tested against (SURVEY §4 'golden tests vs NumPy dequant')."""

import numpy as np
import pytest

from blazr_tpu.formats import GgmlType, dequantize_ggml, quantize_ggml
from blazr_tpu.quant import (
    QuantTensor,
    dequantize_jnp,
    dequantize_np,
    from_awq,
    from_ggml,
    from_gptq,
    quant_matmul,
    unpack_k,
)
from blazr_tpu.quant.qtensor import AWQ_SHIFTS, _pack_k


def test_pack_unpack_roundtrip(rng):
    for bits, signed in [(2, False), (4, False), (8, True), (8, False)]:
        lo, hi = (-(1 << bits - 1), (1 << bits - 1)) if signed else (0, 1 << bits)
        q = rng.integers(lo, hi, (64, 16)).astype(np.int32)
        words = _pack_k(q, bits)
        assert words.shape == (64 * bits // 32, 16)
        back = unpack_k(words, bits, signed)
        np.testing.assert_array_equal(back, q)


# ---------------------------------------------------------------------------
# AWQ
# ---------------------------------------------------------------------------

def _make_awq(rng, k=64, n=32, gs=32):
    """Synthesize an AWQ triplet + its reference dequant."""
    q = rng.integers(0, 16, (k, n)).astype(np.uint32)
    z = rng.integers(0, 16, (k // gs, n)).astype(np.uint32)
    s = (rng.random((k // gs, n)).astype(np.float32) + 0.5) * 0.01

    # Pack with AWQ's interleaved order: col 8w+j at shift AWQ_SHIFTS[j].
    qweight = np.zeros((k, n // 8), dtype=np.uint32)
    qzeros = np.zeros((k // gs, n // 8), dtype=np.uint32)
    for j in range(8):
        qweight |= q[:, j::8] << AWQ_SHIFTS[j]
        qzeros |= z[:, j::8] << AWQ_SHIFTS[j]
    groups = np.arange(k) // gs
    ref = (q.astype(np.float32) - z[groups].astype(np.float32)) * s[groups]
    return qweight, s, qzeros, ref


def test_awq_canonical_exact(rng):
    qweight, s, qzeros, ref = _make_awq(rng)
    qt = from_awq(qweight, s, qzeros, 32)
    assert qt.bits == 4 and qt.fmt == "awq"
    np.testing.assert_allclose(dequantize_np(qt), ref, rtol=1e-6, atol=1e-7)


# ---------------------------------------------------------------------------
# GPTQ
# ---------------------------------------------------------------------------

def _make_gptq(rng, k=64, n=32, gs=32, desc_act=False):
    q = rng.integers(0, 16, (k, n)).astype(np.uint32)
    z = rng.integers(0, 15, (k // gs, n)).astype(np.uint32)   # stored zero-1
    s = (rng.random((k // gs, n)).astype(np.float32) + 0.5) * 0.01

    qweight = np.zeros((k // 8, n), dtype=np.uint32)
    for j in range(8):
        qweight |= q[j::8] << np.uint32(4 * j)
    qzeros = np.zeros((k // gs, n // 8), dtype=np.uint32)
    for j in range(8):
        qzeros |= z[:, j::8] << np.uint32(4 * j)

    if desc_act:
        g_idx = rng.permutation(np.arange(k) // gs)
    else:
        g_idx = np.arange(k) // gs
    ref = (q.astype(np.float32) - (z[g_idx] + 1.0)) * s[g_idx]
    return qweight, s, qzeros, g_idx.astype(np.int32), ref


def test_gptq_canonical_exact(rng):
    qweight, s, qzeros, g_idx, ref = _make_gptq(rng)
    qt = from_gptq(qweight, s, qzeros, g_idx, 32)
    assert qt.perm is None  # trivial g_idx → no activation permutation
    np.testing.assert_allclose(dequantize_np(qt), ref, rtol=1e-6, atol=1e-7)


def test_gptq_desc_act(rng):
    """desc-act: rows sorted group-contiguous; x[perm] @ W_sorted must equal
    x @ W_logical."""
    qweight, s, qzeros, g_idx, ref = _make_gptq(rng, desc_act=True)
    qt = from_gptq(qweight, s, qzeros, g_idx, 32)
    assert qt.perm is not None
    x = rng.standard_normal((3, 64)).astype(np.float32)
    expect = x @ ref
    got = np.asarray(quant_matmul(jnp_arr(x), qt))
    np.testing.assert_allclose(got, expect, rtol=2e-2, atol=2e-3)


def jnp_arr(x):
    import jax.numpy as jnp

    return jnp.asarray(x)


# ---------------------------------------------------------------------------
# GGUF formats — canonical dequant must equal the ggml reference exactly
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("gt", [
    GgmlType.Q8_0, GgmlType.Q4_0, GgmlType.Q4_1, GgmlType.Q2_K,
    GgmlType.Q4_K, GgmlType.Q5_K, GgmlType.Q6_K,
])
def test_ggml_canonical_matches_reference(gt, rng):
    n, k = 4, 512                       # [out, in], blocks along K
    x = rng.standard_normal((n, k)).astype(np.float32)
    raw = quantize_ggml(x, gt)
    ref = dequantize_ggml(raw, gt, (n, k))            # ggml reference [N, K]
    qt = from_ggml(raw, gt, (n, k))
    got = dequantize_np(qt)                           # [K, N]
    np.testing.assert_allclose(got, ref.T, rtol=1e-5, atol=1e-6)


def test_jnp_dequant_matches_np(rng):
    raw = quantize_ggml(rng.standard_normal((8, 256)).astype(np.float32), GgmlType.Q4_K)
    qt = from_ggml(raw, GgmlType.Q4_K, (8, 256))
    np.testing.assert_allclose(
        np.asarray(dequantize_jnp(qt)), dequantize_np(qt), rtol=1e-6, atol=1e-6
    )


def test_quant_matmul_matches_dense(rng):
    import jax.numpy as jnp

    raw = quantize_ggml(rng.standard_normal((64, 256)).astype(np.float32), GgmlType.Q6_K)
    qt = from_ggml(raw, GgmlType.Q6_K, (64, 256))
    x = rng.standard_normal((5, 256)).astype(np.float32)
    ref = x @ dequantize_np(qt)
    got = np.asarray(quant_matmul(jnp.asarray(x), qt))
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_quant_tensor_is_pytree(rng):
    import jax

    raw = quantize_ggml(rng.standard_normal((8, 256)).astype(np.float32), GgmlType.Q8_0)
    qt = from_ggml(raw, GgmlType.Q8_0, (8, 256))
    leaves = jax.tree_util.tree_leaves(qt)
    assert len(leaves) == 3  # qweight, scales, mins (perm is None)
    # jit through a QuantTensor argument
    f = jax.jit(lambda x, q: quant_matmul(x, q))
    x = jnp_arr(rng.standard_normal((2, 256)).astype(np.float32))
    out = f(x, qt)
    assert out.shape == (2, 8)


def test_bits_per_weight(rng):
    raw = quantize_ggml(rng.standard_normal((64, 512)).astype(np.float32), GgmlType.Q4_K)
    qt = from_ggml(raw, GgmlType.Q4_K, (64, 512))
    assert 4.0 < qt.bits_per_weight < 7.0


def test_stream_kernel_matches_dense(rng, monkeypatch):
    """Manual-DMA decode kernel (interpret mode) vs dequantized dense."""
    import jax
    import jax.numpy as jnp

    from blazr_tpu.quant.pallas.int_matmul import quant_matmul_pallas
    from blazr_tpu.quant.qtensor import dequantize_jnp
    from blazr_tpu.utils.synthetic import _rand_awq_qt

    monkeypatch.setenv("BLAZR_TPU_STREAM_KERNEL", "1")
    qt = _rand_awq_qt(jax.random.key(3), 512, 256, group_size=128)
    for m in (1, 4):
        x = jnp.asarray(rng.standard_normal((m, 512)), dtype=jnp.float32)
        got = np.asarray(quant_matmul_pallas(x, qt))
        ref = np.asarray(x @ dequantize_jnp(qt))
        np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)


def test_xla_grouped_matches_dequant(rng):
    """Pure-XLA grouped dequant-dot vs the dense dequant reference, across
    an asymmetric 4-bit and a signed 8-bit format, batched and single-row."""
    import jax
    import jax.numpy as jnp

    from blazr_tpu.quant.matmul import quant_matmul_xla_grouped
    from blazr_tpu.utils.synthetic import _rand_awq_qt

    for qt in (
        _rand_awq_qt(jax.random.key(5), 512, 256, group_size=128),
        from_ggml(quantize_ggml(
            rng.standard_normal((64, 512)).astype(np.float32), GgmlType.Q8_0),
            GgmlType.Q8_0, (64, 512)),
    ):
        k = qt.in_features
        ref_w = dequantize_np(qt)
        for m in (1, 5):
            x = rng.standard_normal((m, k)).astype(np.float32)
            got = np.asarray(quant_matmul_xla_grouped(jnp.asarray(x), qt))
            ref = x.astype(np.float32) @ ref_w
            # bf16 operand rounding in the grouped path
            np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_xla_grouped_batch3d_shape(rng):
    import jax
    import jax.numpy as jnp

    from blazr_tpu.quant.matmul import quant_matmul_xla_grouped
    from blazr_tpu.utils.synthetic import _rand_awq_qt

    qt = _rand_awq_qt(jax.random.key(6), 256, 128, group_size=64)
    x = jnp.asarray(rng.standard_normal((2, 3, 256)), dtype=jnp.bfloat16)
    out = quant_matmul_xla_grouped(x, qt)
    assert out.shape == (2, 3, 128)
    assert out.dtype == jnp.bfloat16
