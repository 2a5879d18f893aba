"""Canonical on-device quantized-weight representation.

The TPU-native answer to boostr's ``DecomposedQuantTensor`` + per-format
CUDA kernels (SURVEY §2.9 "Quant kernels" row). Instead of one kernel per
checkpoint format, every weight-only quant format is normalized **at load
time** (host-side numpy, cheap and streaming) into ONE grouped-affine
integer layout chosen for the TPU memory system:

    w[k, n] = q[k, n] * scales[k // gs, n] - mins[k // gs, n]

  * ``qweight``: uint32 [K*bits/32, N] — **K-packed**: word row ``w``
    holds the ``r = 32/bits`` logical rows ``w*r + j`` in bit-fields
    ``[bits*j, bits*j+bits)``. Packing along K (the sublane axis) means
    in-kernel unpacking is a cheap sublane-interleave reshape, never a
    lane shuffle — the layout the MXU wants.
  * ``scales``/``mins``: float32 [K/gs, N] planes (affine per group).
  * ``perm``: optional int32 [K] activation permutation (GPTQ ``g_idx``
    desc-act checkpoints are pre-sorted group-contiguous at load; the
    gather moves to the cheap activation side — reference keeps g_idx in
    the kernel instead, src/loader/safetensors/gptq.rs:229-235).

Format mapping (all exact — same integers, same affine):
  AWQ INT4 (order [0,2,4,6,1,3,5,7])  → bits=4, m = s·z
  GPTQ INT4 (sequential, +1 zero)     → bits=4, m = s·(z+1)
  GGUF Q8_0 / Q8_K                    → bits=8 (signed), m = 0
  GGUF Q4_0/Q4_1/Q4_K/Q5_K/Q2_K/Q3_K  → bits∈{2,4,8}, per-sub-block affine
  GGUF Q6_K / IQ4_NL / IQ4_XS / TQ2_0 → bits=8/8/8/2
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.gguf import GgmlType
from ..formats.ggml_quants import KVALUES_IQ4NL, QK_K, _blocks, _f16, _k4_scale_min, _q3k_unpack_scales

# AWQ nibble order: column 8w+j uses shift AWQ_SHIFTS[j]
# (reference src/loader/safetensors/awq.rs:29-32).
AWQ_SHIFTS = np.array([0, 16, 4, 20, 8, 24, 12, 28], dtype=np.uint32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QuantTensor:
    """Grouped-affine integer weight. Logical shape [K, N] (in, out)."""

    qweight: jax.Array                    # uint32 [K*bits/32, N]
    scales: jax.Array                     # f32 [K/gs, N]
    mins: jax.Array                       # f32 [K/gs, N]
    perm: Optional[jax.Array]             # int32 [K] or None
    bits: int = dataclasses.field(metadata=dict(static=True))
    group_size: int = dataclasses.field(metadata=dict(static=True))
    signed: bool = dataclasses.field(metadata=dict(static=True))
    in_features: int = dataclasses.field(metadata=dict(static=True))
    out_features: int = dataclasses.field(metadata=dict(static=True))
    fmt: str = dataclasses.field(metadata=dict(static=True))
    # Serve-time compute mode: route matmuls through the int8-MXU kernel
    # (dynamic per-token activation quant, W4A8/W8A8). Set by
    # mark_act_quant/widen_to_int8; never set by the format decoders.
    act_quant: bool = dataclasses.field(
        default=False, metadata=dict(static=True))
    # Minimum matmul row count (static under jit) for the int8-MXU route:
    # 0 = always (w4a8/w8a8); _PREFILL_A8_MIN_M = prefill-only (decode
    # stays on the bit-exact bf16-MXU dequant path).
    act_quant_min_m: int = dataclasses.field(
        default=0, metadata=dict(static=True))

    @property
    def shape(self) -> tuple[int, int]:
        return (self.in_features, self.out_features)

    @property
    def bits_per_weight(self) -> float:
        total = (self.qweight.size * 4 + self.scales.size * self.scales.dtype.itemsize
                 + self.mins.size * self.mins.dtype.itemsize) * 8
        if self.perm is not None:
            total += self.perm.size * 4 * 8
        weights = self.in_features * self.out_features
        if getattr(self.qweight, "ndim", 2) == 3:     # stacked [E, ...] experts
            weights *= self.qweight.shape[0]
        return total / weights


def _pack_k(q: np.ndarray, bits: int) -> np.ndarray:
    """Pack int rows along K into uint32 words: [K, N] → [K*bits/32, N]."""
    k, n = q.shape
    r = 32 // bits
    assert k % r == 0, (k, bits)
    q = q.astype(np.uint32) & ((1 << bits) - 1)
    q = q.reshape(k // r, r, n)
    words = np.zeros((k // r, n), dtype=np.uint32)
    for j in range(r):
        words |= q[:, j, :] << np.uint32(bits * j)
    return words


def unpack_k(words: np.ndarray, bits: int, signed: bool) -> np.ndarray:
    """Inverse of :func:`_pack_k` (numpy reference / test helper)."""
    kw, n = words.shape
    r = 32 // bits
    out = np.empty((kw, r, n), dtype=np.int32)
    mask = (1 << bits) - 1
    for j in range(r):
        vals = (words >> np.uint32(bits * j)) & mask
        vals = vals.astype(np.int32)
        if signed:
            vals = np.where(vals >= (1 << (bits - 1)), vals - (1 << bits), vals)
        out[:, j, :] = vals
    return out.reshape(kw * r, n)


def _finish(q_int: np.ndarray, scales: np.ndarray, mins: np.ndarray, *,
            bits: int, group_size: int, signed: bool, fmt: str,
            perm: Optional[np.ndarray] = None,
            scale_dtype=jnp.float32) -> QuantTensor:
    k, n = q_int.shape
    assert scales.shape == (k // group_size, n), (scales.shape, k, group_size, n)
    if bits == 4 and not signed:
        # Sign-bias the nibbles (q' = q - 8 stored as int4 two's complement,
        # i.e. n' = n XOR 8) so the Pallas kernel unpacks with a single
        # native u32→int4 bitcast; the +8 offset folds into the affine:
        # w = q·s − m = (q' + 8)·s − m = q'·s − (m − 8·s).
        q_int = np.bitwise_xor(q_int.astype(np.uint8), 8)
        mins = mins - 8.0 * scales
        signed = True
    return QuantTensor(
        qweight=jnp.asarray(_pack_k(q_int, bits)),
        scales=jnp.asarray(scales, dtype=scale_dtype),
        mins=jnp.asarray(mins, dtype=scale_dtype),
        perm=None if perm is None else jnp.asarray(perm, dtype=jnp.int32),
        bits=bits,
        group_size=group_size,
        signed=signed,
        in_features=k,
        out_features=n,
        fmt=fmt,
    )


# ---------------------------------------------------------------------------
# AWQ
# ---------------------------------------------------------------------------

def from_awq(qweight_u32: np.ndarray, scales: np.ndarray,
             qzeros_u32: np.ndarray, group_size: int) -> QuantTensor:
    """AWQ triplet → canonical.

    Inputs (HF-AWQ checkpoint layout, reference awq.rs:3-7):
      qweight [K, N/8] uint32 (AWQ interleaved nibbles along N)
      scales  [K/gs, N] (f16/f32)
      qzeros  [K/gs, N/8] uint32 (same interleave)
    """
    k, n8 = qweight_u32.shape
    n = n8 * 8
    # Unpack AWQ's interleaved N-packing → q [K, N].
    q = np.empty((k, n), dtype=np.uint8)
    for j in range(8):
        q[:, j::8] = (qweight_u32 >> AWQ_SHIFTS[j]).astype(np.uint32) & 0xF
    # Zeros share the interleave.
    g = qzeros_u32.shape[0]
    z = np.empty((g, n), dtype=np.float32)
    for j in range(8):
        z[:, j::8] = ((qzeros_u32 >> AWQ_SHIFTS[j]) & 0xF).astype(np.float32)
    s = scales.astype(np.float32)
    return _finish(q, s, s * z, bits=4, group_size=group_size, signed=False, fmt="awq")


# ---------------------------------------------------------------------------
# GPTQ
# ---------------------------------------------------------------------------

def from_gptq(qweight_u32: np.ndarray, scales: np.ndarray,
              qzeros_u32: np.ndarray, g_idx: Optional[np.ndarray],
              group_size: int, *, v2: bool = False) -> QuantTensor:
    """GPTQ group → canonical.

    Inputs (reference gptq.rs:3-11):
      qweight [K/8, N] uint32 (sequential 4-bit, K-packed — already our
               packing), qzeros [K/gs, N/8] uint32 (sequential, stored
               zero-1 in v1), scales [K/gs, N], g_idx [K] optional.

    desc-act checkpoints (non-trivial g_idx) are handled by stable-sorting
    rows by group so groups are contiguous; the activation side carries the
    permutation.
    """
    k8, n = qweight_u32.shape
    k = k8 * 8
    q = unpack_k(qweight_u32, 4, signed=False).astype(np.uint8)  # [K, N]

    g = qzeros_u32.shape[0]
    z = np.empty((g, n), dtype=np.float32)
    for j in range(8):
        z[:, j::8] = ((qzeros_u32 >> np.uint32(4 * j)) & 0xF).astype(np.float32)
    if not v2:
        z = z + 1.0  # classic GPTQ stores zero-1
    s = scales.astype(np.float32)

    perm = None
    if g_idx is not None:
        g_idx = np.asarray(g_idx, dtype=np.int64)
        trivial = np.arange(k) // group_size
        if not np.array_equal(g_idx, trivial):
            perm = np.argsort(g_idx, kind="stable").astype(np.int32)
            q = q[perm]
    return _finish(q, s, s * z, bits=4, group_size=group_size, signed=False,
                   fmt="gptq", perm=perm)


# ---------------------------------------------------------------------------
# GGUF / ggml block formats
# ---------------------------------------------------------------------------

def _ggml_to_int_grouped(raw, gt: GgmlType, n_rows: int, k: int):
    """Extract (q_int [rows, K], scales [rows, K/gs], mins, gs, bits, signed)
    from raw ggml blocks (blocks run along K within each row)."""
    if gt == GgmlType.Q8_0:
        b = _blocks(raw, 34)
        d = _f16(b[:, :2].copy())
        q = b[:, 2:].view(np.int8)
        return (q.reshape(n_rows, k), d.reshape(n_rows, k // 32),
                np.zeros((n_rows, k // 32), np.float32), 32, 8, True)
    if gt == GgmlType.Q4_0:
        b = _blocks(raw, 18)
        d = _f16(b[:, :2].copy())
        qs = b[:, 2:]
        q = np.concatenate([qs & 0x0F, qs >> 4], axis=1)
        return (q.reshape(n_rows, k), d.reshape(n_rows, k // 32),
                (8.0 * d).reshape(n_rows, k // 32), 32, 4, False)
    if gt == GgmlType.Q4_1:
        b = _blocks(raw, 20)
        d = _f16(b[:, :2].copy())
        m = _f16(b[:, 2:4].copy())
        qs = b[:, 4:]
        q = np.concatenate([qs & 0x0F, qs >> 4], axis=1)
        return (q.reshape(n_rows, k), d.reshape(n_rows, k // 32),
                (-m).reshape(n_rows, k // 32), 32, 4, False)
    if gt == GgmlType.Q4_K:
        b = _blocks(raw, 144)
        nb = b.shape[0]
        d = _f16(b[:, :2].copy())[:, 0]
        dmin = _f16(b[:, 2:4].copy())[:, 0]
        sc, mn = _k4_scale_min(b[:, 4:16])                # [nb, 8]
        qs = b[:, 16:]
        q = np.empty((nb, QK_K), dtype=np.uint8)
        for j in range(4):
            qrow = qs[:, j * 32 : j * 32 + 32]
            q[:, j * 64 : j * 64 + 32] = qrow & 0x0F
            q[:, j * 64 + 32 : j * 64 + 64] = qrow >> 4
        scales = (d[:, None] * sc).astype(np.float32)      # per 32-elem group
        mins = (dmin[:, None] * mn).astype(np.float32)
        return (q.reshape(n_rows, k), scales.reshape(n_rows, k // 32),
                mins.reshape(n_rows, k // 32), 32, 4, False)
    if gt == GgmlType.Q5_K:
        b = _blocks(raw, 176)
        nb = b.shape[0]
        d = _f16(b[:, :2].copy())[:, 0]
        dmin = _f16(b[:, 2:4].copy())[:, 0]
        sc, mn = _k4_scale_min(b[:, 4:16])
        qh = b[:, 16:48]
        ql = b[:, 48:]
        q = np.empty((nb, QK_K), dtype=np.uint8)
        for j in range(4):
            qrow = ql[:, j * 32 : j * 32 + 32]
            u1 = 1 << (2 * j)
            u2 = 2 << (2 * j)
            q[:, j * 64 : j * 64 + 32] = (qrow & 0x0F) + np.where((qh & u1) != 0, 16, 0).astype(np.uint8)
            q[:, j * 64 + 32 : j * 64 + 64] = (qrow >> 4) + np.where((qh & u2) != 0, 16, 0).astype(np.uint8)
        scales = (d[:, None] * sc).astype(np.float32)
        mins = (dmin[:, None] * mn).astype(np.float32)
        return (q.reshape(n_rows, k), scales.reshape(n_rows, k // 32),
                mins.reshape(n_rows, k // 32), 32, 8, True)
    if gt == GgmlType.Q6_K:
        b = _blocks(raw, 210)
        nb = b.shape[0]
        ql = b[:, :128]
        qh = b[:, 128:192]
        sc6 = b[:, 192:208].view(np.int8).astype(np.float32)
        d = _f16(b[:, 208:210].copy())[:, 0]
        q = np.empty((nb, QK_K), dtype=np.int8)
        for chunk in range(2):
            qlc = ql[:, chunk * 64 : chunk * 64 + 64]
            qhc = qh[:, chunk * 32 : chunk * 32 + 32]
            base = chunk * 128
            q[:, base : base + 32] = (((qlc[:, :32] & 0x0F) | (((qhc >> 0) & 3) << 4)).astype(np.int32) - 32).astype(np.int8)
            q[:, base + 32 : base + 64] = (((qlc[:, 32:] & 0x0F) | (((qhc >> 2) & 3) << 4)).astype(np.int32) - 32).astype(np.int8)
            q[:, base + 64 : base + 96] = (((qlc[:, :32] >> 4) | (((qhc >> 4) & 3) << 4)).astype(np.int32) - 32).astype(np.int8)
            q[:, base + 96 : base + 128] = (((qlc[:, 32:] >> 4) | (((qhc >> 6) & 3) << 4)).astype(np.int32) - 32).astype(np.int8)
        scales = (d[:, None] * sc6).astype(np.float32)     # per 16-elem group
        return (q.reshape(n_rows, k), scales.reshape(n_rows, k // 16),
                np.zeros((n_rows, k // 16), np.float32), 16, 8, True)
    if gt == GgmlType.Q2_K:
        b = _blocks(raw, 84)
        nb = b.shape[0]
        sc_field = b[:, :16]
        qs = b[:, 16:80]
        d = _f16(b[:, 80:82].copy())[:, 0]
        dmin = _f16(b[:, 82:84].copy())[:, 0]
        q = np.empty((nb, QK_K), dtype=np.uint8)
        for chunk in range(2):
            qchunk = qs[:, chunk * 32 : chunk * 32 + 32]
            for j in range(4):
                q[:, chunk * 128 + j * 32 : chunk * 128 + j * 32 + 32] = (qchunk >> (2 * j)) & 3
        scales = (d[:, None] * (sc_field & 0x0F).astype(np.float32))   # per 16
        mins = (dmin[:, None] * (sc_field >> 4).astype(np.float32))
        return (q.reshape(n_rows, k), scales.reshape(n_rows, k // 16),
                mins.reshape(n_rows, k // 16), 16, 2, False)
    if gt == GgmlType.Q3_K:
        b = _blocks(raw, 110)
        nb = b.shape[0]
        hmask = b[:, :32]
        qs = b[:, 32:96]
        sc16 = _q3k_unpack_scales(np.ascontiguousarray(b[:, 96:108])).astype(np.float32)
        d = _f16(b[:, 108:110].copy())[:, 0]
        q = np.empty((nb, QK_K), dtype=np.uint8)   # values 0..7 (bias 4)
        for chunk in range(2):
            qchunk = qs[:, chunk * 32 : chunk * 32 + 32]
            for j in range(4):
                mbit = 1 << (chunk * 4 + j)
                lo = (qchunk >> (2 * j)) & 3
                hi = np.where((hmask & mbit) != 0, 4, 0).astype(np.uint8)
                q[:, chunk * 128 + j * 32 : chunk * 128 + j * 32 + 32] = lo + hi
        scales = (d[:, None] * (sc16 - 32.0))             # per 16
        mins = 4.0 * scales                                # shift bias: w = s*q' - 4s
        return (q.reshape(n_rows, k), scales.reshape(n_rows, k // 16).astype(np.float32),
                mins.reshape(n_rows, k // 16).astype(np.float32), 16, 4, False)
    if gt == GgmlType.IQ4_NL:
        b = _blocks(raw, 18)
        d = _f16(b[:, :2].copy())
        qs = b[:, 2:]
        idx = np.concatenate([qs & 0x0F, qs >> 4], axis=1)
        q = KVALUES_IQ4NL.astype(np.int8)[idx]
        return (q.reshape(n_rows, k), d.reshape(n_rows, k // 32),
                np.zeros((n_rows, k // 32), np.float32), 32, 8, True)
    if gt == GgmlType.IQ4_XS:
        b = _blocks(raw, 136)
        nb = b.shape[0]
        d = _f16(b[:, :2].copy())[:, 0]
        scales_h = b[:, 2:4].copy().view(np.uint16)[:, 0].astype(np.uint32)
        scales_l = b[:, 4:8]
        qs = b[:, 8:]
        q = np.empty((nb, QK_K), dtype=np.int8)
        scales = np.empty((nb, 8), dtype=np.float32)
        for ib in range(8):
            ls = ((scales_l[:, ib // 2] >> (4 * (ib % 2))) & 0x0F).astype(np.uint32) | (
                ((scales_h >> (2 * ib)) & 3) << 4)
            scales[:, ib] = d * (ls.astype(np.float32) - 32.0)
            qrow = qs[:, ib * 16 : ib * 16 + 16]
            q[:, ib * 32 : ib * 32 + 16] = KVALUES_IQ4NL.astype(np.int8)[qrow & 0x0F]
            q[:, ib * 32 + 16 : ib * 32 + 32] = KVALUES_IQ4NL.astype(np.int8)[qrow >> 4]
        return (q.reshape(n_rows, k), scales.reshape(n_rows, k // 32),
                np.zeros((n_rows, k // 32), np.float32), 32, 8, True)
    if gt == GgmlType.TQ2_0:
        b = _blocks(raw, 66)
        nb = b.shape[0]
        qs = b[:, :64]
        d = _f16(b[:, 64:66].copy())[:, 0]
        q = np.empty((nb, QK_K), dtype=np.uint8)
        for j in range(0, 64, 32):
            for l in range(4):
                q[:, j * 4 + l * 32 : j * 4 + l * 32 + 32] = (qs[:, j : j + 32] >> (2 * l)) & 3
        scales = np.repeat(d[:, None], QK_K // 256, axis=1).astype(np.float32)
        return (q.reshape(n_rows, k), scales.reshape(n_rows, k // 256),
                scales.reshape(n_rows, k // 256).copy(), 256, 2, False)
    if gt == GgmlType.Q8_K:
        b = _blocks(raw, 292)
        d = b[:, :4].copy().view(np.float32)
        q = b[:, 4:260].view(np.int8)
        return (q.reshape(n_rows, k), d.reshape(n_rows, k // 256),
                np.zeros((n_rows, k // 256), np.float32), 256, 8, True)
    raise NotImplementedError(f"no canonical mapping for {gt.name}")


CANONICAL_GGML_TYPES = {
    GgmlType.Q8_0, GgmlType.Q4_0, GgmlType.Q4_1, GgmlType.Q4_K, GgmlType.Q5_K,
    GgmlType.Q6_K, GgmlType.Q2_K, GgmlType.Q3_K, GgmlType.IQ4_NL,
    GgmlType.IQ4_XS, GgmlType.TQ2_0, GgmlType.Q8_K,
}


def from_ggml(raw: bytes | memoryview, gt: GgmlType,
              shape: tuple[int, int]) -> QuantTensor:
    """GGUF tensor blocks → canonical. ``shape`` is the GGUF logical
    [N, K] (out, in); blocks run along K within each output row."""
    n, k = shape
    q_nk, s_nk, m_nk, gs, bits, signed = _ggml_to_int_grouped(raw, gt, n, k)
    # Transpose to our [K, N] convention.
    return _finish(
        np.ascontiguousarray(q_nk.T), np.ascontiguousarray(s_nk.T),
        np.ascontiguousarray(m_nk.T),
        bits=bits, group_size=gs, signed=signed, fmt=f"ggml_{gt.name.lower()}",
    )


# ---------------------------------------------------------------------------
# Reference dequant (numpy + jnp) — golden path for kernels and XLA fallback
# ---------------------------------------------------------------------------

def dequantize_np(qt: QuantTensor) -> np.ndarray:
    """Host-side dequant to f32 [K, N] in the *sorted* (physical) row order."""
    q = unpack_k(np.asarray(qt.qweight), qt.bits, qt.signed).astype(np.float32)
    s = np.repeat(np.asarray(qt.scales, dtype=np.float32), qt.group_size, axis=0)
    m = np.repeat(np.asarray(qt.mins, dtype=np.float32), qt.group_size, axis=0)
    return q * s - m


def unpack_jnp(qt: QuantTensor) -> jax.Array:
    """On-device unpack of the K-packed words → int32 [K, N] (signed
    values already de-biased when ``qt.signed``)."""
    r = 32 // qt.bits
    kw, n = qt.qweight.shape
    shifts = jnp.arange(r, dtype=jnp.uint32) * qt.bits
    mask = jnp.uint32((1 << qt.bits) - 1)
    vals = (qt.qweight[:, None, :] >> shifts[None, :, None]) & mask    # [K/r, r, N]
    vals = vals.astype(jnp.int32)
    if qt.signed:
        half = 1 << (qt.bits - 1)
        vals = jnp.where(vals >= half, vals - (1 << qt.bits), vals)
    return vals.reshape(kw * r, n)


def dequantize_jnp(qt: QuantTensor, dtype=jnp.float32) -> jax.Array:
    """On-device dequant to dense [K, N] (the XLA fallback compute path)."""
    q = unpack_jnp(qt).astype(jnp.float32)
    s = jnp.repeat(qt.scales, qt.group_size, axis=0)
    m = jnp.repeat(qt.mins, qt.group_size, axis=0)
    return (q * s - m).astype(dtype)


def widen_to_int8(qt: QuantTensor) -> QuantTensor:
    """4-bit → 8-bit storage widening for the int8-MXU serve path (W8A8).

    Same integer values, same scales/mins/affine — only the packing
    changes (2× HBM bytes). The payoff on TPU: the kernel's weight feed
    becomes a single free ``pltpu.bitcast(u32, int8)`` with **zero**
    per-element VPU work, where the int4 feed pays an unpack+convert op
    chain per element (the measured round-1 throughput floor,
    pallas/int_matmul.py PERF LOG). The TPU analogue of the reference
    choosing its dp4a int8 tier over bit-exact int4 CUDA unpack
    (/root/reference/src/README.md "Model Formats": optimized dp4a
    kernels for Q4_K/Q6_K/Q8_0)."""
    if qt.bits == 8 and qt.signed:
        return qt if qt.act_quant else dataclasses.replace(qt, act_quant=True)
    if qt.bits != 4 or not qt.signed:
        raise NotImplementedError(
            f"widen_to_int8: only signed 4-bit payloads (got bits={qt.bits} "
            f"signed={qt.signed})")
    q = unpack_jnp(qt)                                    # int32 [K, N]
    k, n = qt.in_features, qt.out_features
    b = (q.astype(jnp.uint32) & jnp.uint32(0xFF)).reshape(k // 4, 4, n)
    words = (b[:, 0] | (b[:, 1] << jnp.uint32(8))
             | (b[:, 2] << jnp.uint32(16)) | (b[:, 3] << jnp.uint32(24)))
    return dataclasses.replace(qt, qweight=words, bits=8, act_quant=True)


# Row threshold above which a matmul counts as "prefill-shaped": the
# int8-MXU kernel beats the fused int4→bf16 path from a few hundred rows
# up (r4 on-chip race, 7B gate/up shapes: 94 vs 77 TF/s at m=1024, 145
# vs 107 at m=4096), while decode (m ≤ max_batch) stays bit-exact on the
# bf16-MXU dequant path.
_PREFILL_A8_MIN_M = 256


def mark_act_quant(qt: QuantTensor, min_m: int = 0) -> QuantTensor:
    """Tag a signed 4/8-bit tensor for the int8-MXU kernel WITHOUT
    widening the storage (W4A8: int4 HBM stream + in-kernel int4→int8).
    ``min_m`` restricts the route to matmuls with at least that many
    rows (prefill-only act quant)."""
    if qt.act_quant and qt.act_quant_min_m == min_m:
        return qt
    if not qt.signed or qt.bits not in (4, 8):
        raise NotImplementedError(
            f"act-quant compute: only signed 4/8-bit payloads (got "
            f"bits={qt.bits} signed={qt.signed})")
    return dataclasses.replace(qt, act_quant=True, act_quant_min_m=min_m)


def apply_quant_compute(params, mode: Optional[str]):
    """Apply an ``inference.quant_compute`` mode to a param tree.

    ``w4a8`` tags signed int tensors for the int8-MXU kernel; ``w8a8``
    additionally widens 4-bit storage to int8 (see widen_to_int8);
    ``w4a8-prefill`` routes only prefill-shaped matmuls (≥
    ``_PREFILL_A8_MIN_M`` rows) through the int8 MXU — decode stays
    bit-exact. ``auto`` resolves to ``w4a8-prefill`` on TPU (the
    analogue of the reference preferring its dp4a int8 CUDA tier —
    README "Model Formats" — whose dp4a dot is likewise int8-activation
    compute) and to no-op elsewhere. ``w4a16``/None leave the tree
    untouched (bit-exact bf16-MXU dequant compute everywhere).
    Unsupported leaves (unsigned/2-bit payloads) pass through unchanged
    rather than failing the whole model."""
    if mode == "auto":
        from .matmul import _on_tpu

        mode = "w4a8-prefill" if _on_tpu() else None
    if mode in (None, "w4a16"):
        return params
    if mode not in ("w4a8", "w8a8", "w4a8-prefill"):
        raise ValueError(f"unknown quant_compute mode {mode!r}")

    def f(leaf):
        if (isinstance(leaf, QuantTensor) and leaf.signed
                and leaf.bits in (4, 8)
                and getattr(leaf.qweight, "ndim", 2) == 2):
            # Stacked [E, ...] expert tensors pass through unchanged —
            # the int8-MXU kernel serves 2-D weights; the MoE paths
            # dequantize per expert (widen_to_int8 would crash on 3-D).
            if mode == "w8a8":
                return widen_to_int8(leaf)
            if mode == "w4a8-prefill":
                return mark_act_quant(leaf, min_m=_PREFILL_A8_MIN_M)
            return mark_act_quant(leaf)
        return leaf

    return jax.tree.map(
        f, params,
        is_leaf=lambda x: isinstance(x, QuantTensor) or x is None)


def concat_n(qts: list["QuantTensor"]) -> "QuantTensor":
    """Concatenate QuantTensors along N (out_features) — used to fuse QKV /
    gate+up projections into one wide matmul (fewer kernel launches, bigger
    tiles). Requires identical K / bits / group_size / signedness / perm."""
    first = qts[0]
    for q in qts[1:]:
        assert (q.in_features, q.bits, q.group_size, q.signed) ==             (first.in_features, first.bits, first.group_size, first.signed)
        assert q.perm is None and first.perm is None
    return QuantTensor(
        qweight=jnp.concatenate([q.qweight for q in qts], axis=1),
        scales=jnp.concatenate([q.scales for q in qts], axis=1),
        mins=jnp.concatenate([q.mins for q in qts], axis=1),
        perm=None,
        bits=first.bits,
        group_size=first.group_size,
        signed=first.signed,
        in_features=first.in_features,
        out_features=sum(q.out_features for q in qts),
        fmt=first.fmt,
    )


# ---------------------------------------------------------------------------
# Stacked expert weights (MoE): QuantTensor with a leading [E] axis
# ---------------------------------------------------------------------------

def stack_quant(qts: list["QuantTensor"]) -> "QuantTensor":
    """Stack per-expert QuantTensors into one whose array fields carry a
    leading expert axis: qweight [E, K*bits/32, N], scales/mins [E, K/gs, N].

    The logical per-expert shape stays (in_features, out_features); slice
    experts back out with :func:`expert_slice`. This is the TPU answer to
    the reference's per-expert weight list (moe_offload.rs expert slices):
    one stacked HBM allocation that einsum/scan can index dynamically.
    """
    first = qts[0]
    for q in qts[1:]:
        assert (q.in_features, q.out_features, q.bits, q.group_size,
                q.signed) == (first.in_features, first.out_features,
                              first.bits, first.group_size, first.signed)
        assert q.perm is None and first.perm is None, \
            "desc-act (perm) expert weights cannot be stacked"
    return dataclasses.replace(
        first,
        qweight=jnp.stack([q.qweight for q in qts]),
        scales=jnp.stack([q.scales for q in qts]),
        mins=jnp.stack([q.mins for q in qts]),
        perm=None,
    )


def is_stacked(qt: "QuantTensor") -> bool:
    return isinstance(qt, QuantTensor) and qt.qweight.ndim == 3


def expert_slice(w, e):
    """Expert ``e`` from a stacked expert weight — dense [E, K, N] array or
    stacked QuantTensor. ``e`` may be a traced scalar (dynamic index)."""
    if isinstance(w, QuantTensor):
        return dataclasses.replace(
            w, qweight=w.qweight[e], scales=w.scales[e], mins=w.mins[e],
            perm=None)
    return w[e]


def dequantize_stack_jnp(qt: "QuantTensor", dtype=jnp.float32) -> jax.Array:
    """On-device dequant of a stacked expert QuantTensor → [E, K, N]."""
    def one(qw, sc, mn):
        return dequantize_jnp(
            dataclasses.replace(qt, qweight=qw, scales=sc, mins=mn,
                                perm=None), dtype)
    return jax.vmap(one)(qt.qweight, qt.scales, qt.mins)


def dequantize_stack_np(qt: "QuantTensor") -> np.ndarray:
    """Host-side dequant of a stacked expert QuantTensor → f32 [E, K, N]."""
    qw = np.asarray(qt.qweight)
    sc = np.asarray(qt.scales)
    mn = np.asarray(qt.mins)
    return np.stack([
        dequantize_np(dataclasses.replace(
            qt, qweight=qw[e], scales=sc[e], mins=mn[e], perm=None))
        for e in range(qw.shape[0])
    ])
