"""Fused dequant + matmul Pallas kernel for grouped-affine int weights.

The heart of the TPU build (SURVEY §7 step 3; replaces boostr's CUDA
dp4a/int4 kernels). One kernel family serves every checkpoint format
because load time normalizes them all to the canonical layout
(``quant.qtensor``): K-packed uint32 words + per-group scale/min planes,
``w = q * s - m``.

Design notes (pallas_guide.md):
  * K-packing along the sublane axis means unpack is 32/bits shifted
    copies of the SAME [bk/r, bn] tile stacked on a new sublane axis —
    a reshape interleave, never a lane shuffle.
  * The nibble→bf16 conversion uses the exponent-bias trick: bits
    ``(134 << 7) | q`` make a bf16 with value ``128 + q`` exactly, so the
    integer→float convert is a cheap OR; the +128 offset folds into the
    affine ``mins`` plane at load... (here: folded at kernel entry via
    mins + 128*scales, computed once per tile).
  * Dequantized tiles feed a dense bf16 MXU matmul with f32 accumulation
    over the K grid axis.
  * Decode is weight-bound: the kernel streams qweight tiles through VMEM
    once; x (activations) is tiny and stays resident.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..qtensor import QuantTensor


def _unpack_tile(qw, bits: int, signed: bool, bk: int, bn: int):
    """[bk*bits/32, bn] u32 → [bk, bn] f32 integer values.

    For signed 4/8-bit payloads (every canonical format after load-time
    sign biasing) the unpack is ONE native bitcast — Mosaic expands the
    sublane axis ×(32/bits) in exactly our K-packed row order — plus a
    convert. The shift/mask loop remains only for 2-bit payloads.
    """
    if signed and bits == 4:
        return pltpu.bitcast(qw, jnp.int4).astype(jnp.float32)
    if signed and bits == 8:
        return pltpu.bitcast(qw, jnp.int8).astype(jnp.float32)
    r = 32 // bits
    mask = jnp.uint32((1 << bits) - 1)
    planes = [(qw >> jnp.uint32(bits * j)) & mask for j in range(r)]
    q = jnp.stack(planes, axis=1).reshape(bk, bn)      # row w*r+j ← plane j
    qi = q.astype(jnp.int32)
    if signed:
        half = 1 << (bits - 1)
        qi = jnp.where(qi >= half, qi - (1 << bits), qi)
    return qi.astype(jnp.float32)


def _interpret() -> bool:
    """Interpret mode only OFF the TPU — the remote plugin may expose the
    backend as 'axon'; the dispatcher (quant/matmul._on_tpu) treats both
    names as the real chip, and running the interpreter there would be a
    silent orders-of-magnitude slowdown."""
    return jax.default_backend() not in ("tpu", "axon")


def _qmm_kernel(x_ref, qw_ref, s_ref, m_ref, o_ref, acc_ref, *,
                bits: int, signed: bool, group_size: int,
                bk: int, bn: int, k_tiles: int):
    """Per-group matmul formulation: the affine scale/min never touch
    per-ELEMENT space —

        y += Σ_g (x_g @ q_g) ⊙ s_g  −  (Σ_k∈g x)_g ⊙ m_g

    so the only per-element VPU work is the native int4/int8 bitcast +
    one convert to bf16; scaling is a [bm, bn] FMA per group."""
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bm = x_ref.shape[0]
    if signed and bits == 4:
        q = pltpu.bitcast(qw_ref[...], jnp.int4).astype(jnp.bfloat16)
    elif signed and bits == 8:
        q = pltpu.bitcast(qw_ref[...], jnp.int8).astype(jnp.bfloat16)
    else:
        q = _unpack_tile(qw_ref[...], bits, signed, bk, bn).astype(jnp.bfloat16)
    s = s_ref[0]                                               # [gpb, bn] f32
    m = m_ref[0]
    gpb = bk // group_size

    x = x_ref[...].astype(jnp.bfloat16)                        # [bm, bk]
    # Per-group input sums for the min/offset term.
    xs = x.astype(jnp.float32).reshape(bm, gpb, group_size).sum(axis=2)

    # One batched matmul over groups (an unrolled per-group loop blows the
    # scoped-VMEM stack): partial[g] = x_g @ q_g, then scale per group.
    xg = x.reshape(bm, gpb, group_size).transpose(1, 0, 2)     # [gpb, bm, gs]
    qg = q.reshape(gpb, group_size, bn)                        # [gpb, gs, bn]
    partial = jax.lax.dot_general(
        xg, qg, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                    # [gpb, bm, bn]
    # Mosaic cannot lower this contraction as a dot; broadcast+sum is
    # cheap ([gpb, bm, bn] VPU elements).
    scaled = jnp.sum(partial * s[:, None, :], axis=0)
    offset = jnp.dot(xs, m, preferred_element_type=jnp.float32)  # [bm, bn]
    acc_ref[...] += scaled - offset

    @pl.when(pl.program_id(2) == k_tiles - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "signed", "group_size", "in_features",
                     "out_features", "bm", "bk", "bn", "out_dtype"),
)
def _qmm(x, qweight, scales, mins, *, bits, signed, group_size,
         in_features, out_features, bm, bk, bn, out_dtype):
    m = x.shape[0]
    k, n = in_features, out_features
    r = 32 // bits
    k_tiles = k // bk
    n_tiles = n // bn
    m_tiles = pl.cdiv(m, bm)

    grid = (m_tiles, n_tiles, k_tiles)
    kernel = functools.partial(
        _qmm_kernel, bits=bits, signed=signed, group_size=group_size,
        bk=bk, bn=bn, k_tiles=k_tiles,
    )
    flops = 2 * m * k * n
    bytes_accessed = (qweight.size * 4 + scales.size * scales.dtype.itemsize
                      + mins.size * mins.dtype.itemsize + x.size * x.dtype.itemsize)
    gpb = bk // group_size
    scales3 = scales.reshape(k_tiles, gpb, n)
    mins3 = mins.reshape(k_tiles, gpb, n)
    interpret = _interpret()
    return pl.pallas_call(
        kernel,
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, t: (i, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk // r, bn), lambda i, j, t: (t, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk // group_size, bn),
                         lambda i, j, t: (t, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk // group_size, bn),
                         lambda i, j, t: (t, 0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, t: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_tiles * bm, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0,
        ),
    )(x, qweight, scales3, mins3)


def _qmm_stream_kernel(x_ref, s_ref, mn_ref, qw_hbm, o_ref, *,
                       bits: int, group_size: int, bk: int, k_tiles: int,
                       n: int, nbuf: int):
    """Decode-path kernel with a MANUAL nbuf-deep DMA pipeline.

    The auto-pipelined kernel plateaus at ~40% of HBM BW on weight
    streaming (round-1 PERF LOG below); this variant takes the whole N
    dimension per chunk so every DMA is one fully-contiguous
    [bk/r, N] row-slab of the K-packed qweight, and keeps ``nbuf``
    copies in flight (pallas_guide.md §Double Buffering, generalized).
    Compute per chunk is identical to ``_qmm_kernel``'s per-group
    formulation.
    """
    r = 32 // bits
    bkr = bk // r
    gpb = bk // group_size
    bm = x_ref.shape[0]

    def body(bufs, acc_ref, sems):
        def get_dma(slot, t):
            return pltpu.make_async_copy(
                qw_hbm.at[pl.ds(t * bkr, bkr), :],
                bufs.at[slot],
                sems.at[slot],
            )

        for t0 in range(nbuf - 1):           # warm-up: nbuf-1 in flight
            @pl.when(t0 < k_tiles)
            def _():
                get_dma(t0, t0).start()

        acc_ref[...] = jnp.zeros_like(acc_ref)

        def loop_body(t, _):
            slot = jax.lax.rem(t, nbuf)
            ahead = t + nbuf - 1             # refill the slot freed at t-1
            @pl.when(ahead < k_tiles)
            def _():
                get_dma(jax.lax.rem(ahead, nbuf), ahead).start()
            get_dma(slot, t).wait()

            if bits == 4:
                q = pltpu.bitcast(bufs[slot], jnp.int4).astype(jnp.bfloat16)
            else:
                q = pltpu.bitcast(bufs[slot], jnp.int8).astype(jnp.bfloat16)
            x = x_ref[:, pl.ds(t * bk, bk)].astype(jnp.bfloat16)   # [bm, bk]
            xs = x.astype(jnp.float32).reshape(bm, gpb, group_size).sum(axis=2)
            xg = x.reshape(bm, gpb, group_size).transpose(1, 0, 2)
            qg = q.reshape(gpb, group_size, n)
            partial = jax.lax.dot_general(
                xg, qg, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)                # [gpb,bm,n]
            s = s_ref[t]                                           # [gpb, n]
            m = mn_ref[t]
            acc_ref[...] += (jnp.sum(partial * s[:, None, :], axis=0)
                             - jnp.sum(xs[:, :, None] * m[None], axis=1))
            return 0

        jax.lax.fori_loop(0, k_tiles, loop_body, 0)
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    pl.run_scoped(
        body,
        bufs=pltpu.VMEM((nbuf, bkr, n), jnp.uint32),
        acc_ref=pltpu.VMEM((bm, n), jnp.float32),
        sems=pltpu.SemaphoreType.DMA((nbuf,)),
    )


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "in_features", "out_features",
                     "bm", "bk", "nbuf", "out_dtype"),
)
def _qmm_stream(x, qweight, scales, mins, *, bits, group_size,
                in_features, out_features, bm, bk, nbuf, out_dtype):
    k, n = in_features, out_features
    k_tiles = k // bk
    gpb = bk // group_size
    scales3 = scales.reshape(k_tiles, gpb, n)
    mins3 = mins.reshape(k_tiles, gpb, n)
    kernel = functools.partial(
        _qmm_stream_kernel, bits=bits, group_size=group_size, bk=bk,
        k_tiles=k_tiles, n=n, nbuf=nbuf)
    return pl.pallas_call(
        kernel,
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),     # x  [bm, K]
            pl.BlockSpec(memory_space=pltpu.VMEM),     # scales3
            pl.BlockSpec(memory_space=pltpu.VMEM),     # mins3
            pl.BlockSpec(memory_space=pltpu.ANY),      # qweight stays in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bm, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bm * k * n,
            bytes_accessed=qweight.size * 4 + scales.size * 4 * 2,
            transcendentals=0,
        ),
    )(x, scales3, mins3, qweight)


def _qmm_int8_kernel(xq_ref, xs_ref, qw_ref, s_ref, m_ref, o_ref,
                     acc_ref, *, bits: int, group_size: int,
                     bk: int, bn: int, k_tiles: int):
    """int8-MXU matmul with per-group affine applied to the partials.

    The weight feed is a FREE bitcast for 8-bit payloads (zero VPU ops per
    element — the whole point, see PERF LOG: the int4→bf16 convert chain
    was the round-1 floor) and one int4→int8 convert for 4-bit payloads.
    Activations arrive pre-quantized (per-row symmetric int8, scale xs):

        y[i,n] = xs[i] · Σ_g [ s[g,n] · (Σ_{k∈g} xq[i,k]·q[k,n])
                               − (Σ_{k∈g} xq[i,k]) · m[g,n] ]

    The offset (mins) term reuses the quantized activations' group sums
    (computed in-kernel from xq — a separate exact-sums input would need a
    [bm, gpb] block, whose last dim violates the Mosaic (8,128) block
    rule), so both terms carry the same ~1/254 relative activation-quant
    error. MXU runs int8×int8→int32 (2× the bf16 rate on v5e+).
    """
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    bm = xq_ref.shape[0]
    gpb = bk // group_size
    if bits == 4:
        q = pltpu.bitcast(qw_ref[...], jnp.int4).astype(jnp.int8)
    else:
        q = pltpu.bitcast(qw_ref[...], jnp.int8)
    xq = xq_ref[...]
    xg = xq.reshape(bm, gpb, group_size).transpose(1, 0, 2)   # [gpb, bm, gs]
    qg = q.reshape(gpb, group_size, bn)                       # [gpb, gs, bn]
    partial = jax.lax.dot_general(
        xg, qg, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)                     # [gpb, bm, bn]
    s = s_ref[0]                                              # [gpb, bn]
    m = m_ref[0]
    # Group sums of the quantized activations for the mins/offset term.
    gsum = xq.astype(jnp.float32).reshape(bm, gpb, group_size).sum(axis=2)
    scaled = jnp.sum(partial.astype(jnp.float32) * s[:, None, :], axis=0)
    offset = jnp.dot(gsum, m, preferred_element_type=jnp.float32)
    acc_ref[...] += (scaled - offset) * xs_ref[...]

    @pl.when(pl.program_id(2) == k_tiles - 1)
    def _done():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "in_features", "out_features",
                     "bm", "bk", "bn", "out_dtype"),
)
def _qmm_int8(xq, xs, qweight, scales, mins, *, bits, group_size,
              in_features, out_features, bm, bk, bn, out_dtype):
    k, n = in_features, out_features
    k_tiles = k // bk
    n_tiles = n // bn
    m_tiles = pl.cdiv(xq.shape[0], bm)
    gpb = bk // group_size
    scales3 = scales.reshape(k_tiles, gpb, n)
    mins3 = mins.reshape(k_tiles, gpb, n)
    kernel = functools.partial(
        _qmm_int8_kernel, bits=bits, group_size=group_size,
        bk=bk, bn=bn, k_tiles=k_tiles)
    m = xq.shape[0]
    return pl.pallas_call(
        kernel,
        grid=(m_tiles, n_tiles, k_tiles),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, t: (i, t),
                         memory_space=pltpu.VMEM),             # xq int8
            pl.BlockSpec((bm, 1), lambda i, j, t: (i, 0),
                         memory_space=pltpu.VMEM),             # xs f32
            pl.BlockSpec((bk * bits // 32, bn), lambda i, j, t: (t, j),
                         memory_space=pltpu.VMEM),             # qweight u32
            pl.BlockSpec((1, gpb, bn), lambda i, j, t: (t, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gpb, bn), lambda i, j, t: (t, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, t: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_tiles * bm, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=qweight.size * 4 + scales.size * 8 + xq.size,
            transcendentals=0,
        ),
    )(xq, xs, qweight, scales3, mins3)


def quant_matmul_int8mxu(x: jax.Array, qt: QuantTensor) -> jax.Array:
    """``x [..., K] @ dequant(qt) → [..., N]`` via dynamic per-row int8
    activation quant + the int8-MXU kernel (W4A8 when qt.bits==4,
    W8A8 when the storage was widened — quant.qtensor.widen_to_int8)."""
    if not qt.signed or qt.bits not in (4, 8):
        raise NotImplementedError(
            f"int8-MXU path needs signed 4/8-bit (got {qt.bits}/{qt.signed})")
    k, n = qt.in_features, qt.out_features
    lead_shape = x.shape[:-1]
    m = int(np.prod(lead_shape)) if lead_shape else 1
    tiles = _choose_tiles(m, k, n, qt.bits, qt.group_size)
    if tiles is None:
        raise NotImplementedError(
            f"quant geometry not tiled: K={k} N={n} bits={qt.bits} "
            f"gs={qt.group_size}")
    bm, bk, bn = tiles

    x2 = x.reshape(m, k).astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x2), axis=1, keepdims=True)
    xs = jnp.maximum(absmax, 1e-30) / 127.0
    xq = jnp.clip(jnp.round(x2 / xs), -127, 127).astype(jnp.int8)

    pad = (-m) % bm
    if pad:
        xq = jnp.pad(xq, ((0, pad), (0, 0)))
        xs = jnp.pad(xs, ((0, pad), (0, 0)))

    out = _qmm_int8(
        xq, xs, qt.qweight,
        qt.scales.astype(jnp.float32), qt.mins.astype(jnp.float32),
        bits=qt.bits, group_size=qt.group_size,
        in_features=k, out_features=n, bm=bm, bk=bk, bn=bn,
        out_dtype=x.dtype,
    )
    return out[:m].reshape(*lead_shape, n)


def _largest_aligned_divisor(n: int, unit: int, cap: int) -> Optional[int]:
    """Largest multiple of ``unit`` that divides ``n`` and is ≤ cap."""
    if n % unit != 0:
        return None
    q = n // unit
    best = None
    d = 1
    while d * d <= q:
        if q % d == 0:
            for cand in (d, q // d):
                v = cand * unit
                if v <= cap and (best is None or v > best):
                    best = v
        d += 1
    return best


def _choose_tiles(m: int, k: int, n: int, bits: int, group_size: int
                  ) -> Optional[tuple[int, int, int]]:
    """Pick (bm, bk, bn) or None if shapes don't fit the kernel's
    constraints (fall back to XLA).

    Per-tile overhead dominates at small tiles (measured: bn 512→3584 took
    37%→>70% of HBM roofline), so bn is the largest 128-aligned divisor of
    N within the VMEM budget.
    """
    r = 32 // bits
    # bm: pad tiny decode batches up to the bf16 sublane tile.
    bm = 16 if m <= 16 else (32 if m <= 32 else 64 if m <= 64 else 128)
    for bk in (512, 256, 128):
        if k % bk == 0 and bk % r == 0 and bk % group_size == 0:
            break
    else:
        return None
    # VMEM-driven bn cap: q tile (bk×bn bf16 + f32 partials) ~ budget/8.
    cap = max(128, min(8192, (24 * 1024 * 1024) // (bk * 3)))
    cap = cap // 128 * 128
    bn = _largest_aligned_divisor(n, 128, cap)
    if bn is None:
        return None
    return bm, bk, bn


def quant_matmul_pallas(x: jax.Array, qt: QuantTensor) -> jax.Array:
    """``x [..., K] @ dequant(qt) [K, N] → [..., N]`` via the fused kernel.

    Raises NotImplementedError for unsupported geometry (dispatcher falls
    back to the XLA dequant path).
    """
    k, n = qt.in_features, qt.out_features
    lead_shape = x.shape[:-1]
    m = int(np.prod(lead_shape)) if lead_shape else 1
    tiles = _choose_tiles(m, k, n, qt.bits, qt.group_size)
    if tiles is None:
        raise NotImplementedError(
            f"quant geometry not tiled: K={k} N={n} bits={qt.bits} "
            f"gs={qt.group_size}")
    bm, bk, bn = tiles

    x2 = x.reshape(m, k)

    # Decode regime: weight-streaming bound → manual-DMA kernel (whole-N
    # contiguous slabs, nbuf-deep pipeline). Prefill keeps the tiled
    # auto-pipelined kernel (compute-bound, needs the n/k grid).
    # Opt-in until validated faster on real hardware (the tunnel died
    # mid-measurement; see PERF LOG).
    import os
    if (os.environ.get("BLAZR_TPU_STREAM_KERNEL") == "1"
            and m <= 32 and qt.signed and qt.bits in (4, 8)
            and n % 128 == 0 and k % bk == 0 and k // bk >= 2):
        sbm = 16 if m <= 16 else 32
        nbuf = 4
        bkr = bk // (32 // qt.bits)
        vmem_need = (nbuf * bkr * n * 4              # dma buffers
                     + 2 * (k // qt.group_size) * n * 4   # scale/min planes
                     + sbm * n * 4 + sbm * k * 2     # acc + x
                     + 3 * bk * n * 2)               # dequant + partials
        if vmem_need < 100 * 1024 * 1024:
            pad = (-m) % sbm
            xp = jnp.pad(x2, ((0, pad), (0, 0))) if pad else x2
            out = _qmm_stream(
                xp, qt.qweight, qt.scales.astype(jnp.float32),
                qt.mins.astype(jnp.float32),
                bits=qt.bits, group_size=qt.group_size, in_features=k,
                out_features=n, bm=sbm, bk=bk, nbuf=nbuf, out_dtype=x.dtype)
            return out[:m].reshape(*lead_shape, n)

    pad = (-m) % bm
    if pad:
        x2 = jnp.pad(x2, ((0, pad), (0, 0)))

    scales = qt.scales.astype(jnp.float32)
    mins = qt.mins.astype(jnp.float32)
    out = _qmm(
        x2, qt.qweight, scales, mins,
        bits=qt.bits, signed=qt.signed, group_size=qt.group_size,
        in_features=k, out_features=n, bm=bm, bk=bk, bn=bn,
        out_dtype=x.dtype,
    )
    out = out[:m]
    return out.reshape(*lead_shape, n)


# PERF NOTES (round 1, measured on v5e through the axon tunnel):
#   dense bf16 [1,4096]x[4096,14336]: ~152 us  (~770 GB/s, 94% of HBM BW)
#   this kernel same shape:           ~329 us  (~100 GB/s) — VPU-bound on
#   the unpack interleave (stack+reshape) and int→float converts.
# Next optimizations (in flight):
#   1. pltpu.bitcast(u32, int4): expands the SUBLANE dim ×8 in one op —
#      replaces the 8-plane shift/mask/stack with a single native unpack
#      (needs the nibble→row order check; tunnel died mid-experiment).
#   2. plane-contiguous repack at load (bk = 8·gs ⇒ plane j == group j):
#      scale application becomes a per-plane broadcast, no interleave.
#   3. W4A8: dynamic int8 activation quant + int8 MXU (2× rate), the
#      TPU analogue of the reference's dp4a path.


# PERF LOG (real v5e via axon tunnel, Mistral-7B AWQ-INT4 single-stream):
#   round-1 final: 99.5 tok/s per chip = 54% of the 183 tok/s HBM roofline
#   (full decode step incl. attention + sampling; matmul-only ~90 tok/s).
#   Tile sweep plateaus ~38-43% per-matmul regardless of (bk, bn) —
#   the int4→bf16 convert (~1 VPU op/element) is the suspected floor.
#   Round-2 candidates: int4/int8-native MXU feed (W4A8 with activation
#   quant), double-buffered manual DMA with convert overlap, bf16 scale
#   planes (−13% traffic).
#   Batched serving regime (B=8 decode, same weights): 281 tok/s aggregate
#   per chip (weight reads amortized across the batch).
#   bm 8 vs 16 and W4A8 (int8 MXU) all plateau ~100 us/matmul at 7B
#   shapes -> the cap is the Pallas auto-pipeline's effective HBM
#   streaming (~310-400 GB/s vs XLA's own 770 GB/s on dense bf16);
#   round 2: manual double-buffered DMA per the pallas guide pattern.
# ROUND-1 TAIL MEASUREMENTS (same chip, later session; chained 512-iter
# fori_loop, K=4096 N=14336):
#   dense bf16                m=16   97 us  (~1210 GB/s — chip streams
#                                            well above the v5e 819 spec)
#   auto-pipe (this kernel)   m=16  104 us  (~319 GB/s)   <- still fastest
#   manual-DMA stream kernel  m=16  122-146 us (nbuf=4, bk=1024/512)
#                             -> SLOWER than auto-pipe; stays opt-in/off.
#   xla int8 dequant-dot      m=1   131 us  (~462 GB/s over 2x the bytes)
#   xla grouped int4 einsum   m=1   773 us  (~38 GB/s — XLA materializes
#                             the [m,G,N] partials; BLAZR_TPU_XLA_GROUPED
#                             stays off)
# Verdict: keep the auto-pipelined kernel as default. The 97-vs-104 us
# dense gap means the kernel is only ~7% from DENSE wall time while
# reading 4x fewer weight bytes — the unpack/convert chain, not DMA, is
# the bottleneck. Round-2: native-int4 MXU feed / bitcast unpack.
#
# ROUND-2 MEASUREMENTS (fresh session, chained 256-iter fori_loop,
# K=4096 N=14336; tools/bench_int8_mxu.py + bench_tile_sweep.py):
#   dense bf16    m=16: 145.7 us (806 GB/s = chip spec; r1's "1210 GB/s"
#                 was a VMEM-residency artifact), m=1: 271 us (XLA's
#                 small-m path is 2x worse than m=16)
#   w4a16 (this kernel): 151-157 us across bk=512/1024/2048 — FLAT
#   w4a8  (int8 MXU, int4 stream): 135-154 us — FLAT
#   w8a8  (int8 MXU, FREE bitcast feed, zero VPU/elem): 177-191 us
#         across every (gs, bk, bn) incl. gpb=1 single-dot — FLAT
# Fitting fixed-cost + bytes/BW across w4/w8: F ≈ 120 us fixed,
# incremental streaming ≈ 1000 GB/s. The fixed cost matches the MXU
# systolic wave count: (K/128)·(N/128)·128 cycles / 4 MXUs at 940 MHz
# = 122 us — with m=16 rows the array pads the output-row wave to 128,
# so 87.5% of MXU capacity is dead and NOTHING about the weight feed
# (bytes, converts, group structure, tile sizes) moves the floor.
# int8 × int8 → int32 dots get NO rate doubling through Mosaic on this
# chip (w8a8 ≈ w4a16 wall time at 2x the bytes).
# CONCLUSIONS:
#   1. Single-stream decode (m ≤ 16) is MXU-WAVE-bound at ~100 tok/s for
#      7B on this chip — the HBM "roofline" (183 tok/s) is not reachable
#      by ANY weight-compression scheme at batch 1; W4A8/W8A8 stay
#      opt-in (no win to justify the activation-quant numerics).
#   2. The throughput lever is BATCH: MXU waves are ~constant in B up to
#      128 rows, so batched decode amortizes the floor across sequences.
#      Optimize the continuous-batching step (paged-attention kernel,
#      fused sampling, host-side batching overheads) instead of the
#      matmul feed.
# ROUND-2 CONFIRMATION (full-model decode, bench.py on the same chip):
#   B=1: 107.2 tok/s | B=8: 694.6 | B=16: 1194.3 | B=32: 1973.6 aggregate
#   (10.8x the B=1 HBM roofline; 62% of linear at B=32). The r1 batched
#   anomaly (B=8 only 2.8x) was the repeat_kv materialization in
#   attention — the grouped-GQA einsum fixed it. TTFT p50 56.5 ms warm.
# ROUND-3 WAVE-FLAT VALIDATION (bench.py sweep, same chip, 2026-08-19):
#   B=64 @ ctx512: 3549.6 tok/s aggregate — 1.80x the B=32 point, i.e.
#   per-step wall is still ~flat in B well past 32 rows, exactly the
#   MXU-wave prediction (output-row waves pad to 128; extra rows ride the
#   same waves). B=64@ctx1024 and B=128@ctx256 failed in the REMOTE
#   COMPILE helper (HTTP 500, logged in batch_sweep_errors) — an
#   infrastructure cap, not a chip limit; B>=64 serving should target
#   ctx<=512 KV budgets until the compile path handles the bigger
#   allocations. The B>32 regime is therefore EXPLOITABLE: the serving
#   engine's max_batch default stays 32 only for KV-memory headroom at
#   ctx 1024.
# ROUND-4 PREFILL-REGIME RACE (same chip, 2026-08-20; /tmp/mm_race.py,
# K=4096 N=28672 AWQ-int4 g128 — the 7B gateup shape):
#   m=1024:  dense bf16 88.1 TF/s | w4a16 fused 76.5 | xla dequant-dot
#            56.6 | W4A8 int8-MXU 94.3   <- int8 beats even dense
#   m=4096:  dense bf16 134.8     | w4a16 fused 107.4 | xla 115.6
#            | W4A8 int8-MXU 144.9
# At prefill row counts the MXU wave floor is gone (output rows fill the
# waves) and the int4->bf16 convert chain + bf16 MXU rate become the
# binds; int8 activations halve the convert work AND ride the faster
# int8 MXU issue rate: 1.23-1.35x the fused path. Hence quant_compute
# "auto" = w4a8-prefill on TPU (quant/qtensor.apply_quant_compute):
# matmuls with >= _PREFILL_A8_MIN_M rows ride the int8 MXU; decode
# (m <= max_batch, wave-bound, no win) stays bit-exact w4a16. Engine
# prefill measured flat ~6.3k tok/s (45% bf16 peak) before this change —
# the burst-TTFT p50 floor (half-burst prompt tokens / prefill rate) was
# 325 ms; the int8 tier moves the floor to ~265 ms.
