"""Quantized matmul dispatch: Pallas fused kernel on TPU, XLA fallback.

TPU-native equivalent of boostr's ``QuantMatmulOps`` (SURVEY §2.9): one
entry point the model layers call for ``x @ dequant(W)``. On TPU the hot
path is the fused Pallas dequant+matmul (``pallas/int_matmul.py``); on CPU
(tests) and for shapes the kernel does not cover, the XLA fallback
dequantizes on the fly and lets XLA fuse what it can — bit-identical
affine math either way.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .qtensor import QuantTensor, dequantize_jnp, unpack_jnp

# Env knobs are read PER CALL (not latched at import) so tests and
# benchmark scripts can monkeypatch them after blazr_tpu is imported —
# matching the BLAZR_TPU_STREAM_KERNEL knob's behavior.
def _force_xla() -> bool:
    return os.environ.get("BLAZR_TPU_FORCE_XLA_QUANT", "0") == "1"


def _force_pallas() -> bool:
    # Debug/verification knob: route through the Pallas kernel in
    # interpret mode even off-TPU (slow; exercises the real kernel path).
    return os.environ.get("BLAZR_TPU_FORCE_PALLAS_QUANT", "0") == "1"


def _xla_grouped() -> bool:
    # Experimental: grouped dequant-dot in pure XLA instead of the Pallas
    # kernel — rides XLA's own HBM streaming (tools/bench_quant_paths.py
    # decides whether this becomes the default).
    return os.environ.get("BLAZR_TPU_XLA_GROUPED", "0") == "1"


def _rows(x: jax.Array) -> int:
    n = 1
    for d in x.shape[:-1]:
        n *= d
    return n


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover
        return False


def quant_matmul(x: jax.Array, qt: QuantTensor) -> jax.Array:
    """``x [..., K] @ W_logical [K, N] → [..., N]``.

    Applies the activation permutation (GPTQ desc-act) before the kernel so
    the weight side stays group-contiguous.
    """
    if qt.perm is not None:
        x = jnp.take(x, qt.perm, axis=-1)

    # int8-MXU compute (W4A8/W8A8): tensors tagged by mark_act_quant /
    # widen_to_int8 (inference.quant_compute) carry dynamic per-row
    # activation quant through the int8 MXU — zero/one VPU op per weight
    # element vs the int4→bf16 convert chain (pallas PERF LOG). With
    # act_quant_min_m set (w4a8-prefill / auto-on-TPU), only
    # prefill-shaped matmuls take this route; decode (m ≤ max_batch)
    # stays on the bit-exact dequant path below. The row count is a
    # trace-time shape, so the dispatch is jit-static. The user-selected
    # compute mode outranks the experimental XLA-grouped knob below.
    if (qt.act_quant and _rows(x) >= qt.act_quant_min_m
            and not _force_xla() and (_on_tpu() or _force_pallas())):
        from .pallas.int_matmul import quant_matmul_int8mxu

        try:
            return quant_matmul_int8mxu(x, qt)
        except NotImplementedError:
            pass

    # Decode-regime only: the grouped path keeps [m, G, N] f32 partials
    # live (~1 GB at prefill sizes); prefill stays on the tiled kernel.
    if _xla_grouped() and _rows(x) <= 32:
        return quant_matmul_xla_grouped(x, qt)

    if not _force_xla() and (_on_tpu() or _force_pallas()):
        from .pallas.int_matmul import quant_matmul_pallas

        try:
            return quant_matmul_pallas(x, qt)
        except NotImplementedError:
            pass

    w = dequantize_jnp(qt, dtype=x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)


def quant_matmul_xla_grouped(x: jax.Array, qt: QuantTensor) -> jax.Array:
    """Grouped-affine dequant-dot expressed in pure XLA.

    Never materializes the dense f32/bf16 weight: the integer weight is
    converted group-wise inside a batched dot, the affine is applied to the
    group partials —
        y[m,n] = Σ_g s[g,n]·(Σ_{k∈g} x[m,k]·q[k,n]) − (Σ_{k∈g} x[m,k])·m[g,n]
    Exactly the kernel's math (same affine, f32 accumulation); the bet is
    that XLA's HBM pipelining of the int weight stream beats the Pallas
    auto-pipeline in the weight-bound decode regime.
    """
    lead = x.shape[:-1]
    k, n = qt.in_features, qt.out_features
    g = k // qt.group_size
    x2 = x.reshape(-1, k)
    m = x2.shape[0]

    # bf16 operands on the MXU; CPU XLA has no bf16 dot → f32 there.
    cdtype = jnp.bfloat16 if _on_tpu() else jnp.float32
    q = unpack_jnp(qt).astype(cdtype)                  # int values, exact
    qg = q.reshape(g, qt.group_size, n)
    xg = x2.astype(cdtype).reshape(m, g, qt.group_size)
    partial = jnp.einsum("mgk,gkn->mgn", xg, qg,
                         preferred_element_type=jnp.float32)   # [m, G, N]
    y = jnp.einsum("mgn,gn->mn", partial, qt.scales)
    y -= jnp.einsum("mg,gn->mn", xg.astype(jnp.float32).sum(-1), qt.mins)
    return y.astype(x.dtype).reshape(*lead, n)
