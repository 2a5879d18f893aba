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

from .qtensor import QuantTensor, dequantize_jnp

_FORCE_XLA = os.environ.get("BLAZR_TPU_FORCE_XLA_QUANT", "0") == "1"
# Debug/verification knob: route through the Pallas kernel in interpret
# mode even off-TPU (slow; exercises the real kernel code path).
_FORCE_PALLAS = os.environ.get("BLAZR_TPU_FORCE_PALLAS_QUANT", "0") == "1"


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

    if not _FORCE_XLA and (_on_tpu() or _FORCE_PALLAS):
        from .pallas.int_matmul import quant_matmul_pallas

        try:
            return quant_matmul_pallas(x, qt)
        except NotImplementedError:
            pass

    w = dequantize_jnp(qt, dtype=x.dtype)
    return jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
