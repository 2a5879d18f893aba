"""Fused dequant+matmul Pallas kernel (placeholder — lands with the TPU
kernel milestone). The dispatcher falls back to XLA until then."""

from __future__ import annotations

import jax

from ..qtensor import QuantTensor


def quant_matmul_pallas(x: jax.Array, qt: QuantTensor) -> jax.Array:
    raise NotImplementedError("pallas int matmul kernel not yet implemented")
