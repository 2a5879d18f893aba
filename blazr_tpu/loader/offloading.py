"""Device/host layer placement for models larger than device memory.

TPU-native port of the reference offloading loader
(src/loader/safetensors/offloading.rs): device-memory auto-detect
(:342-364), a layers-on-device budget reserving headroom for the KV cache
(:33, 2 GB), a ``LayerDeviceMap``, and host-staged loading. Like the
reference, full-speed inference requires full device residency — loading
with offload succeeds but building an executor over a partially-resident
model raises the same hard error (offloading.rs:170-183); host-resident
layers are streamed on demand only by the (slower) layers-range path.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

KV_RESERVE_BYTES = 2 << 30          # reference reserves 2 GB for KV (:33)


class DevicePlacement:
    DEVICE = "device"
    HOST = "host"


@dataclass
class LayerDeviceMap:
    """layer index → placement (reference LayerDeviceMap)."""

    placements: list[str]

    @classmethod
    def with_device_layers(cls, total_layers: int, device_layers: int
                           ) -> "LayerDeviceMap":
        device_layers = max(0, min(device_layers, total_layers))
        return cls([DevicePlacement.DEVICE] * device_layers +
                   [DevicePlacement.HOST] * (total_layers - device_layers))

    @property
    def num_device_layers(self) -> int:
        return sum(1 for p in self.placements if p == DevicePlacement.DEVICE)

    @property
    def fully_resident(self) -> bool:
        return self.num_device_layers == len(self.placements)

    def placement(self, layer: int) -> str:
        return self.placements[layer]


def device_free_memory() -> Optional[int]:
    """Free device (HBM) bytes, None if unknown
    (reference VRAM auto-detect, offloading.rs:342-364)."""
    try:
        import jax

        dev = jax.devices()[0]
        stats = dev.memory_stats() or {}
        limit = stats.get("bytes_limit")
        used = stats.get("bytes_in_use", 0)
        if limit:
            return int(limit) - int(used)
    except Exception:
        pass
    return None


def compute_device_layer_budget(per_layer_bytes: int, total_layers: int,
                                other_bytes: int = 0,
                                free_bytes: Optional[int] = None) -> int:
    """How many layers fit on device, reserving KV headroom."""
    if free_bytes is None:
        free_bytes = device_free_memory()
    if free_bytes is None:
        return total_layers
    budget = free_bytes - KV_RESERVE_BYTES - other_bytes
    if per_layer_bytes <= 0:
        return total_layers
    return max(0, min(total_layers, budget // per_layer_bytes))


def estimate_param_bytes(vm, num_layers: int) -> tuple[int, int]:
    """(per_layer_bytes, non_layer_bytes) from a VarMap's logical shapes."""
    from ..quant.qtensor import QuantTensor

    per_layer = 0
    other = 0
    for name in vm.names():
        w = vm.get(name)
        if isinstance(w, QuantTensor):
            nbytes = (w.qweight.size * 4 + w.scales.size * 4 + w.mins.size * 4)
        else:
            nbytes = int(np.prod(np.asarray(w).shape)) * 2   # bf16 on device
        if ".layers." in name:
            per_layer += nbytes
        else:
            other += nbytes
    per_layer = per_layer // max(num_layers, 1)
    return per_layer, other


class OffloadResidencyError(RuntimeError):
    """Raised when inference is attempted on a partially-resident model
    (reference hard error, offloading.rs:170-183)."""


def plan_offload(vm, num_layers: int, requested_device_layers: Optional[int]
                 = None) -> LayerDeviceMap:
    """Build the placement map (reference load_model_with_offloading)."""
    if requested_device_layers is not None:
        lm = LayerDeviceMap.with_device_layers(num_layers,
                                               requested_device_layers)
    else:
        per_layer, other = estimate_param_bytes(vm, num_layers)
        budget = compute_device_layer_budget(per_layer, num_layers, other)
        lm = LayerDeviceMap.with_device_layers(num_layers, budget)
    logger.info("layer placement: %d/%d on device",
                lm.num_device_layers, num_layers)
    return lm
