"""MoE expert offload: hot/cold placement between HBM and host RAM.

TPU-native port of the reference MoE offload manager
(src/engine/moe_offload.rs + moe_offload_types.rs): per-layer expert
frequency tracking with decay, top-K hot-set rebalancing every
``rebalance_interval`` forward passes, and strategies resolved against
device memory (Auto/Device/Host/Hybrid — the reference's Gpu/Cpu/Hybrid/
Auto against VRAM, moe_offload_types.rs:55-102). Transfers move stacked
expert weight slices between host numpy and device arrays (the analogue
of get_expert_weights/set_expert_weights byte copies).
"""

from __future__ import annotations

import enum
import logging
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np

logger = logging.getLogger(__name__)


class OffloadStrategy(enum.Enum):
    AUTO = "auto"
    DEVICE = "gpu"        # reference name kept for config compat: all in HBM
    HOST = "cpu"          # all experts in host RAM
    HYBRID = "hybrid"     # hot set in HBM, cold in host RAM


def resolve_strategy(strategy: OffloadStrategy, expert_bytes_total: int,
                     device_free_bytes: Optional[int],
                     reserve_bytes: int = 2 << 30) -> OffloadStrategy:
    """AUTO → concrete strategy against available device memory
    (reference moe_offload_types.rs:55-102)."""
    if strategy != OffloadStrategy.AUTO:
        return strategy
    if device_free_bytes is None:
        return OffloadStrategy.DEVICE
    budget = device_free_bytes - reserve_bytes
    if expert_bytes_total <= budget:
        return OffloadStrategy.DEVICE
    if expert_bytes_total // 2 <= budget:
        return OffloadStrategy.HYBRID
    return OffloadStrategy.HOST


class ExpertFrequencyTracker:
    """Exponential-decay usage counts per (layer, expert)
    (reference ExpertFrequencyTracker, moe_offload.rs)."""

    def __init__(self, num_layers: int, num_experts: int, decay: float = 0.95):
        self.counts = np.zeros((num_layers, num_experts), dtype=np.float64)
        self.decay = decay
        self.steps = 0

    def record(self, layer: int, expert_ids) -> None:
        for e in np.atleast_1d(expert_ids).reshape(-1):
            self.counts[layer, int(e)] += 1.0

    def step(self) -> None:
        """One forward pass completed → decay window."""
        self.steps += 1
        self.counts *= self.decay

    def hot_set(self, layer: int, k: int) -> list[int]:
        """Top-K most-used experts for a layer."""
        order = np.argsort(-self.counts[layer], kind="stable")
        return [int(i) for i in order[:k]]


@dataclass
class ExpertPlacement:
    """Which experts are device-resident per layer."""

    on_device: list[set[int]]

    def is_on_device(self, layer: int, expert: int) -> bool:
        return expert in self.on_device[layer]


class MoeOffloadManager:
    """Tracks usage and rebalances the device-resident expert set
    (reference MoeOffloadManager, moe_offload.rs:36)."""

    def __init__(self, num_layers: int, num_experts: int,
                 device_experts_per_layer: int,
                 rebalance_interval: int = 64,
                 strategy: OffloadStrategy = OffloadStrategy.HYBRID):
        self.num_layers = num_layers
        self.num_experts = num_experts
        self.k = min(device_experts_per_layer, num_experts)
        self.rebalance_interval = rebalance_interval
        self.strategy = strategy
        self.tracker = ExpertFrequencyTracker(num_layers, num_experts)
        initial = set(range(self.k))
        self.placement = ExpertPlacement(
            on_device=[set(initial) for _ in range(num_layers)])
        self.transfers = 0
        self._since_rebalance = 0

    # ------------------------------------------------------------------
    def record_usage(self, layer: int, expert_ids) -> None:
        self.tracker.record(layer, expert_ids)

    def step(self) -> Optional[list[tuple[int, list[int], list[int]]]]:
        """Advance one forward pass; every ``rebalance_interval`` passes
        return the transfer plan [(layer, to_device, to_host), ...]
        (reference moe_offload_step, executor_cache.rs:235)."""
        self.tracker.step()
        self._since_rebalance += 1
        if self.strategy != OffloadStrategy.HYBRID:
            return None
        if self._since_rebalance < self.rebalance_interval:
            return None
        self._since_rebalance = 0
        return self.rebalance()

    def rebalance(self) -> list[tuple[int, list[int], list[int]]]:
        plan = []
        for layer in range(self.num_layers):
            want = set(self.tracker.hot_set(layer, self.k))
            have = self.placement.on_device[layer]
            to_device = sorted(want - have)
            to_host = sorted(have - want)
            if to_device or to_host:
                plan.append((layer, to_device, to_host))
                self.placement.on_device[layer] = want
                self.transfers += len(to_device) + len(to_host)
        if plan:
            logger.info("MoE rebalance: %d layers changed, %d total transfers",
                        len(plan), self.transfers)
        return plan

    # ------------------------------------------------------------------
    def apply_plan_to_params(self, moe_params: dict[str, Any], layer_plan,
                             host_store: dict) -> dict[str, Any]:
        """Execute a layer's transfer plan on stacked expert weights.

        ``host_store`` maps key → full host copy [E, ...]; device arrays
        keep only the device-resident experts' rows up to date. Cold
        experts compute from the host copy (gathered on demand)."""
        import jax
        import jax.numpy as jnp

        layer, to_device, to_host = layer_plan
        for key in ("experts_gate", "experts_up", "experts_down"):
            full_host = host_store[key]
            dev = moe_params[key]
            for e in to_device:
                dev = dev.at[e].set(jnp.asarray(full_host[e]))
            self.transfers += 0  # device→host copies are implicit (host kept)
            moe_params[key] = dev
        return moe_params
