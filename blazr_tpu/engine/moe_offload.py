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


# ---------------------------------------------------------------------------
# Runtime: the live wiring between jitted MoE forwards and the manager
# ---------------------------------------------------------------------------
#
# Device params hold a RESIDENT expert stack [K_res, ...] plus a
# ``resident_ids`` [K_res] map (slot → expert id). Inside the jitted
# forward, ``models.moe.moe_ffn_offload`` computes resident experts on
# device, reports routed expert ids through ``io_callback``, and computes
# cold-expert contributions on host via ``pure_callback`` against this
# runtime's RAM mirror. The executor calls :meth:`OffloadRuntime.tick`
# once per forward pass; every ``rebalance_interval`` passes the hot set
# is recomputed and resident rows are swapped in place (reference drives
# the same cycle from executor_cache.rs:235-348).

_EXPERT_KEYS = ("experts_gate", "experts_up", "experts_down")
_RUNTIMES: dict[int, "OffloadRuntime"] = {}
_NEXT_RUNTIME_KEY = [1]


def _silu_np(x: np.ndarray) -> np.ndarray:
    return x / (1.0 + np.exp(-x))


def _record_usage_cb(rt_layer, topk_idx) -> None:
    rt = _RUNTIMES.get(int(np.asarray(rt_layer)[0]))
    if rt is not None:
        rt.manager.record_usage(int(np.asarray(rt_layer)[1]),
                                np.asarray(topk_idx))


def _cold_compute_cb(rt_layer, x, cold_w) -> np.ndarray:
    """Host compute of Σ_e cold_w[:, e]·expert_e(x) for non-resident
    experts (f32 numpy — the CPU tier of the hybrid placement)."""
    x = np.asarray(x, dtype=np.float32)
    cold_w = np.asarray(cold_w, dtype=np.float32)
    out = np.zeros_like(x)
    rt = _RUNTIMES.get(int(np.asarray(rt_layer)[0]))
    if rt is None:
        return out
    layer = int(np.asarray(rt_layer)[1])
    gate, up, down = rt.dense_experts(layer)
    for e in np.nonzero(np.any(cold_w != 0.0, axis=0))[0]:
        rows = np.nonzero(cold_w[:, e])[0]
        xe = x[rows]
        a = _silu_np(xe @ gate[e]) * (xe @ up[e])
        out[rows] += cold_w[rows, e][:, None] * (a @ down[e])
    rt.cold_accesses += 1
    return out


class OffloadRuntime:
    """Host side of MoE expert offload for one loaded model."""

    def __init__(self, manager: MoeOffloadManager):
        self.key = _NEXT_RUNTIME_KEY[0]
        _NEXT_RUNTIME_KEY[0] += 1
        self.manager = manager
        self.host: dict[int, dict[str, Any]] = {}     # layer → key → host stack
        self.resident: dict[int, list[int]] = {}      # layer → slot → expert
        self._dense_cache: dict[int, tuple] = {}
        self.cold_accesses = 0
        _RUNTIMES[self.key] = self

    def close(self) -> None:
        _RUNTIMES.pop(self.key, None)

    # -- host mirror access -------------------------------------------------
    def dense_experts(self, layer: int):
        """f32 dense [E, H, I]/[E, I, H] stacks for host compute (lazily
        dequantized from the mirror and cached)."""
        if layer not in self._dense_cache:
            from ..quant.qtensor import QuantTensor, dequantize_stack_np

            def densify(w):
                if isinstance(w, QuantTensor):
                    return dequantize_stack_np(w)
                return np.asarray(w, dtype=np.float32)

            store = self.host[layer]
            self._dense_cache[layer] = tuple(
                densify(store[k]) for k in _EXPERT_KEYS)
        return self._dense_cache[layer]

    # -- per-forward drive --------------------------------------------------
    def tick(self, params: dict[str, Any]) -> int:
        """Advance one forward pass; execute any rebalance plan by
        swapping resident rows in place. Returns transfers executed."""
        import jax
        import jax.numpy as jnp

        plan = self.manager.step()
        if not plan:
            return 0
        moved = 0
        for layer, to_device, to_host in plan:
            p = params["layers"][layer]["moe"]
            res = self.resident[layer]
            slots, incoming = [], []
            for out_e, in_e in zip(to_host, to_device):
                slot = res.index(out_e)
                res[slot] = in_e
                slots.append(slot)
                incoming.append(in_e)
                moved += 1
            if slots:
                # ONE batched scatter per key — .at[slot].set inside the
                # pair loop copied the whole resident stack per swapped
                # expert, multiplying rebalance latency and transient HBM
                # by the number of swaps.
                idx = jnp.asarray(slots, dtype=jnp.int32)
                for key in _EXPERT_KEYS:
                    p[key] = jax.tree.map(
                        lambda dev, host: dev.at[idx].set(
                            jnp.asarray(host[np.asarray(incoming)])),
                        p[key], self.host[layer][key])
            p["resident_ids"] = jnp.asarray(res, dtype=jnp.int32)
        return moved


def _device_free_bytes() -> Optional[int]:
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"]) - int(stats.get("bytes_in_use", 0))
    except Exception:
        pass
    return None


def install_offload(params: dict[str, Any], model_cfg,
                    inference_cfg) -> tuple[dict[str, Any],
                                            Optional[OffloadRuntime]]:
    """Transform loaded params for expert offload per
    ``inference.moe_offload`` (auto|gpu|cpu|hybrid — reference strategy
    names, moe_offload_types.rs:55-102). Returns (params, runtime);
    runtime is None when everything stays device-resident."""
    import jax
    import jax.numpy as jnp

    moe_cfg = getattr(model_cfg, "moe", None)
    layers = params.get("layers") or []
    moe_layers = [i for i, lp in enumerate(layers)
                  if isinstance(lp, dict) and lp.get("moe") is not None]
    if moe_cfg is None or not moe_layers:
        return params, None

    strategy = OffloadStrategy(inference_cfg.moe_offload)
    expert_bytes = 0
    for i in moe_layers:
        for key in _EXPERT_KEYS:
            expert_bytes += sum(
                leaf.size * leaf.dtype.itemsize
                for leaf in jax.tree.leaves(layers[i]["moe"][key]))
    strategy = resolve_strategy(strategy, expert_bytes, _device_free_bytes())
    if strategy == OffloadStrategy.DEVICE:
        return params, None

    e = moe_cfg.num_experts
    k_res = (inference_cfg.moe_device_experts
             or getattr(inference_cfg, "moe_gpu_experts", None))
    if k_res is None:
        # HOST keeps the minimum on device (top-1 hot expert per layer);
        # HYBRID keeps half.
        k_res = 1 if strategy == OffloadStrategy.HOST else max(1, e // 2)
    k_res = max(1, min(int(k_res), e))
    if k_res >= e:
        return params, None

    manager = MoeOffloadManager(
        num_layers=len(layers), num_experts=e,
        device_experts_per_layer=k_res,
        rebalance_interval=inference_cfg.moe_rebalance_interval,
        strategy=OffloadStrategy.HYBRID)
    rt = OffloadRuntime(manager)

    resident0 = list(range(k_res))
    for i in moe_layers:
        p = layers[i]["moe"]
        rt.host[i] = {
            key: jax.tree.map(np.asarray, p[key]) for key in _EXPERT_KEYS}
        rt.resident[i] = list(resident0)
        for key in _EXPERT_KEYS:
            p[key] = jax.tree.map(
                lambda host: jnp.asarray(host[np.asarray(resident0)]),
                rt.host[i][key])
        p["resident_ids"] = jnp.asarray(resident0, dtype=jnp.int32)
        p["offload_rt"] = jnp.asarray([rt.key, i], dtype=jnp.int32)
    logger.info(
        "MoE offload active (%s): %d/%d experts device-resident per layer, "
        "%d MoE layers, %.2f GB expert weights",
        strategy.value, k_res, e, len(moe_layers), expert_bytes / 1e9)
    return params, rt
