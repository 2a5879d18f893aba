"""LoRA adapter loading + hot-swappable registry.

TPU-native port of the reference LoRA module (src/engine/lora.rs:306):
HF-PEFT ``adapter_model.safetensors`` loading (lora_A [r, in] /
lora_B [out, r], alpha/r scaling), a thread-safe named registry for hot
load/unload, and application to a param tree (W' = W + scale·(A·B),
applied on the activation side for quantized weights so the base stays
packed).
"""

from __future__ import annotations

import json
import logging
import threading
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..formats.safetensors import SafeTensorsReader

logger = logging.getLogger(__name__)


@jax.tree_util.register_dataclass
@dataclass
class LoraLinear:
    """A quantized base weight plus an activation-side LoRA term.

    ``layers.linear`` computes ``x @ base + (x @ a) @ b`` — the base
    stays packed (merging W + s·BA would force dequantization)."""

    base: Any                     # QuantTensor (stays packed)
    a: jax.Array                  # [in, r]
    b: jax.Array                  # [r, out] (scale folded in)


@dataclass
class LoraAdapter:
    """One loaded adapter (reference LoraAdapter, lora.rs:32)."""

    name: str
    rank: int
    alpha: float
    # module path (e.g. "model.layers.0.self_attn.q_proj") → (A [r,in], B [out,r])
    weights: dict[str, tuple[np.ndarray, np.ndarray]]

    @property
    def scale(self) -> float:
        return self.alpha / self.rank

    def num_modules(self) -> int:
        return len(self.weights)


def load_lora_adapter(path: str | Path, name: Optional[str] = None) -> LoraAdapter:
    """Load a HF-PEFT adapter dir (reference load_lora_adapter, lora.rs:138)."""
    path = Path(path)
    cfg_path = path / "adapter_config.json"
    rank, alpha = 8, 16.0
    if cfg_path.exists():
        cfg = json.loads(cfg_path.read_text())
        rank = int(cfg.get("r", rank))
        alpha = float(cfg.get("lora_alpha", alpha))
    st = path / "adapter_model.safetensors"
    if not st.exists():
        raise FileNotFoundError(f"no adapter_model.safetensors in {path}")

    weights: dict[str, tuple[np.ndarray, np.ndarray]] = {}
    with SafeTensorsReader(st) as r:
        pairs: dict[str, dict[str, np.ndarray]] = {}
        for tname in r.tensor_names():
            # base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight
            if ".lora_A." in tname:
                key, part = tname.split(".lora_A."), "A"
            elif ".lora_B." in tname:
                key, part = tname.split(".lora_B."), "B"
            else:
                continue
            module = key[0].replace("base_model.model.", "")
            pairs.setdefault(module, {})[part] = r.load_numpy(tname).astype(np.float32)
    for module, ab in pairs.items():
        if "A" in ab and "B" in ab:
            weights[module] = (ab["A"], ab["B"])
    if not weights:
        raise ValueError(f"no LoRA weight pairs found in {st}")
    inferred_rank = next(iter(weights.values()))[0].shape[0]
    return LoraAdapter(name=name or path.name, rank=inferred_rank or rank,
                       alpha=alpha, weights=weights)


class LoraAdapterRegistry:
    """Thread-safe named registry (reference LoraAdapterRegistry, lora.rs:63)."""

    def __init__(self) -> None:
        self._adapters: dict[str, LoraAdapter] = {}
        self._lock = threading.Lock()

    def load(self, path: str | Path, name: Optional[str] = None) -> LoraAdapter:
        adapter = load_lora_adapter(path, name)
        with self._lock:
            self._adapters[adapter.name] = adapter
        logger.info("loaded LoRA adapter %r (rank=%d, %d modules)",
                    adapter.name, adapter.rank, adapter.num_modules())
        return adapter

    def get(self, name: str) -> Optional[LoraAdapter]:
        with self._lock:
            return self._adapters.get(name)

    def unload(self, name: str) -> bool:
        with self._lock:
            return self._adapters.pop(name, None) is not None

    def list(self) -> list[dict]:
        with self._lock:
            return [{"name": a.name, "rank": a.rank, "alpha": a.alpha,
                     "modules": a.num_modules()}
                    for a in self._adapters.values()]


# ---------------------------------------------------------------------------
# Application to a llama-family param tree
# ---------------------------------------------------------------------------

_MODULE_TO_KEY = {
    "q_proj": "q", "k_proj": "k", "v_proj": "v", "o_proj": "o",
    "gate_proj": "gate", "up_proj": "up", "down_proj": "down",
}


def _fused_slot(layer: dict, key: str, model_cfg) -> Optional[tuple[str, int, int]]:
    """(fused_key, out_offset, out_width) when ``key``'s projection lives
    inside a fused qkv / gateup weight, else None."""
    if model_cfg is None:
        return None
    att = getattr(model_cfg, "attention", None)
    if key in ("q", "k", "v") and layer.get("qkv") is not None and att:
        hd = att.resolved_head_dim(model_cfg.hidden_size)
        q_dim = att.num_heads * hd
        kv_dim = att.kv_heads() * hd
        off = {"q": 0, "k": q_dim, "v": q_dim + kv_dim}[key]
        width = q_dim if key == "q" else kv_dim
        return "qkv", off, width
    if key in ("gate", "up") and layer.get("gateup") is not None:
        inter = model_cfg.resolved_intermediate_size()
        return "gateup", (0 if key == "gate" else inter), inter
    return None


def merge_lora(params: dict[str, Any], adapter: LoraAdapter,
               model_cfg=None) -> dict[str, Any]:
    """Return params with LoRA deltas merged into dense weights.

    Quantized (QuantTensor) base weights get a :class:`LoraLinear`
    wrapper instead — ``layers.linear`` adds the (x·A)·B term on the
    activation side (the base stays packed; W + s·BA would force
    dequantization). Projections living inside fused qkv/gateup weights
    are addressed through their output slice (``model_cfg`` supplies the
    split offsets).
    """
    from ..quant.qtensor import QuantTensor

    new_params = dict(params)
    new_layers = [dict(l) for l in params["layers"]]
    new_params["layers"] = new_layers
    applied = 0
    for module, (a, b) in adapter.weights.items():
        parts = module.split(".")
        try:
            li = parts.index("layers") + 1
            layer_idx = int(parts[li])
            proj = parts[-1]
        except (ValueError, IndexError):
            continue
        key = _MODULE_TO_KEY.get(proj)
        if key is None or layer_idx >= len(new_layers):
            continue
        layer = new_layers[layer_idx]
        base = layer.get(key)
        b_scaled = b.T * adapter.scale                   # [r, out]
        if base is None:
            fused = _fused_slot(layer, key, model_cfg)
            if fused is None:
                continue
            fkey, off, width = fused
            fbase = layer[fkey]
            total = (fbase.base.out_features
                     if isinstance(fbase, LoraLinear)
                     else fbase.out_features
                     if isinstance(fbase, QuantTensor) else fbase.shape[-1])
            if b_scaled.shape[1] != width:
                logger.warning("LoRA %s: out dim %d != fused slice %d; skip",
                               module, b_scaled.shape[1], width)
                continue
            bf = np.zeros((b_scaled.shape[0], total), dtype=np.float32)
            bf[:, off : off + width] = b_scaled
            key, base, b_scaled = fkey, fbase, bf
        # delta in [in, out] orientation: (B @ A)^T = A^T @ B^T
        if isinstance(base, QuantTensor):
            layer[key] = LoraLinear(
                base=base, a=jnp.asarray(a.T), b=jnp.asarray(b_scaled))
        elif isinstance(base, LoraLinear):
            # Another module of THIS adapter targeting the same (fused)
            # weight: accumulate by widening the rank (merge always
            # starts from the clean base tree, so nothing stacks across
            # adapters).
            layer[key] = LoraLinear(
                base=base.base,
                a=jnp.concatenate([base.a, jnp.asarray(a.T)], axis=1),
                b=jnp.concatenate([base.b, jnp.asarray(b_scaled)], axis=0))
        else:
            delta = a.T @ b_scaled
            layer[key] = base + jnp.asarray(delta, dtype=base.dtype)
        applied += 1
    logger.info("merged LoRA %r into %d modules", adapter.name, applied)
    return new_params
