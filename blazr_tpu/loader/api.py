"""Unified model-loading API.

TPU-native equivalent of the reference's loader facade
(src/loader/api.rs:20-114): auto-detect format (SafeTensors plain/AWQ/GPTQ
or GGUF), build the UniversalConfig (config.json → GGUF metadata →
tensor-name sniffing priority chain, src/loader/safetensors/config.rs:30-57),
fill a VarMap, and build the Model.
"""

from __future__ import annotations

import json
import logging
from pathlib import Path
from typing import Optional

import jax.numpy as jnp

from ..config.app import AppConfig, parse_dtype
from ..config.model_config import UniversalConfig, universal_from_hf_config
from ..formats.detect import ModelFormat, ModelSource, QuantMethod, detect_model_source
from ..formats.detect_arch import detect_architecture_from_names, infer_config_from_shapes
from ..formats.gguf import Gguf
from ..models.registry import Model, build_model
from .gguf_config import universal_from_gguf_metadata
from .varmap import (
    VarMap,
    varmap_from_awq,
    varmap_from_gguf,
    varmap_from_gptq,
    varmap_from_safetensors,
)

logger = logging.getLogger(__name__)


def load_varmap(source: ModelSource) -> VarMap:
    if source.format == ModelFormat.GGUF:
        vm = varmap_from_gguf(source.path)
    elif source.quant == QuantMethod.AWQ:
        vm = varmap_from_awq(source.path)
    elif source.quant == QuantMethod.GPTQ:
        vm = varmap_from_gptq(source.path)
    else:
        vm = varmap_from_safetensors(source.path)
    # HF multimodal (LLaVA) checkpoints nest the LLM under "language_model.";
    # strip it so the text builders see canonical names.
    lm_names = [n for n in vm.names() if n.startswith("language_model.")]
    for n in lm_names:
        vm.insert(n[len("language_model."):], vm.take(n))
    return vm


def resolve_config(source: ModelSource, vm: Optional[VarMap] = None) -> AppConfig:
    """Config priority chain (reference safetensors/config.rs:30-57):
    explicit config.json (ours or HF) → GGUF metadata → shape inference."""
    if source.config_path is not None:
        raw = json.loads(Path(source.config_path).read_text())
        if "inference" in raw or "generation" in raw:
            return AppConfig.from_dict(raw)         # our flattened AppConfig
        cfg = AppConfig()
        cfg.model = universal_from_hf_config(raw)
        if source.quant in (QuantMethod.AWQ, QuantMethod.GPTQ):
            cfg.inference.dtype = "f16"             # quant scales are f16
        return cfg

    if source.format == ModelFormat.GGUF:
        with Gguf.open(source.path) as g:
            model = universal_from_gguf_metadata(g.metadata())
        return AppConfig.from_universal_with_dtype(model, "bf16")

    # Last resort: sniff architecture + dims from tensor names/shapes.
    assert vm is not None, "shape inference needs a loaded VarMap"
    names = vm.names()
    detected = detect_architecture_from_names(names)
    model = infer_config_from_shapes(names, vm.logical_shape, detected)
    return AppConfig.from_universal_with_dtype(model, "bf16")


def load_model(path: str | Path, dtype: Optional[str] = None,
               device_layers: Optional[int] = None,
               mmproj: Optional[str] = None) -> tuple[Model, AppConfig]:
    """Auto-detect and load a model (reference api.rs:20-34).

    ``device_layers`` caps how many decoder layers stay device-resident
    (reference n-gpu-layers); the remainder live in host RAM and stream
    per step via ``engine.offload_stream.StreamingModel``.
    ``mmproj`` points at a GGUF vision-projector sidecar (auto-detected
    when colocated; reference loader/vision.rs).
    """
    source = detect_model_source(path)
    logger.info("Loading %s model from %s (quant=%s)",
                source.format.value, source.path, source.quant.value)
    vm = load_varmap(source)
    app_cfg = resolve_config(source, vm)
    if dtype is not None:
        app_cfg.inference.dtype = dtype
    if device_layers is None:
        device_layers = app_cfg.inference.num_device_layers
    # Fill holes in the config from actual tensor shapes (e.g. vocab pad).
    _reconcile_config_with_weights(app_cfg.model, vm)
    model = build_model(app_cfg.model, vm, dtype=parse_dtype(app_cfg.inference.dtype))
    # Vision tower: mmproj sidecar or in-checkpoint tower
    # (reference loader/vision.rs:25-95).
    from .vision import attach_vision

    attach_vision(model, app_cfg.model, source.path, vm, mmproj_path=mmproj)
    if device_layers is not None and device_layers < model.num_layers:
        from ..engine.offload_stream import maybe_stream
        from .offloading import LayerDeviceMap

        lm = LayerDeviceMap.with_device_layers(model.num_layers,
                                               device_layers)
        app_cfg.inference.num_device_layers = device_layers
        model = maybe_stream(model, lm)
    return model, app_cfg


def _reconcile_config_with_weights(model_cfg: UniversalConfig, vm: VarMap) -> None:
    for name in ("model.embed_tokens.weight", "embed_tokens.weight"):
        if name in vm:
            v, h = vm.logical_shape(name)
            if model_cfg.vocab_size != v:
                logger.info("vocab_size %d → %d (from embed shape)",
                            model_cfg.vocab_size, v)
                model_cfg.vocab_size = v
            model_cfg.hidden_size = h
            break
