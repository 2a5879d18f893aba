"""VarMap: the name → weight store filled by checkpoint loaders.

TPU-native equivalent of boostr's ``VarMap``/``VarBuilder`` (SURVEY §2.9
"Formats" row): loaders normalize every checkpoint format into a flat
dict of HF-convention names mapping to either a dense numpy array or a
canonical :class:`~blazr_tpu.quant.qtensor.QuantTensor`; model builders
then ``take`` what they need and place it on device.
"""

from __future__ import annotations

import re
from pathlib import Path
from typing import Callable, Optional, Union

import numpy as np

from ..config.model_config import UniversalConfig
from ..formats.detect import read_quant_group_size
from ..formats.gguf import Gguf, GgmlType
from ..formats.ggml_quants import dequantize_ggml
from ..formats.names import gguf_to_hf_name
from ..formats.safetensors import SafeTensorsReader
from ..quant.qtensor import (
    CANONICAL_GGML_TYPES,
    QuantTensor,
    from_awq,
    from_ggml,
    from_gptq,
)

Weight = Union[np.ndarray, QuantTensor]


class VarMap:
    """Flat tensor-name → weight store with HF-convention names."""

    def __init__(self) -> None:
        self._store: dict[str, Weight] = {}

    def insert(self, name: str, value: Weight) -> None:
        self._store[name] = value

    def get(self, name: str, default=None) -> Optional[Weight]:
        return self._store.get(name, default)

    def take(self, name: str) -> Weight:
        """Remove and return (frees host memory as weights move to device)."""
        return self._store.pop(name)

    def __contains__(self, name: str) -> bool:
        return name in self._store

    def __len__(self) -> int:
        return len(self._store)

    def names(self) -> list[str]:
        return sorted(self._store)

    def merge(self, other: "VarMap") -> None:
        self._store.update(other._store)

    def logical_shape(self, name: str) -> tuple[int, ...]:
        """Shape in HF orientation ([out, in] for linear weights)."""
        w = self._store[name]
        if isinstance(w, QuantTensor):
            return (w.out_features, w.in_features)
        return w.shape


# ---------------------------------------------------------------------------
# SafeTensors loaders (plain / AWQ / GPTQ)
# ---------------------------------------------------------------------------

def varmap_from_safetensors(path: str | Path) -> VarMap:
    """Load a plain (fp) SafeTensors checkpoint
    (reference src/loader/safetensors/regular.rs)."""
    vm = VarMap()
    with SafeTensorsReader(path) as r:
        for name in r.tensor_names():
            vm.insert(name, r.load_numpy(name))
    return vm


def varmap_from_awq(path: str | Path, group_size: Optional[int] = None) -> VarMap:
    """Load an AWQ checkpoint: .qweight/.qzeros/.scales triplets become
    QuantTensors stored under ``base.weight``
    (reference src/loader/safetensors/awq.rs:108-125)."""
    path = Path(path)
    model_dir = path if path.is_dir() else path.parent
    if group_size is None:
        group_size = read_quant_group_size(model_dir)
    vm = VarMap()
    with SafeTensorsReader(path) as r:
        names = r.tensor_names()
        bases = {n[: -len(".qweight")] for n in names if n.endswith(".qweight")}
        for name in names:
            if any(name.endswith(suf) for suf in (".qweight", ".qzeros", ".scales")):
                continue
            vm.insert(name, r.load_numpy(name))
        for base in sorted(bases):
            qw = r.load_numpy(base + ".qweight", dtype=np.uint32)
            sc = r.load_numpy(base + ".scales").astype(np.float32)
            qz = r.load_numpy(base + ".qzeros", dtype=np.uint32)
            vm.insert(base + ".weight", from_awq(qw, sc, qz, group_size))
    return vm


def varmap_from_gptq(path: str | Path, group_size: Optional[int] = None,
                     v2: bool = False) -> VarMap:
    """Load a GPTQ checkpoint: 5-tensor groups become QuantTensors
    (reference src/loader/safetensors/gptq.rs:102-125)."""
    path = Path(path)
    model_dir = path if path.is_dir() else path.parent
    if group_size is None:
        group_size = read_quant_group_size(model_dir)
    vm = VarMap()
    with SafeTensorsReader(path) as r:
        names = set(r.tensor_names())
        bases = {n[: -len(".qweight")] for n in names if n.endswith(".qweight")}
        for name in sorted(names):
            if any(name.endswith(s) for s in (".qweight", ".qzeros", ".scales", ".g_idx")):
                continue
            if name.endswith(".bias") and name[: -len(".bias")] in bases:
                vm.insert(name, r.load_numpy(name).astype(np.float32))
                continue
            vm.insert(name, r.load_numpy(name))
        for base in sorted(bases):
            qw = r.load_numpy(base + ".qweight", dtype=np.uint32)
            sc = r.load_numpy(base + ".scales").astype(np.float32)
            qz = r.load_numpy(base + ".qzeros", dtype=np.uint32)
            gi = (r.load_numpy(base + ".g_idx", dtype=np.int32)
                  if base + ".g_idx" in names else None)
            if gi is not None:
                gi = gi.reshape(-1)
            vm.insert(base + ".weight", from_gptq(qw, sc, qz, gi, group_size, v2=v2))
    return vm


# ---------------------------------------------------------------------------
# GGUF loader
# ---------------------------------------------------------------------------

# Tensors that must be dense (gathered / broadcast) even when quantized in
# the file: embeddings and norms.
_DENSE_PATTERNS = re.compile(
    r"(embed_tokens|token_embd|norm|layernorm|ln_|_bias|\.bias|A_log|\.D\b)", re.IGNORECASE
)


def varmap_from_gguf(path: str | Path, keep_quantized: bool = True) -> VarMap:
    """Load a GGUF checkpoint with GGUF→HF name mapping
    (reference boostr VarMap::from_gguf, used at src/loader/gguf.rs:32-34).

    2-D weights in canonical-capable quant formats stay quantized
    (QuantTensor); embeddings/norms and exotic formats dequantize to dense
    float32.
    """
    vm = VarMap()
    with Gguf.open(path) as g:
        # Grid-coded IQ tensors decode through curated codebooks; without
        # the official tables an external file would load to silently
        # wrong weights — fail loud instead (iq_quants.check_grid_interop).
        from ..formats.iq_quants import (IQ_GRID_TYPES, IQ_GRIDS_META_KEY,
                                         check_grid_interop)

        if any(g.tensor_info(n).ggml_type in IQ_GRID_TYPES
               for n in g.tensor_names()):
            check_grid_interop(g.metadata().kv.get(IQ_GRIDS_META_KEY),
                               f"GGUF file {path}")
        for name in g.tensor_names():
            info = g.tensor_info(name)
            hf_name = gguf_to_hf_name(name)
            gt = info.ggml_type
            is_dense_target = (
                len(info.shape) != 2
                or gt in (GgmlType.F32, GgmlType.F16, GgmlType.BF16)
                or _DENSE_PATTERNS.search(hf_name) is not None
            )
            if keep_quantized and not is_dense_target and gt in CANONICAL_GGML_TYPES:
                vm.insert(hf_name, from_ggml(g.tensor_bytes(name), gt, info.shape))
            else:
                vm.insert(hf_name, dequantize_ggml(g.tensor_bytes(name), gt, info.shape))
    return vm
