"""Top-level application config.

TPU-native equivalent of the reference BlazrConfig
(src/config/blazr.rs:36-52): a serde-flattened model UniversalConfig plus
``inference``, ``server`` and ``generation`` sections, loadable from YAML
or JSON with max_seq_len override logic (src/config/blazr.rs:119-123).
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Optional

import yaml

from .generation import GenerationConfig
from .inference import InferenceConfig
from .model_config import UniversalConfig
from .server import ServerConfig

import numpy as np
import jax.numpy as jnp

_DTYPE_MAP = {
    "f32": jnp.float32,
    "float32": jnp.float32,
    "f16": jnp.float16,
    "float16": jnp.float16,
    "bf16": jnp.bfloat16,
    "bfloat16": jnp.bfloat16,
}


def parse_dtype(name: str):
    """Parse a dtype string (reference src/config/blazr.rs:15-30)."""
    try:
        return _DTYPE_MAP[name.lower()]
    except KeyError:
        raise ValueError(f"Unknown dtype '{name}' (want f32/f16/bf16)") from None


@dataclass
class AppConfig:
    """model ⊕ inference ⊕ server ⊕ generation — the full app config."""

    model: UniversalConfig = field(default_factory=UniversalConfig)
    inference: InferenceConfig = field(default_factory=InferenceConfig)
    server: ServerConfig = field(default_factory=ServerConfig)
    generation: GenerationConfig = field(default_factory=GenerationConfig)

    @property
    def dtype(self):
        return parse_dtype(self.inference.dtype)

    def effective_max_seq_len(self) -> int:
        """inference.max_seq_len overrides the model's natural context length
        (reference src/config/blazr.rs:119-123)."""
        if self.inference.max_seq_len is not None:
            return min(self.inference.max_seq_len, self.model.max_seq_len) \
                if self.model.max_seq_len else self.inference.max_seq_len
        return self.model.max_seq_len

    # ---- serde -----------------------------------------------------------
    def to_dict(self) -> dict[str, Any]:
        # The model config is flattened at top level, as in the reference.
        d = self.model.to_dict()
        d["inference"] = self.inference.to_dict()
        d["server"] = self.server.to_dict()
        d["generation"] = self.generation.to_dict()
        return d

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "AppConfig":
        d = dict(d)
        inference = InferenceConfig.from_dict(d.pop("inference", {}) or {})
        server = ServerConfig.from_dict(d.pop("server", {}) or {})
        generation = GenerationConfig.from_dict(d.pop("generation", {}) or {})
        model = UniversalConfig.from_dict(d)
        return cls(model=model, inference=inference, server=server, generation=generation)

    @classmethod
    def from_file(cls, path: str | Path) -> "AppConfig":
        path = Path(path)
        text = path.read_text()
        if path.suffix in (".yaml", ".yml"):
            return cls.from_dict(yaml.safe_load(text) or {})
        return cls.from_dict(json.loads(text))

    @classmethod
    def from_universal_with_dtype(cls, model: UniversalConfig, dtype: str) -> "AppConfig":
        cfg = cls(model=model)
        cfg.inference.dtype = dtype
        return cfg

    def save(self, path: str | Path) -> None:
        path = Path(path)
        if path.suffix in (".yaml", ".yml"):
            path.write_text(yaml.safe_dump(self.to_dict()))
        else:
            path.write_text(json.dumps(self.to_dict(), indent=2))
