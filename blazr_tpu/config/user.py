"""Persistent per-user defaults (~/.blazr_tpu/config.yaml).

TPU-native equivalent of the reference UserConfig (src/config/user.rs:11-39).
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass
from pathlib import Path
from typing import Any, Optional

import yaml


def user_config_path() -> Path:
    return Path(os.environ.get("BLAZR_TPU_HOME", Path.home() / ".blazr_tpu")) / "config.yaml"


@dataclass
class UserConfig:
    model: Optional[str] = None
    device: Optional[str] = None
    num_ctx: Optional[int] = None
    port: Optional[int] = None
    temperature: Optional[float] = None
    max_tokens: Optional[int] = None

    @classmethod
    def load(cls, path: Optional[Path] = None) -> "UserConfig":
        path = path or user_config_path()
        if not path.exists():
            return cls()
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in data.items() if k in known})

    def save(self, path: Optional[Path] = None) -> None:
        path = path or user_config_path()
        path.parent.mkdir(parents=True, exist_ok=True)
        data = {k: v for k, v in dataclasses.asdict(self).items() if v is not None}
        with open(path, "w") as f:
            yaml.safe_dump(data, f)
