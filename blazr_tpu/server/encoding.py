"""Embedding wire encodings (float list / base64).

TPU-native port of the reference encoding module (src/server/encoding.rs).
"""

from __future__ import annotations

import base64

import numpy as np


def encode_embedding(vec: np.ndarray, fmt: str = "float"):
    if fmt == "float":
        return [float(x) for x in vec]
    if fmt == "base64":
        return base64.b64encode(
            np.asarray(vec, dtype=np.float32).tobytes()).decode("ascii")
    raise ValueError(f"unknown encoding_format {fmt!r}")


def decode_embedding(data) -> np.ndarray:
    if isinstance(data, str):
        return np.frombuffer(base64.b64decode(data), dtype=np.float32)
    return np.asarray(data, dtype=np.float32)
