"""Native (C++) runtime components.

The compute path is JAX/XLA/Pallas; these are the native pieces around it
(the role boostr/splintr's Rust plays in the reference). Libraries are
compiled on first use with g++ and cached next to the source.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

logger = logging.getLogger(__name__)

_DIR = Path(__file__).parent
_LOCK = threading.Lock()
_LIBS: dict[str, Optional[ctypes.CDLL]] = {}


def _build(name: str) -> Optional[Path]:
    src = _DIR / f"{name}.cpp"
    so = _DIR / f"lib{name}.so"
    if so.exists() and so.stat().st_mtime >= src.stat().st_mtime:
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
             "-march=native", str(src), "-o", str(so)],
            check=True, capture_output=True, timeout=120,
        )
        return so
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        logger.warning("native build of %s failed (%s); using Python path",
                       name, e)
        return None


def load_library(name: str) -> Optional[ctypes.CDLL]:
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        so = _build(name)
        lib = None
        if so is not None:
            try:
                lib = ctypes.CDLL(str(so))
            except OSError:
                logger.warning("could not load %s", so)
        _LIBS[name] = lib
        return lib
