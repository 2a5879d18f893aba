"""ctypes binding for the native BPE core."""

from __future__ import annotations

import ctypes
import struct
from typing import Optional

import numpy as np

from . import load_library


class NativeBpe:
    """Wraps libbpe.so; None-safe construction (falls back to Python)."""

    def __init__(self, ranks: dict[bytes, int]):
        self._lib = load_library("bpe")
        self._handle = None
        if self._lib is None:
            raise RuntimeError("native bpe unavailable")
        lib = self._lib
        lib.bpe_new.restype = ctypes.c_void_p
        lib.bpe_new.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.bpe_encode.restype = ctypes.c_int64
        lib.bpe_encode.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint64]
        lib.bpe_encode_batch.restype = ctypes.c_int64
        lib.bpe_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_uint64,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint64]
        lib.bpe_free.argtypes = [ctypes.c_void_p]

        blob = bytearray(struct.pack("<I", len(ranks)))
        for tok, tid in ranks.items():
            if len(tok) > 0xFFFF:
                continue
            blob += struct.pack("<H", len(tok)) + tok + struct.pack("<I", tid)
        blob_bytes = bytes(blob)
        self._handle = lib.bpe_new(blob_bytes, len(blob_bytes))
        if not self._handle:
            raise RuntimeError("bpe_new failed")

    def encode_piece(self, piece: bytes) -> list[int]:
        cap = max(16, len(piece) + 4)
        out = (ctypes.c_uint32 * cap)()
        n = self._lib.bpe_encode(self._handle, piece, len(piece), out, cap)
        if n < 0:
            raise RuntimeError("bpe output overflow")
        return list(out[:n])

    def encode_pieces(self, pieces: list[bytes]) -> list[int]:
        """Batch encode — one ctypes crossing for a whole document."""
        text = b"".join(pieces)
        offsets = np.zeros(len(pieces) + 1, dtype=np.uint64)
        np.cumsum([len(p) for p in pieces], out=offsets[1:])
        cap = max(16, len(text) + 4 * len(pieces))
        out = (ctypes.c_uint32 * cap)()
        n = self._lib.bpe_encode_batch(
            self._handle, text,
            offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            len(pieces), out, cap)
        if n < 0:
            raise RuntimeError("bpe output overflow")
        return list(out[:n])

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.bpe_free(self._handle)
