"""ctypes binding for the native BPE core + pre-tokenizer."""

from __future__ import annotations

import ctypes
import logging
import os
import struct
from typing import Optional

import numpy as np

from . import load_library

logger = logging.getLogger(__name__)

_CATS_CACHE = os.path.expanduser("~/.cache/blazr_tpu/unicode_cats_v1.npy")
_cats_table: Optional[np.ndarray] = None


def unicode_category_table() -> np.ndarray:
    """Per-codepoint class for the pre-tokenizer: 0 other, 1 letter,
    2 number, 3 whitespace.

    Built by running the SAME ``regex`` engine the Python fallback uses
    over every codepoint (three vectorized passes), so the native scanner
    and ``regex`` agree exactly. Cached on disk (~1 MB).
    """
    global _cats_table
    if _cats_table is not None:
        return _cats_table
    try:
        t = np.load(_CATS_CACHE)
        if t.shape == (0x110000,) and t.dtype == np.uint8:
            _cats_table = t
            return t
    except Exception:
        pass

    import regex

    t = np.zeros(0x110000, dtype=np.uint8)
    # All codepoints minus surrogates, as two contiguous chunks so string
    # index ↔ codepoint stays affine.
    chunks = [(0, 0xD800), (0xE000, 0x110000)]
    for cls, pat in ((1, r"\p{L}+"), (2, r"\p{N}+"), (3, r"\s+")):
        rx = regex.compile(pat)
        for base, end in chunks:
            s = "".join(chr(c) for c in range(base, end))
            for m in rx.finditer(s):
                t[base + m.start(): base + m.end()] = cls
    try:
        os.makedirs(os.path.dirname(_CATS_CACHE), exist_ok=True)
        np.save(_CATS_CACHE, t)
    except Exception:
        logger.debug("could not cache unicode table", exc_info=True)
    _cats_table = t
    return t


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
        lib.bpe_cats_new.restype = ctypes.c_void_p
        lib.bpe_cats_new.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
        lib.bpe_cats_free.argtypes = [ctypes.c_void_p]
        lib.bpe_encode_text.restype = ctypes.c_int64
        lib.bpe_encode_text.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_char_p,
            ctypes.c_uint64, ctypes.c_int32,
            ctypes.POINTER(ctypes.c_uint32), ctypes.c_uint64]
        self._cats = None

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

    def enable_pretokenizer(self) -> None:
        """Load the unicode table so encode_text covers pre-tokenization
        too (one ctypes crossing per document, no Python regex)."""
        if self._cats is None:
            table = unicode_category_table().tobytes()
            self._cats = self._lib.bpe_cats_new(table, len(table))
            if not self._cats:
                raise RuntimeError("bpe_cats_new failed")

    @property
    def has_pretokenizer(self) -> bool:
        return self._cats is not None

    def encode_text(self, text: bytes, mode: int = 1) -> list[int]:
        """Pre-tokenize + merge fully natively.

        mode 0 = GPT-2 pattern, 1 = cl100k/llama3 pattern.
        """
        cap = max(16, len(text) + 8)
        out = (ctypes.c_uint32 * cap)()
        n = self._lib.bpe_encode_text(self._handle, self._cats, text,
                                      len(text), mode, out, cap)
        if n < 0:
            raise RuntimeError("bpe output overflow")
        return list(out[:n])

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib is not None:
            self._lib.bpe_free(self._handle)
            if getattr(self, "_cats", None):
                self._lib.bpe_cats_free(self._cats)
