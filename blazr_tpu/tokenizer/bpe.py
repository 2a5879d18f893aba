"""Byte-level BPE engine.

TPU-native equivalent of splintr's BPE core (SURVEY §2.9 "splintr" row):
byte-pair encoding over a rank table with regex pre-tokenization
(tiktoken-style), special-token handling, and exact decode. Pure Python
here; the hot loop is replaced by the native C++ tokenizer when built
(``blazr_tpu/native``), with this as the reference implementation.
"""

from __future__ import annotations

import functools
from typing import Iterable, Optional

import regex  # PCRE-style, needed for \p{L} classes (like splintr's PCRE2)

# Pre-tokenization patterns (public tiktoken/llama patterns).
PATTERN_CL100K = (
    r"'(?i:[sdmt]|ll|ve|re)|[^\r\n\p{L}\p{N}]?+\p{L}+|\p{N}{1,3}|"
    r" ?[^\s\p{L}\p{N}]++[\r\n]*|\s*[\r\n]|\s+(?!\S)|\s+"
)
PATTERN_O200K = (
    r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]*[\p{Ll}\p{Lm}\p{Lo}\p{M}]+"
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)?|"
    r"[^\r\n\p{L}\p{N}]?[\p{Lu}\p{Lt}\p{Lm}\p{Lo}\p{M}]+[\p{Ll}\p{Lm}\p{Lo}\p{M}]*"
    r"(?i:'s|'t|'re|'ve|'m|'ll|'d)?|"
    r"\p{N}{1,3}| ?[^\s\p{L}\p{N}]+[\r\n/]*|\s*[\r\n]+|\s+(?!\S)|\s+"
)
PATTERN_GPT2 = (
    r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+"
)
# Llama 3 uses the cl100k pattern with minor changes; identical in practice.
PATTERN_LLAMA3 = PATTERN_CL100K


class BpeTokenizer:
    """Rank-table byte-level BPE (tiktoken-compatible semantics)."""

    def __init__(
        self,
        ranks: dict[bytes, int],
        pattern: str = PATTERN_CL100K,
        special_tokens: Optional[dict[str, int]] = None,
        bos_token_id: Optional[int] = None,
        eos_token_id: Optional[int] = None,
    ):
        self.ranks = ranks
        self._pattern_str = pattern
        self.pattern = regex.compile(pattern)
        self.special_tokens = special_tokens or {}
        self.bos_token_id = bos_token_id
        self.eos_token_id = eos_token_id
        self._decoder: dict[int, bytes] = {v: k for k, v in ranks.items()}
        for tok, tid in self.special_tokens.items():
            self._decoder[tid] = tok.encode("utf-8")
        if self.special_tokens:
            self._special_re = regex.compile(
                "|".join(regex.escape(t) for t in
                         sorted(self.special_tokens, key=len, reverse=True))
            )
        else:
            self._special_re = None
        self._n_vocab = max(self._decoder) + 1 if self._decoder else 0
        self._native = None
        self._native_mode = None     # 0 = gpt2 pattern, 1 = cl100k family
        try:
            from ..native.bpe_binding import NativeBpe

            self._native = NativeBpe(ranks)
            # Fully-native path (pre-tokenize + merge in one C++ call) for
            # the two patterns the native scanner replicates exactly.
            if pattern == PATTERN_GPT2:
                self._native_mode = 0
            elif pattern in (PATTERN_CL100K, PATTERN_LLAMA3):
                self._native_mode = 1
            if self._native_mode is not None:
                self._native.enable_pretokenizer()
        except Exception:
            self._native_mode = None  # python merge loop fallback

    # -- introspection -----------------------------------------------------
    @property
    def vocab_size(self) -> int:
        return self._n_vocab

    def special_token_id(self, token: str) -> Optional[int]:
        return self.special_tokens.get(token)

    def token_bytes(self, token_id: int) -> bytes:
        return self._decoder.get(token_id, b"")

    def vocab_bytes(self) -> list[bytes]:
        """[V] list of token byte strings (grammar masking input)."""
        return [self._decoder.get(i, b"") for i in range(self._n_vocab)]

    # -- encode ------------------------------------------------------------
    def _bpe_merge(self, piece: bytes) -> list[int]:
        if len(piece) == 1:
            rank = self.ranks.get(piece)
            return [rank] if rank is not None else []
        rank = self.ranks.get(piece)
        if rank is not None:
            return [rank]
        parts = [piece[i : i + 1] for i in range(len(piece))]
        while len(parts) > 1:
            best_rank = None
            best_idx = -1
            for i in range(len(parts) - 1):
                r = self.ranks.get(parts[i] + parts[i + 1])
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank = r
                    best_idx = i
            if best_rank is None:
                break
            parts[best_idx : best_idx + 2] = [parts[best_idx] + parts[best_idx + 1]]
        out = []
        for p in parts:
            r = self.ranks.get(p)
            if r is None:
                # byte fallback: split into single bytes
                for b in p:
                    rb = self.ranks.get(bytes([b]))
                    if rb is not None:
                        out.append(rb)
            else:
                out.append(r)
        return out

    def encode_ordinary(self, text: str) -> list[int]:
        """Encode without special-token recognition."""
        if (self._native is not None and self._native_mode is not None
                and self._native.has_pretokenizer):
            return self._native.encode_text(text.encode("utf-8"),
                                            mode=self._native_mode)
        if self._native is not None:
            pieces = [m.group().encode("utf-8")
                      for m in self.pattern.finditer(text)]
            return self._native.encode_pieces(pieces) if pieces else []
        ids: list[int] = []
        for m in self.pattern.finditer(text):
            ids.extend(self._bpe_merge(m.group().encode("utf-8")))
        return ids

    def encode(self, text: str, add_bos: bool = False,
               allowed_special: bool = True) -> list[int]:
        """Encode with special tokens recognized inline
        (splintr encode_with_special)."""
        ids: list[int] = []
        if add_bos and self.bos_token_id is not None:
            ids.append(self.bos_token_id)
        if self._special_re is None or not allowed_special:
            ids.extend(self.encode_ordinary(text))
            return ids
        pos = 0
        for m in self._special_re.finditer(text):
            ids.extend(self.encode_ordinary(text[pos : m.start()]))
            ids.append(self.special_tokens[m.group()])
            pos = m.end()
        ids.extend(self.encode_ordinary(text[pos:]))
        return ids

    # -- decode ------------------------------------------------------------
    def decode_bytes(self, ids: Iterable[int]) -> bytes:
        return b"".join(self._decoder.get(i, b"") for i in ids)

    def decode(self, ids: Iterable[int]) -> str:
        return self.decode_bytes(ids).decode("utf-8", errors="replace")

    def is_eos(self, token_id: int) -> bool:
        return self.eos_token_id is not None and token_id == self.eos_token_id


# ---------------------------------------------------------------------------
# GPT-2 byte↔unicode table (HF tokenizer.json BPE vocabs use this alphabet)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=1)
def gpt2_byte_encoder() -> dict[int, str]:
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(0xA1, 0xAD)) + list(range(0xAE, 0x100)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {b: chr(c) for b, c in zip(bs, cs)}


@functools.lru_cache(maxsize=1)
def gpt2_byte_decoder() -> dict[str, int]:
    return {c: b for b, c in gpt2_byte_encoder().items()}


def gpt2_unicode_to_bytes(s: str) -> bytes:
    dec = gpt2_byte_decoder()
    return bytes(dec[c] for c in s if c in dec)
