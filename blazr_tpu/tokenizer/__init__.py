"""Tokenizer subsystem (splintr equivalent, SURVEY §2.5).

Resolution order for a model dir (reference run.rs:78-111 behavior):
GGUF-embedded tokenizer → tokenizer.json (HF) → pretrained vocab guessed
from vocab size (splintr_tokenizer.rs:147-164 thresholds).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional, Protocol, Union

from .bpe import BpeTokenizer
from .gguf_tokenizer import SentencePieceBpeTokenizer, tokenizer_from_gguf
from .hf_tokenizer import load_hf_tokenizer


class TokenizerLike(Protocol):
    """TokenizerTrait surface (reference src/tokenizer/traits.rs:6-31)."""

    def encode(self, text: str) -> list[int]: ...
    def decode(self, ids) -> str: ...
    def is_eos(self, token_id: int) -> bool: ...
    @property
    def vocab_size(self) -> int: ...


AnyTokenizer = Union[BpeTokenizer, SentencePieceBpeTokenizer]


# Vocab-size → pretrained vocab name thresholds
# (reference splintr_tokenizer.rs:147-164).
VOCAB_SIZE_THRESHOLDS = [
    (32100, "mistral"),
    (50300, "gpt2"),
    (100352, "cl100k_base"),
    (128512, "llama3"),
    (152128, "qwen2"),
    (200100, "o200k_base"),
]


def vocab_name_for_size(vocab_size: int) -> str:
    for limit, name in VOCAB_SIZE_THRESHOLDS:
        if vocab_size <= limit:
            return name
    return "o200k_base"


def load_tokenizer(model_dir: str | Path,
                   gguf_path: Optional[str | Path] = None) -> AnyTokenizer:
    """Auto-resolve the best tokenizer for a checkpoint."""
    model_dir = Path(model_dir)
    if gguf_path is not None:
        from ..formats.gguf import Gguf

        with Gguf.open(gguf_path) as g:
            try:
                return tokenizer_from_gguf(g)
            except ValueError:
                pass  # no embedded tokenizer → try sibling tokenizer.json
    tok_json = model_dir / "tokenizer.json"
    if tok_json.exists():
        return load_hf_tokenizer(tok_json)
    ggufs = sorted(model_dir.glob("*.gguf"))
    if ggufs:
        from ..formats.gguf import Gguf

        with Gguf.open(ggufs[0]) as g:
            return tokenizer_from_gguf(g)
    # No tokenizer artifact at all. The reference ships pretrained vocab
    # TABLES in-crate (splintr_tokenizer.rs:42-48: cl100k/o200k/llama3/
    # deepseek_v3/mistral) so a bare checkpoint still tokenizes; this
    # build has no bundled vocab data (zero-egress environment), so the
    # only sources are checkpoint-local files — name them explicitly.
    raise FileNotFoundError(
        f"No tokenizer found for {model_dir}: expected one of "
        f"'{model_dir / 'tokenizer.json'}' (HF fast-tokenizer JSON), a "
        f"'*.gguf' file with an embedded tokenizer (tokenizer.ggml.* "
        f"metadata), or an explicit gguf_path argument. Unlike the "
        f"reference (splintr), no pretrained vocab tables are bundled — "
        f"copy the model's tokenizer.json next to the weights."
    )


__all__ = [
    "AnyTokenizer",
    "BpeTokenizer",
    "SentencePieceBpeTokenizer",
    "TokenizerLike",
    "load_hf_tokenizer",
    "load_tokenizer",
    "tokenizer_from_gguf",
    "vocab_name_for_size",
]
