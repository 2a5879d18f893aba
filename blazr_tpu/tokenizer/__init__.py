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
    # Pretrained tier (reference splintr_tokenizer.rs:42-48 + 147-164):
    # guess the vocab by the checkpoint's vocab size and load a BAKED
    # rank table from package data (tools/bake_vocabs.py embeds them —
    # the zero-egress build ships the machinery, not the tables).
    from .pretrained import available_vocabs, load_pretrained

    vocab_size = _config_vocab_size(model_dir)
    if vocab_size is not None:
        name = vocab_name_for_size(vocab_size)
        try:
            return load_pretrained(name)
        except FileNotFoundError:
            pass
    raise FileNotFoundError(
        f"No tokenizer found for {model_dir}: expected one of "
        f"'{model_dir / 'tokenizer.json'}' (HF fast-tokenizer JSON), a "
        f"'*.gguf' file with an embedded tokenizer (tokenizer.ggml.* "
        f"metadata), an explicit gguf_path argument, or a baked "
        f"pretrained vocab matching the model's vocab size "
        f"(baked: {available_vocabs() or 'none'} — run "
        f"tools/bake_vocabs.py to embed the splintr vocab set). "
        f"Fallback: copy the model's tokenizer.json next to the weights."
    )


def _config_vocab_size(model_dir: Path) -> Optional[int]:
    """vocab_size from a checkpoint-local config.json, if any."""
    import json

    cfg = model_dir / "config.json"
    if not cfg.exists():
        return None
    try:
        v = json.loads(cfg.read_text()).get("vocab_size")
        return int(v) if v else None
    except (ValueError, OSError):
        return None


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
