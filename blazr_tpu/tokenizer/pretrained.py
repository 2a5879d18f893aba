"""Pretrained vocab tier (splintr equivalent, SURVEY §2.5).

The reference ships five pretrained BPE vocab tables in-crate
(splintr_tokenizer.rs:42-48: cl100k_base / o200k_base / llama3 /
deepseek_v3 / mistral) so a bare checkpoint — no tokenizer.json, no GGUF
metadata — still tokenizes, keyed off the model's vocab size
(splintr_tokenizer.rs:147-164).

This module is that tier: rank tables live as package data under
``tokenizer/vocab_data/`` in the standard ``.tiktoken`` format
(base64(token) <space> rank per line; optionally gzipped) with a JSON
sidecar carrying the pre-tokenization pattern, special tokens and
bos/eos ids. The build environment has zero egress and no cached tables,
so the data files are BAKED, not bundled: run ``tools/bake_vocabs.py``
once on a machine with the tables (tiktoken cache, HF tokenizer.json
files, or a splintr checkout) and the tier lights up — including fully
offline afterwards.
"""

from __future__ import annotations

import base64
import gzip
import json
import os
from pathlib import Path
from typing import Optional

from .bpe import PATTERN_CL100K, PATTERN_GPT2, PATTERN_O200K, BpeTokenizer

VOCAB_DATA_DIR = Path(__file__).parent / "vocab_data"

# The splintr set + the sizes our thresholds can name.
KNOWN_VOCABS = ("mistral", "gpt2", "cl100k_base", "llama3", "qwen2",
                "o200k_base", "deepseek_v3")

_PATTERNS = {
    "gpt2": PATTERN_GPT2,
    "cl100k": PATTERN_CL100K,
    "o200k": PATTERN_O200K,
}


def data_dir() -> Path:
    """Active vocab-data directory (``BLAZR_TPU_VOCAB_DIR`` overrides the
    package data — the analogue of BLAZR_TPU_IQ_GRIDS for codebooks)."""
    override = os.environ.get("BLAZR_TPU_VOCAB_DIR")
    return Path(override) if override else VOCAB_DATA_DIR


def available_vocabs() -> list[str]:
    d = data_dir()
    if not d.is_dir():
        return []
    out = set()
    for p in d.iterdir():
        name = p.name
        for suf in (".tiktoken.gz", ".tiktoken"):
            if name.endswith(suf):
                out.add(name[: -len(suf)])
    return sorted(out)


def _read_ranks(path: Path) -> dict[bytes, int]:
    raw = path.read_bytes()
    if path.name.endswith(".gz"):
        raw = gzip.decompress(raw)
    ranks: dict[bytes, int] = {}
    for line in raw.splitlines():
        if not line.strip():
            continue
        tok_b64, rank = line.split()
        ranks[base64.b64decode(tok_b64)] = int(rank)
    return ranks


def load_pretrained(name: str,
                    directory: Optional[Path] = None) -> BpeTokenizer:
    """Load a baked pretrained vocab table by name.

    Raises FileNotFoundError with baking instructions when the table is
    not present (zero-egress builds ship the machinery, not the data)."""
    d = Path(directory) if directory else data_dir()
    table = None
    for suf in (".tiktoken.gz", ".tiktoken"):
        p = d / f"{name}{suf}"
        if p.exists():
            table = p
            break
    if table is None:
        raise FileNotFoundError(
            f"pretrained vocab {name!r} is not baked (looked in {d}; "
            f"available: {available_vocabs() or 'none'}). Run "
            f"tools/bake_vocabs.py on a machine with the tables "
            f"(tiktoken cache or HF tokenizer.json files) to embed them, "
            f"or set BLAZR_TPU_VOCAB_DIR."
        )
    ranks = _read_ranks(table)

    meta_path = d / f"{name}.json"
    meta = json.loads(meta_path.read_text()) if meta_path.exists() else {}
    pattern = _PATTERNS.get(meta.get("pattern", "cl100k"), PATTERN_CL100K)
    return BpeTokenizer(
        ranks,
        pattern=pattern,
        special_tokens=meta.get("special_tokens") or {},
        bos_token_id=meta.get("bos_token_id"),
        eos_token_id=meta.get("eos_token_id"),
    )


def write_vocab(name: str, ranks: dict[bytes, int], *,
                pattern: str = "cl100k",
                special_tokens: Optional[dict[str, int]] = None,
                bos_token_id: Optional[int] = None,
                eos_token_id: Optional[int] = None,
                directory: Optional[Path] = None) -> Path:
    """Serialize a rank table (+sidecar) into the vocab-data dir — the
    write half used by tools/bake_vocabs.py and tests."""
    d = Path(directory) if directory else data_dir()
    d.mkdir(parents=True, exist_ok=True)
    lines = b"\n".join(
        base64.b64encode(tok) + b" " + str(rank).encode()
        for tok, rank in sorted(ranks.items(), key=lambda kv: kv[1]))
    out = d / f"{name}.tiktoken.gz"
    out.write_bytes(gzip.compress(lines + b"\n"))
    sidecar = {"pattern": pattern}
    if special_tokens:
        sidecar["special_tokens"] = special_tokens
    if bos_token_id is not None:
        sidecar["bos_token_id"] = bos_token_id
    if eos_token_id is not None:
        sidecar["eos_token_id"] = eos_token_id
    (d / f"{name}.json").write_text(json.dumps(sidecar))
    return out
