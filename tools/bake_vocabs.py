"""Bake the pretrained BPE vocab tables into package data.

The reference (splintr) ships five vocab tables in-crate
(splintr_tokenizer.rs:42-48) so bare checkpoints tokenize offline. This
build environment has zero egress and no cached tables, so the tier is
baked instead of bundled: run this tool once on a machine that has the
tables and commit `blazr_tpu/tokenizer/vocab_data/`.

Sources (any mix):
  --tiktoken NAME[=ENCODING]   fetch via the tiktoken package (uses its
                               cache/network): cl100k_base, o200k_base,
                               gpt2, ...
  --hf-json NAME=PATH          convert an HF tokenizer.json (llama3,
                               mistral, qwen2, deepseek_v3 ship one) to
                               a rank table.

Examples:
  python tools/bake_vocabs.py --tiktoken cl100k_base --tiktoken o200k_base \
      --tiktoken gpt2 \
      --hf-json llama3=/models/Llama-3.2-1B/tokenizer.json \
      --hf-json mistral=/models/Mistral-7B/tokenizer.json

Verification: prints per-vocab size; `blazr_tpu.tokenizer.pretrained.
load_pretrained(name)` then works offline, and load_tokenizer() resolves
bare checkpoints by vocab size (splintr_tokenizer.rs:147-164 behavior).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

from blazr_tpu.tokenizer.pretrained import write_vocab  # noqa: E402

_PATTERN_BY_NAME = {
    "gpt2": "gpt2",
    "o200k_base": "o200k",
    "deepseek_v3": "gpt2",      # deepseek uses a gpt2-style pattern
}


def bake_tiktoken(spec: str, out_dir):
    name, _, enc_name = spec.partition("=")
    enc_name = enc_name or name
    import tiktoken

    enc = tiktoken.get_encoding(enc_name)
    path = write_vocab(
        name, dict(enc._mergeable_ranks),
        pattern=_PATTERN_BY_NAME.get(name, "cl100k"),
        special_tokens=dict(enc._special_tokens),
        eos_token_id=enc._special_tokens.get("<|endoftext|>"),
        directory=out_dir)
    print(f"baked {name}: {enc.n_vocab} tokens -> {path}")


def bake_hf_json(spec: str, out_dir):
    name, _, path = spec.partition("=")
    if not path:
        raise SystemExit(f"--hf-json needs NAME=PATH, got {spec!r}")
    from blazr_tpu.tokenizer.hf_tokenizer import load_hf_tokenizer

    tok = load_hf_tokenizer(path)
    out = write_vocab(
        name, dict(tok.ranks),
        pattern="cl100k" if name in ("llama3", "qwen2") else
                _PATTERN_BY_NAME.get(name, "cl100k"),
        special_tokens=dict(tok.special_tokens),
        bos_token_id=tok.bos_token_id,
        eos_token_id=tok.eos_token_id,
        directory=out_dir)
    print(f"baked {name}: {tok.vocab_size} tokens -> {out}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--tiktoken", action="append", default=[],
                    metavar="NAME[=ENCODING]")
    ap.add_argument("--hf-json", action="append", default=[],
                    metavar="NAME=PATH")
    ap.add_argument("--out", default=None,
                    help="output dir (default: package vocab_data/)")
    args = ap.parse_args()
    if not args.tiktoken and not args.hf_json:
        ap.error("nothing to bake: pass --tiktoken and/or --hf-json")
    for spec in args.tiktoken:
        bake_tiktoken(spec, args.out)
    for spec in args.hf_json:
        bake_hf_json(spec, args.out)


if __name__ == "__main__":
    main()
