"""Tokenizer tests: BPE engine roundtrips, cross-check vs tiktoken and HF
tokenizers where available, GGUF-embedded tokenizers (ports the reference's
tokenizer unit tier, splintr_tokenizer.rs:229-319)."""

import json

import numpy as np
import pytest

from blazr_tpu.tokenizer import (
    load_hf_tokenizer,
    load_tokenizer,
    tokenizer_from_gguf,
    vocab_name_for_size,
)
from blazr_tpu.tokenizer.bpe import (
    PATTERN_CL100K,
    BpeTokenizer,
    gpt2_byte_encoder,
    gpt2_unicode_to_bytes,
)
from blazr_tpu.tokenizer.gguf_tokenizer import (
    TOKEN_TYPE_BYTE,
    TOKEN_TYPE_CONTROL,
    TOKEN_TYPE_NORMAL,
    SentencePieceBpeTokenizer,
)


def _tiny_ranks():
    """Byte-complete rank table + a few merges."""
    ranks = {bytes([i]): i for i in range(256)}
    nxt = 256
    for merge in [b"he", b"ll", b"llo", b"hello", b" w", b"or", b"ld",
                  b"orld", b" world"]:
        ranks[merge] = nxt
        nxt += 1
    return ranks


def test_bpe_roundtrip_ascii():
    tok = BpeTokenizer(_tiny_ranks())
    text = "hello world"
    ids = tok.encode(text)
    assert tok.decode(ids) == text
    # Merges applied: far fewer tokens than bytes.
    assert len(ids) < len(text)


def test_bpe_roundtrip_unicode():
    tok = BpeTokenizer(_tiny_ranks())
    text = "héllo wörld 你好"
    assert tok.decode(tok.encode(text)) == text


def test_bpe_special_tokens():
    tok = BpeTokenizer(
        _tiny_ranks(),
        special_tokens={"<|eot|>": 999, "<s>": 998},
        bos_token_id=998, eos_token_id=999,
    )
    ids = tok.encode("hello<|eot|>world", add_bos=True)
    assert ids[0] == 998
    assert 999 in ids
    assert tok.is_eos(999) and not tok.is_eos(5)
    assert tok.special_token_id("<|eot|>") == 999
    # special text reassembles on decode
    assert "<|eot|>" in tok.decode(ids)


def test_bpe_matches_tiktoken():
    """Cross-check our BPE merge loop against tiktoken on its own ranks."""
    tiktoken = pytest.importorskip("tiktoken")
    try:
        enc = tiktoken.get_encoding("cl100k_base")
    except Exception:
        pytest.skip("tiktoken vocab not available offline")
    ours = BpeTokenizer(enc._mergeable_ranks, pattern=PATTERN_CL100K,
                        special_tokens=enc._special_tokens)
    for text in ["Hello, world!", "The quick brown fox jumps over 42 lazy dogs.",
                 "  indented\n\ncode() {\n  return 1;\n}", "émojis 🎉 and ünïcode"]:
        assert ours.encode_ordinary(text) == enc.encode_ordinary(text), text


def test_gpt2_byte_table():
    enc = gpt2_byte_encoder()
    assert len(enc) == 256
    assert gpt2_unicode_to_bytes("".join(enc[b] for b in b"hello")) == b"hello"


# ---------------------------------------------------------------------------
# HF tokenizer.json
# ---------------------------------------------------------------------------

def _write_hf_tokenizer(tmp_path):
    """Minimal byte-level BPE tokenizer.json."""
    enc = gpt2_byte_encoder()
    vocab = {enc[b]: b for b in range(256)}
    merges = []
    nxt = 256

    def tok_str(raw: bytes) -> str:
        return "".join(enc[b] for b in raw)

    for a, b in [(b"h", b"e"), (b"l", b"l"), (b"ll", b"o"), (b"he", b"llo")]:
        merges.append(f"{tok_str(a)} {tok_str(b)}")
        vocab[tok_str(a + b)] = nxt
        nxt += 1
    data = {
        "version": "1.0",
        "truncation": None,
        "padding": None,
        "added_tokens_decoder": {},
        "normalizer": None,
        "post_processor": None,
        "model": {"type": "BPE", "dropout": None, "unk_token": None,
                  "continuing_subword_prefix": None, "end_of_word_suffix": None,
                  "fuse_unk": False, "byte_fallback": False,
                  "ignore_merges": False, "vocab": vocab, "merges": merges},
        "pre_tokenizer": {"type": "ByteLevel", "add_prefix_space": False,
                          "trim_offsets": True, "use_regex": True},
        "decoder": {"type": "ByteLevel", "add_prefix_space": False,
                    "trim_offsets": True, "use_regex": True},
        "added_tokens": [
            {"id": nxt, "content": "<|eos|>", "special": True},
        ],
    }
    (tmp_path / "tokenizer.json").write_text(json.dumps(data))
    return nxt


def test_hf_tokenizer_loads(tmp_path):
    eos = _write_hf_tokenizer(tmp_path)
    tok = load_hf_tokenizer(tmp_path)
    ids = tok.encode("hello")
    assert tok.decode(ids) == "hello"
    assert len(ids) == 1          # fully merged
    assert tok.special_token_id("<|eos|>") == eos


def test_hf_tokenizer_matches_hf_lib(tmp_path):
    """Cross-check against the `tokenizers` library: IT writes the file
    (realistic schema), our loader reads it back."""
    tokenizers = pytest.importorskip("tokenizers")
    enc = gpt2_byte_encoder()
    vocab = {enc[b]: b for b in range(256)}
    merges = []
    nxt = 256

    def tok_str(raw: bytes) -> str:
        return "".join(enc[b] for b in raw)

    for a, b in [(b"h", b"e"), (b"l", b"l"), (b"ll", b"o"), (b"he", b"llo"),
                 (b" ", b"w"), (b"o", b"r"), (b"l", b"d")]:
        merges.append((tok_str(a), tok_str(b)))
        vocab[tok_str(a + b)] = nxt
        nxt += 1
    tk = tokenizers.Tokenizer(tokenizers.models.BPE(vocab=vocab, merges=merges))
    tk.pre_tokenizer = tokenizers.pre_tokenizers.ByteLevel(add_prefix_space=False)
    tk.decoder = tokenizers.decoders.ByteLevel()
    tk.save(str(tmp_path / "tokenizer.json"))

    theirs = tokenizers.Tokenizer.from_file(str(tmp_path / "tokenizer.json"))
    ours = load_hf_tokenizer(tmp_path)
    for text in ["hello", "hellohello", "hhlelo", "hello world or ld"]:
        assert ours.encode_ordinary(text) == theirs.encode(text).ids, text


# ---------------------------------------------------------------------------
# GGUF-embedded (SentencePiece + gpt2 families)
# ---------------------------------------------------------------------------

def _spm_tokenizer():
    tokens = ["<unk>", "<s>", "</s>"]
    types = [2, TOKEN_TYPE_CONTROL, TOKEN_TYPE_CONTROL]
    scores = [0.0, 0.0, 0.0]
    for b in range(256):
        tokens.append(f"<0x{b:02X}>")
        types.append(TOKEN_TYPE_BYTE)
        scores.append(-1e6)
    pieces = [("▁", -1.0), ("h", -2.0), ("e", -2.1), ("l", -2.2), ("o", -2.3),
              ("he", -0.5), ("ll", -0.6), ("llo", -0.4), ("hello", -0.1),
              ("▁hello", -0.05), ("▁world", -0.2), ("w", -2.4), ("r", -2.5),
              ("d", -2.6), ("or", -0.8), ("ld", -0.85), ("orld", -0.7),
              ("world", -0.3)]
    for t, s in pieces:
        tokens.append(t)
        types.append(TOKEN_TYPE_NORMAL)
        scores.append(s)
    return SentencePieceBpeTokenizer(tokens, scores, types, 1, 2)


def test_spm_encode_merges_by_score():
    tok = _spm_tokenizer()
    ids = tok.encode("hello world", add_bos=True)
    assert ids[0] == 1
    text = tok.decode(ids[1:])
    assert text == "hello world"
    # "▁hello" and "▁world" should be produced as single pieces
    assert tok.tokens[ids[1]] == "▁hello"
    assert tok.tokens[ids[2]] == "▁world"


def test_spm_byte_fallback():
    tok = _spm_tokenizer()
    ids = tok.encode("hz", add_bos=False)
    # 'z' has no piece → byte fallback token <0x7A>
    assert any(tok.tokens[i] == "<0x7A>" for i in ids)
    assert tok.decode(ids) == "hz"


def test_gguf_embedded_tokenizer(tmp_path, rng):
    from blazr_tpu.formats import Gguf, GgmlType, write_gguf

    tok = _spm_tokenizer()
    meta = {
        "general.architecture": "llama",
        "llama.embedding_length": 16,
        "llama.block_count": 1,
        "tokenizer.ggml.model": "llama",
        "tokenizer.ggml.tokens": tok.tokens,
        "tokenizer.ggml.scores": tok.scores,
        "tokenizer.ggml.token_type": tok.token_types,
        "tokenizer.ggml.bos_token_id": 1,
        "tokenizer.ggml.eos_token_id": 2,
    }
    w = np.zeros((4, 4), dtype=np.float32)
    write_gguf(tmp_path / "m.gguf", meta, {"token_embd.weight": (w, GgmlType.F32, (4, 4))})
    with Gguf.open(tmp_path / "m.gguf") as g:
        emb = tokenizer_from_gguf(g)
    assert emb.decode(emb.encode("hello world")[1:]) == "hello world"
    assert emb.is_eos(2)
    # load_tokenizer directory resolution
    tok2 = load_tokenizer(tmp_path)
    assert tok2.vocab_size == emb.vocab_size


def test_vocab_size_thresholds():
    assert vocab_name_for_size(32000) == "mistral"
    assert vocab_name_for_size(50257) == "gpt2"
    assert vocab_name_for_size(100277) == "cl100k_base"
    assert vocab_name_for_size(128256) == "llama3"
    assert vocab_name_for_size(152064) == "qwen2"
    assert vocab_name_for_size(199998) == "o200k_base"
    assert vocab_name_for_size(300000) == "o200k_base"


def test_native_bpe_matches_python():
    """The C++ merge core must produce identical ids to the Python loop."""
    pytest.importorskip("ctypes")
    tok = BpeTokenizer(_tiny_ranks())
    if tok._native is None:
        pytest.skip("native bpe unavailable (no g++)")
    texts = ["hello world", "héllo wörld 你好", "x" * 500,
             "the quick brown fox!! 123  \n\n indented"]
    for text in texts:
        native_ids = tok.encode_ordinary(text)
        tok2 = BpeTokenizer(_tiny_ranks())
        tok2._native = None
        assert native_ids == tok2.encode_ordinary(text), text


def test_native_pretokenizer_matches_regex():
    """The C++ scanner must agree with the `regex` engine exactly, for
    both supported patterns, on adversarial inputs."""
    import regex as regex_mod

    from blazr_tpu.tokenizer.bpe import (
        PATTERN_CL100K,
        PATTERN_GPT2,
        BpeTokenizer,
    )

    ranks = {bytes([b]): b for b in range(256)}
    ranks[b"th"] = 256
    ranks[b"the"] = 257
    ranks[b"  "] = 258
    ranks[b"'s"] = 259
    cases = [
        "Hello world!  It's a test.",
        "don't DON'T 'll 'S",
        "  spaces\ttabs\t\tdeep  1234 12 123",
        "newlines\n\nand \n  \n mixed \r\n win",
        "café über 中文  nbsp em",
        "punct!!! ??? ''' !?x ' s 'x",
        "trailing   ", "\n", " ", "", "'", "\r\n\r\n",
    ]
    for pat, mode in ((PATTERN_GPT2, 0), (PATTERN_CL100K, 1)):
        tok = BpeTokenizer(ranks, pattern=pat)
        if tok._native is None or tok._native_mode is None:
            pytest.skip("native bpe unavailable")
        rx = regex_mod.compile(pat)
        for s in cases:
            ref = []
            for m in rx.finditer(s):
                ref.extend(tok._bpe_merge(m.group().encode("utf-8")))
            assert tok._native.encode_text(s.encode("utf-8"),
                                           mode=mode) == ref, (pat[:20], s)


def test_native_pretokenizer_end_to_end():
    from blazr_tpu.tokenizer.bpe import PATTERN_CL100K, BpeTokenizer

    ranks = {bytes([b]): b for b in range(256)}
    tok = BpeTokenizer(ranks, pattern=PATTERN_CL100K,
                       special_tokens={"<|eos|>": 256})
    ids = tok.encode("hi <|eos|> there")
    assert 256 in ids
    assert tok.decode(ids) == "hi <|eos|> there"


# ---------------------------------------------------------------------------
# Pretrained vocab tier (VERDICT r4 #4; reference splintr_tokenizer.rs:42-48
# ships its five vocab tables in-crate). The zero-egress build bakes tables
# via tools/bake_vocabs.py into package data; these tests exercise the full
# machinery on a synthetic table.
# ---------------------------------------------------------------------------

def _tiny_ranks():
    """Byte-complete rank table + two merges — valid BPE over ASCII."""
    ranks = {bytes([i]): i for i in range(256)}
    ranks[b"he"] = 256
    ranks[b"ll"] = 257
    return ranks


def test_pretrained_write_load_roundtrip(tmp_path):
    from blazr_tpu.tokenizer.pretrained import load_pretrained, write_vocab

    write_vocab("demo", _tiny_ranks(), pattern="gpt2",
                special_tokens={"<|eot|>": 258}, eos_token_id=258,
                directory=tmp_path)
    tok = load_pretrained("demo", directory=tmp_path)
    assert tok.vocab_size == 259
    ids = tok.encode("hello")
    assert tok.decode(ids) == "hello"
    assert 256 in ids                       # the "he" merge applied
    assert tok.is_eos(258)


def test_pretrained_missing_table_names_bake_tool(tmp_path):
    from blazr_tpu.tokenizer.pretrained import load_pretrained

    with pytest.raises(FileNotFoundError, match="bake_vocabs"):
        load_pretrained("cl100k_base", directory=tmp_path)


def test_load_tokenizer_resolves_pretrained_by_vocab_size(tmp_path,
                                                          monkeypatch):
    """A bare checkpoint (config.json only, no tokenizer artifacts)
    resolves through the vocab-size thresholds to a baked table
    (splintr_tokenizer.rs:147-164 behavior)."""
    import json as _json

    from blazr_tpu.tokenizer import load_tokenizer
    from blazr_tpu.tokenizer.pretrained import write_vocab

    vocab_dir = tmp_path / "vocab_data"
    write_vocab("mistral", _tiny_ranks(), pattern="cl100k",
                directory=vocab_dir)
    monkeypatch.setenv("BLAZR_TPU_VOCAB_DIR", str(vocab_dir))

    model_dir = tmp_path / "model"
    model_dir.mkdir()
    (model_dir / "config.json").write_text(_json.dumps(
        {"model_type": "mistral", "vocab_size": 32000}))
    tok = load_tokenizer(model_dir)
    assert tok.decode(tok.encode("hello")) == "hello"


def test_load_tokenizer_error_lists_baked_vocabs(tmp_path, monkeypatch):
    from blazr_tpu.tokenizer import load_tokenizer

    monkeypatch.setenv("BLAZR_TPU_VOCAB_DIR", str(tmp_path / "none"))
    model_dir = tmp_path / "model"
    model_dir.mkdir()
    with pytest.raises(FileNotFoundError, match="bake_vocabs"):
        load_tokenizer(model_dir)


def test_bake_tool_hf_json_path(tmp_path):
    """tools/bake_vocabs.py --hf-json converts a tokenizer.json into a
    baked table that load_pretrained serves."""
    import importlib.util
    import json as _json

    from fixtures import write_byte_tokenizer_json

    from blazr_tpu.tokenizer.pretrained import load_pretrained

    src = tmp_path / "src"
    src.mkdir()
    write_byte_tokenizer_json(src)

    spec = importlib.util.spec_from_file_location(
        "bake_vocabs", "/root/repo/tools/bake_vocabs.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out = tmp_path / "baked"
    mod.bake_hf_json(f"demo={src / 'tokenizer.json'}", out)
    tok = load_pretrained("demo", directory=out)
    assert tok.decode(tok.encode("abc")) == "abc"
