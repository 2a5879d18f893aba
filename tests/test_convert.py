"""Checkpoint conversion (loader/convert.py) + GGUF writer regressions."""

import numpy as np
import pytest

from blazr_tpu.formats.gguf import Gguf, GgmlType, write_gguf
from blazr_tpu.loader import load_model
from blazr_tpu.loader.convert import convert_checkpoint

from fixtures import write_tiny_llama_checkpoint


@pytest.fixture(scope="module")
def st_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("conv_src")
    write_tiny_llama_checkpoint(path, np.random.default_rng(11))
    return path


def test_st_to_gguf_roundtrip(st_dir, tmp_path):
    """safetensors → GGUF → loadable model with matching architecture."""
    dst = tmp_path / "model.gguf"
    convert_checkpoint(st_dir, dst)
    with Gguf.open(dst) as g:
        md = g.metadata()
        # Architecture comes from the config, not a hardcoded 'llama'.
        assert md.architecture() == load_model(st_dir, dtype="f32")[0].cfg.model_type
        assert g.tensor_names()


def test_gguf_to_st_file_destination(st_dir, tmp_path):
    """'out.safetensors' must be a FILE (regression: a directory named
    out.safetensors was created instead)."""
    gg = tmp_path / "m.gguf"
    convert_checkpoint(st_dir, gg)
    out = tmp_path / "out.safetensors"
    convert_checkpoint(gg, out)
    assert out.is_file()
    assert (tmp_path / "config.json").is_file()


def test_st_to_gguf_quant_block32(st_dir, tmp_path):
    """Q8_0 (32-element blocks) must quantize tensors whose inner dim is
    a multiple of 32 (the gate hardcoded 256)."""
    dst = tmp_path / "q8.gguf"
    convert_checkpoint(st_dir, dst, quant="q8_0")
    with Gguf.open(dst) as g:
        types = {g.tensor_info(n).ggml_type for n in g.tensor_names()}
    assert GgmlType.Q8_0 in types


def test_write_gguf_mixed_int_array(tmp_path):
    """Heterogeneous metadata arrays promote to a common type instead of
    crashing (negative-after-positive, int-then-float, bool-first)."""
    p = tmp_path / "m.gguf"
    t = np.zeros((1, 32), dtype=np.float32)
    write_gguf(p, {"a": [1, 2, -1], "b": [0, 1.5], "c": [True, 2],
                   "d": [1, 2 ** 33]},
               {"t": (t, GgmlType.F32, t.shape)})
    with Gguf.open(p) as g:
        md = g.metadata()
        assert list(md.get("a")) == [1, 2, -1]
        assert list(md.get("b")) == [0.0, 1.5]
        assert list(md.get("d")) == [1, 2 ** 33]


def test_write_gguf_nondefault_alignment(tmp_path):
    """alignment != 32 must stamp general.alignment so readers relocate
    data_start correctly (regression: silent tensor corruption)."""
    p = tmp_path / "a64.gguf"
    t = np.arange(64, dtype=np.float32).reshape(2, 32)
    write_gguf(p, {"k": 1}, {"t": (t, GgmlType.F32, t.shape)}, alignment=64)
    with Gguf.open(p) as g:
        np.testing.assert_array_equal(g.load_numpy("t"), t)


def test_iq_quant_degenerate_blocks_finite():
    """All-zero, tiny, and huge blocks must quantize without NaN/inf
    (f16 under/overflow in the super-scale)."""
    from blazr_tpu.formats.iq_quants import dequant_iq2_xxs, quant_iq2_xxs

    for block in (np.zeros(256, np.float32),
                  np.full(256, 1e-7, np.float32),
                  np.full(256, 3e7, np.float32)):
        out = dequant_iq2_xxs(quant_iq2_xxs(block))
        assert np.isfinite(out).all()
