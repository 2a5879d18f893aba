"""Format-layer tests: safetensors reader/writer, GGUF parser/writer,
ggml quant codecs (golden roundtrips), detection (ports the reference's
loader/detect.rs:148-272 and detect_arch.rs:199-315 test tiers)."""

import json

import numpy as np
import pytest

from blazr_tpu.formats import (
    Gguf,
    GgmlType,
    ModelFormat,
    QuantMethod,
    SafeTensorsReader,
    dequantize_ggml,
    detect_architecture_from_names,
    detect_model_source,
    gguf_to_hf_name,
    hf_to_gguf_name,
    infer_config_from_shapes,
    quantize_ggml,
    read_quant_group_size,
    write_gguf,
    write_safetensors,
)
from blazr_tpu.formats.gguf import GGML_BLOCK_INFO


# ---------------------------------------------------------------------------
# safetensors
# ---------------------------------------------------------------------------

def test_safetensors_roundtrip(tmp_path, rng):
    tensors = {
        "a.weight": rng.standard_normal((8, 16)).astype(np.float32),
        "b.weight": rng.standard_normal((4, 4)).astype(np.float16),
        "c.qweight": rng.integers(0, 2**31, (4, 2)).astype(np.int32),
    }
    p = tmp_path / "model.safetensors"
    write_safetensors(p, tensors, metadata={"format": "pt"})
    with SafeTensorsReader(p) as r:
        assert set(r.tensor_names()) == set(tensors)
        assert r.metadata["format"] == "pt"
        for name, arr in tensors.items():
            got = r.load_numpy(name)
            np.testing.assert_array_equal(got, arr)
        # dtype reinterpretation (int32 → uint32, AWQ-style)
        q = r.load_numpy("c.qweight", dtype=np.uint32)
        assert q.dtype == np.uint32 and q.shape == (4, 2)


def test_safetensors_sharded(tmp_path, rng):
    t1 = {"x.weight": rng.standard_normal((4, 4)).astype(np.float32)}
    t2 = {"y.weight": rng.standard_normal((2, 2)).astype(np.float32)}
    write_safetensors(tmp_path / "model-00001-of-00002.safetensors", t1)
    write_safetensors(tmp_path / "model-00002-of-00002.safetensors", t2)
    index = {
        "weight_map": {
            "x.weight": "model-00001-of-00002.safetensors",
            "y.weight": "model-00002-of-00002.safetensors",
        }
    }
    (tmp_path / "model.safetensors.index.json").write_text(json.dumps(index))
    with SafeTensorsReader(tmp_path) as r:
        assert r.is_sharded and r.num_shards == 2
        np.testing.assert_array_equal(r.load_numpy("y.weight"), t2["y.weight"])


def test_safetensors_bf16(tmp_path):
    import ml_dtypes

    arr = np.arange(16, dtype=np.float32).reshape(4, 4).astype(ml_dtypes.bfloat16)
    write_safetensors(tmp_path / "m.safetensors", {"w": arr})
    with SafeTensorsReader(tmp_path / "m.safetensors") as r:
        assert r.tensor_info("w").dtype_str == "BF16"
        np.testing.assert_array_equal(r.load_numpy("w"), arr)


# ---------------------------------------------------------------------------
# ggml quant codecs — roundtrip within expected quantization error
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "gt,rtol",
    [
        (GgmlType.Q8_0, 0.01),
        (GgmlType.Q4_0, 0.15),
        (GgmlType.Q4_1, 0.10),
        (GgmlType.Q2_K, 0.50),
        (GgmlType.Q4_K, 0.10),
        (GgmlType.Q5_K, 0.05),
        (GgmlType.Q6_K, 0.03),
    ],
)
def test_quant_roundtrip(gt, rtol, rng):
    x = rng.standard_normal(4 * 256).astype(np.float32)
    raw = quantize_ggml(x, gt)
    bs, epb = GGML_BLOCK_INFO[gt]
    assert len(raw) == x.size // epb * bs
    y = dequantize_ggml(raw, gt, (x.size,))
    err = np.abs(y - x).mean() / np.abs(x).mean()
    assert err < rtol, f"{gt.name}: relative error {err:.4f} >= {rtol}"


def test_q8_0_exact_ints(rng):
    """Integer-valued data within int8 range must roundtrip exactly."""
    x = rng.integers(-50, 50, 64).astype(np.float32)
    y = dequantize_ggml(quantize_ggml(x, GgmlType.Q8_0), GgmlType.Q8_0, (64,))
    # d = amax/127 so integers map near-exactly (f16 scale rounding only)
    assert np.abs(y - x).max() < 0.5


def test_dequant_handles_f16_f32_bf16():
    x = np.arange(32, dtype=np.float32)
    assert np.allclose(dequantize_ggml(x.tobytes(), GgmlType.F32, (32,)), x)
    assert np.allclose(
        dequantize_ggml(x.astype(np.float16).tobytes(), GgmlType.F16, (32,)), x
    )
    import ml_dtypes

    assert np.allclose(
        dequantize_ggml(x.astype(ml_dtypes.bfloat16).tobytes(), GgmlType.BF16, (32,)), x
    )


# ---------------------------------------------------------------------------
# GGUF parse/write
# ---------------------------------------------------------------------------

def _make_gguf(tmp_path, rng):
    w = rng.standard_normal((64, 256)).astype(np.float32)
    q8 = quantize_ggml(w, GgmlType.Q8_0)
    meta = {
        "general.architecture": "llama",
        "general.name": "test-model",
        "llama.embedding_length": 64,
        "llama.block_count": 2,
        "llama.context_length": 2048,
        "llama.attention.head_count": 8,
        "llama.attention.head_count_kv": 4,
        "llama.rope.freq_base": 10000.0,
        "llama.attention.layer_norm_rms_epsilon": 1e-5,
        "tokenizer.ggml.tokens": ["<s>", "</s>", "a", "b"],
        "tokenizer.ggml.scores": [0.0, 0.0, -1.0, -2.0],
    }
    tensors = {
        "token_embd.weight": (w, GgmlType.F32, (64, 256)),
        "blk.0.attn_q.weight": (q8, GgmlType.Q8_0, (64, 256)),
        "output_norm.weight": (np.ones(64, dtype=np.float32), GgmlType.F32, (64,)),
    }
    p = tmp_path / "test.gguf"
    write_gguf(p, meta, tensors)
    return p, w


def test_gguf_roundtrip(tmp_path, rng):
    p, w = _make_gguf(tmp_path, rng)
    with Gguf.open(p) as g:
        md = g.metadata()
        assert md.architecture() == "llama"
        assert md.embedding_length() == 64
        assert md.block_count() == 2
        assert md.context_length() == 2048
        assert md.get_u32("llama.attention.head_count") == 8
        assert md.get_f32("llama.rope.freq_base") == pytest.approx(10000.0)
        assert md.get_array("tokenizer.ggml.tokens") == ["<s>", "</s>", "a", "b"]
        assert set(g.tensor_names()) == {
            "token_embd.weight", "blk.0.attn_q.weight", "output_norm.weight",
        }
        info = g.tensor_info("blk.0.attn_q.weight")
        assert info.ggml_type == GgmlType.Q8_0
        assert info.shape == (64, 256)
        np.testing.assert_array_equal(g.load_numpy("token_embd.weight"), w)
        deq = g.load_numpy("blk.0.attn_q.weight")
        err = np.abs(deq - w).mean() / np.abs(w).mean()
        assert err < 0.01
        assert g.dominant_quant_type() == "F32"


# ---------------------------------------------------------------------------
# name mapping
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "gguf,hf",
    [
        ("token_embd.weight", "model.embed_tokens.weight"),
        ("output.weight", "lm_head.weight"),
        ("output_norm.weight", "model.norm.weight"),
        ("blk.0.attn_q.weight", "model.layers.0.self_attn.q_proj.weight"),
        ("blk.31.ffn_down.weight", "model.layers.31.mlp.down_proj.weight"),
        ("blk.2.attn_norm.weight", "model.layers.2.input_layernorm.weight"),
        ("blk.1.ffn_gate_inp.weight", "model.layers.1.mlp.gate.weight"),
        ("blk.4.attn_kv_a_mqa.weight", "model.layers.4.self_attn.kv_a_proj_with_mqa.weight"),
        ("blk.3.ssm_in.weight", "model.layers.3.mixer.in_proj.weight"),
        ("blk.3.ssm_a", "model.layers.3.mixer.A_log.weight"),
    ],
)
def test_name_mapping(gguf, hf):
    assert gguf_to_hf_name(gguf) == hf


def test_name_mapping_inverse():
    for g in ["blk.0.attn_q.weight", "token_embd.weight", "blk.5.ffn_up.weight"]:
        assert hf_to_gguf_name(gguf_to_hf_name(g)) == g


# ---------------------------------------------------------------------------
# detection
# ---------------------------------------------------------------------------

def test_detect_source_gguf_dir(tmp_path, rng):
    _make_gguf(tmp_path, rng)
    src = detect_model_source(tmp_path)
    assert src.format == ModelFormat.GGUF
    assert src.quant == QuantMethod.GGUF


def test_detect_source_prefers_safetensors(tmp_path, rng):
    _make_gguf(tmp_path, rng)
    write_safetensors(
        tmp_path / "model.safetensors",
        {"w": np.zeros((2, 2), dtype=np.float32)},
    )
    src = detect_model_source(tmp_path)
    assert src.format == ModelFormat.SAFETENSORS


def test_detect_awq_from_config(tmp_path):
    write_safetensors(tmp_path / "model.safetensors",
                      {"w": np.zeros((2, 2), dtype=np.float32)})
    (tmp_path / "config.json").write_text(json.dumps({
        "model_type": "llama",
        "quantization_config": {"quant_method": "awq", "group_size": 64},
    }))
    src = detect_model_source(tmp_path)
    assert src.quant == QuantMethod.AWQ
    assert read_quant_group_size(tmp_path) == 64


def test_detect_gptq_from_quantize_config(tmp_path):
    write_safetensors(tmp_path / "model.safetensors",
                      {"w": np.zeros((2, 2), dtype=np.float32)})
    (tmp_path / "quantize_config.json").write_text(json.dumps({
        "bits": 4, "group_size": 128, "desc_act": True,
    }))
    src = detect_model_source(tmp_path)
    assert src.quant == QuantMethod.GPTQ


def test_detect_missing(tmp_path):
    with pytest.raises(FileNotFoundError):
        detect_model_source(tmp_path / "nope")
    with pytest.raises(FileNotFoundError):
        detect_model_source(tmp_path)


# ---------------------------------------------------------------------------
# arch detection from synthetic tensor-name lists
# (ports reference detect_arch.rs:199-315 tests)
# ---------------------------------------------------------------------------

def _llama_names(layers=2):
    names = ["model.embed_tokens.weight", "model.norm.weight", "lm_head.weight"]
    for i in range(layers):
        p = f"model.layers.{i}."
        names += [
            p + "self_attn.q_proj.weight", p + "self_attn.k_proj.weight",
            p + "self_attn.v_proj.weight", p + "self_attn.o_proj.weight",
            p + "mlp.gate_proj.weight", p + "mlp.up_proj.weight",
            p + "mlp.down_proj.weight", p + "input_layernorm.weight",
            p + "post_attention_layernorm.weight",
        ]
    return names


def test_detect_llama_arch():
    det = detect_architecture_from_names(_llama_names())
    assert det.model_type == "llama"
    assert det.num_layers == 2
    assert not (det.has_mla or det.has_moe or det.has_ssm)
    assert det.layer_types == ["attention", "attention"]


def test_detect_mla_moe_arch():
    names = ["model.embed_tokens.weight", "lm_head.weight"]
    for i in range(2):
        p = f"model.layers.{i}."
        names += [
            p + "self_attn.kv_a_proj_with_mqa.weight",
            p + "self_attn.kv_b_proj.weight",
            p + "self_attn.q_a_proj.weight",
        ]
        if i > 0:
            names += [p + f"mlp.experts.{e}.gate_proj.weight" for e in range(4)]
            names += [p + "mlp.gate.weight"]
        else:
            names += [p + "mlp.gate_proj.weight"]
    det = detect_architecture_from_names(names)
    assert det.has_mla and det.has_moe
    assert det.layer_types == ["mla", "mla_moe"]
    assert det.model_type == "deepseek"


def test_detect_hybrid_arch():
    names = ["model.embed_tokens.weight", "lm_head.weight"]
    names += ["model.layers.0.mixer.in_proj.weight", "model.layers.0.mixer.A_log"]
    names += ["model.layers.1.self_attn.q_proj.weight"]
    det = detect_architecture_from_names(names)
    assert det.model_type == "hybrid"
    assert det.layer_types == ["mamba2", "attention"]


def test_detect_awq_names():
    names = [n.replace(".weight", ".qweight") if "proj" in n else n
             for n in _llama_names()]
    det = detect_architecture_from_names(names)
    assert det.is_quantized_awq and not det.is_quantized_gptq


def test_infer_config_from_shapes():
    shapes = {
        "model.embed_tokens.weight": (32000, 2048),
        "model.layers.0.self_attn.q_proj.weight": (2048, 2048),
        "model.layers.0.self_attn.k_proj.weight": (512, 2048),
        "model.layers.0.mlp.gate_proj.weight": (5632, 2048),
    }
    names = _llama_names()
    cfg = infer_config_from_shapes(names, lambda n: shapes.get(n, (1, 1)))
    assert cfg.hidden_size == 2048
    assert cfg.vocab_size == 32000
    assert cfg.intermediate_size == 5632
    assert cfg.attention.num_heads == 16          # 2048/128
    assert cfg.attention.num_kv_heads == 4        # 512/128
