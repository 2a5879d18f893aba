"""Multimodal end-to-end: content-part parsing + image/audio decode
(reference src/server/multimodal.rs tests), vision checkpoint loading
(mmproj GGUF + HF LLaVA, reference src/loader/vision.rs), and a chat
request with an image against a tiny synthetic vision+LLM checkpoint
through the real server (reference chat.rs:70-118)."""

import asyncio
import base64
import io
import json
import struct

import numpy as np
import pytest

from blazr_tpu.server.multimodal import (
    MultimodalError,
    b64_decode,
    content_text,
    decode_audio,
    decode_image,
    detect_image_mime,
    has_audio,
    has_images,
    image_urls,
)
from fixtures import (
    write_byte_tokenizer_json,
    write_tiny_llama_checkpoint,
    write_tiny_llava_checkpoint,
)


# ---------------------------------------------------------------------------
# content parts (reference multimodal.rs tests :320-380)
# ---------------------------------------------------------------------------

def test_content_text_plain():
    assert content_text("Hello world") == "Hello world"
    assert not has_images("Hello world")


def test_content_parts():
    parts = [
        {"type": "text", "text": "What is this?"},
        {"type": "image_url", "image_url": {"url": "https://x/img.png"}},
    ]
    assert content_text(parts) == "What is this?"
    assert has_images(parts)
    urls = image_urls(parts)
    assert len(urls) == 1 and urls[0]["url"] == "https://x/img.png"
    assert urls[0]["detail"] == "auto"          # default detail


def test_content_multiple_text_parts():
    parts = [{"type": "text", "text": "Line 1"},
             {"type": "text", "text": "Line 2"}]
    assert content_text(parts) == "Line 1\nLine 2"
    assert not has_images(parts)


def test_content_audio_parts():
    parts = [
        {"type": "text", "text": "Transcribe this"},
        {"type": "input_audio", "input_audio": {"data": "AAAA", "format": "wav"}},
    ]
    assert has_audio(parts)


# ---------------------------------------------------------------------------
# base64 / image decode
# ---------------------------------------------------------------------------

def test_b64_variants():
    assert b64_decode("SGVsbG8=") == b"Hello"
    assert b64_decode("SGVsbG8") == b"Hello"            # no padding
    assert b64_decode("SGVsbG8=".replace("+", "-")) == b"Hello"


def test_detect_image_mime():
    assert detect_image_mime(b"\x89PNG\r\n") == "image/png"
    assert detect_image_mime(b"\xff\xd8\xff\xe0") == "image/jpeg"
    assert detect_image_mime(b"GIF89a") == "image/gif"
    assert detect_image_mime(b"\x00\x01") == "application/octet-stream"


def test_decode_image_data_uri():
    png = b"\x89PNG\r\n\x1a\nrest"
    uri = "data:image/png;base64," + base64.b64encode(png).decode()
    data, mime = asyncio.run(decode_image(uri))
    assert data == png and mime == "image/png"

    with pytest.raises(MultimodalError):
        asyncio.run(decode_image("data:no-comma-here"))


def test_decode_image_plain_b64():
    png = b"\x89PNG\r\n\x1a\nrest"
    data, mime = asyncio.run(decode_image(base64.b64encode(png).decode()))
    assert data == png and mime == "image/png"


# ---------------------------------------------------------------------------
# audio decode (reference multimodal.rs:420-470)
# ---------------------------------------------------------------------------

def _wav_bytes(samples: list[int]) -> bytes:
    data = b"".join(struct.pack("<h", s) for s in samples)
    hdr = bytearray(44)
    hdr[0:4] = b"RIFF"
    hdr[4:8] = struct.pack("<I", 36 + len(data))
    hdr[8:12] = b"WAVE"
    hdr[12:16] = b"fmt "
    hdr[16:20] = struct.pack("<I", 16)
    hdr[20:22] = struct.pack("<H", 1)        # PCM
    hdr[22:24] = struct.pack("<H", 1)        # mono
    hdr[24:28] = struct.pack("<I", 16000)
    hdr[28:32] = struct.pack("<I", 32000)
    hdr[32:34] = struct.pack("<H", 2)
    hdr[34:36] = struct.pack("<H", 16)       # 16-bit
    hdr[36:40] = b"data"
    hdr[40:44] = struct.pack("<I", len(data))
    return bytes(hdr) + data


def test_decode_audio_pcm16():
    raw = struct.pack("<hh", 256, 32767)
    out = decode_audio({"data": base64.b64encode(raw).decode(),
                        "format": "pcm16"})
    np.testing.assert_allclose(out, [256 / 32768.0, 32767 / 32768.0],
                               atol=1e-6)


def test_decode_audio_wav():
    wav = _wav_bytes([256, -100])
    out = decode_audio({"data": base64.b64encode(wav).decode(),
                        "format": "wav"})
    np.testing.assert_allclose(out, [256 / 32768.0, -100 / 32768.0],
                               atol=1e-6)


def test_decode_audio_errors():
    with pytest.raises(MultimodalError, match="not yet supported"):
        decode_audio({"data": "AAAA", "format": "mp3"})
    with pytest.raises(MultimodalError, match="Unsupported audio format"):
        decode_audio({"data": "AAAA", "format": "aac"})
    with pytest.raises(MultimodalError, match="RIFF"):
        decode_audio({"data": base64.b64encode(b"\0" * 50).decode(),
                      "format": "wav"})


# ---------------------------------------------------------------------------
# mmproj name remap + GGUF loading (reference vision.rs:97-164)
# ---------------------------------------------------------------------------

def test_remap_mmproj_names():
    from blazr_tpu.loader.vision import remap_mmproj_name as r

    assert r("v.enc.blk.0.attn_q.weight") == \
        "vision_model.encoder.layers.0.q_proj.weight"
    assert r("v.enc.blk.11.attn_k.weight") == \
        "vision_model.encoder.layers.11.k_proj.weight"
    assert r("v.enc.blk.5.attn_out.weight") == \
        "vision_model.encoder.layers.5.out_proj.weight"
    assert r("v.patch_embd.weight") == "vision_model.patch_embedding.weight"
    assert r("v.class_embd") == "vision_model.class_embedding"
    assert r("v.pre_ln.weight") == "vision_model.ln_pre.weight"
    assert r("mm.0.weight") == "vision_model.projector.linear1.weight"
    assert r("mm.2.bias") == "vision_model.projector.linear2.bias"


def _mmproj_tensors(rng, h=32, ps=8, img=32, inter=64, layers=2, proj=64):
    n_pos = (img // ps) ** 2 + 1
    t = {
        "v.patch_embd.weight": rng.standard_normal(
            (h, 3, ps, ps)).astype(np.float32) * 0.05,
        "v.class_embd": rng.standard_normal((h,)).astype(np.float32) * 0.05,
        "v.position_embd.weight": rng.standard_normal(
            (n_pos, h)).astype(np.float32) * 0.05,
        "v.pre_ln.weight": np.ones(h, np.float32),
        "v.pre_ln.bias": np.zeros(h, np.float32),
        "mm.0.weight": rng.standard_normal((proj, h)).astype(np.float32) * 0.05,
        "mm.0.bias": np.zeros(proj, np.float32),
        "mm.2.weight": rng.standard_normal(
            (proj, proj)).astype(np.float32) * 0.05,
        "mm.2.bias": np.zeros(proj, np.float32),
    }
    for i in range(layers):
        p = f"v.enc.blk.{i}."
        t.update({
            p + "ln1.weight": np.ones(h, np.float32),
            p + "ln1.bias": np.zeros(h, np.float32),
            p + "ln2.weight": np.ones(h, np.float32),
            p + "ln2.bias": np.zeros(h, np.float32),
            p + "attn_q.weight": rng.standard_normal((h, h)).astype(np.float32) * 0.05,
            p + "attn_k.weight": rng.standard_normal((h, h)).astype(np.float32) * 0.05,
            p + "attn_v.weight": rng.standard_normal((h, h)).astype(np.float32) * 0.05,
            p + "attn_out.weight": rng.standard_normal((h, h)).astype(np.float32) * 0.05,
            p + "ffn_down.weight": rng.standard_normal((inter, h)).astype(np.float32) * 0.05,
            p + "ffn_up.weight": rng.standard_normal((h, inter)).astype(np.float32) * 0.05,
        })
    return t


def test_load_gguf_mmproj(tmp_path):
    from blazr_tpu.formats.gguf import write_gguf
    from blazr_tpu.loader.vision import (
        detect_vision_config_from_mmproj,
        find_mmproj,
        varmap_from_mmproj,
    )
    from blazr_tpu.formats.gguf import Gguf

    from blazr_tpu.formats.gguf import GgmlType

    def as_gguf(t):
        return {k: (v, GgmlType.F32, v.shape) for k, v in t.items()}

    rng = np.random.default_rng(0)
    path = tmp_path / "mmproj-model-f32.gguf"
    write_gguf(path, {
        "clip.vision.image_size": 32,
        "clip.vision.patch_size": 8,
        "clip.vision.embedding_length": 32,
        "clip.vision.block_count": 2,
        "clip.vision.head_count": 4,
        "clip.vision.feed_forward_length": 64,
    }, as_gguf(_mmproj_tensors(rng)))

    assert find_mmproj(tmp_path) == path
    with Gguf.open(path) as g:
        vcfg = detect_vision_config_from_mmproj(g)
    assert vcfg.image_size == 32 and vcfg.num_layers == 2

    vm = varmap_from_mmproj(path)
    assert "vision_model.encoder.layers.0.q_proj.weight" in vm
    assert "vision_model.projector.linear1.weight" in vm

    from blazr_tpu.loader.vision import build_vision_params

    params = build_vision_params(vm, vcfg)
    assert params["patch_embed"].shape == (3 * 8 * 8, 32)
    assert len(params["layers"]) == 2
    assert params["layers"][0]["fc1"].shape == (32, 64)   # [in, out]
    assert params["proj_fc2"].shape[1] == vcfg.projection_dim


def test_llama_plus_mmproj_loads_vision(tmp_path):
    """A llama checkpoint dir with an mmproj sidecar loads a vision tower."""
    from blazr_tpu.formats.gguf import write_gguf
    from blazr_tpu.loader import load_model

    from blazr_tpu.formats.gguf import GgmlType

    rng = np.random.default_rng(1)
    write_tiny_llama_checkpoint(tmp_path, rng)
    write_gguf(tmp_path / "mmproj-f32.gguf", {
        "clip.vision.image_size": 32,
        "clip.vision.patch_size": 8,
        "clip.vision.embedding_length": 32,
        "clip.vision.block_count": 2,
        "clip.vision.head_count": 4,
        "clip.vision.feed_forward_length": 64,
    }, {k: (v, GgmlType.F32, v.shape)
        for k, v in _mmproj_tensors(rng).items()})

    model, _ = load_model(tmp_path, dtype="f32")
    assert model.is_multimodal
    assert model.vision_cfg.projection_dim == 64


def test_llava_hf_checkpoint_loads(tmp_path):
    """HF LLaVA layout: language_model.* + vision_tower.* in one file."""
    from blazr_tpu.loader import load_model

    rng = np.random.default_rng(2)
    write_tiny_llava_checkpoint(tmp_path, rng)
    model, _ = load_model(tmp_path, dtype="f32")
    assert model.is_multimodal
    assert model.cfg.model_type == "llama"          # text config unwrapped
    assert model.vision_cfg.hidden_size == 32
    # projector output must be the LLM embedding width
    assert model.vision_cfg.projection_dim == model.cfg.hidden_size


def _tiny_png(size=32) -> bytes:
    from PIL import Image

    img = Image.new("RGB", (size, size), (128, 64, 200))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_multimodal_generate(tmp_path):
    """MultimodalExecutor produces tokens from image + text input."""
    from blazr_tpu.config import GenerationConfig
    from blazr_tpu.engine.executor import Executor
    from blazr_tpu.engine.executor_multimodal import MultimodalExecutor
    from blazr_tpu.loader import load_model
    from tests_helpers import ByteTok

    rng = np.random.default_rng(3)
    write_tiny_llava_checkpoint(tmp_path, rng)
    model, app_cfg = load_model(tmp_path, dtype="f32")
    app_cfg.inference.max_seq_len = 128
    ex = Executor(model, ByteTok(), app_cfg)
    mm = MultimodalExecutor(ex, model.vision_params, model.vision_cfg)
    toks = list(mm.generate_multimodal(
        [10, 20, 30], images=[_tiny_png()],
        gen_cfg=GenerationConfig(max_tokens=4, temperature=0.0)))
    assert 1 <= len(toks) <= 4
    assert all(0 <= t.token_id < 256 + 1 for t in toks)


# ---------------------------------------------------------------------------
# server end-to-end: chat with an image
# ---------------------------------------------------------------------------

def test_server_chat_with_image(tmp_path):
    from aiohttp.test_utils import TestClient, TestServer

    from blazr_tpu.config import ServerConfig
    from blazr_tpu.engine.model_scheduler import ModelScheduler
    from blazr_tpu.server import create_app

    rng = np.random.default_rng(4)
    write_tiny_llava_checkpoint(tmp_path, rng)
    write_byte_tokenizer_json(tmp_path)

    async def main():
        scheduler = ModelScheduler(tmp_path, dtype="f32")
        app = create_app(scheduler, ServerConfig())
        async with TestClient(TestServer(app)) as c:
            b64 = base64.b64encode(_tiny_png()).decode()
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": [
                    {"type": "text", "text": "describe"},
                    {"type": "image_url", "image_url": {
                        "url": f"data:image/png;base64,{b64}"}},
                ]}],
                "max_tokens": 4, "temperature": 0,
            })
            body = await r.json()
            assert r.status == 200, body
            assert body["choices"][0]["message"]["content"] is not None

            # bad image → 400 invalid_request_error
            r2 = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": [
                    {"type": "image_url", "image_url": {
                        "url": "data:image/png;base64,&&&invalid"}},
                ]}],
                "max_tokens": 4,
            })
            assert r2.status == 400

            # streaming with an image takes the direct multimodal path
            r3 = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": [
                    {"type": "text", "text": "hi"},
                    {"type": "image_url", "image_url": {
                        "url": f"data:image/png;base64,{b64}"}},
                ]}],
                "max_tokens": 3, "temperature": 0, "stream": True,
            })
            assert r3.status == 200
            text = await r3.text()
            assert "[DONE]" in text
    asyncio.run(main())


def test_server_image_on_text_model_400(tmp_path):
    """Image content against a text-only model must 400, not 500."""
    from aiohttp.test_utils import TestClient, TestServer

    from blazr_tpu.config import ServerConfig
    from blazr_tpu.engine.model_scheduler import ModelScheduler
    from blazr_tpu.server import create_app

    rng = np.random.default_rng(5)
    write_tiny_llama_checkpoint(tmp_path, rng)
    write_byte_tokenizer_json(tmp_path)

    async def main():
        scheduler = ModelScheduler(tmp_path, dtype="f32")
        app = create_app(scheduler, ServerConfig())
        async with TestClient(TestServer(app)) as c:
            b64 = base64.b64encode(_tiny_png()).decode()
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": [
                    {"type": "image_url", "image_url": {
                        "url": f"data:image/png;base64,{b64}"}},
                ]}],
                "max_tokens": 4,
            })
            assert r.status == 400
            body = await r.json()
            assert "support" in body["error"]["message"]
    asyncio.run(main())
