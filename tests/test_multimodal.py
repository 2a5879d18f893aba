"""Multimodal tests: image/mel preprocessing, ViT encoder, image-prefixed
generation (ports the reference executor_multimodal behavior)."""

import io

import numpy as np
import pytest

import jax.numpy as jnp

from blazr_tpu.config import GenerationConfig, VisionConfig
from blazr_tpu.engine.executor import Executor
from blazr_tpu.engine.executor_multimodal import MultimodalExecutor
from blazr_tpu.loader import load_model
from blazr_tpu.models.vision import encode_images, init_vision_params
from blazr_tpu.utils.preprocess import (
    compute_mel_spectrogram,
    mel_filterbank,
    preprocess_image,
)
from fixtures import write_tiny_llama_checkpoint
from tests_helpers import ByteTok


def _png_bytes(w=48, h=32):
    from PIL import Image

    rng = np.random.default_rng(0)
    img = Image.fromarray(rng.integers(0, 255, (h, w, 3)).astype(np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_preprocess_image_shape_and_norm():
    out = preprocess_image(_png_bytes(), size=28)
    assert out.shape == (3, 28, 28)
    assert out.dtype == np.float32
    assert -5 < out.mean() < 5


def test_mel_spectrogram():
    t = np.arange(16000, dtype=np.float32)
    tone = np.sin(2 * np.pi * 440.0 * t / 16000)
    mel = compute_mel_spectrogram(tone, n_mels=80)
    assert mel.shape[0] == 80
    assert mel.shape[1] > 90
    fb = mel_filterbank(80, 400, 16000)
    assert fb.shape == (80, 201)
    assert (fb >= 0).all()


def test_vit_encoder_shapes():
    vcfg = VisionConfig(hidden_size=32, num_layers=2, num_heads=4,
                        image_size=28, patch_size=14, intermediate_size=64,
                        projection_dim=64)
    params = init_vision_params(vcfg, None)
    pixels = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 3, 28, 28)).astype(np.float32))
    emb = encode_images(params, vcfg, pixels)
    assert emb.shape == (2, 4, 64)      # 4 patches, proj dim 64


def test_multimodal_generate(tmp_path):
    write_tiny_llama_checkpoint(tmp_path, np.random.default_rng(3))
    model, app_cfg = load_model(tmp_path, dtype="f32")
    app_cfg.inference.max_seq_len = 128
    ex = Executor(model, ByteTok(), app_cfg)

    vcfg = VisionConfig(hidden_size=32, num_layers=1, num_heads=4,
                        image_size=28, patch_size=14, intermediate_size=64,
                        projection_dim=model.hidden_size)
    vparams = init_vision_params(vcfg, None)
    mm = MultimodalExecutor(ex, vparams, vcfg)

    toks = [t.token_id for t in mm.generate_multimodal(
        [10, 20, 30], images=[_png_bytes()],
        gen_cfg=GenerationConfig(max_tokens=5, temperature=0.0))]
    assert 1 <= len(toks) <= 5
    # image conditioning changes the output vs text-only
    toks_text = [t.token_id for t in mm.generate_multimodal(
        [10, 20, 30], images=[],
        gen_cfg=GenerationConfig(max_tokens=5, temperature=0.0))]
    assert toks != toks_text or len(toks) == 1
