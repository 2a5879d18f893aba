"""Multimodal preprocessing: image → pixel tensor, audio → mel spectrogram.

TPU-native port of boostr's vision/audio preprocessing
(``model::vision::preprocess::preprocess_image`` and
``model::audio::mel::compute_mel_spectrogram``, SURVEY §2.9 "Vision/audio
pre" row; usage reference: src/engine/executor_multimodal.rs:110-148).
"""

from __future__ import annotations

import io
import math
from typing import Optional

import numpy as np

# CLIP normalization constants (public).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], dtype=np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], dtype=np.float32)


def preprocess_image(data: bytes, size: int = 336) -> np.ndarray:
    """Decode + center-crop-resize + CLIP-normalize → [3, size, size] f32."""
    from PIL import Image

    img = Image.open(io.BytesIO(data)).convert("RGB")
    # Resize shortest side to `size`, center crop.
    w, h = img.size
    scale = size / min(w, h)
    img = img.resize((max(size, round(w * scale)), max(size, round(h * scale))),
                     Image.BICUBIC)
    w, h = img.size
    left = (w - size) // 2
    top = (h - size) // 2
    img = img.crop((left, top, left + size, top + size))
    arr = np.asarray(img, dtype=np.float32) / 255.0          # [H, W, 3]
    arr = (arr - CLIP_MEAN) / CLIP_STD
    return arr.transpose(2, 0, 1)                             # [3, H, W]


def hz_to_mel(f: np.ndarray | float) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + np.asarray(f) / 700.0)


def mel_to_hz(m: np.ndarray | float) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m) / 2595.0) - 1.0)


def mel_filterbank(n_mels: int, n_fft: int, sample_rate: int,
                   fmin: float = 0.0, fmax: Optional[float] = None) -> np.ndarray:
    """Triangular mel filterbank [n_mels, n_fft//2+1] (Slaney-style)."""
    fmax = fmax or sample_rate / 2
    mels = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    freqs = mel_to_hz(mels)
    bins = np.floor((n_fft + 1) * freqs / sample_rate).astype(int)
    fb = np.zeros((n_mels, n_fft // 2 + 1), dtype=np.float32)
    for i in range(n_mels):
        lo, c, hi = bins[i], bins[i + 1], bins[i + 2]
        for b in range(lo, min(c, fb.shape[1])):
            if c > lo:
                fb[i, b] = (b - lo) / (c - lo)
        for b in range(c, min(hi, fb.shape[1])):
            if hi > c:
                fb[i, b] = (hi - b) / (hi - c)
    return fb


def compute_mel_spectrogram(samples: np.ndarray, n_mels: int = 80,
                            sample_rate: int = 16000, n_fft: int = 400,
                            hop: int = 160) -> np.ndarray:
    """Whisper-style log-mel spectrogram → [n_mels, frames] f32."""
    samples = np.asarray(samples, dtype=np.float32)
    window = np.hanning(n_fft).astype(np.float32)
    n_frames = 1 + max(0, (len(samples) - n_fft)) // hop
    if n_frames < 1:
        samples = np.pad(samples, (0, n_fft - len(samples)))
        n_frames = 1
    frames = np.lib.stride_tricks.sliding_window_view(
        samples, n_fft)[::hop][:n_frames]
    spec = np.abs(np.fft.rfft(frames * window, axis=-1)) ** 2   # [T, F]
    fb = mel_filterbank(n_mels, n_fft, sample_rate)
    mel = fb @ spec.T                                           # [n_mels, T]
    log_mel = np.log10(np.maximum(mel, 1e-10))
    log_mel = np.maximum(log_mel, log_mel.max() - 8.0)
    return ((log_mel + 4.0) / 4.0).astype(np.float32)
