"""Multimodal generation: image/audio embeddings merged with text.

TPU-native port of the reference multimodal executor
(src/engine/executor_multimodal.rs:50-395): preprocess images → vision
encoder → embeddings; audio → mel → audio encoder; merge with text embeds
(images prepended, audio appended — reference :205-238), prefill from
embeddings, then ordinary text decode.
"""

from __future__ import annotations

from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.generation import GenerationConfig
from ..models.llama import forward_head, forward_layers_range
from ..models.vision import encode_images
from ..utils.preprocess import compute_mel_spectrogram, preprocess_image
from .types import GeneratedToken


class MediaBoundExecutor:
    """Adapter binding decoded media to a MultimodalExecutor so the shared
    text helpers (collect_generation / stream_generation) drive multimodal
    generation unchanged (reference generate_multimodal_text,
    executor_multimodal.rs:50-120)."""

    def __init__(self, mm: "MultimodalExecutor", images, audio):
        self.mm = mm
        self.images = images
        self.audio = audio
        self.executor = mm.executor

    def __getattr__(self, name):
        return getattr(self.executor, name)

    def generate(self, prompt_ids, gen_cfg=None):
        return self.mm.generate_multimodal(
            prompt_ids, images=self.images, audio=self.audio,
            gen_cfg=gen_cfg)


class MultimodalExecutor:
    """Wraps a text Executor with vision (and audio) encoders."""

    def __init__(self, executor, vision_params=None, vision_cfg=None,
                 audio_encoder=None):
        self.executor = executor
        self.vision_params = vision_params
        self.vision_cfg = vision_cfg
        self.audio_encoder = audio_encoder

    # ------------------------------------------------------------------
    def embed_images(self, images: list[bytes]) -> Optional[jax.Array]:
        if not images or self.vision_params is None:
            return None
        pixels = jnp.asarray(np.stack([
            preprocess_image(img, self.vision_cfg.image_size)
            for img in images]))
        emb = encode_images(self.vision_params, self.vision_cfg, pixels)
        # [N, P, H] → [N*P, H] image-token rows
        return emb.reshape(-1, emb.shape[-1])

    def embed_audio(self, audio: list[np.ndarray]) -> Optional[jax.Array]:
        if not audio or self.audio_encoder is None:
            return None
        mels = [compute_mel_spectrogram(a) for a in audio]
        return self.audio_encoder(mels)

    # ------------------------------------------------------------------
    def generate_multimodal(
        self,
        prompt_ids: list[int],
        images: Optional[list[bytes]] = None,
        audio: Optional[list[np.ndarray]] = None,
        gen_cfg: Optional[GenerationConfig] = None,
    ) -> Iterator[GeneratedToken]:
        """Image embeds prepended / audio appended to the text embedding
        sequence (reference :205-238), prefill via layers-range over raw
        embeddings, then the ordinary decode loop."""
        ex = self.executor
        model = ex.model
        cfg = gen_cfg or ex.app_cfg.generation

        img_emb = self.embed_images(images or [])
        aud_emb = self.embed_audio(audio or [])
        text_emb = jnp.take(model.params["embed"],
                            jnp.asarray(prompt_ids, dtype=jnp.int32), axis=0)
        parts = []
        if img_emb is not None:
            parts.append(img_emb.astype(text_emb.dtype))
        parts.append(text_emb)
        if aud_emb is not None:
            parts.append(aud_emb.astype(text_emb.dtype))
        hidden = jnp.concatenate(parts, axis=0)[None]      # [1, T_total, H]
        t_total = hidden.shape[1]

        cache = model.init_cache(1, ex.capacity)
        positions = jnp.asarray(np.arange(t_total, dtype=np.int32)[None, :])
        hidden, cache = forward_layers_range(
            model.params, model.cfg, hidden, cache, positions,
            0, model.num_layers)
        logits = forward_head(model.params, model.cfg, hidden[:, -1:])
        cur = int(np.asarray(logits)[0, -1].argmax())

        emitted = 0
        pos = t_total
        max_new = min(cfg.max_tokens, ex.capacity - t_total)
        history = list(prompt_ids)
        while emitted < max_new:
            is_eos = ex.tokenizer.is_eos(cur)
            yield GeneratedToken(
                token_id=cur,
                text="" if is_eos else ex._token_text(cur))
            emitted += 1
            history.append(cur)
            if is_eos or emitted >= max_new:
                return
            last_logits, cache = ex._forward_step(
                cache, jnp.asarray([[cur]], dtype=jnp.int32),
                jnp.asarray([[pos]], dtype=jnp.int32),
                jnp.asarray([pos + 1], dtype=jnp.int32),
            )
            pos += 1
            cur = int(np.asarray(last_logits)[0].argmax())
