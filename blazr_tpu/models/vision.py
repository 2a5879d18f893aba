"""Vision encoder (CLIP-style ViT) + multimodal projector.

TPU-native equivalent of boostr's Multimodal model surface
(``LoadedModel::Multimodal`` with ``encode_images``, SURVEY §2.9; vision
mmproj loading reference: src/loader/vision.rs:25-80): patch embedding →
pre-norm transformer → multimodal projector into the LLM embedding space.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config.model_config import UniversalConfig, VisionConfig
from .layers import linear


def layer_norm(x: jax.Array, weight: jax.Array, bias: Optional[jax.Array],
               eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _vit_attention(p: dict[str, Any], x: jax.Array, num_heads: int) -> jax.Array:
    b, t, h = x.shape
    d = h // num_heads
    q = linear(x, p["q"], p.get("q_bias")).reshape(b, t, num_heads, d)
    k = linear(x, p["k"], p.get("k_bias")).reshape(b, t, num_heads, d)
    v = linear(x, p["v"], p.get("v_bias")).reshape(b, t, num_heads, d)
    scale = 1.0 / (d ** 0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32) * scale,
                        k.astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v.astype(jnp.float32))
    out = out.reshape(b, t, h).astype(x.dtype)
    return linear(out, p["o"], p.get("o_bias"))


def encode_images(params: dict[str, Any], vcfg: VisionConfig,
                  pixels: jax.Array) -> jax.Array:
    """[N, 3, H, W] pixel tensors → [N, num_patches, proj_dim] LLM-space
    embeddings (reference Multimodal::encode_images)."""
    n, c, hh, ww = pixels.shape
    ps = vcfg.patch_size
    # Patch embedding: conv == unfold + matmul (MXU-friendly).
    patches = pixels.reshape(n, c, hh // ps, ps, ww // ps, ps)
    patches = patches.transpose(0, 2, 4, 1, 3, 5).reshape(
        n, (hh // ps) * (ww // ps), c * ps * ps)
    x = linear(patches.astype(jnp.float32), params["patch_embed"])
    if params.get("cls_token") is not None:
        cls = jnp.broadcast_to(params["cls_token"], (n, 1, x.shape[-1]))
        x = jnp.concatenate([cls, x], axis=1)
    x = x + params["pos_embed"][: x.shape[1]][None]
    if params.get("pre_norm") is not None:
        x = layer_norm(x, params["pre_norm"], params.get("pre_norm_bias"))

    for p in params["layers"]:
        h = layer_norm(x, p["norm1"], p.get("norm1_bias"))
        x = x + _vit_attention(p, h, vcfg.num_heads)
        h = layer_norm(x, p["norm2"], p.get("norm2_bias"))
        h = linear(h, p["fc1"], p.get("fc1_bias"))
        h = jax.nn.gelu(h, approximate=False)
        x = x + linear(h, p["fc2"], p.get("fc2_bias"))

    if params.get("post_norm") is not None:
        x = layer_norm(x, params["post_norm"], params.get("post_norm_bias"))
    # Drop CLS for the projector (LLaVA convention) when present.
    if params.get("cls_token") is not None:
        x = x[:, 1:]
    # Multimodal projector (2-layer MLP, LLaVA-style).
    h = linear(x, params["proj_fc1"], params.get("proj_fc1_bias"))
    h = jax.nn.gelu(h, approximate=False)
    return linear(h, params["proj_fc2"], params.get("proj_fc2_bias"))


def init_vision_params(vcfg: VisionConfig, key, dtype=jnp.float32) -> dict:
    """Random-init vision params (testing / synthetic checkpoints)."""
    import numpy as np

    rng = np.random.default_rng(0)
    h = vcfg.hidden_size
    ps = vcfg.patch_size
    n_patches = (vcfg.image_size // ps) ** 2

    def w(*shape, scale=0.02):
        return jnp.asarray(rng.standard_normal(shape).astype(np.float32) * scale,
                           dtype=dtype)

    layers = []
    for _ in range(vcfg.num_layers):
        layers.append({
            "norm1": jnp.ones((h,), dtype), "norm1_bias": jnp.zeros((h,), dtype),
            "norm2": jnp.ones((h,), dtype), "norm2_bias": jnp.zeros((h,), dtype),
            "q": w(h, h), "k": w(h, h), "v": w(h, h), "o": w(h, h),
            "q_bias": jnp.zeros((h,), dtype), "k_bias": jnp.zeros((h,), dtype),
            "v_bias": jnp.zeros((h,), dtype), "o_bias": jnp.zeros((h,), dtype),
            "fc1": w(h, vcfg.intermediate_size),
            "fc1_bias": jnp.zeros((vcfg.intermediate_size,), dtype),
            "fc2": w(vcfg.intermediate_size, h),
            "fc2_bias": jnp.zeros((h,), dtype),
        })
    return {
        "patch_embed": w(3 * ps * ps, h),
        "cls_token": w(1, h),
        "pos_embed": w(n_patches + 1, h),
        "pre_norm": jnp.ones((h,), dtype),
        "pre_norm_bias": jnp.zeros((h,), dtype),
        "post_norm": None,
        "layers": layers,
        "proj_fc1": w(h, vcfg.projection_dim),
        "proj_fc1_bias": jnp.zeros((vcfg.projection_dim,), dtype),
        "proj_fc2": w(vcfg.projection_dim, vcfg.projection_dim),
        "proj_fc2_bias": jnp.zeros((vcfg.projection_dim,), dtype),
    }
