"""Core neural-net building blocks (functional, jit-friendly).

TPU-native equivalents of the reference model layer zoo that lives in
boostr (SURVEY §2.9 "Model layer" row): RMSNorm, rotary embeddings (with
linear / llama3 / yarn scaling), GQA attention over a fixed-shape cache,
and the SwiGLU MLP. Everything is a pure function over pytrees — the XLA
analogue of boostr's LoadedModel forward methods.

Weight convention: linear weights are stored **[in_features, out_features]**
so forward is ``x @ w`` with no transpose (HF checkpoints are transposed at
load time). Quantized weights are ``quant.qtensor.QuantTensor`` pytrees and
are dispatched through :func:`linear`.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config.model_config import AttentionConfig, RopeScaling


# ---------------------------------------------------------------------------
# Linear dispatch (plain / quantized)
# ---------------------------------------------------------------------------

def linear(x: jax.Array, w: Any, bias: Optional[jax.Array] = None) -> jax.Array:
    """``x @ w`` where ``w`` is a plain [K, N] array, a QuantTensor, or a
    LoraLinear (packed base + activation-side low-rank term)."""
    from ..quant.qtensor import QuantTensor

    lora = None
    if w.__class__.__name__ == "LoraLinear":   # avoid a circular import
        lora = w
        w = w.base
    if isinstance(w, QuantTensor):
        from ..quant.matmul import quant_matmul

        y = quant_matmul(x, w)
    else:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    if lora is not None:
        y = y + jnp.dot(jnp.dot(x, lora.a.astype(x.dtype)),
                        lora.b.astype(x.dtype))
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


# ---------------------------------------------------------------------------
# Norms
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, weight: jax.Array, eps: float = 1e-5,
             offset: float = 0.0) -> jax.Array:
    """RMSNorm in f32 accumulation. ``offset=1.0`` gives Gemma's (1+w) form."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jax.lax.rsqrt(var + eps)
    w = weight.astype(jnp.float32) + offset
    return (xf * w).astype(dtype)


# ---------------------------------------------------------------------------
# Rotary position embeddings
# ---------------------------------------------------------------------------

def rope_frequencies(cfg: AttentionConfig, head_dim: int) -> jnp.ndarray:
    """Per-dimension inverse frequencies with scaling applied
    (linear / llama3 / yarn / dynamic)."""
    half = head_dim // 2
    inv_freq = 1.0 / (
        cfg.rope_theta ** (jnp.arange(0, half, dtype=jnp.float32) / half)
    )
    sc: Optional[RopeScaling] = cfg.rope_scaling
    if sc is None:
        return inv_freq
    if sc.rope_type in ("linear", "dynamic"):
        return inv_freq / sc.factor
    if sc.rope_type == "llama3":
        low_wavelen = sc.original_max_position_embeddings / sc.low_freq_factor
        high_wavelen = sc.original_max_position_embeddings / sc.high_freq_factor
        wavelen = 2.0 * jnp.pi / inv_freq
        scaled = inv_freq / sc.factor
        smooth = (sc.original_max_position_embeddings / wavelen - sc.low_freq_factor) / (
            sc.high_freq_factor - sc.low_freq_factor
        )
        smoothed = (1.0 - smooth) * scaled + smooth * inv_freq
        out = jnp.where(wavelen > low_wavelen, scaled, inv_freq)
        mid = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
        return jnp.where(mid, smoothed, out)
    if sc.rope_type == "yarn":
        # YaRN: per-band interpolation between scaled and original freqs.
        def find_dim(num_rot: float) -> float:
            return (head_dim * math.log(sc.original_max_position_embeddings /
                                        (num_rot * 2 * math.pi))) / (
                2 * math.log(cfg.rope_theta))

        low = max(math.floor(find_dim(sc.beta_fast)), 0)
        high = min(math.ceil(find_dim(sc.beta_slow)), half - 1)
        rng = jnp.arange(half, dtype=jnp.float32)
        ramp = jnp.clip((rng - low) / max(high - low, 1), 0.0, 1.0)
        mask = 1.0 - ramp
        return inv_freq / sc.factor * (1 - mask) + inv_freq * mask
    return inv_freq


def rope_cos_sin(positions: jax.Array, inv_freq: jnp.ndarray,
                 mscale: float = 1.0) -> tuple[jax.Array, jax.Array]:
    """cos/sin tables for integer positions ``[...]`` → ``[..., half]``."""
    angles = positions.astype(jnp.float32)[..., None] * inv_freq
    return jnp.cos(angles) * mscale, jnp.sin(angles) * mscale


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Rotate half-dims: x shape [..., S, H, D]; cos/sin [..., S, half].

    Uses the HF "rotate_half" convention (first half / second half split),
    matching Llama/Mistral/Qwen checkpoints.
    """
    half = x.shape[-1] // 2
    x1 = x[..., :half]
    x2 = x[..., half:]
    cos = cos[..., None, :].astype(x.dtype)  # broadcast over heads
    sin = sin[..., None, :].astype(x.dtype)
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    )


def apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """GPT-NeoX interleaved pairing (even/odd dims), used by GGUF-converted
    and some Mamba3/DeepSeek checkpoints."""
    x1 = x[..., 0::2]
    x2 = x[..., 1::2]
    cos = cos[..., None, :].astype(x.dtype)
    sin = sin[..., None, :].astype(x.dtype)
    r1 = x1 * cos - x2 * sin
    r2 = x2 * cos + x1 * sin
    return jnp.stack([r1, r2], axis=-1).reshape(x.shape)


# ---------------------------------------------------------------------------
# Attention (GQA) over a fixed-shape contiguous cache
# ---------------------------------------------------------------------------

def repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """[B, S, H_kv, D] → [B, S, H_kv*n_rep, D] (GQA head expansion)."""
    if n_rep == 1:
        return x
    b, s, h, d = x.shape
    return jnp.broadcast_to(x[:, :, :, None, :], (b, s, h, n_rep, d)).reshape(
        b, s, h * n_rep, d
    )


def alibi_slopes(n_heads: int) -> jnp.ndarray:
    """Per-head ALiBi slopes (Press et al.; the formula HF falcon's
    ``build_alibi_tensor`` and ggml use). Reference carries the flag as
    ``AttentionConfig.use_alibi`` (loader/gguf.rs:199-202 sets it for
    falcon); the bias itself lived in boostr's attention kernels."""
    p = 2 ** math.floor(math.log2(n_heads))
    base = 2.0 ** (-(2.0 ** -(math.log2(p) - 3)))
    slopes = [base ** (i + 1) for i in range(p)]
    if p < n_heads:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * p) - 3)))
        slopes += [extra_base ** (2 * i + 1) for i in range(n_heads - p)]
    return jnp.asarray(slopes, dtype=jnp.float32)


def layer_norm(x: jax.Array, w: jax.Array, b: Optional[jax.Array],
               eps: float) -> jax.Array:
    """Full LayerNorm (mean-centered) — starcoder2/falcon family."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = (xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
    if b is not None:
        out = out + b.astype(jnp.float32)
    return out.astype(x.dtype)


def plain_mlp(x: jax.Array, fc, fc_b, down, down_b,
              act: str = "gelu_tanh") -> jax.Array:
    """Non-gated 2-layer MLP (starcoder2 c_fc → act → c_proj)."""
    h = linear(x, fc, fc_b)
    if act in ("gelu", "gelu_tanh", "gelu_pytorch_tanh"):
        h = jax.nn.gelu(h, approximate=True)
    elif act == "gelu_exact":
        h = jax.nn.gelu(h, approximate=False)
    elif act == "relu":
        h = jax.nn.relu(h)
    else:
        h = jax.nn.silu(h)
    return linear(h, down, down_b)


def attend(
    q: jax.Array,                 # [B, T, H, D]
    k: jax.Array,                 # [B, S, H_kv, D]
    v: jax.Array,                 # [B, S, H_kv, D]
    *,
    q_positions: jax.Array,       # [B, T] absolute positions of queries
    kv_len: jax.Array,            # [B] number of valid cache entries
    sliding_window: Optional[int] = None,
    logit_softcap: Optional[float] = None,
    scale: Optional[float] = None,
    k_scale: Optional[jax.Array] = None,   # [B, S, H_kv] int8-KV dequant
    v_scale: Optional[jax.Array] = None,
    alibi: Optional[jax.Array] = None,     # [H] per-head ALiBi slopes
) -> jax.Array:
    """Masked scaled-dot-product attention over a fixed-length cache.

    Fixed shapes keep XLA decode steps recompile-free (the TPU analogue of
    the reference's CUDA decode graphs, SURVEY §3.3): invalid cache slots
    are masked by ``kv_len``; causality by ``q_positions``.
    """
    b, t, h, d = q.shape
    s = k.shape[1]
    g = k.shape[2]
    n_rep = h // g
    scale = scale if scale is not None else 1.0 / math.sqrt(d)

    # GQA via GROUPED einsums: q heads fold onto the kv-head axis instead
    # of materializing repeat_kv'd K/V (n_rep× the KV bytes written+read —
    # the dominant cost of batched decode). Compute runs in the model
    # dtype (bf16 on TPU) with f32 accumulation; int8-KV planes convert
    # inside the fused dot, never to a float buffer.
    cdt = q.dtype
    qg = (q * scale).astype(cdt).reshape(b, t, g, n_rep, d)
    logits = jnp.einsum("btgrd,bsgd->bgrts", qg, k.astype(cdt),
                        preferred_element_type=jnp.float32)   # [B,G,R,T,S]
    if k_scale is not None:
        # int8 KV: fold the per-key scale into the scores AFTER the dot
        # (score_s = (q·k_i8[s]) * scale_s).
        logits = logits * jnp.transpose(k_scale, (0, 2, 1))[:, :, None, None, :]
    if logit_softcap is not None:
        logits = jnp.tanh(logits / logit_softcap) * logit_softcap
    if alibi is not None:
        # slope * (k_pos - q_pos): ≤ 0 for the causal past. Equivalent to
        # HF's slope * k_pos bias (softmax is shift-invariant per row).
        rel = (jnp.arange(s, dtype=jnp.int32)[None, None, :]
               - q_positions[:, :, None]).astype(jnp.float32)   # [B, T, S]
        logits = logits + (alibi.reshape(g, n_rep)[None, :, :, None, None]
                           * rel[:, None, None, :, :])

    kv_pos = jnp.arange(s, dtype=jnp.int32)[None, :]                    # [1, S]
    valid = kv_pos < kv_len[:, None]                                    # [B, S]
    causal = kv_pos[:, None, :] <= q_positions[:, :, None]              # [B, T, S]
    mask = valid[:, None, :] & causal
    if sliding_window is not None:
        mask = mask & (kv_pos[:, None, :] > q_positions[:, :, None] - sliding_window)
    logits = jnp.where(mask[:, None, None, :, :], logits, -1e30)

    probs = jax.nn.softmax(logits, axis=-1)
    if v_scale is not None:
        # fold the per-value scale into the probabilities
        probs = probs * jnp.transpose(v_scale, (0, 2, 1))[:, :, None, None, :]
        out = jnp.einsum("bgrts,bsgd->btgrd", probs,
                         v.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
    else:
        out = jnp.einsum("bgrts,bsgd->btgrd", probs.astype(cdt),
                         v.astype(cdt), preferred_element_type=jnp.float32)
    return out.reshape(b, t, h, d).astype(q.dtype)


# ---------------------------------------------------------------------------
# MLPs
# ---------------------------------------------------------------------------

def swiglu_mlp(x: jax.Array, gate_w: Any, up_w: Any, down_w: Any,
               act: str = "silu") -> jax.Array:
    """SwiGLU feed-forward (Llama/Mistral/Qwen family)."""
    g = linear(x, gate_w)
    u = linear(x, up_w)
    if act == "silu":
        g = jax.nn.silu(g)
    elif act == "gelu":
        g = jax.nn.gelu(g, approximate=True)
    else:
        raise ValueError(f"unknown activation {act}")
    return linear(g * u, down_w)
