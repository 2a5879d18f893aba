"""Contiguous (dense) layered KV cache.

TPU-native equivalent of boostr ``inference::LayeredKvCache`` (SURVEY §2.9
"KV caches" row): fixed-capacity per-layer K/V arrays with a tracked
length. Fixed shapes are deliberate — the decode step jits once and XLA
reuses the compiled program every token (the analogue of the reference's
CUDA decode graphs, SURVEY §3.3); buffer donation makes updates in-place.

Layout: ``[num_layers, batch, capacity, kv_heads, head_dim]``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class KVCache:
    k: jax.Array                      # [L, B, S, H_kv, D] (bf16/f16/f32 or int8)
    v: jax.Array                      # [L, B, S, H_kv, D]
    length: jax.Array                 # [B] int32 — valid entries per sequence
    # int8 KV mode: per-token-per-head absmax scales (None = float mode).
    # Halves KV HBM traffic at decode; scales fold into the attention
    # matmuls (score *= k_scale_s, probs *= v_scale_s) so the int8 planes
    # are never materialized as floats.
    k_scale: Optional[jax.Array] = None   # [L, B, S, H_kv] f32
    v_scale: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def batch(self) -> int:
        return self.k.shape[1]

    @property
    def capacity(self) -> int:
        """Usable capacity (one extra hidden slot absorbs padded writes)."""
        return self.k.shape[2] - 1

    @property
    def trash_position(self) -> int:
        """Write target for padding tokens: beyond every valid kv_len, so
        masked attention never reads it (enables fixed-shape bucketed
        prefill without corrupting real slots)."""
        return self.k.shape[2] - 1

    def reset(self) -> "KVCache":
        return dataclasses.replace(self, length=jnp.zeros_like(self.length))


def init_kv_cache(num_layers: int, batch: int, capacity: int, kv_heads: int,
                  head_dim: int, dtype=jnp.bfloat16,
                  quantized: bool = False, kv_dtype: str = "int8") -> KVCache:
    shape = (num_layers, batch, capacity + 1, kv_heads, head_dim)
    if quantized:
        # int4 KV (PAPERS.md "When Quantization Is Free"): halves KV HBM
        # traffic again vs int8; the attend() scale-fold path is identical.
        qdt = jnp.int4 if kv_dtype == "int4" else jnp.int8
        return KVCache(
            k=jnp.zeros(shape, dtype=qdt),
            v=jnp.zeros(shape, dtype=qdt),
            length=jnp.zeros((batch,), dtype=jnp.int32),
            k_scale=jnp.zeros(shape[:4], dtype=jnp.float32),
            v_scale=jnp.zeros(shape[:4], dtype=jnp.float32),
        )
    return KVCache(
        k=jnp.zeros(shape, dtype=dtype),
        v=jnp.zeros(shape, dtype=dtype),
        length=jnp.zeros((batch,), dtype=jnp.int32),
    )


def _quantize_tokens(x: jax.Array, qdt=jnp.int8) -> tuple[jax.Array, jax.Array]:
    """[B, T, H, D] float → (int4/int8 values, [B, T, H] absmax scales)."""
    qmax = 7.0 if qdt == jnp.int4 else 127.0
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1), 1e-8) / qmax
    q = jnp.clip(jnp.round(xf / scale[..., None]), -qmax, qmax).astype(qdt)
    return q, scale


def write_layer(cache: KVCache, layer: int, k_new: jax.Array, v_new: jax.Array,
                positions: jax.Array) -> KVCache:
    """Scatter new K/V at absolute ``positions`` [B, T] into layer ``layer``.

    Supports ragged per-sequence positions (continuation prefill). Returns a
    new cache pytree; under jit with donated buffers this is in-place.
    """
    b = k_new.shape[0]
    batch_idx = jnp.arange(b, dtype=jnp.int32)[:, None]          # [B, 1]
    if cache.quantized:
        kq, ks = _quantize_tokens(k_new, cache.k.dtype)
        vq, vs = _quantize_tokens(v_new, cache.v.dtype)
        return dataclasses.replace(
            cache,
            k=cache.k.at[layer, batch_idx, positions].set(kq),
            v=cache.v.at[layer, batch_idx, positions].set(vq),
            k_scale=cache.k_scale.at[layer, batch_idx, positions].set(ks),
            v_scale=cache.v_scale.at[layer, batch_idx, positions].set(vs),
        )
    k = cache.k.at[layer, batch_idx, positions].set(k_new.astype(cache.k.dtype))
    v = cache.v.at[layer, batch_idx, positions].set(v_new.astype(cache.v.dtype))
    return dataclasses.replace(cache, k=k, v=v)


def advance(cache: KVCache, positions: jax.Array,
            seq_lens: Optional[jax.Array] = None) -> KVCache:
    """Update per-sequence lengths after writing tokens at ``positions``.

    ``seq_lens`` overrides the derived length (needed for bucketed/padded
    prefill where pad positions point at the trash slot).
    """
    if seq_lens is not None:
        new_len = jnp.maximum(cache.length, seq_lens)
    else:
        new_len = jnp.maximum(cache.length, jnp.max(positions, axis=-1) + 1)
    return dataclasses.replace(cache, length=new_len.astype(jnp.int32))
