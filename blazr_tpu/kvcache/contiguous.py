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
    k: jax.Array                      # [L, B, S, H_kv, D]
    v: jax.Array                      # [L, B, S, H_kv, D]
    length: jax.Array                 # [B] int32 — valid entries per sequence

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
        return KVCache(k=self.k, v=self.v, length=jnp.zeros_like(self.length))


def init_kv_cache(num_layers: int, batch: int, capacity: int, kv_heads: int,
                  head_dim: int, dtype=jnp.bfloat16) -> KVCache:
    shape = (num_layers, batch, capacity + 1, kv_heads, head_dim)
    return KVCache(
        k=jnp.zeros(shape, dtype=dtype),
        v=jnp.zeros(shape, dtype=dtype),
        length=jnp.zeros((batch,), dtype=jnp.int32),
    )


def write_layer(cache: KVCache, layer: int, k_new: jax.Array, v_new: jax.Array,
                positions: jax.Array) -> KVCache:
    """Scatter new K/V at absolute ``positions`` [B, T] into layer ``layer``.

    Supports ragged per-sequence positions (continuation prefill). Returns a
    new cache pytree; under jit with donated buffers this is in-place.
    """
    b = k_new.shape[0]
    batch_idx = jnp.arange(b, dtype=jnp.int32)[:, None]          # [B, 1]
    k = cache.k.at[layer, batch_idx, positions].set(k_new.astype(cache.k.dtype))
    v = cache.v.at[layer, batch_idx, positions].set(v_new.astype(cache.v.dtype))
    return KVCache(k=k, v=v, length=cache.length)


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
    return KVCache(k=cache.k, v=cache.v, length=new_len.astype(jnp.int32))
