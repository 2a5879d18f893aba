"""Paged KV cache in HBM.

TPU-native equivalent of boostr ``inference::kv_cache::LayeredPagedKvCache``
(SURVEY §2.9 "KV caches" row). Layout chosen for the TPU memory system:

    k, v: [num_layers, num_blocks * block_size, kv_heads, head_dim]

(block-flattened so writes are a single scatter on the slot axis and the
fallback attention path gathers pages with one take along that axis; the
Pallas paged-attention kernel indexes the same layout by block).

All shapes are static: block tables are padded [B, max_blocks] and slot
mappings padded with a trash slot — the decode step compiles once
(reference batch_decode.rs:107-131 uses the same padded-batch pattern).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

PAD_BLOCK = 0x7FFFFFFF  # padded block-table entries (never dereferenced)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PagedKVCache:
    k: jax.Array                     # [L, NB*BS + 1, H_kv, D] (+1 trash slot)
    v: jax.Array
    block_size: int = dataclasses.field(metadata=dict(static=True))
    num_blocks: int = dataclasses.field(metadata=dict(static=True))
    # int8 KV mode (same scheme as the contiguous cache): per-slot-per-head
    # absmax scales; None = float mode.
    k_scale: Optional[jax.Array] = None   # [L, NB*BS + 1, H_kv] f32
    v_scale: Optional[jax.Array] = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def num_layers(self) -> int:
        return self.k.shape[0]

    @property
    def kv_heads(self) -> int:
        return self.k.shape[2]

    @property
    def head_dim(self) -> int:
        return self.k.shape[3]

    @property
    def trash_slot(self) -> int:
        return self.k.shape[1] - 1


def init_paged_cache(num_layers: int, num_blocks: int, block_size: int,
                     kv_heads: int, head_dim: int,
                     dtype=jnp.bfloat16, quantized: bool = False) -> PagedKVCache:
    shape = (num_layers, num_blocks * block_size + 1, kv_heads, head_dim)
    if quantized:
        return PagedKVCache(
            k=jnp.zeros(shape, dtype=jnp.int8),
            v=jnp.zeros(shape, dtype=jnp.int8),
            block_size=block_size,
            num_blocks=num_blocks,
            k_scale=jnp.zeros(shape[:3], dtype=jnp.float32),
            v_scale=jnp.zeros(shape[:3], dtype=jnp.float32),
        )
    return PagedKVCache(
        k=jnp.zeros(shape, dtype=dtype),
        v=jnp.zeros(shape, dtype=dtype),
        block_size=block_size,
        num_blocks=num_blocks,
    )


def write_paged_layer(cache: PagedKVCache, layer: int, k_new: jax.Array,
                      v_new: jax.Array, slot_mapping: jax.Array) -> PagedKVCache:
    """Scatter [B, T, H, D] new K/V into flat slots [B, T] (trash slot for
    padding)."""
    b, t, h, d = k_new.shape
    flat_slots = slot_mapping.reshape(-1)
    if cache.quantized:
        from .contiguous import _quantize_tokens

        # Quantize to the CACHE's storage dtype — hardcoding int8 would
        # silently wraparound-corrupt a narrower (int4) pool on .set().
        kq, ks = _quantize_tokens(k_new, qdt=cache.k.dtype)
        vq, vs = _quantize_tokens(v_new, qdt=cache.v.dtype)
        return dataclasses.replace(
            cache,
            k=cache.k.at[layer, flat_slots].set(kq.reshape(b * t, h, d)),
            v=cache.v.at[layer, flat_slots].set(vq.reshape(b * t, h, d)),
            k_scale=cache.k_scale.at[layer, flat_slots].set(
                ks.reshape(b * t, h)),
            v_scale=cache.v_scale.at[layer, flat_slots].set(
                vs.reshape(b * t, h)),
        )
    k = cache.k.at[layer, flat_slots].set(
        k_new.reshape(b * t, h, d).astype(cache.k.dtype))
    v = cache.v.at[layer, flat_slots].set(
        v_new.reshape(b * t, h, d).astype(cache.v.dtype))
    return dataclasses.replace(cache, k=k, v=v)


def page_slot_index(block_size: int, block_tables: jax.Array) -> jax.Array:
    """[B, MB] block tables → flat pool slot indices [B, MB*BS].

    The ONE place the PAD_BLOCK-masked block→slot arithmetic lives —
    values, scales, and the MLA latent gather all index with it."""
    mb = block_tables.shape[1]
    safe = jnp.where(block_tables == PAD_BLOCK, 0, block_tables)
    starts = safe * block_size                               # [B, MB]
    return (starts[:, :, None] +
            jnp.arange(block_size, dtype=jnp.int32)[None, None, :]).reshape(
        block_tables.shape[0], mb * block_size)


def gather_pages(cache: PagedKVCache, layer: int,
                 block_tables: jax.Array) -> tuple[jax.Array, jax.Array]:
    """[B, MB] block tables → (k, v) [B, MB*BS, H, D] (fallback attention
    path; the Pallas kernel reads pages in place instead)."""
    slot_idx = page_slot_index(cache.block_size, block_tables)
    k = jnp.take(cache.k[layer], slot_idx, axis=0)           # [B, MB*BS, H, D]
    v = jnp.take(cache.v[layer], slot_idx, axis=0)
    return k, v


def gather_page_scales(cache: PagedKVCache, layer: int,
                       block_tables: jax.Array) -> tuple[jax.Array, jax.Array]:
    """int8 mode: scales gathered with the same slot indexing as
    :func:`gather_pages` → [B, MB*BS, H]."""
    slot_idx = page_slot_index(cache.block_size, block_tables)
    ks = jnp.take(cache.k_scale[layer], slot_idx, axis=0)
    vs = jnp.take(cache.v_scale[layer], slot_idx, axis=0)
    return ks, vs


# ---------------------------------------------------------------------------
# Host-side helpers (fixed-shape padding discipline)
# ---------------------------------------------------------------------------

def compute_slot_mapping(block_table: list[int], start_pos: int, num_tokens: int,
                         block_size: int, trash_slot: int,
                         pad_to: Optional[int] = None) -> np.ndarray:
    """Flat slots for tokens [start_pos, start_pos+num_tokens) of one
    sequence (reference LayeredPagedKvCache::compute_slot_mapping)."""
    width = pad_to if pad_to is not None else num_tokens
    out = np.full((width,), trash_slot, dtype=np.int32)
    for i in range(num_tokens):
        p = start_pos + i
        blk = block_table[p // block_size]
        out[i] = blk * block_size + p % block_size
    return out


def pad_block_table(blocks: list[int], max_blocks: int) -> np.ndarray:
    """[MB]-padded device block table (reference block_table_device_format)."""
    out = np.full((max_blocks,), PAD_BLOCK, dtype=np.int32)
    out[: len(blocks)] = blocks
    return out
