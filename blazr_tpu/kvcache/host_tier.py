"""Two-tier prefix cache: device (HBM) blocks + host-RAM KV swap.

TPU-native port of the reference ``GpuPrefixCache`` (SURVEY §2.9 "Prefix
cache" row: VRAM→RAM two-tier with insert/inc_ref/dec_ref and block
hashes; config gpu_prefix_cache + ram_tier, inference.rs). When a cached
block is evicted from the device pool under pressure, its K/V contents are
copied to host RAM keyed by the chain hash; a later prefix hit restores
them into a freshly allocated device block instead of recomputing the
prefill.
"""

from __future__ import annotations

import logging
from collections import OrderedDict
from dataclasses import dataclass
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class HostTierStats:
    saved: int = 0
    restored: int = 0
    dropped: int = 0

    @property
    def bytes_resident(self) -> int:
        return 0


class HostKVTier:
    """LRU store of evicted KV block contents (hash → [L, BS, H, D] pair)."""

    def __init__(self, max_blocks: int = 5000):
        self.max_blocks = max_blocks
        self._store: "OrderedDict[bytes, tuple[np.ndarray, np.ndarray]]" = \
            OrderedDict()
        self.stats = HostTierStats()

    def save(self, h: bytes, *arrays: np.ndarray) -> None:
        """2 arrays (k, v) in float mode; 4 (+k_scale, v_scale) for int8."""
        if h in self._store:
            self._store.move_to_end(h)
            return
        while len(self._store) >= self.max_blocks:
            self._store.popitem(last=False)
            self.stats.dropped += 1
        self._store[h] = tuple(np.asarray(a) for a in arrays)
        self.stats.saved += 1

    def take(self, h: bytes) -> Optional[tuple[np.ndarray, np.ndarray]]:
        item = self._store.pop(h, None)
        if item is not None:
            self.stats.restored += 1
        return item

    def __contains__(self, h: bytes) -> bool:
        return h in self._store

    def __len__(self) -> int:
        return len(self._store)


def attach_host_tier(prefix_cache, paged_cache_getter, max_blocks: int = 5000):
    """Wire a HostKVTier into a PrefixCache + PagedKVCache pair.

    * On eviction: the block's device KV slice is copied host-side.
    * On get_or_allocate miss whose hash exists in the host tier: allocate
      a fresh device block, restore the KV contents, and count the tokens
      as cached (no recompute).

    ``paged_cache_getter``/setter operate on the engine's live cache (the
    engine mutates the pytree each step, so indirection is required).
    """
    tier = HostKVTier(max_blocks)
    orig_evict = prefix_cache._evict_one
    orig_get = prefix_cache.get_or_allocate_blocks

    def _block_kv(cache, blk):
        bs = cache.block_size
        k = np.asarray(cache.k[:, blk * bs : (blk + 1) * bs])
        v = np.asarray(cache.v[:, blk * bs : (blk + 1) * bs])
        if getattr(cache, "quantized", False):
            # int8 mode: the scale planes travel with the block, else a
            # restored block would dequantize with stale scales.
            ks = np.asarray(cache.k_scale[:, blk * bs : (blk + 1) * bs])
            vs = np.asarray(cache.v_scale[:, blk * bs : (blk + 1) * bs])
            return k, v, ks, vs
        return k, v

    def evict_one():
        # Find which block is about to be evicted: replicate the LRU scan.
        for h in sorted(prefix_cache._lru, key=prefix_cache._lru.get):
            blk = prefix_cache._by_hash.get(h)
            if blk is not None and prefix_cache.allocator.ref_count(blk) <= 1:
                cache = paged_cache_getter()
                # Only computed blocks hold real KV worth preserving.
                if cache is not None and blk in prefix_cache._computed:
                    tier.save(h, *_block_kv(cache, blk))
                break
        orig_evict()

    def get_or_allocate_blocks(seq_id, tokens):
        cached, blocks = orig_get(seq_id, tokens)
        # Try restoring deeper prefixes from the host tier.
        from .prefix_cache import _chain_hash

        bs = prefix_cache.block_size
        cache = paged_cache_getter()
        if cache is None:
            return cached, blocks
        prev = b"root"
        for i in range(len(blocks)):
            chunk = tuple(tokens[i * bs : (i + 1) * bs])
            if len(chunk) < bs:
                break
            h = _chain_hash(prev, chunk)
            if i * bs >= cached:
                item = tier.take(h)
                if item is None:
                    break
                blk = blocks[i]
                import jax.numpy as jnp

                k_np, v_np = item[0], item[1]
                cache.k = cache.k.at[:, blk * bs : (blk + 1) * bs].set(
                    jnp.asarray(k_np))
                cache.v = cache.v.at[:, blk * bs : (blk + 1) * bs].set(
                    jnp.asarray(v_np))
                if len(item) == 4 and getattr(cache, "quantized", False):
                    cache.k_scale = cache.k_scale.at[
                        :, blk * bs : (blk + 1) * bs].set(jnp.asarray(item[2]))
                    cache.v_scale = cache.v_scale.at[
                        :, blk * bs : (blk + 1) * bs].set(jnp.asarray(item[3]))
                # Register so future requests hit the device tier directly.
                if h not in prefix_cache._by_hash:
                    prefix_cache._register(h, blk)
                # The restored block carries valid KV — computed immediately
                # (it was never prefilled by this sequence, so clear any
                # pending entry orig_get recorded for it).
                prefix_cache._computed.add(blk)
                pend = prefix_cache._pending.get(seq_id)
                if pend:
                    pend[:] = [p for p in pend if p[0] != blk]
                cached = (i + 1) * bs
            prev = h
        if cached >= len(tokens):
            cached = len(tokens) - 1
        return cached, blocks

    prefix_cache._evict_one = evict_one
    prefix_cache.get_or_allocate_blocks = get_or_allocate_blocks
    prefix_cache.host_tier = tier
    return tier
