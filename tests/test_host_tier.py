"""Two-tier prefix cache (device + host-RAM KV swap) tests
(reference GpuPrefixCache VRAM→RAM behavior)."""

import numpy as np
import pytest

import jax.numpy as jnp

from blazr_tpu.kvcache.block_allocator import BlockAllocator
from blazr_tpu.kvcache.host_tier import HostKVTier, attach_host_tier
from blazr_tpu.kvcache.paged import init_paged_cache
from blazr_tpu.kvcache.prefix_cache import PrefixCache


def test_host_tier_lru():
    t = HostKVTier(max_blocks=2)
    k = np.zeros((1, 4, 2, 8), np.float32)
    t.save(b"a", k, k)
    t.save(b"b", k, k)
    t.save(b"c", k, k)           # evicts a
    assert b"a" not in t and b"b" in t and b"c" in t
    assert t.stats.dropped == 1
    assert t.take(b"b") is not None
    assert t.take(b"b") is None
    assert t.stats.restored == 1


def test_two_tier_restore_roundtrip():
    """Evicted block contents must be restorable from the host tier with
    the cached-token count credited."""
    bs = 4
    alloc = BlockAllocator(8, bs)
    pc = PrefixCache(alloc)
    cache = init_paged_cache(num_layers=2, num_blocks=8, block_size=bs,
                             kv_heads=2, head_dim=8, dtype=jnp.float32)
    tier = attach_host_tier(pc, lambda: cache, max_blocks=16)

    tokens = [1, 2, 3, 4, 5, 6, 7, 8]           # 2 full blocks
    cached, blocks = pc.get_or_allocate_blocks(1, tokens)
    assert cached == 0
    # Write recognizable KV into the blocks (simulating prefill).
    for blk in blocks:
        cache.k = cache.k.at[:, blk * bs : (blk + 1) * bs].set(float(blk + 1))
        cache.v = cache.v.at[:, blk * bs : (blk + 1) * bs].set(float(blk + 1))
    pc.mark_computed(1, len(tokens))
    pc.release_blocks(1)

    # Force eviction of both cached blocks (device tier drops them).
    while pc.stats.cached_blocks:
        pc._evict_one()
    assert tier.stats.saved >= 2
    assert alloc.free_blocks == 8

    # Same prompt again: device tier misses, host tier restores.
    cached2, blocks2 = pc.get_or_allocate_blocks(2, tokens)
    assert cached2 == len(tokens) - 1            # full-hit capped
    assert tier.stats.restored >= 2
    blk0 = blocks2[0]
    np.testing.assert_allclose(
        np.asarray(cache.k[:, blk0 * bs : (blk0 + 1) * bs]),
        np.full((2, bs, 2, 8), 1.0), rtol=0, atol=0)


def test_two_tier_restore_int8_scales():
    """int8 cache: evict/restore must carry the scale planes (stale scales
    would silently corrupt restored blocks)."""
    bs = 4
    alloc = BlockAllocator(8, bs)
    pc = PrefixCache(alloc)
    cache = init_paged_cache(num_layers=1, num_blocks=8, block_size=bs,
                             kv_heads=2, head_dim=8, quantized=True)
    tier = attach_host_tier(pc, lambda: cache, max_blocks=16)

    tokens = [1, 2, 3, 4]
    cached, blocks = pc.get_or_allocate_blocks(1, tokens)
    blk = blocks[0]
    cache.k = cache.k.at[:, blk * bs : (blk + 1) * bs].set(42)
    cache.k_scale = cache.k_scale.at[:, blk * bs : (blk + 1) * bs].set(0.5)
    cache.v_scale = cache.v_scale.at[:, blk * bs : (blk + 1) * bs].set(0.25)
    pc.mark_computed(1, len(tokens))
    pc.release_blocks(1)
    while pc.stats.cached_blocks:
        pc._evict_one()
    # wipe the device planes to prove restoration carries the values back
    cache.k_scale = cache.k_scale.at[...].set(0.0)
    cache.v_scale = cache.v_scale.at[...].set(0.0)

    cached2, blocks2 = pc.get_or_allocate_blocks(2, tokens)
    assert tier.stats.restored >= 1
    b2 = blocks2[0]
    np.testing.assert_allclose(
        np.asarray(cache.k_scale[:, b2 * bs : (b2 + 1) * bs]), 0.5)
    np.testing.assert_allclose(
        np.asarray(cache.v_scale[:, b2 * bs : (b2 + 1) * bs]), 0.25)
    np.testing.assert_allclose(
        np.asarray(cache.k[:, b2 * bs : (b2 + 1) * bs]), 42)
