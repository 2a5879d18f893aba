"""Cache-aware request router.

TPU-native port of the reference cache router (src/engine/cache_router.rs):
FNV-1a hash of the prompt prefix (first 512 chars, :137-146) maps a prompt
family to a sticky replica so prefix-cache state concentrates; falls back
to least-loaded when the sticky replica is overloaded.
"""

from __future__ import annotations

PREFIX_CHARS = 512
FNV_OFFSET = 0xCBF29CE484222325
FNV_PRIME = 0x100000001B3


def fnv1a(data: bytes) -> int:
    h = FNV_OFFSET
    for b in data:
        h ^= b
        h = (h * FNV_PRIME) & 0xFFFFFFFFFFFFFFFF
    return h


class CacheAwareRouter:
    def __init__(self, num_replicas: int, overload_factor: float = 2.0):
        self.num_replicas = num_replicas
        self.overload_factor = overload_factor

    def route(self, prompt: str, loads: list[int]) -> int:
        """Sticky-hash routing with least-loaded fallback
        (reference CacheAwareRouter::route, cache_router.rs:68)."""
        sticky = fnv1a(prompt[:PREFIX_CHARS].encode("utf-8")) % self.num_replicas
        if not loads:
            return sticky
        avg = sum(loads) / len(loads)
        if loads[sticky] <= max(1.0, avg * self.overload_factor):
            return sticky
        return min(range(len(loads)), key=lambda i: loads[i])
