"""Data-parallel replica group + routing.

TPU-native port of the reference DP layer (src/engine/data_parallel.rs:22,
cache_router.rs:68): a replica group with round-robin or cache-aware
request routing and atomic active-request load tracking. On TPU, replicas
are independent engine instances over disjoint device sets (the ``dp``
mesh axis carries batch parallelism inside one engine; this router spreads
REQUESTS across engines).
"""

from __future__ import annotations

import itertools
import threading
from dataclasses import dataclass, field
from typing import Any, Optional

from .cache_router import CacheAwareRouter


@dataclass
class Replica:
    index: int
    engine: Any
    active: int = 0


class DataParallelGroup:
    """Round-robin or cache-aware replica selection."""

    def __init__(self, engines: list[Any], cache_aware: bool = True):
        if not engines:
            raise ValueError("need at least one replica")
        self.replicas = [Replica(i, e) for i, e in enumerate(engines)]
        self._rr = itertools.count()
        self._lock = threading.Lock()
        self.router = CacheAwareRouter(len(engines)) if cache_aware else None

    def select(self, prompt: str = "") -> Replica:
        """Pick a replica (reference select(), data_parallel.rs:84)."""
        with self._lock:
            if self.router is not None and prompt:
                loads = [r.active for r in self.replicas]
                idx = self.router.route(prompt, loads)
            else:
                idx = next(self._rr) % len(self.replicas)
            r = self.replicas[idx]
            r.active += 1
            return r

    def release(self, replica: Replica) -> None:
        with self._lock:
            replica.active = max(0, replica.active - 1)

    def stats(self) -> list[dict]:
        with self._lock:
            return [{"index": r.index, "active": r.active}
                    for r in self.replicas]
