"""Multi-NODE SPMD serving: lockstep request broadcast.

The reference serves a multi-node world by routing requests over its own
TCP mesh to per-rank executors (src/distributed/swarm.rs, disagg.rs). On
TPU the natural shape is different: with ``jax.distributed`` up, every
jitted step is ONE global SPMD program over a mesh spanning all hosts —
so every process must issue the *same* engine steps in the *same* order.
Only process 0 talks HTTP; what the other processes need is the request
stream, not the sockets.

This module provides that: process 0 records engine mutations (submit /
cancel / stop) as compact ops, broadcasts them before every scheduling
iteration (two-phase length+payload broadcast over the JAX runtime's
own collectives — no extra TCP mesh to configure), and every process —
including process 0 — applies them at the same point and then runs one
identical ``BatchEngine.step_once()``. Scheduler decisions, seq-id
assignment and sampling keys are all deterministic functions of the op
stream, so the hosts stay in lockstep with no further coordination.

Degenerates to a plain in-process driver when ``jax.process_count()==1``
(broadcasts become identity), which is how the single-host tests and
server exercise the same code path.
"""

from __future__ import annotations

import asyncio
import json
import logging
from typing import Any, Optional

import numpy as np

from ..config.generation import GenerationConfig
from ..engine.batch_engine import BatchEngine, RequestHandle

logger = logging.getLogger(__name__)

# Primary heartbeat: never leave followers parked in a collective longer
# than this, even with zero traffic (DCN collectives can time out).
HEARTBEAT_S = 10.0


def broadcast_payload(data: Optional[bytes]) -> bytes:
    """Broadcast a variable-length byte string from process 0 to all.

    Two-phase: broadcast the length (fixed shape), then the padded
    payload. Followers pass ``None``. Identity on single-process runs.
    """
    import jax

    if jax.process_count() == 1:
        return data or b""
    from jax.experimental import multihost_utils

    payload = np.frombuffer(data or b"", dtype=np.uint8)
    n = int(multihost_utils.broadcast_one_to_all(
        np.array([payload.size], dtype=np.int32))[0])
    if n == 0:
        return b""
    buf = np.zeros((n,), dtype=np.uint8)
    if jax.process_index() == 0:
        buf[: payload.size] = payload
    return multihost_utils.broadcast_one_to_all(buf).tobytes()


def encode_ops(ops: list[dict[str, Any]]) -> bytes:
    return json.dumps(ops, separators=(",", ":")).encode()


def decode_ops(payload: bytes) -> list[dict[str, Any]]:
    return json.loads(payload.decode()) if payload else []


class LockstepEngine:
    """Drives a :class:`BatchEngine` in lockstep across all JAX processes.

    Primary (process 0) usage — from the HTTP layer::

        handle = await lockstep.submit(prompt_tokens, gen_cfg)
        async for tok in handle.tokens(): ...

    Followers just ``await lockstep.run()``; they receive the op stream
    and mirror every step. ``submit``/``cancel`` raise off-primary.
    """

    def __init__(self, engine: BatchEngine, heartbeat_s: float = HEARTBEAT_S):
        import jax

        self.engine = engine
        self.heartbeat_s = heartbeat_s
        self.is_primary = jax.process_index() == 0
        self._nprocs = jax.process_count()
        self._pending: list[tuple[dict[str, Any],
                                  Optional[asyncio.Future]]] = []
        self._wake = asyncio.Event()
        self._stop = False
        self._steps = 0

    # -- primary-side API ------------------------------------------------
    async def submit(self, prompt_tokens: list[int],
                     gen_cfg: Optional[GenerationConfig] = None
                     ) -> RequestHandle:
        """Queue a request; resolves once every process has admitted it."""
        if not self.is_primary:
            raise RuntimeError("submit() is primary-only in lockstep mode")
        op = {"op": "submit", "tokens": list(prompt_tokens),
              "gen": (gen_cfg or GenerationConfig()).to_dict()}
        fut: asyncio.Future = asyncio.get_running_loop().create_future()
        self._pending.append((op, fut))
        self._wake.set()
        return await fut

    def cancel(self, seq_id: int) -> None:
        if not self.is_primary:
            raise RuntimeError("cancel() is primary-only in lockstep mode")
        self._pending.append(({"op": "cancel", "seq": seq_id}, None))
        self._wake.set()

    def stop(self) -> None:
        self._stop = True
        self._wake.set()

    @property
    def steps(self) -> int:
        return self._steps

    @property
    def scheduler(self):
        """Expose the wrapped engine's scheduler (server metrics read it)."""
        return self.engine.scheduler

    # -- lockstep loop (all processes) -----------------------------------
    async def run(self) -> None:
        logger.info("lockstep engine started (primary=%s)", self.is_primary)
        while True:
            items: list[tuple[dict[str, Any], Optional[asyncio.Future]]] = []
            payload: Optional[bytes] = None
            if self.is_primary:
                # Idle-park until there are ops or live sequences, but wake
                # at the heartbeat so followers never sit in a collective
                # indefinitely.
                while (not self._pending and not self._stop
                       and not self.engine.scheduler.has_work):
                    self._wake.clear()
                    try:
                        await asyncio.wait_for(self._wake.wait(),
                                               timeout=self.heartbeat_s)
                    except asyncio.TimeoutError:
                        break  # heartbeat: broadcast empty ops
                items, self._pending = self._pending, []
                ops = [op for op, _ in items]
                if self._stop:
                    ops.append({"op": "stop"})
                payload = encode_ops(ops)
            if self._nprocs > 1:
                # Drain in-flight SPMD programs (pipelined horizon rounds
                # outlive step_once) BEFORE the op broadcast: overlapping
                # their tp psums with this host collective interleaves on
                # the shared gloo/DCN transport and corrupts both streams
                # (see BatchEngine.sync_device).
                await asyncio.to_thread(self.engine.sync_device)
            payload = await asyncio.to_thread(broadcast_payload, payload)
            ops = decode_ops(payload)
            futs = [f for _, f in items]
            stopping = self._apply(ops, futs)
            if stopping:
                break
            if not await self.engine.step_once():
                # No runnable batch anywhere (identical verdict on every
                # process). Brief backoff on top of the idle-park above.
                await asyncio.sleep(0.001)
            else:
                self._steps += 1
        self.engine.stop()
        # Submits queued after the final snapshot would otherwise hang
        # their awaiting handlers forever.
        for _, fut in self._pending:
            if fut is not None and not fut.done():
                fut.set_exception(RuntimeError("lockstep engine stopped"))
        self._pending.clear()
        logger.info("lockstep engine stopped after %d steps", self._steps)

    # -- op application (identical on every process) ---------------------
    def _apply(self, ops: list[dict[str, Any]],
               futs: list[Optional[asyncio.Future]]) -> bool:
        stopping = False
        fi = 0
        for op in ops:
            kind = op["op"]
            fut = None
            if kind in ("submit", "cancel"):
                if fi < len(futs):
                    fut = futs[fi]
                fi += 1
            if kind == "submit":
                # Per-request failures (bad grammar, invalid gen config)
                # must fail THAT request, not the world — the op raises
                # identically on every process (pure function of the op
                # payload), so all hosts stay in lockstep either way.
                try:
                    handle = self.engine.submit(
                        op["tokens"], GenerationConfig.from_dict(op["gen"]))
                except Exception as e:
                    logger.warning("lockstep submit rejected: %s", e)
                    if fut is not None and not fut.done():
                        fut.set_exception(e)
                    continue
                if self.is_primary and fut is not None:
                    # The client may have disconnected (future cancelled)
                    # between queueing and broadcast; the sequence still
                    # runs on every process — detach its stream.
                    if not fut.done():
                        fut.set_result(handle)
                    else:
                        self.engine.detach_handle(handle.seq_id)
                elif not self.is_primary:
                    # Followers decode every sequence but stream to no one.
                    self.engine.detach_handle(handle.seq_id)
            elif kind == "cancel":
                self.engine.cancel(op["seq"])
            elif kind == "stop":
                stopping = True
            else:  # future-proofing: unknown ops are a hard error — a
                # silently skipped op would desynchronize the world.
                raise ValueError(f"unknown lockstep op {kind!r}")
        return stopping
