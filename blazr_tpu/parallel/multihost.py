"""Multi-host (multi-process) bring-up.

TPU-native replacement for the reference's MPI/NCCL world setup
(boostr ``distributed::init`` + tensor_parallel.rs:125-142): JAX's
distributed runtime handles rendezvous (one coordinator, N processes),
after which ``jax.devices()`` spans every host's chips and a global
``Mesh`` + GSPMD shardings drive ICI/DCN collectives — no per-rank
send/recv code.

Usage (one command per host):
    blazr-tpu serve --coordinator host0:1234 --num-processes 4 \
        --process-id $RANK ...
or rely on the TPU pod metadata (initialize() with no args auto-detects
on Cloud TPU slices).
"""

from __future__ import annotations

import logging
import os
from typing import Optional

logger = logging.getLogger(__name__)

_initialized = False


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None,
                     local_device_ids: Optional[list[int]] = None) -> bool:
    """Initialize the JAX distributed runtime (idempotent).

    Falls back to env vars BLAZR_TPU_COORDINATOR / BLAZR_TPU_NUM_PROCESSES
    / BLAZR_TPU_PROCESS_ID, then to JAX auto-detection (TPU pod metadata).
    Returns True if a multi-process runtime is active.
    """
    global _initialized
    import jax

    if _initialized:
        return jax.process_count() > 1

    coordinator = coordinator or os.environ.get("BLAZR_TPU_COORDINATOR")
    if num_processes is None and os.environ.get("BLAZR_TPU_NUM_PROCESSES"):
        num_processes = int(os.environ["BLAZR_TPU_NUM_PROCESSES"])
    if process_id is None and os.environ.get("BLAZR_TPU_PROCESS_ID"):
        process_id = int(os.environ["BLAZR_TPU_PROCESS_ID"])

    if coordinator is None and num_processes is None:
        # Single-host run (or Cloud TPU auto-detect explicitly requested
        # via env) — nothing to do.
        return False

    if num_processes is not None and num_processes <= 1:
        return False

    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True
    logger.info("jax.distributed up: process %d/%d, %d global / %d local devices",
                jax.process_index(), jax.process_count(),
                len(jax.devices()), len(jax.local_devices()))
    return jax.process_count() > 1


def is_primary() -> bool:
    """True on the process that should own user-facing side effects
    (HTTP bind, checkpoint writes, logging)."""
    import jax

    return jax.process_index() == 0


def process_info() -> dict:
    import jax

    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
    }


def shutdown() -> None:
    global _initialized
    if _initialized:
        import jax

        jax.distributed.shutdown()
        _initialized = False
