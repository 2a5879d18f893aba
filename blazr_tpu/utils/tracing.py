"""Structured tracing / profiling.

TPU-native port of the reference tracing setup (SURVEY §5.1): structured
phase spans in the generate loops (``phase=prefill_start/prefill_end/
decode_start/decode_end backend=...``, reference
executor_generate.rs:136-140) plus optional jax.profiler capture. The
``BLAZR_TPU_LOG`` env var plays the RUST_LOG role.
"""

from __future__ import annotations

import contextlib
import logging
import os
import time
from typing import Iterator, Optional

logger = logging.getLogger("blazr_tpu.trace")


def setup_logging(default: str = "info") -> None:
    """Initialize logging from BLAZR_TPU_LOG (RUST_LOG analogue)."""
    level_name = os.environ.get("BLAZR_TPU_LOG", default).lower()
    level = {"trace": logging.DEBUG, "debug": logging.DEBUG,
             "info": logging.INFO, "warn": logging.WARNING,
             "error": logging.ERROR}.get(level_name, logging.INFO)
    logging.basicConfig(
        level=level,
        format="%(asctime)s %(levelname).1s %(name)s: %(message)s",
    )


@contextlib.contextmanager
def span(phase: str, **fields) -> Iterator[None]:
    """Structured phase span: logs phase=X_start / phase=X_end with the
    elapsed wall time and any extra key=value fields."""
    extra = " ".join(f"{k}={v}" for k, v in fields.items())
    logger.debug("phase=%s_start %s", phase, extra)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = (time.perf_counter() - t0) * 1e3
        logger.debug("phase=%s_end %s elapsed_ms=%.2f", phase, extra, dt)


@contextlib.contextmanager
def profile(log_dir: Optional[str] = None) -> Iterator[None]:
    """jax.profiler capture around a region (the bench harness profiler)."""
    log_dir = log_dir or os.environ.get("BLAZR_TPU_PROFILE_DIR")
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        logger.info("profiler trace written to %s", log_dir)
