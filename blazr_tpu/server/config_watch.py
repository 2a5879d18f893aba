"""Config hot-reload watcher.

TPU-native port of the reference config watcher (src/server/config_watch.rs
:13-47): polls the user config file every 5 s and applies changed
generation defaults without restart.
"""

from __future__ import annotations

import asyncio
import logging
from pathlib import Path
from typing import Callable, Optional

logger = logging.getLogger(__name__)

POLL_INTERVAL_S = 5.0


async def watch_config(path: str | Path,
                       on_change: Callable[[dict], None],
                       poll_interval: float = POLL_INTERVAL_S,
                       stop_event: Optional[asyncio.Event] = None) -> None:
    """Poll ``path`` for mtime changes; parse + call ``on_change``."""
    import yaml

    path = Path(path)
    last_mtime = path.stat().st_mtime if path.exists() else None
    while stop_event is None or not stop_event.is_set():
        await asyncio.sleep(poll_interval)
        try:
            if not path.exists():
                continue
            mtime = path.stat().st_mtime
            if last_mtime is not None and mtime == last_mtime:
                continue
            last_mtime = mtime
            data = yaml.safe_load(path.read_text()) or {}
            logger.info("config file %s changed; applying", path)
            on_change(data)
        except Exception:
            logger.exception("config reload failed")
