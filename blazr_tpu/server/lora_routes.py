"""LoRA management endpoints.

TPU-native port of the reference LoRA routes (src/server/lora.rs:183):
``POST /v1/lora`` load, ``DELETE /v1/lora/{name}``, ``GET /v1/lora``.
"""

from __future__ import annotations

import asyncio

from aiohttp import web

from ..engine.lora import LoraAdapterRegistry
from .api_types import ApiError

REGISTRY_KEY = web.AppKey("lora_registry", LoraAdapterRegistry)


async def lora_load(request: web.Request) -> web.Response:
    from .app import STATE_KEY, _json

    registry = request.app[REGISTRY_KEY]
    body = await _json(request)
    path = body.get("path")
    if not path:
        raise ApiError(400, "path required")
    try:
        adapter = await asyncio.to_thread(registry.load, path, body.get("name"))
    except (FileNotFoundError, ValueError) as e:
        raise ApiError(400, str(e))
    # Loading ACTIVATES the adapter on the serving model (reference
    # semantics; the last-loaded adapter is the active one).
    state = request.app[STATE_KEY]
    try:
        ex = await asyncio.to_thread(
            state.scheduler.get_executor, body.get("model") or "default")
        await asyncio.to_thread(ex.set_lora, adapter)
    except FileNotFoundError:
        pass                           # no model loaded yet: applied on use
    except ValueError as e:
        registry.unload(adapter.name)
        raise ApiError(400, str(e))
    return web.json_response({
        "name": adapter.name, "rank": adapter.rank,
        "alpha": adapter.alpha, "modules": adapter.num_modules(),
    }, status=201)


async def lora_list(request: web.Request) -> web.Response:
    registry = request.app[REGISTRY_KEY]
    return web.json_response({"adapters": registry.list()})


async def lora_delete(request: web.Request) -> web.Response:
    from .app import STATE_KEY

    registry = request.app[REGISTRY_KEY]
    name = request.match_info["name"]
    if not registry.unload(name):
        raise ApiError(404, f"adapter {name!r} not found", "not_found_error")
    # Deactivate if it was the live adapter.
    state = request.app[STATE_KEY]
    for entry in state.scheduler.loaded_models():
        if getattr(entry.executor, "active_lora", None) == name:
            entry.executor.clear_lora()
    return web.json_response({"deleted": name})
