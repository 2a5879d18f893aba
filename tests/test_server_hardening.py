"""Server hardening: /api/copy + /api/pull management routes, the
request-timeout and concurrency-limit middleware, and the wired config
hot-reload watcher (reference routes.rs:56-57, management.rs:140-300,
startup.rs:179/223-245)."""

import asyncio
import json

import numpy as np
import pytest
from aiohttp import web
from aiohttp.test_utils import TestClient, TestServer

from blazr_tpu.config import ServerConfig
from blazr_tpu.engine.model_scheduler import ModelScheduler
from blazr_tpu.server import create_app
from blazr_tpu.server.app import concurrency_middleware, timeout_middleware
from fixtures import write_byte_tokenizer_json, write_tiny_llama_checkpoint


@pytest.fixture()
def models_root(tmp_path):
    """A model_dir CONTAINING model subdirectories (multi-model layout)."""
    rng = np.random.default_rng(5)
    sub = tmp_path / "tiny"
    sub.mkdir()
    write_tiny_llama_checkpoint(sub, rng)
    write_byte_tokenizer_json(sub)
    return tmp_path


def _client(model_dir, server_cfg=None):
    scheduler = ModelScheduler(model_dir, dtype="f32")
    app = create_app(scheduler, server_cfg or ServerConfig())
    return TestClient(TestServer(app))


def run(coro):
    return asyncio.run(coro)


# ---------------------------------------------------------------------------
# /api/copy
# ---------------------------------------------------------------------------

def test_api_copy(models_root):
    async def main():
        async with _client(models_root) as c:
            r = await c.post("/api/copy", json={
                "source": "tiny", "destination": "tiny-alias"})
            assert r.status == 200
            assert (models_root / "tiny-alias" / "config.json").exists()
            # alias is discoverable
            tags = await (await c.get("/api/tags")).json()
            names = [m["name"] for m in tags["models"]]
            assert "tiny-alias" in names
            # 409 on existing destination
            r2 = await c.post("/api/copy", json={
                "source": "tiny", "destination": "tiny-alias"})
            assert r2.status == 409
            # 404 on missing source
            r3 = await c.post("/api/copy", json={
                "source": "nope", "destination": "x"})
            assert r3.status == 404
            # 400 on missing fields / path traversal
            r4 = await c.post("/api/copy", json={"source": "tiny"})
            assert r4.status == 400
            r5 = await c.post("/api/copy", json={
                "source": "tiny", "destination": "../evil"})
            assert r5.status == 400
    run(main())


# ---------------------------------------------------------------------------
# /api/pull
# ---------------------------------------------------------------------------

def test_api_pull_streams_ndjson(models_root):
    """Zero-egress environment: the pull must stream NDJSON status lines
    and end with an error line rather than failing the request."""
    async def main():
        async with _client(models_root) as c:
            r = await c.post("/api/pull", json={"name": "org/not-a-model"})
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("application/x-ndjson")
            lines = [json.loads(l) for l in (await r.text()).splitlines() if l]
            assert lines and "status" in lines[0]
            assert any("error" in l or l.get("status") == "success"
                       for l in lines)

            r2 = await c.post("/api/pull", json={})
            assert r2.status == 400
    run(main())


# ---------------------------------------------------------------------------
# timeout + concurrency middleware
# ---------------------------------------------------------------------------

def test_timeout_middleware_408():
    async def main():
        async def slow(request):
            await asyncio.sleep(5)
            return web.json_response({"ok": True})

        async def fast(request):
            return web.json_response({"ok": True})

        async def slow_stream(request):
            request["streaming"] = True
            resp = web.StreamResponse()
            await resp.prepare(request)
            await asyncio.sleep(0.3)
            await resp.write(b"data")
            await resp.write_eof()
            return resp

        app = web.Application(middlewares=[timeout_middleware(0.15)])
        app.router.add_get("/slow", slow)
        app.router.add_get("/fast", fast)
        app.router.add_get("/stream", slow_stream)
        async with TestClient(TestServer(app)) as c:
            assert (await c.get("/fast")).status == 200
            r = await c.get("/slow")
            assert r.status == 408
            body = await r.json()
            assert body["error"]["type"] == "timeout_error"
            # streaming responses are exempt once in flight
            r2 = await c.get("/stream")
            assert r2.status == 200
            assert await r2.read() == b"data"
    run(main())


def test_concurrency_middleware_serializes():
    async def main():
        active = 0
        max_active = 0

        async def handler(request):
            nonlocal active, max_active
            active += 1
            max_active = max(max_active, active)
            await asyncio.sleep(0.05)
            active -= 1
            return web.json_response({"ok": True})

        app = web.Application(middlewares=[concurrency_middleware(2)])
        app.router.add_get("/", handler)
        async with TestClient(TestServer(app)) as c:
            rs = await asyncio.gather(*[c.get("/") for _ in range(6)])
            assert all(r.status == 200 for r in rs)
        assert max_active <= 2
    run(main())


# ---------------------------------------------------------------------------
# config hot-reload wired into the server lifecycle
# ---------------------------------------------------------------------------

def test_server_config_hot_reload(models_root, tmp_path, monkeypatch):
    monkeypatch.setenv("BLAZR_TPU_HOME", str(tmp_path / "home"))
    cfg_path = tmp_path / "home" / "config.yaml"
    cfg_path.parent.mkdir(parents=True)
    cfg_path.write_text("temperature: 0.5\n")

    async def main():
        import os
        sc = ServerConfig(config_poll_interval=0.05)
        async with _client(models_root, sc) as c:
            from blazr_tpu.server.app import STATE_KEY
            state = c.app[STATE_KEY]
            assert state.user_config.temperature == 0.5
            await asyncio.sleep(0.1)
            cfg_path.write_text("temperature: 0.9\nmax_tokens: 7\n")
            os.utime(cfg_path)
            for _ in range(40):                    # wait for the watcher
                await asyncio.sleep(0.05)
                if state.user_config.temperature == 0.9:
                    break
            assert state.user_config.temperature == 0.9
            assert state.user_config.max_tokens == 7
    run(main())
