"""Tests for the remaining server endpoints: responses API, rerank,
infill, LoRA routes, audio stubs, config watcher."""

import asyncio
import json

import numpy as np
import pytest
from aiohttp.test_utils import TestClient, TestServer

from blazr_tpu.config import ServerConfig
from blazr_tpu.engine.model_scheduler import ModelScheduler
from blazr_tpu.server import create_app
from fixtures import write_byte_tokenizer_json, write_tiny_llama_checkpoint


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    path = tmp_path_factory.mktemp("srv2_model")
    write_tiny_llama_checkpoint(path, np.random.default_rng(55))
    write_byte_tokenizer_json(path)
    return path


def _client(model_dir, server_cfg=None):
    scheduler = ModelScheduler(model_dir, dtype="f32")
    app = create_app(scheduler, server_cfg or ServerConfig())
    return TestClient(TestServer(app))


def run(coro):
    return asyncio.run(coro)


def test_responses_api(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/v1/responses", json={
                "input": "hello", "max_output_tokens": 4, "temperature": 0,
            })
            assert r.status == 200
            body = await r.json()
            assert body["object"] == "response"
            assert body["status"] == "completed"
            assert body["output"][-1]["type"] == "message"
            assert isinstance(body["output_text"], str)
            # item-list input + instructions
            r2 = await c.post("/v1/responses", json={
                "instructions": "be brief",
                "input": [{"type": "message", "role": "user",
                           "content": [{"type": "input_text", "text": "hi"}]}],
                "max_output_tokens": 3,
            })
            assert r2.status == 200
            # missing input → 400
            r3 = await c.post("/v1/responses", json={})
            assert r3.status == 400
    run(main())


def test_rerank(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/rerank", json={
                "query": "apple fruit",
                "documents": ["apple pie recipe", "quantum field theory",
                              "apple fruit nutrition"],
                "top_n": 2,
            })
            assert r.status == 200
            body = await r.json()
            assert len(body["results"]) == 2
            scores = [x["relevance_score"] for x in body["results"]]
            assert scores == sorted(scores, reverse=True)
            # /v1/rerank alias
            r2 = await c.post("/v1/rerank", json={
                "query": "q", "documents": ["a"], "return_documents": False,
            })
            assert "document" not in (await r2.json())["results"][0]
            r3 = await c.post("/rerank", json={"query": "q"})
            assert r3.status == 400
    run(main())


def test_infill(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/v1/infill", json={
                "input_prefix": "def add(a, b):\n    ",
                "input_suffix": "\n    return result",
                "max_tokens": 4, "temperature": 0,
            })
            assert r.status == 200
            body = await r.json()
            assert "content" in body and "usage" in body
            r2 = await c.post("/v1/infill", json={})
            assert r2.status == 400
    run(main())


def test_audio_stubs(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/v1/audio/speech", json={"input": "hi"})
            assert r.status == 501
            r2 = await c.post("/v1/audio/transcriptions", json={})
            assert r2.status == 501
            assert (await r.json())["error"]["type"] == "not_implemented_error"
    run(main())


def test_lora_routes(model_dir, tmp_path):
    from blazr_tpu.formats import write_safetensors

    adapter_dir = tmp_path / "adapter"
    adapter_dir.mkdir()
    rng = np.random.default_rng(0)
    weights = {
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight":
            rng.standard_normal((4, 64)).astype(np.float32),
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight":
            rng.standard_normal((64, 4)).astype(np.float32),
    }
    write_safetensors(adapter_dir / "adapter_model.safetensors", weights)
    (adapter_dir / "adapter_config.json").write_text(
        json.dumps({"r": 4, "lora_alpha": 8}))

    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/v1/lora", json={
                "path": str(adapter_dir), "name": "test-adapter"})
            assert r.status == 201
            body = await r.json()
            assert body["name"] == "test-adapter" and body["rank"] == 4
            r2 = await c.get("/v1/lora")
            assert len((await r2.json())["adapters"]) == 1
            r3 = await c.delete("/v1/lora/test-adapter")
            assert r3.status == 200
            r4 = await c.delete("/v1/lora/test-adapter")
            assert r4.status == 404
            r5 = await c.post("/v1/lora", json={"path": "/nope"})
            assert r5.status == 400
    run(main())


def test_config_watch(tmp_path):
    from blazr_tpu.server.config_watch import watch_config

    cfg_file = tmp_path / "config.yaml"
    cfg_file.write_text("temperature: 0.5\n")
    seen = []

    async def main():
        stop = asyncio.Event()
        task = asyncio.create_task(watch_config(
            cfg_file, seen.append, poll_interval=0.05, stop_event=stop))
        await asyncio.sleep(0.15)
        cfg_file.write_text("temperature: 0.9\n")
        import os
        os.utime(cfg_file, (1e9, 2e9))     # force mtime change
        await asyncio.sleep(0.3)
        stop.set()
        await asyncio.sleep(0.1)
        task.cancel()

    run(main())
    assert seen and seen[-1]["temperature"] == 0.9
