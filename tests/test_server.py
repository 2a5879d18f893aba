"""Live-server API-contract tests — the port of the reference integration
suite (tests/api.rs: health/models/metrics, 404/400 validation,
completions + chat, streaming [DONE] + role-chunk assertions,
tokenize/detokenize roundtrip, stop-sequence semantics, concurrency,
admission control, slots lifecycle) against a real in-process aiohttp
server over the tiny model."""

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
    rng = np.random.default_rng(77)
    path = tmp_path_factory.mktemp("server_model")
    write_tiny_llama_checkpoint(path, rng)
    write_byte_tokenizer_json(path)
    return path


def _client(model_dir, server_cfg=None):
    scheduler = ModelScheduler(model_dir, dtype="f32")
    app = create_app(scheduler, server_cfg or ServerConfig())
    return TestClient(TestServer(app))


def run(coro):
    return asyncio.run(coro)


# ---------------------------------------------------------------------------

def test_health(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.get("/health")
            assert r.status == 200
            body = await r.json()
            assert body["status"] == "ok"
    run(main())


def test_models_list_and_get(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.get("/v1/models")
            data = await r.json()
            assert data["object"] == "list" and data["data"]
            model_id = data["data"][0]["id"]
            r2 = await c.get(f"/v1/models/{model_id}")
            assert r2.status == 200
            r3 = await c.get("/v1/models/definitely-not-a-model")
            assert r3.status == 404
    run(main())


def test_validation_errors(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "x"}],
                "temperature": 5.0,
            })
            assert r.status == 400
            body = await r.json()
            assert "temperature" in body["error"]["message"]
            r2 = await c.post("/v1/chat/completions", json={"messages": []})
            assert r2.status == 400
            r3 = await c.post("/v1/completions", data=b"{not json")
            assert r3.status == 400
    run(main())


def test_completions_basic(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/v1/completions", json={
                "prompt": "hello", "max_tokens": 4, "temperature": 0.0,
            })
            assert r.status == 200
            body = await r.json()
            assert body["object"] == "text_completion"
            assert body["choices"][0]["finish_reason"] in ("length", "stop")
            assert body["usage"]["prompt_tokens"] > 0
            assert body["usage"]["completion_tokens"] <= 4
    run(main())


def test_chat_completions_basic(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4, "temperature": 0.0,
            })
            assert r.status == 200
            body = await r.json()
            assert body["object"] == "chat.completion"
            msg = body["choices"][0]["message"]
            assert msg["role"] == "assistant"
            assert isinstance(msg["content"], str)
    run(main())


def test_chat_streaming_role_chunk_and_done(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4, "temperature": 0.0, "stream": True,
            })
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/event-stream")
            raw = (await r.read()).decode()
            events = [l[6:] for l in raw.splitlines() if l.startswith("data: ")]
            assert events[-1] == "[DONE]"
            first = json.loads(events[0])
            assert first["choices"][0]["delta"].get("role") == "assistant"
            finals = [json.loads(e) for e in events[:-1]]
            assert any(ch["choices"][0]["finish_reason"] for ch in finals)
    run(main())


def test_completions_streaming(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/v1/completions", json={
                "prompt": "abc", "max_tokens": 3, "stream": True,
                "temperature": 0.0,
            })
            raw = (await r.read()).decode()
            assert raw.strip().endswith("data: [DONE]")
    run(main())


def test_tokenize_detokenize_roundtrip(model_dir):
    async def main():
        async with _client(model_dir) as c:
            text = "roundtrip me!"
            r = await c.post("/tokenize", json={"content": text})
            toks = (await r.json())["tokens"]
            assert len(toks) > 0
            r2 = await c.post("/detokenize", json={"tokens": toks})
            assert (await r2.json())["content"] == text
    run(main())


def test_stop_sequences(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/v1/completions", json={
                "prompt": "hello", "max_tokens": 32, "temperature": 0.0,
                "stop": ["zzz-never-appears"],
            })
            body = await r.json()
            assert body["choices"][0]["finish_reason"] == "length"
    run(main())


def test_concurrent_requests(model_dir):
    async def main():
        async with _client(model_dir) as c:
            async def one(i):
                r = await c.post("/v1/completions", json={
                    "prompt": f"req {i}", "max_tokens": 3, "temperature": 0.0,
                })
                assert r.status == 200
                return (await r.json())["choices"][0]["text"]
            outs = await asyncio.gather(*[one(i) for i in range(3)])
            assert len(outs) == 3
    run(main())


def test_admission_control_503(model_dir):
    async def main():
        cfg = ServerConfig(max_inflight_tokens=1)
        async with _client(model_dir, cfg) as c:
            r = await c.post("/v1/completions", json={
                "prompt": "this prompt is too long for the budget",
                "max_tokens": 50,
            })
            assert r.status == 503
            assert r.headers.get("Retry-After") == "1"
    run(main())


def test_auth_required(model_dir):
    async def main():
        cfg = ServerConfig(api_keys=["sk-test"])
        async with _client(model_dir, cfg) as c:
            r = await c.post("/v1/completions", json={"prompt": "x"})
            assert r.status == 401
            r2 = await c.get("/health")   # unprotected
            assert r2.status == 200
            r3 = await c.post("/v1/completions",
                              json={"prompt": "x", "max_tokens": 2},
                              headers={"Authorization": "Bearer sk-test"})
            assert r3.status == 200
    run(main())


def test_metrics_endpoint(model_dir):
    async def main():
        async with _client(model_dir) as c:
            await c.post("/v1/completions",
                         json={"prompt": "x", "max_tokens": 2})
            r = await c.get("/metrics")
            text = await r.text()
            assert "blazr_tpu_requests_total" in text
            assert "blazr_tpu_tokens_generated_total" in text
    run(main())


def test_slots_lifecycle(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/api/slots", json={"model": "default"})
            assert r.status == 201
            slot = await r.json()
            r2 = await c.get("/api/slots")
            slots = (await r2.json())["slots"]
            assert any(s["id"] == slot["id"] for s in slots)
            r3 = await c.delete(f"/api/slots/{slot['id']}")
            assert r3.status == 200
            r4 = await c.delete(f"/api/slots/{slot['id']}")
            assert r4.status == 404
    run(main())


def test_management_endpoints(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.get("/api/tags")
            assert (await r.json())["models"]
            r2 = await c.post("/api/show", json={})
            info = (await r2.json())["model_info"]
            assert info["hidden_size"] == 64
            r3 = await c.get("/api/ps")
            assert "models" in (await r3.json())
    run(main())


def test_embeddings(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/v1/embeddings", json={
                "input": ["hello", "world"],
            })
            body = await r.json()
            assert len(body["data"]) == 2
            v = body["data"][0]["embedding"]
            assert len(v) == 64
            n = sum(x * x for x in v) ** 0.5
            assert abs(n - 1.0) < 1e-3      # normalized
    run(main())


def test_anthropic_messages(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/v1/messages", json={
                "model": "default", "max_tokens": 4,
                "messages": [{"role": "user", "content": "hi"}],
            })
            assert r.status == 200
            body = await r.json()
            assert body["type"] == "message"
            assert body["content"][0]["type"] == "text"
            assert body["usage"]["input_tokens"] > 0
            # missing max_tokens → 400
            r2 = await c.post("/v1/messages", json={
                "messages": [{"role": "user", "content": "hi"}]})
            assert r2.status == 400
            r3 = await c.post("/v1/messages/count_tokens", json={
                "messages": [{"role": "user", "content": "count me"}]})
            assert (await r3.json())["input_tokens"] > 0
    run(main())


def test_anthropic_streaming(model_dir):
    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/v1/messages", json={
                "model": "default", "max_tokens": 3, "stream": True,
                "messages": [{"role": "user", "content": "hi"}],
            })
            raw = (await r.read()).decode()
            assert "event: message_start" in raw
            assert "event: content_block_delta" in raw
            assert "event: message_stop" in raw
    run(main())


def test_chat_via_batch_engine(model_dir):
    """Serving through the continuous-batching engine (the reference's
    primary mode): non-streaming + streaming + concurrency."""
    from blazr_tpu.engine.batch_engine import BatchEngine

    async def main():
        scheduler = ModelScheduler(model_dir, dtype="f32")
        ex = scheduler.get_executor("default")
        ex.app_cfg.inference.max_seq_len = 128
        ex.app_cfg.inference.prefix_cache = True
        engine = BatchEngine(ex.model, ex.tokenizer, ex.app_cfg)
        app = create_app(scheduler, ServerConfig(), batch_engine=engine)
        async with TestClient(TestServer(app)) as c:
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4, "temperature": 0.0,
            })
            assert r.status == 200
            body = await r.json()
            assert isinstance(body["choices"][0]["message"]["content"], str)

            r2 = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 3, "temperature": 0.0, "stream": True,
            })
            raw = (await r2.read()).decode()
            assert raw.strip().endswith("data: [DONE]")

            async def one(i):
                r = await c.post("/v1/completions", json={
                    "prompt": f"c{i}", "max_tokens": 3, "temperature": 0.0})
                assert r.status == 200
                return (await r.json())["choices"][0]["text"]
            outs = await asyncio.gather(*[one(i) for i in range(3)])
            assert len(outs) == 3

            # Horizon telemetry surfaces on /metrics (VERDICT r2 #7;
            # reference logs speculative stats, speculative.rs:131-136).
            m = await c.get("/metrics")
            text = await m.text()
            assert "blazr_tpu_spec_drafted_total" in text
            hline = next(ln for ln in text.splitlines()
                         if ln.startswith(
                             "blazr_tpu_horizon_steps_per_dispatch"))
            assert float(hline.split()[-1]) >= 1.0
    run(main())


def test_chat_via_lockstep_engine(model_dir):
    """Serving through the LockstepEngine wrapper (multi-node SPMD serving
    degenerate single-process path): the server's awaitable-submit branch,
    streaming, and metrics gauges through the wrapped scheduler."""
    from blazr_tpu.distributed.lockstep import LockstepEngine
    from blazr_tpu.engine.batch_engine import BatchEngine

    async def main():
        scheduler = ModelScheduler(model_dir, dtype="f32")
        ex = scheduler.get_executor("default")
        ex.app_cfg.inference.max_seq_len = 128
        ex.app_cfg.inference.prefix_cache = True
        engine = LockstepEngine(
            BatchEngine(ex.model, ex.tokenizer, ex.app_cfg),
            heartbeat_s=0.2)
        app = create_app(scheduler, ServerConfig(), batch_engine=engine)
        async with TestClient(TestServer(app)) as c:
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4, "temperature": 0.0,
            })
            assert r.status == 200
            body = await r.json()
            assert isinstance(body["choices"][0]["message"]["content"], str)

            r2 = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 3, "temperature": 0.0, "stream": True,
            })
            raw = (await r2.read()).decode()
            assert raw.strip().endswith("data: [DONE]")

            m = await c.get("/metrics")
            assert m.status == 200
            assert "blazr_tpu_queue_depth" in (await m.text())
        assert engine.steps > 0
    run(main())


def test_completions_logprobs_direct(model_dir):
    """Classic /v1/completions logprobs shape (reference completions.rs +
    sampling.rs:197-256): parallel tokens / token_logprobs / top_logprobs /
    text_offset arrays, int `logprobs` = alternatives per token."""
    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/v1/completions", json={
                "prompt": "hello", "max_tokens": 4, "temperature": 0.0,
                "logprobs": 2,
            })
            assert r.status == 200
            lp = (await r.json())["choices"][0]["logprobs"]
            assert lp is not None
            n = len(lp["tokens"])
            assert n > 0
            assert len(lp["token_logprobs"]) == n
            assert len(lp["top_logprobs"]) == n
            assert len(lp["text_offset"]) == n
            assert all(v <= 0.0 for v in lp["token_logprobs"])
            assert all(t is None or len(t) <= 2 for t in lp["top_logprobs"])
    run(main())


def test_chat_logprobs_direct(model_dir):
    """OpenAI chat logprobs content block through the direct executor."""
    async def main():
        async with _client(model_dir) as c:
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4, "temperature": 0.0,
                "logprobs": True, "top_logprobs": 3,
            })
            assert r.status == 200
            lp = (await r.json())["choices"][0]["logprobs"]
            assert lp and lp["content"]
            entry = lp["content"][0]
            assert "token" in entry and "logprob" in entry
            assert entry["logprob"] <= 0.0
            assert len(entry["top_logprobs"]) <= 3
            # the chosen token's logprob must appear no better than the best
            # alternative (top-1 is the argmax of the distribution)
            assert entry["logprob"] <= entry["top_logprobs"][0]["logprob"] + 1e-5
    run(main())


def test_logprobs_via_batch_engine(model_dir):
    """Logprobs through the continuous-batching engine: the fused top-K
    fetch in the batched decode/prefill programs (non-streaming chat,
    completions, and a streaming request carrying per-chunk logprobs)."""
    from blazr_tpu.engine.batch_engine import BatchEngine

    async def main():
        scheduler = ModelScheduler(model_dir, dtype="f32")
        ex = scheduler.get_executor("default")
        ex.app_cfg.inference.max_seq_len = 128
        ex.app_cfg.inference.prefix_cache = True
        engine = BatchEngine(ex.model, ex.tokenizer, ex.app_cfg)
        app = create_app(scheduler, ServerConfig(), batch_engine=engine)
        async with TestClient(TestServer(app)) as c:
            r = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 4, "temperature": 0.0,
                "logprobs": True, "top_logprobs": 4,
            })
            assert r.status == 200
            lp = (await r.json())["choices"][0]["logprobs"]
            assert lp and lp["content"]
            for entry in lp["content"]:
                assert entry["logprob"] <= 0.0
                assert 1 <= len(entry["top_logprobs"]) <= 4
                # entries are sorted best-first
                lps = [t["logprob"] for t in entry["top_logprobs"]]
                assert lps == sorted(lps, reverse=True)

            r2 = await c.post("/v1/completions", json={
                "prompt": "hey", "max_tokens": 3, "temperature": 0.0,
                "logprobs": 1,
            })
            assert r2.status == 200
            lp2 = (await r2.json())["choices"][0]["logprobs"]
            assert lp2 is not None and len(lp2["tokens"]) > 0
            assert all(t is None or len(t) <= 1 for t in lp2["top_logprobs"])

            r3 = await c.post("/v1/chat/completions", json={
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 3, "temperature": 0.0, "stream": True,
                "logprobs": True, "top_logprobs": 2,
            })
            raw = (await r3.read()).decode()
            assert raw.strip().endswith("data: [DONE]")
            chunks = [json.loads(ln[len("data: "):])
                      for ln in raw.splitlines()
                      if ln.startswith("data: ") and ln != "data: [DONE]"]
            lp_chunks = [ch for ch in chunks
                         if ch["choices"][0].get("logprobs")]
            assert lp_chunks, "no streamed chunk carried logprobs"
            entry = lp_chunks[0]["choices"][0]["logprobs"]["content"][0]
            assert len(entry["top_logprobs"]) <= 2

            # mixed batch: one logprobs row + one plain row concurrently
            async def one(i, want_lp):
                body = {"prompt": f"m{i}", "max_tokens": 3,
                        "temperature": 0.0}
                if want_lp:
                    body["logprobs"] = 2
                r = await c.post("/v1/completions", json=body)
                assert r.status == 200
                return (await r.json())["choices"][0]["logprobs"]
            outs = await asyncio.gather(one(0, True), one(1, False))
            assert outs[0] is not None and outs[1] is None
    run(main())


def test_chat_context_token_prefix(model_dir):
    """Ollama-style ``context`` continuation (reference chat_types.rs:50,
    applied chat.rs:56-65): caller-supplied token ids are decoded and
    prepended before the templated prompt — visible as exactly
    len(context) extra prompt tokens under the byte tokenizer."""
    async def main():
        async with _client(model_dir) as c:
            base = {"messages": [{"role": "user", "content": "hi"}],
                    "max_tokens": 2, "temperature": 0.0}
            r0 = await c.post("/v1/chat/completions", json=base)
            p0 = (await r0.json())["usage"]["prompt_tokens"]
            ctx = [ord(x) for x in "prior turn"]
            r1 = await c.post("/v1/chat/completions",
                              json={**base, "context": ctx})
            assert r1.status == 200
            p1 = (await r1.json())["usage"]["prompt_tokens"]
            assert p1 == p0 + len(ctx)

            # completions: string prompt gets the decoded prefix...
            r2 = await c.post("/v1/completions", json={
                "prompt": "abc", "max_tokens": 2, "temperature": 0.0,
                "context": ctx})
            assert r2.status == 200
            u2 = (await r2.json())["usage"]["prompt_tokens"]
            assert u2 == len(ctx) + 3
            # ...and a pre-tokenized prompt gets the ids prepended raw.
            r3 = await c.post("/v1/completions", json={
                "prompt": [104, 105], "max_tokens": 2, "temperature": 0.0,
                "context": ctx})
            assert (await r3.json())["usage"]["prompt_tokens"] == \
                len(ctx) + 2

            # malformed context -> 400
            r4 = await c.post("/v1/chat/completions",
                              json={**base, "context": ["x", 1]})
            assert r4.status == 400
    run(main())
