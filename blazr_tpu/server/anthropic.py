"""Anthropic Messages API translation.

TPU-native port of the reference anthropic module (src/server/anthropic.rs
:498): ``/v1/messages`` (content blocks, system string-or-blocks,
stop_sequences, streaming) and ``/v1/messages/count_tokens`` — translated
onto the chat pipeline.
"""

from __future__ import annotations

import asyncio
import json
import time

from aiohttp import web

from ..config.generation import GenerationConfig
from ..engine.generate_text import collect_generation, stream_generation
from ..model_meta.chat_template import ChatMessage, ChatTemplate
from .api_types import ApiError, new_id


def _blocks_to_text(content) -> str:
    if isinstance(content, str):
        return content
    if isinstance(content, list):
        parts = []
        for b in content:
            if isinstance(b, dict) and b.get("type") == "text":
                parts.append(b.get("text", ""))
        return "".join(parts)
    return str(content or "")


def _anthropic_messages(body: dict) -> list[ChatMessage]:
    msgs: list[ChatMessage] = []
    system = body.get("system")
    if system:
        msgs.append(ChatMessage("system", _blocks_to_text(system)))
    for m in body.get("messages", []):
        msgs.append(ChatMessage(m.get("role", "user"),
                                _blocks_to_text(m.get("content"))))
    if not any(m.role != "system" for m in msgs):
        raise ApiError(400, "messages must not be empty")
    return msgs


def _gen_config(body: dict, defaults: GenerationConfig) -> GenerationConfig:
    cfg = GenerationConfig.from_dict(defaults.to_dict())
    try:
        if body.get("max_tokens") is not None:
            cfg.max_tokens = int(body["max_tokens"])
        for k in ("temperature", "top_p", "top_k"):
            if body.get(k) is not None:
                setattr(cfg, k, body[k])
        if body.get("stop_sequences"):
            cfg.stop_sequences = list(body["stop_sequences"])
        cfg.validate()                 # same 400 path as chat/completions
    except (TypeError, ValueError) as e:
        raise ApiError(400, f"invalid sampling parameters: {e}")
    return cfg


async def messages_handler(request: web.Request) -> web.Response:
    from .app import STATE_KEY, _collect_via_engine, _get_executor, _json, \
        _overloaded

    state = request.app[STATE_KEY]
    body = await _json(request)
    if body.get("max_tokens") is None:
        raise ApiError(400, "max_tokens is required")
    executor = await asyncio.to_thread(_get_executor, state, body)
    msgs = _anthropic_messages(body)
    template = ChatTemplate.detect(model_type=executor.model.cfg.model_type)
    prompt = template.apply(msgs)
    prompt_ids = executor.tokenizer.encode(prompt)
    cfg = _gen_config(body, executor.app_cfg.generation)

    # Same overload protection as chat/completions (admission budget).
    budget = len(prompt_ids) + cfg.max_tokens
    if not state.try_admit(budget):
        return _overloaded()
    state.metrics.requests_active.inc()
    t0 = time.time()
    try:
        if body.get("stream"):
            return await _stream_messages(request, state, executor,
                                          prompt_ids, cfg, body)

        if state.batch_engine is not None:
            res = await _collect_via_engine(state, prompt_ids, cfg)
        else:
            res = await asyncio.to_thread(collect_generation, executor,
                                          prompt_ids, cfg)
        stop_reason = {
            "eos": "end_turn", "length": "max_tokens", "stop": "stop_sequence",
        }.get(res.finish_reason.value, "end_turn")
        state.metrics.tokens_prompted.inc(res.prompt_tokens)
        state.metrics.tokens_generated.inc(res.completion_tokens)
        state.slo.record_e2e(time.time() - t0)
        return web.json_response({
            "id": new_id("msg"),
            "type": "message",
            "role": "assistant",
            "model": body.get("model", "default"),
            "content": [{"type": "text", "text": res.text}],
            "stop_reason": stop_reason,
            "stop_sequence": None,
            "usage": {"input_tokens": res.prompt_tokens,
                      "output_tokens": res.completion_tokens},
        })
    finally:
        state.release(budget)
        state.metrics.requests_active.dec()


async def _stream_messages(request, state, executor, prompt_ids, cfg, body):
    """Anthropic streaming event sequence: message_start →
    content_block_start → deltas → content_block_stop → message_delta →
    message_stop. Rides the continuous-batching engine when available;
    errors surface as an ``error`` event, and a client disconnect
    cancels the engine sequence."""
    import inspect

    from ..engine.generate_text import StopScanner
    from ..engine.types import FinishReason

    request["streaming"] = True   # exempt in-flight SSE from the timeout
    resp = web.StreamResponse(headers={
        "Content-Type": "text/event-stream",
        "Cache-Control": "no-cache",
    })
    await resp.prepare(request)

    def ev(name: str, data: dict) -> bytes:
        return f"event: {name}\ndata: {json.dumps(data)}\n\n".encode()

    mid = new_id("msg")
    await resp.write(ev("message_start", {
        "type": "message_start",
        "message": {"id": mid, "type": "message", "role": "assistant",
                    "model": body.get("model", "default"), "content": [],
                    "usage": {"input_tokens": len(prompt_ids),
                              "output_tokens": 0}},
    }))
    await resp.write(ev("content_block_start", {
        "type": "content_block_start", "index": 0,
        "content_block": {"type": "text", "text": ""},
    }))

    loop = asyncio.get_running_loop()
    queue: asyncio.Queue = asyncio.Queue()
    seq_ref: dict = {}
    tok_count = [0]

    def produce():
        try:
            for delta, fin in stream_generation(executor, prompt_ids, cfg):
                tok_count[0] += 1
                loop.call_soon_threadsafe(queue.put_nowait,
                                          (delta, fin, None))
        except Exception as e:        # surfaced as an SSE error event
            loop.call_soon_threadsafe(queue.put_nowait, ("", None, str(e)))
        loop.call_soon_threadsafe(queue.put_nowait, None)

    async def produce_engine():
        try:
            eng = state.batch_engine
            handle = eng.submit(prompt_ids, cfg)
            if inspect.isawaitable(handle):
                handle = await handle
            seq_ref["id"] = handle.seq_id
            scanner = StopScanner(cfg.stop_sequences)
            while True:
                tok, fin = await handle.queue.get()
                if tok is not None:
                    tok_count[0] += 1
                    emit, stopped = scanner.push(tok.text)
                    if stopped:
                        eng.cancel(handle.seq_id)
                        queue.put_nowait((emit, FinishReason.STOP, None))
                        break
                    if emit:
                        queue.put_nowait((emit, None, None))
                if fin is not None:
                    queue.put_nowait((scanner.flush(), fin, None))
                    break
        except Exception as e:
            queue.put_nowait(("", None, str(e)))
        queue.put_nowait(None)

    if state.batch_engine is not None:
        task = asyncio.ensure_future(produce_engine())
    else:
        task = loop.run_in_executor(None, produce)
    finish = "end_turn"
    try:
        while True:
            item = await queue.get()
            if item is None:
                break
            delta, fin, err = item
            if err is not None:
                await resp.write(ev("error", {
                    "type": "error",
                    "error": {"type": "api_error", "message": err}}))
                break
            if delta:
                await resp.write(ev("content_block_delta", {
                    "type": "content_block_delta", "index": 0,
                    "delta": {"type": "text_delta", "text": delta},
                }))
            if fin is not None:
                finish = {"eos": "end_turn", "length": "max_tokens",
                          "stop": "stop_sequence"}.get(fin.value, "end_turn")
                break
        await resp.write(ev("content_block_stop",
                            {"type": "content_block_stop", "index": 0}))
        await resp.write(ev("message_delta", {
            "type": "message_delta",
            "delta": {"stop_reason": finish, "stop_sequence": None},
            "usage": {"output_tokens": tok_count[0]},
        }))
        await resp.write(ev("message_stop", {"type": "message_stop"}))
    except (ConnectionResetError, asyncio.CancelledError):
        if seq_ref.get("id") is not None and state.batch_engine is not None:
            try:
                state.batch_engine.cancel(seq_ref["id"])
            except Exception:
                pass
    finally:
        await task
    await resp.write_eof()
    return resp


async def count_tokens_handler(request: web.Request) -> web.Response:
    from .app import STATE_KEY, _get_executor, _json

    state = request.app[STATE_KEY]
    body = await _json(request)
    executor = await asyncio.to_thread(_get_executor, state, body)
    msgs = _anthropic_messages(body)
    template = ChatTemplate.detect(model_type=executor.model.cfg.model_type)
    prompt = template.apply(msgs)
    ids = executor.tokenizer.encode(prompt)
    return web.json_response({"input_tokens": len(ids)})
