"""OpenAI Responses API.

TPU-native port of the reference responses module (src/server/responses.rs
:465): translates ``/v1/responses`` (input string or item list,
instructions, reasoning config) onto the chat pipeline and emits the
Responses output-item shape.
"""

from __future__ import annotations

import asyncio
import time

from aiohttp import web

from ..config.generation import GenerationConfig
from ..engine.generate_text import collect_generation
from ..model_meta.chat_template import ChatMessage, ChatTemplate
from .api_types import ApiError, new_id


def _input_to_messages(body: dict) -> list[ChatMessage]:
    msgs: list[ChatMessage] = []
    instructions = body.get("instructions")
    if instructions:
        msgs.append(ChatMessage("system", instructions))
    inp = body.get("input")
    if inp is None:
        raise ApiError(400, "input required")
    if isinstance(inp, str):
        msgs.append(ChatMessage("user", inp))
        return msgs
    for item in inp:
        if not isinstance(item, dict):
            continue
        itype = item.get("type", "message")
        if itype == "message":
            content = item.get("content")
            if isinstance(content, list):
                text = "".join(
                    c.get("text", "") for c in content
                    if isinstance(c, dict) and c.get("type") in
                    ("input_text", "output_text", "text"))
            else:
                text = str(content or "")
            msgs.append(ChatMessage(item.get("role", "user"), text))
    if not any(m.role != "system" for m in msgs):
        raise ApiError(400, "input must contain at least one message")
    return msgs


async def responses_handler(request: web.Request) -> web.Response:
    from .app import (STATE_KEY, _collect_via_engine, _get_executor, _json,
                      _overloaded)

    state = request.app[STATE_KEY]
    body = await _json(request)
    if body.get("stream"):
        # Honest error beats a silent JSON body an SSE parser chokes on.
        raise ApiError(400, "streaming is not supported on /v1/responses; "
                            "use /v1/chat/completions with stream=true")
    executor = await asyncio.to_thread(_get_executor, state, body)
    msgs = _input_to_messages(body)
    template = ChatTemplate.detect(model_type=executor.model.cfg.model_type)
    prompt = template.apply(msgs)
    prompt_ids = executor.tokenizer.encode(prompt)

    cfg = GenerationConfig.from_dict(executor.app_cfg.generation.to_dict())
    try:
        if body.get("max_output_tokens") is not None:
            cfg.max_tokens = int(body["max_output_tokens"])
        for k in ("temperature", "top_p"):
            if body.get(k) is not None:
                setattr(cfg, k, body[k])
        cfg.validate()
    except (TypeError, ValueError) as e:
        raise ApiError(400, f"invalid sampling parameters: {e}")

    budget = len(prompt_ids) + cfg.max_tokens
    if not state.try_admit(budget):
        return _overloaded()
    try:
        if state.batch_engine is not None:
            res = await _collect_via_engine(state, prompt_ids, cfg)
            from ..model_meta.think import extract_thinking

            res.thinking, res.text = extract_thinking(res.text)
        else:
            res = await asyncio.to_thread(collect_generation, executor,
                                          prompt_ids, cfg, True)
    finally:
        state.release(budget)
    output = []
    if res.thinking:
        output.append({
            "type": "reasoning",
            "id": new_id("rs"),
            "summary": [{"type": "summary_text", "text": res.thinking}],
        })
    output.append({
        "type": "message",
        "id": new_id("msg"),
        "status": "completed",
        "role": "assistant",
        "content": [{"type": "output_text", "text": res.text,
                     "annotations": []}],
    })
    return web.json_response({
        "id": new_id("resp"),
        "object": "response",
        "created_at": int(time.time()),
        "status": "completed",
        "model": body.get("model", "default"),
        "output": output,
        "output_text": res.text,
        "usage": {
            "input_tokens": res.prompt_tokens,
            "output_tokens": res.completion_tokens,
            "total_tokens": res.prompt_tokens + res.completion_tokens,
        },
    })
