"""Code infill (fill-in-the-middle) endpoint.

TPU-native port of the reference infill module (src/server/infill.rs:272):
builds a PSM-order prompt ``<fim_prefix>P<fim_suffix>S<fim_middle>`` using
the tokenizer's FIM special tokens (looked up by the common aliases,
reference :29-48) and generates the middle.
"""

from __future__ import annotations

import asyncio

from aiohttp import web

from ..config.generation import GenerationConfig
from ..engine.generate_text import collect_generation
from .api_types import ApiError, new_id, usage_dict

FIM_PREFIX_ALIASES = ["<fim_prefix>", "<|fim_prefix|>", "<PRE>", "<|fim▁begin|>"]
FIM_SUFFIX_ALIASES = ["<fim_suffix>", "<|fim_suffix|>", "<SUF>", "<|fim▁hole|>"]
FIM_MIDDLE_ALIASES = ["<fim_middle>", "<|fim_middle|>", "<MID>", "<|fim▁end|>"]


def _find_special(tokenizer, aliases: list[str]):
    lookup = getattr(tokenizer, "special_token_id", None)
    if lookup is None:
        return None, None
    for a in aliases:
        tid = lookup(a)
        if tid is not None:
            return a, tid
    return None, None


async def infill_handler(request: web.Request) -> web.Response:
    from .app import STATE_KEY, _get_executor, _json

    state = request.app[STATE_KEY]
    body = await _json(request)
    executor = await asyncio.to_thread(_get_executor, state, body)

    prefix = body.get("input_prefix", body.get("prefix", ""))
    suffix = body.get("input_suffix", body.get("suffix", ""))
    if not prefix and not suffix:
        raise ApiError(400, "input_prefix or input_suffix required")

    p_tok, _ = _find_special(executor.tokenizer, FIM_PREFIX_ALIASES)
    s_tok, _ = _find_special(executor.tokenizer, FIM_SUFFIX_ALIASES)
    m_tok, _ = _find_special(executor.tokenizer, FIM_MIDDLE_ALIASES)
    if p_tok and s_tok and m_tok:
        prompt = f"{p_tok}{prefix}{s_tok}{suffix}{m_tok}"   # PSM order
    else:
        # Model has no FIM vocabulary — degrade to plain continuation.
        prompt = prefix

    cfg = GenerationConfig.from_dict(executor.app_cfg.generation.to_dict())
    cfg.max_tokens = int(body.get("max_tokens", 128))
    if body.get("temperature") is not None:
        cfg.temperature = float(body["temperature"])
    cfg.stop_sequences = list(body.get("stop", [])) or cfg.stop_sequences

    prompt_ids = executor.tokenizer.encode(prompt)
    res = await asyncio.to_thread(collect_generation, executor, prompt_ids, cfg)
    return web.json_response({
        "id": new_id("infill"),
        "content": res.text,
        "stop": res.finish_reason.value != "length",
        "usage": usage_dict(res.prompt_tokens, res.completion_tokens),
    })
