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
    from .api_types import gen_config_from_body
    from .app import (STATE_KEY, _collect_via_engine, _get_executor, _json,
                      _overloaded)

    state = request.app[STATE_KEY]
    body = await _json(request)
    executor = await asyncio.to_thread(_get_executor, state, body)

    prefix = body.get("input_prefix", body.get("prefix", ""))
    suffix = body.get("input_suffix", body.get("suffix", ""))
    if not prefix and not suffix:
        raise ApiError(400, "input_prefix or input_suffix required")

    p_tok, p_id = _find_special(executor.tokenizer, FIM_PREFIX_ALIASES)
    s_tok, s_id = _find_special(executor.tokenizer, FIM_SUFFIX_ALIASES)
    m_tok, m_id = _find_special(executor.tokenizer, FIM_MIDDLE_ALIASES)
    enc = executor.tokenizer.encode
    if p_id is not None and s_id is not None and m_id is not None:
        # Build at the TOKEN level from the looked-up ids — re-encoding
        # the control strings as text fails on SentencePiece tokenizers
        # (no special-token splitting in encode), which is exactly the
        # CodeLlama <PRE>/<SUF>/<MID> family. PSM order.
        prompt_ids = [p_id] + enc(prefix) + [s_id] + enc(suffix) + [m_id]
    else:
        # Model has no FIM vocabulary — degrade to plain continuation.
        prompt_ids = enc(prefix)

    # Shared parser: correct string-vs-list `stop` handling, validation.
    cfg = gen_config_from_body(body, executor.app_cfg.generation)
    if body.get("max_tokens") is None:
        cfg.max_tokens = 128
    try:
        cfg.validate()
    except (TypeError, ValueError) as e:
        raise ApiError(400, f"invalid sampling parameters: {e}")

    budget = len(prompt_ids) + cfg.max_tokens
    if not state.try_admit(budget):
        return _overloaded()
    try:
        if state.batch_engine is not None:
            res = await _collect_via_engine(state, prompt_ids, cfg)
        else:
            res = await asyncio.to_thread(collect_generation, executor,
                                          prompt_ids, cfg)
    finally:
        state.release(budget)
    return web.json_response({
        "id": new_id("infill"),
        "content": res.text,
        "stop": res.finish_reason.value != "length",
        "usage": usage_dict(res.prompt_tokens, res.completion_tokens),
    })
