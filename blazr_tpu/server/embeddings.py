"""/v1/embeddings endpoint.

TPU-native port of the reference embeddings endpoint
(src/server/embeddings.rs): string-or-array input, mean/cls/last pooling,
optional L2 normalization, float or base64 output.
"""

from __future__ import annotations

import asyncio

import numpy as np
from aiohttp import web

from .api_types import ApiError, usage_dict
from .encoding import encode_embedding
from .pooling import pool


async def embeddings_handler(request: web.Request) -> web.Response:
    from .app import STATE_KEY, _get_executor, _json

    state = request.app[STATE_KEY]
    body = await _json(request)
    executor = await asyncio.to_thread(_get_executor, state, body)

    inputs = body.get("input")
    if inputs is None:
        raise ApiError(400, "input required")
    if isinstance(inputs, str):
        inputs = [inputs]
    if not isinstance(inputs, list) or not inputs:
        raise ApiError(400, "input must be a non-empty string or array")
    if all(isinstance(t, int) for t in inputs):
        # Flat token-id array = ONE pre-tokenized input (OpenAI spec).
        inputs = [list(inputs)]

    strategy = body.get("pooling", "mean")
    if strategy not in ("mean", "cls", "last"):
        raise ApiError(400, f"unknown pooling strategy {strategy!r} "
                            "(mean | cls | last)")
    normalize = bool(body.get("normalize", True))
    fmt = body.get("encoding_format", "float")
    if fmt not in ("float", "base64"):
        raise ApiError(400, f"unknown encoding_format {fmt!r} "
                            "(float | base64)")

    data = []
    total_tokens = 0
    for i, item in enumerate(inputs):
        ids = (executor.tokenizer.encode(item) if isinstance(item, str)
               else [int(t) for t in item])
        if not ids:
            raise ApiError(400, f"input[{i}] is empty after tokenization")
        total_tokens += len(ids)
        emb = await asyncio.to_thread(executor.get_embeddings, ids)
        vec = pool(np.asarray(emb), strategy, normalize)
        data.append({
            "object": "embedding",
            "index": i,
            "embedding": encode_embedding(vec, fmt),
        })

    return web.json_response({
        "object": "list",
        "data": data,
        "model": body.get("model", "default"),
        "usage": usage_dict(total_tokens, 0),
    })
