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

    strategy = body.get("pooling", "mean")
    normalize = bool(body.get("normalize", True))
    fmt = body.get("encoding_format", "float")

    data = []
    total_tokens = 0
    for i, item in enumerate(inputs):
        ids = (executor.tokenizer.encode(item) if isinstance(item, str)
               else [int(t) for t in item])
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
