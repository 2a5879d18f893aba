"""Rerank endpoint (Cohere/Jina-compatible).

TPU-native port of the reference rerank module (src/server/rerank.rs:314):
embed the query and each document, rank by cosine similarity, return the
top-n with optional document echo.
"""

from __future__ import annotations

import asyncio

import numpy as np
from aiohttp import web

from .api_types import ApiError
from .pooling import pool


async def rerank_handler(request: web.Request) -> web.Response:
    from .app import STATE_KEY, _get_executor, _json

    state = request.app[STATE_KEY]
    body = await _json(request)
    executor = await asyncio.to_thread(_get_executor, state, body)

    query = body.get("query")
    documents = body.get("documents")
    if not query or not documents:
        raise ApiError(400, "query and documents are required")
    top_n = int(body.get("top_n", len(documents)))
    return_docs = bool(body.get("return_documents", True))

    def embed(text: str):
        ids = executor.tokenizer.encode(text)
        if not ids:
            return None               # empty doc: NaN-free score of 0
        return pool(np.asarray(executor.get_embeddings(ids)), "mean", True)

    q_vec = await asyncio.to_thread(embed, query)
    if q_vec is None:
        raise ApiError(400, "query must not be empty")
    results = []
    for i, doc in enumerate(documents):
        text = doc if isinstance(doc, str) else doc.get("text", "")
        d_vec = await asyncio.to_thread(embed, text)
        score = 0.0 if d_vec is None else float(np.dot(q_vec, d_vec))
        entry = {"index": i, "relevance_score": score}
        if return_docs:
            entry["document"] = {"text": text}
        results.append(entry)
    results.sort(key=lambda r: -r["relevance_score"])
    return web.json_response({
        "model": body.get("model", "default"),
        "results": results[:top_n],
    })
