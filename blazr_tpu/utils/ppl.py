"""Perplexity evaluation — the Δppl quality gate.

BASELINE.md's quality gate is "Δppl vs fp16 on WikiText-2 ≤ the reference
CPU kernels' dequant error at the same bit-width". No datasets exist in
this environment, so the harness takes any token stream; the gate tests
run it on synthetic text and assert the Δppl ORDERING across bit-widths
(8-bit ≈ lossless < 4-bit < 2-bit), which is representation-level and
dataset-independent.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np


def perplexity(model, token_ids: list[int], window: int = 512,
               stride: Optional[int] = None) -> float:
    """Sliding-window perplexity of ``model`` over a token stream."""
    stride = stride or window
    n = len(token_ids)
    total_nll = 0.0
    total_tok = 0
    for start in range(0, max(n - 1, 1), stride):
        chunk = token_ids[start : start + window + 1]
        if len(chunk) < 2:
            break
        inp = np.asarray(chunk[:-1], dtype=np.int32)[None, :]
        tgt = np.asarray(chunk[1:], dtype=np.int64)
        cache = model.init_cache(1, len(chunk))
        pos = np.arange(inp.shape[1], dtype=np.int32)[None, :]
        logits, _ = model.forward(jnp.asarray(inp), cache, jnp.asarray(pos))
        lp = np.asarray(logits[0], dtype=np.float64)
        lp = lp - lp.max(axis=-1, keepdims=True)
        lse = np.log(np.exp(lp).sum(axis=-1))
        nll = -(lp[np.arange(len(tgt)), tgt] - lse)
        # Only score the non-overlapping tail when striding.
        score_from = 0 if start == 0 else window - stride
        total_nll += float(nll[score_from:].sum())
        total_tok += len(tgt) - score_from
        if start + window + 1 >= n:
            break
    return math.exp(total_nll / max(total_tok, 1))


def delta_ppl(base_model, quant_model, token_ids: list[int],
              window: int = 512) -> tuple[float, float, float]:
    """(ppl_base, ppl_quant, delta)."""
    p0 = perplexity(base_model, token_ids, window)
    p1 = perplexity(quant_model, token_ids, window)
    return p0, p1, p1 - p0
