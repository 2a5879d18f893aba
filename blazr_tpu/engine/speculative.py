"""Speculative decoding: draft-k / verify loop with adaptive depth.

TPU-native port of the reference speculative machinery
(src/engine/speculative.rs + boostr SpeculativeExecutor, SURVEY §2.9
"Speculative" row): a small draft model proposes ``k`` tokens, the target
model verifies them in ONE forward (the XLA win: verification of k tokens
costs one prefill-shaped step), accepted prefix keeps, first mismatch
resamples from the target. Adaptive depth grows/shrinks k with the
acceptance rate (reference SpeculativeConfig.adaptive_depth).

Greedy verification (temperature 0) gives exact target-distribution
output; sampled verification uses standard rejection sampling. Both
speculative paths verify with PURE argmax — run them with the
penalty-free greedy preset (``GenerationConfig.greedy()``); repeat
penalties would need per-position host reapplication inside the block.
"""

from __future__ import annotations

import dataclasses
import logging
from dataclasses import dataclass
from typing import Iterator, Optional

import jax.numpy as jnp
import numpy as np

from ..config.generation import GenerationConfig
from ..config.inference import SpeculativeDecodingConfig
from .types import GeneratedToken

logger = logging.getLogger(__name__)


@dataclass
class SpeculativeStats:
    """Accepted/rejected counters (reference stats logging,
    generate_text.rs:131-136)."""

    drafted: int = 0
    accepted: int = 0
    rejected: int = 0
    rounds: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.accepted / self.drafted if self.drafted else 0.0


class SpeculativeExecutor:
    """Drives a draft + target Executor pair."""

    def __init__(self, draft, target,
                 cfg: Optional[SpeculativeDecodingConfig] = None):
        self.draft = draft
        self.target = target
        self.cfg = cfg or SpeculativeDecodingConfig()
        self.stats = SpeculativeStats()

    def generate(self, prompt_ids: list[int], gen_cfg: GenerationConfig
                 ) -> Iterator[GeneratedToken]:
        """Greedy speculative generation (exact target parity)."""
        k = self.cfg.num_speculative_tokens
        if (gen_cfg.repeat_penalty != 1.0 or gen_cfg.frequency_penalty
                or gen_cfg.presence_penalty):
            logger.warning(
                "speculative verification is pure argmax; repeat/frequency/"
                "presence penalties are ignored (set repeat_penalty=1.0 to "
                "silence)")
        max_new = gen_cfg.max_tokens
        capacity = min(self.target.capacity, self.draft.capacity)

        t_cache = self.target.model.init_cache(1, capacity)
        d_cache = self.draft.model.init_cache(1, capacity)

        # Prefill both models on the prompt.
        t_last, t_cache = self.target.prefill(t_cache, prompt_ids)
        d_last, d_cache = self.draft.prefill(d_cache, prompt_ids)

        tokens = list(prompt_ids)
        emitted = 0
        cur = int(np.asarray(t_last)[0].argmax())

        while emitted < max_new and len(tokens) + 1 < capacity:
            yield GeneratedToken(token_id=cur, text=self._text(cur))
            emitted += 1
            tokens.append(cur)
            if self.target.tokenizer.is_eos(cur) or emitted >= max_new:
                return

            # --- draft k tokens (greedy) --------------------------------
            draft_toks: list[int] = []
            d_in = cur
            pos = len(tokens) - 1
            budget = min(k, capacity - len(tokens) - 1, max_new - emitted)
            for j in range(budget):
                d_logits, d_cache = self.draft._forward_step(
                    d_cache, jnp.asarray([[d_in]], dtype=jnp.int32),
                    jnp.asarray([[pos + j]], dtype=jnp.int32),
                    jnp.asarray([pos + j + 1], dtype=jnp.int32))
                d_in = int(np.asarray(d_logits)[0].argmax())
                draft_toks.append(d_in)
            self.stats.drafted += len(draft_toks)
            self.stats.rounds += 1

            # --- verify with ONE target forward over [cur, drafts...] ----
            block = [cur] + draft_toks
            positions = np.arange(pos, pos + len(block), dtype=np.int32)[None, :]
            t_logits, t_cache = self.target._verify_step(
                t_cache, jnp.asarray([block], dtype=jnp.int32),
                jnp.asarray(positions),
                jnp.asarray([pos + len(block)], dtype=np.int32))
            t_greedy = np.asarray(t_logits)[0].argmax(axis=-1)  # [len(block)]

            # Accept the longest prefix where target agrees with the draft.
            n_accept = 0
            for j, d_tok in enumerate(draft_toks):
                if int(t_greedy[j]) == d_tok:
                    n_accept += 1
                else:
                    break
            self.stats.accepted += n_accept
            self.stats.rejected += len(draft_toks) - n_accept

            for j in range(n_accept):
                tok = draft_toks[j]
                yield GeneratedToken(token_id=tok, text=self._text(tok))
                emitted += 1
                tokens.append(tok)
                if self.target.tokenizer.is_eos(tok) or emitted >= max_new:
                    return
            # Next token = target's correction (or continuation) point.
            cur = int(t_greedy[n_accept])

            # Roll back target/draft caches past the rejected suffix by
            # rewriting lengths (contiguous cache: cheap length reset).
            true_len = len(tokens)
            t_cache = self._trim(t_cache, true_len)
            d_cache = self._trim(d_cache, true_len)
            # Re-sync the draft on the accepted region (one forward).
            if n_accept < len(draft_toks):
                d_logits, d_cache = self.draft._forward_step(
                    d_cache,
                    jnp.asarray([[tokens[-1]]], dtype=jnp.int32),
                    jnp.asarray([[true_len - 1]], dtype=jnp.int32),
                    jnp.asarray([true_len], dtype=np.int32))

            # Adaptive depth (reference adaptive_depth).
            if self.cfg.adaptive_depth and self.stats.rounds % 8 == 0:
                rate = self.stats.acceptance_rate
                if rate > 0.8:
                    k = min(k + 1, 16)
                elif rate < 0.4:
                    k = max(k - 1, 1)

    @staticmethod
    def _trim(cache, length: int):
        return dataclasses.replace(
            cache, length=jnp.minimum(
                cache.length, jnp.asarray([length], dtype=jnp.int32)))

    def _text(self, tok: int) -> str:
        try:
            return self.target.tokenizer.decode([tok])
        except Exception:
            return ""


def prompt_lookup_draft(tokens: list[int], budget: int,
                        ngram_max: int = 3, ngram_min: int = 1) -> list[int]:
    """Find the most recent earlier occurrence of the longest trailing
    n-gram and copy its continuation (prompt-lookup / n-gram drafting)."""
    t = len(tokens)
    for n in range(min(ngram_max, t - 1), ngram_min - 1, -1):
        tail = tokens[t - n:]
        # scan most-recent-first, excluding the trailing match itself
        for s in range(t - n - 1, -1, -1):
            if tokens[s:s + n] == tail:
                cont = tokens[s + n: s + n + budget]
                if cont:
                    return cont
    return []


class PromptLookupExecutor:
    """Draft-model-free speculation: drafts are copied from the sequence's
    own history (prompt-lookup / n-gram speculation). The longest recent
    n-gram that re-occurs earlier in the context proposes its historical
    continuation; the target verifies in one forward exactly like the
    draft-model path.

    Wins on extractive/repetitive workloads (RAG quoting, code edits,
    JSON echoing) with ZERO extra model memory — a mode the reference
    lacks (speculative.rs requires a draft checkpoint)."""

    def __init__(self, target, num_speculative_tokens: int = 8,
                 ngram_max: int = 3, ngram_min: int = 1):
        self.target = target
        self.k = num_speculative_tokens
        self.ngram_max = ngram_max
        self.ngram_min = ngram_min
        self.stats = SpeculativeStats()

    def _draft(self, tokens: list[int], budget: int) -> list[int]:
        return prompt_lookup_draft(tokens, budget, self.ngram_max,
                                   self.ngram_min)

    def generate(self, prompt_ids: list[int], gen_cfg: GenerationConfig
                 ) -> Iterator[GeneratedToken]:
        """Greedy prompt-lookup generation (exact target parity)."""
        if (gen_cfg.repeat_penalty != 1.0 or gen_cfg.frequency_penalty
                or gen_cfg.presence_penalty):
            logger.warning(
                "speculative verification is pure argmax; repeat/frequency/"
                "presence penalties are ignored (set repeat_penalty=1.0 to "
                "silence)")
        max_new = gen_cfg.max_tokens
        capacity = self.target.capacity
        cache = self.target.model.init_cache(1, capacity)
        last, cache = self.target.prefill(cache, prompt_ids)

        tokens = list(prompt_ids)
        emitted = 0
        cur = int(np.asarray(last)[0].argmax())

        while emitted < max_new and len(tokens) + 1 < capacity:
            yield GeneratedToken(token_id=cur, text=self._text(cur))
            emitted += 1
            tokens.append(cur)
            if self.target.tokenizer.is_eos(cur) or emitted >= max_new:
                return

            pos = len(tokens) - 1
            budget = min(self.k, capacity - len(tokens) - 1,
                         max_new - emitted)
            draft_toks = self._draft(tokens, budget)
            self.stats.drafted += len(draft_toks)
            self.stats.rounds += 1

            block = [cur] + draft_toks
            positions = np.arange(pos, pos + len(block), dtype=np.int32)[None, :]
            t_logits, cache = self.target._verify_step(
                cache, jnp.asarray([block], dtype=jnp.int32),
                jnp.asarray(positions),
                jnp.asarray([pos + len(block)], dtype=np.int32))
            t_greedy = np.asarray(t_logits)[0].argmax(axis=-1)

            n_accept = 0
            for j, d_tok in enumerate(draft_toks):
                if int(t_greedy[j]) == d_tok:
                    n_accept += 1
                else:
                    break
            self.stats.accepted += n_accept
            self.stats.rejected += len(draft_toks) - n_accept

            for j in range(n_accept):
                tok = draft_toks[j]
                yield GeneratedToken(token_id=tok, text=self._text(tok))
                emitted += 1
                tokens.append(tok)
                if self.target.tokenizer.is_eos(tok) or emitted >= max_new:
                    return
            cur = int(t_greedy[n_accept])
            cache = SpeculativeExecutor._trim(cache, len(tokens))

    def _text(self, tok: int) -> str:
        try:
            return self.target.tokenizer.decode([tok])
        except Exception:
            return ""
