"""Continuous-batching engine over the paged KV cache.

TPU-native port of the reference BatchEngine + RequestScheduler + batched
decode (src/engine/batch_engine.rs:93-143, request_scheduler.rs:50,
batch_decode.rs:35-209): an async loop that admits requests, runs
(chunked) prefills, then ONE fused batched decode step for every running
sequence — fixed [B_max] shapes, padded block tables, per-sequence fused
sampling — and streams tokens back through per-request asyncio queues.
"""

from __future__ import annotations

import asyncio
import dataclasses
import logging
import time
from collections import deque
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.app import AppConfig
from ..config.generation import GenerationConfig
from ..kvcache.block_allocator import BlockAllocator
from ..kvcache.paged import (
    PagedKVCache,
    compute_slot_mapping,
    pad_block_table,
)
from ..kvcache.prefix_cache import PrefixCache, PrefixCacheConfig
from ..models.paged_multi import (
    init_engine_cache,
    make_paged_forward,
    zero_state_rows,
)
from ..models.registry import Model
from .grammar import GrammarState, compile_grammar_to_dfa, make_grammar_state
from .grammar_json import JSON_GRAMMAR, json_schema_to_gbnf
from .sampling import (PAD_TOKEN, make_bias_rows, make_window,
                       pack_sampling_host, sample_tokens, unpack_sampling)
from .sequence_scheduler import (
    ScheduledBatch,
    SchedulerConfig,
    Sequence,
    SequenceScheduler,
    SequenceState,
)
from .types import FinishReason, GeneratedToken
from ..utils.tracing import span as tracing_span

logger = logging.getLogger(__name__)


# Max sequences per batched-prefill step: pow-2 padded, so the compiled
# shape set stays bounded while bursts amortize the per-step weight stream.
# Max same-bucket prefill rows fused into one program. Was 8 when the
# program materialized [P,T,V] f32 logits; with the pre-head last_idx
# slice the logits are [P,1,V], so a 32-concurrent burst prefills in ONE
# dispatch (each dispatch is a blocking round-trip on remote links).
_PREFILL_GROUP = 32
# Top-K width of the fused logprobs fetch (the OpenAI top_logprobs cap;
# rows slice to their requested k host-side).
TOPK_K = 20

# Pad-row sampling config: GREEDY (temperature=0). Pad rows are discarded
# host-side so any config is semantically safe, but the fused sampler's
# all-greedy fast path gates on `jnp.any(temperature > 0)` over the WHOLE
# padded batch — a default-temperature (1.0) pad row would silently defeat
# it at every non-power-of-two occupancy (ADVICE r3, medium).
_PAD_CFG = GenerationConfig(temperature=0.0)

# Packed decode-table (itab) column layout — shared by decode_step,
# horizon_step, warmup, and the host-side batch builders:
#   0 token | 1 position | 2 slot | 3 seq_len | 4 state_row |
#   _ITAB_WIN penalty window | _ITAB_BT.. block table (mb cols) |
# then the per-row sampling/config tail (appended so ONE int32 upload
# carries the whole step — on the remote-tunnel link every extra
# host→device array is a blocking ~15 ms round-trip, measured PERF r3:
# ~12 uploads cost 165 ms of the 264 ms decode round):
#   _M_SP sampling f32 bits (8) | _M_KEYS (seed, step) (2) |
#   _M_BIAS bias ids (16) | _M_BIASV bias f32 bits (16) |
#   _M_GST grammar state | _M_HASG | _M_FRESH | _M_T t_steps (row 0)
_ITAB_WIN_START = 5
_ITAB_BT = _ITAB_WIN_START + 64          # == 5 + PENALTY_WINDOW
_ITAB_WIN = slice(_ITAB_WIN_START, _ITAB_BT)
_BIAS_W = 16                             # make_bias_rows fixed width


def _mtab_offsets(mb: int) -> dict:
    """Column offsets of the sampling/config tail appended after the
    [mb]-wide block table."""
    sp = _ITAB_BT + mb
    keys = sp + 8
    bias = keys + 2
    biasv = bias + _BIAS_W
    gst = biasv + _BIAS_W
    hasg = gst + 1
    fresh = hasg + 1
    t = fresh + 1
    return {"sp": sp, "keys": keys, "bias": bias, "biasv": biasv,
            "gst": gst, "hasg": hasg, "fresh": fresh, "t": t, "w": t + 1}


def _ptab_offsets(mb: int) -> dict:
    """Prefill metadata table: 0 start | 1 chunk_len | 2 state_row |
    3.. penalty window (64) | block table (mb) | sampling tail (8+2+32).
    Positions / slots / seq_lens / last_idx all derive in-jit from
    (start, chunk_len, block table) — they were 5 of the 11 per-group
    uploads."""
    bt = 3 + 64
    sp = bt + mb
    return {"win": 3, "bt": bt, "sp": sp, "w": sp + 10 + 2 * _BIAS_W}


def _next_pow2(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


def _ramp_sizes(n: int, first: int, cap: int) -> list[int]:
    """Prefill-priority pacing (VERDICT r3 #2): split an n-row burst of
    FINISHING prefill rows into flat groups of `first` so each group's
    first tokens land as soon as that group completes instead of after
    the whole slab. Measured on-chip (r4): prefill rate is near-flat in
    batch (b8 ≈ b32 on the 7B AWQ flagship), so small groups cost only
    the extra dispatches (~2 ms each) while TTFT p50 drops to about half
    the slab wall. Chunked mid-prompt rows (no token to emit) are NOT
    ramped — they keep full-width slabs."""
    if first <= 0 or first >= cap:
        return [min(n, cap)] * -(-n // cap) if n else []
    out = []
    while n > 0:
        s = min(first, n)
        out.append(s)
        n -= s
    return out


def _median_first_sizes(n: int, first: int, cap: int) -> list[int]:
    """Cold-burst pacing: one front-loaded group covering the median
    request, then small flat groups.

    Prefill groups pad to powers of two (one compiled program per
    bucket), and the large-m matmul rate RISES with rows on the int8
    prefill tier (r4 race: 94 TF/s at m=1024 → 145 at m=4096), so the
    burst's p50 TTFT is minimized by one group of the smallest power of
    two ≥ ⌈n/2⌉ — the median request's first token lands when that
    single maximal-rate slab completes — followed by tiny 2-wide groups:
    for even bursts p50 averages the requests just before/after the
    lead-group boundary, so the first trailing group's wall is on the
    p50 path and smaller is strictly better (measured on the 32-burst:
    tail 8 → p50 375 ms, tail 4 → 362, tail 2 → 327; aggregate and p95
    unchanged). Used only when no decode rows are active (a big slab
    would otherwise stall running sequences' ITL by its full wall)."""
    if first <= 0 or first >= cap or n <= first:
        return _ramp_sizes(n, first, cap)
    lead = 1
    while lead < min(-(-n // 2), cap):
        lead *= 2
    out = [min(lead, n)]
    return out + _ramp_sizes(n - out[0], min(first, 2), cap)


@dataclasses.dataclass
class RequestHandle:
    """Token stream handle (reference RequestHandle, request_scheduler.rs:25-46)."""

    seq_id: int
    queue: "asyncio.Queue[tuple[Optional[GeneratedToken], Optional[FinishReason]]]"
    prompt_tokens: int

    async def tokens(self):
        while True:
            tok, fin = await self.queue.get()
            if tok is not None:
                yield tok
            if fin is not None:
                return


class BatchEngine:
    """Paged-KV continuous-batching executor + scheduler loop."""

    def __init__(self, model: Model, tokenizer,
                 app_cfg: Optional[AppConfig] = None,
                 draft_model: Optional[Model] = None):
        self.model = model
        self.tokenizer = tokenizer
        self.app_cfg = app_cfg or AppConfig(model=model.cfg)
        inf = self.app_cfg.inference
        self.block_size = inf.block_size
        self.max_batch = inf.max_batch_size
        self._horizon = max(1, int(getattr(inf, "decode_horizon", 1) or 1))
        self.max_seq_len = min(self.app_cfg.effective_max_seq_len() or 4096,
                               model.cfg.max_seq_len or 4096)
        self.max_blocks_per_seq = (self.max_seq_len + self.block_size - 1) // self.block_size

        num_blocks = inf.num_blocks or inf.kv_pool_blocks or (
            self.max_batch * self.max_blocks_per_seq)
        self.allocator = BlockAllocator(num_blocks, self.block_size)
        self.prefix_cache = (
            PrefixCache(self.allocator,
                        PrefixCacheConfig(max_cached_blocks=inf.max_cached_blocks))
            if inf.prefix_cache else None
        )
        if self.prefix_cache is not None and inf.gpu_prefix_cache:
            from ..kvcache.host_tier import attach_host_tier

            attach_host_tier(self.prefix_cache, lambda: self.cache,
                             max_blocks=inf.prefix_cache_ram_tier)
        # Per-sequence prefill chunk vs per-round admission budget: the
        # budget defaults to one full prefill GROUP so a burst of short
        # prompts admits in one scheduling round instead of trickling in
        # at budget/prompt_len sequences per round (measured: 1.0 s TTFT
        # p50 at 32x128-token prompts with budget == chunk == 512).
        self._chunk = inf.prefill_chunk_size or 4096
        self.scheduler = SequenceScheduler(
            self.allocator,
            SchedulerConfig(
                max_batch_size=self.max_batch,
                max_batch_tokens=(inf.max_batch_tokens
                                  or self._chunk * _PREFILL_GROUP),
                block_size=self.block_size,
                max_seq_len=self.max_seq_len,
            ),
            prefix_cache=self.prefix_cache,
        )

        if inf.kv_cache_dtype == "int4":
            # int4 KV is contiguous-cache only; silently running bf16 would
            # give the user 4x the expected KV footprint (ADVICE r1).
            logger.warning("kv_cache_dtype=int4 is not supported on the "
                           "paged path; using int8")
        # Per-family continuous-batching cache + forward (paged KV for
        # llama, paged latent for MLA, state slots for mamba2/hybrid) —
        # reference serves every arch through the batch engine the same
        # way (executor_generate.rs:123-340).
        self.cache, self._needs_state_rows = init_engine_cache(
            model.cfg, num_blocks, self.block_size, self.max_batch,
            dtype=model.dtype,
            quantized=inf.kv_cache_dtype in ("int8", "int4"),
        )
        self._fwd = make_paged_forward(model.cfg)
        self._trash = getattr(self.cache, "trash_slot", 0)
        if self._needs_state_rows:
            # Recurrent state can never be reconstructed from cached KV
            # blocks — prefix reuse is attention-only (same invariant as
            # the single-stream session cache).
            if self.prefix_cache is not None:
                logger.warning("prefix cache disabled: model has recurrent "
                               "(SSM) state")
                self.prefix_cache = None
                self.scheduler.prefix_cache = None
            self._free_rows = list(range(self.max_batch))
            self._seq_rows: dict[int, int] = {}

        # Tensor-parallel serving: shard params (column/row Megatron specs,
        # quantized weights included) and the paged KV over the kv-head
        # axis; every jitted step below then runs GSPMD-partitioned
        # (reference scheduler.rs:160-206 + tensor_parallel.rs:76-163).
        from ..quant.qtensor import apply_quant_compute

        model.params = apply_quant_compute(model.params, inf.quant_compute)
        from ..parallel.tp import (maybe_serving_mesh, shard_paged_cache,
                                   shard_params)

        self.mesh = maybe_serving_mesh(inf, model.cfg, model.params)
        if self.mesh is not None:
            if self.mesh.shape.get("ep", 1) > 1 and model.cfg.moe is not None:
                model.cfg.moe.use_ep = True      # all-to-all MoE dispatch
            model.params = shard_params(model.params, self.mesh, model.cfg)
            if isinstance(self.cache, PagedKVCache):
                self.cache = shard_paged_cache(self.cache, self.mesh)
            elif hasattr(self.cache, "kv"):      # hybrid: shard the KV part
                import dataclasses as _dc

                self.cache = _dc.replace(
                    self.cache,
                    kv=shard_paged_cache(self.cache.kv, self.mesh))
            # MLA latent / SSM state have no kv-head axis — replicated.

        # Batched speculative decoding (prompt-lookup / n-gram drafts,
        # no draft model): greedy rows verify k drafts in ONE fused
        # [B, k+1] step. With B·(k+1) rows still under the MXU output
        # wave (128), the verify step costs the same wall time as plain
        # [B, 1] decode (int_matmul.py PERF LOG) — accepted drafts are
        # nearly free. Recurrent-state models are excluded: a rejected
        # draft would leave the SSM state advanced past the rollback.
        spec = inf.speculative
        self._spec_k = (
            spec.num_speculative_tokens
            if (spec is not None
                and not self._needs_state_rows
                and spec.num_speculative_tokens > 0)
            else 0)
        self.spec_drafted = 0
        self.spec_accepted = 0
        # Adaptive speculative depth (reference SpeculativeConfig.
        # adaptive_depth, inference.rs:205-207): the drafting budget
        # shrinks when the measured acceptance is poor (each rejected
        # draft position is a wasted verify-row FLOP and, with a draft
        # model, a wasted chain step) and regrows when drafts land. The
        # verify program stays compiled at [B, spec_k+1]; depth only
        # bounds how many proposals fill the span.
        self._spec_adaptive = bool(spec is not None
                                   and getattr(spec, "adaptive_depth", False))
        self._spec_depth = self._spec_k
        self._spec_win = [0, 0]          # drafted, accepted (rolling window)
        self._spec_rounds = 0
        # Horizon telemetry (/metrics horizon_steps_per_dispatch).
        self.horizon_dispatches = 0
        self.horizon_steps = 0
        # Wall-time breakdown by phase (seconds; perf["<phase>_n"] counts
        # calls). Near-zero cost; read by tools/bench_engine_serving.py.
        from collections import defaultdict

        self.perf: dict[str, float] = defaultdict(float)

        # Draft-MODEL speculation under continuous batching (reference
        # speculative.rs driven from the batch engine): the draft keeps
        # its own paged KV cache over the SAME block tables (same block
        # ids, draft-sized planes), and proposes k tokens per row with an
        # ON-DEVICE greedy chain — one dispatch, no per-token host
        # round-trips. Verification is the existing fused [B, k+1] step,
        # so output is exactly the target's greedy chain regardless of
        # draft quality. Without a draft model, spec falls back to
        # prompt-lookup (n-gram) drafting.
        self._draft: Optional[Model] = None
        if self._spec_k and draft_model is not None:
            d_cache, d_state_rows = init_engine_cache(
                draft_model.cfg, num_blocks, self.block_size,
                self.max_batch, dtype=draft_model.dtype,
                quantized=inf.kv_cache_dtype in ("int8", "int4"))
            if d_state_rows:
                logger.warning("draft model has recurrent state; "
                               "speculation disabled")
                self._spec_k = 0
            elif draft_model.vocab_size != model.vocab_size:
                raise ValueError(
                    "draft model vocab (%d) != target vocab (%d)"
                    % (draft_model.vocab_size, model.vocab_size))
            else:
                self._draft = draft_model
                self._draft_cache = d_cache
                self._dfwd = make_paged_forward(draft_model.cfg)
                self._d_trash = getattr(d_cache, "trash_slot", 0)
                if self.mesh is not None:
                    try:
                        draft_model.params = shard_params(
                            draft_model.params, self.mesh, draft_model.cfg)
                        self._draft_cache = shard_paged_cache(
                            self._draft_cache, self.mesh)
                    except Exception as e:  # kv-heads not divisible etc.
                        logger.warning("draft model left replicated over "
                                       "the mesh: %s", e)
        elif self._spec_k and spec is not None and spec.draft_model:
            # Config names a draft checkpoint but none was loaded/passed.
            logger.warning("speculative.draft_model set but no draft "
                           "model provided; using prompt-lookup drafts")

        self._handles: dict[int, RequestHandle] = {}
        # Depth-D decode pipeline: FIFO of dispatched, un-fetched horizon
        # rounds (newest last; carries chain from the newest). Depth >1
        # hides the per-round fetch round-trip behind later dispatches —
        # on a high-RTT link the fetch is the dominant per-round cost
        # (measured 341 ms fetch vs 130 ms device time per 8-step round
        # at B=32 through the tunnel). See _horizon_round.
        self._pipe_q: deque = deque()
        self._pipe_depth = max(
            1, getattr(app_cfg.inference, "decode_pipe_depth", 2) or 1)
        self._grammars: dict[int, GrammarState] = {}
        # Device-resident grammar tables keyed by DFA identity (mask +
        # token-transition planes for in-device grammar stepping).
        self._dev_gram: dict[int, tuple] = {}
        self._windows: dict[int, list[int]] = {}
        # Host-sampler path (mirostat/DRY/typical/dynatemp): per-sequence
        # state, applied per batch row on the raw decode logits
        # (reference applies the full sampler stack per sequence in batch
        # decode, batch_decode.rs:35-209).
        self._host_states: dict[int, dict] = {}
        self._notify = asyncio.Event()
        self._stop = False
        self._vocab_bytes: Optional[list[bytes]] = None

        cfg = model.cfg
        fwd = self._fwd
        mo = _mtab_offsets(self.max_blocks_per_seq)
        self._mo = mo
        po = _ptab_offsets(self.max_blocks_per_seq)
        self._po = po

        def unpack_tail(tab, off):
            """In-jit unpack of the sampling/config tail at column ``off``
            (see _mtab_offsets): sampling f32 bits, (seed, step) keys,
            logit-bias ids/values."""
            sp_packed = jax.lax.bitcast_convert_type(
                tab[:, off : off + 8], jnp.float32)
            sp_keys = jax.lax.bitcast_convert_type(
                tab[:, off + 8 : off + 10], jnp.uint32)
            bias_ids = tab[:, off + 10 : off + 10 + _BIAS_W]
            bias_vals = jax.lax.bitcast_convert_type(
                tab[:, off + 10 + _BIAS_W : off + 10 + 2 * _BIAS_W],
                jnp.float32)
            return sp_packed, sp_keys, bias_ids, bias_vals

        def _pack_row(tok, lp, logprobs, use_topk):
            """[B, 2] (token, lp-bits) — or [B, 2+2K] with the top-K
            logprob ids and values appended when a row wants OpenAI
            logprobs (K fixed at 20, the API maximum; rows slice to
            their requested k host-side)."""
            cols = [tok[:, None],
                    jax.lax.bitcast_convert_type(lp, jnp.int32)[:, None]]
            if use_topk:
                top_lp, top_ids = jax.lax.top_k(logprobs, TOPK_K)
                cols += [top_ids.astype(jnp.int32),
                         jax.lax.bitcast_convert_type(top_lp, jnp.int32)]
            return jnp.concatenate(cols, axis=1)

        block_size = self.block_size
        mb_static = self.max_blocks_per_seq
        trash = self._trash
        max_pos = self.max_seq_len - 1

        def _prefill_derive(ptab, t):
            """Positions / slots / seq_lens / last_idx from (start,
            chunk_len, block table) — exactly the host-side math the
            builders used to upload."""
            start = ptab[:, 0:1]
            chunk = ptab[:, 1:2]
            bt = ptab[:, po["bt"] : po["bt"] + mb_static]
            p = ptab.shape[0]
            idx = jax.lax.broadcasted_iota(jnp.int32, (p, t), 1)
            live = idx < chunk
            pos = jnp.where(live, start + idx, 0)
            blk = jnp.take_along_axis(
                bt, jnp.minimum(pos // block_size, mb_static - 1), axis=1)
            slots = jnp.where(
                live & (blk != 0x7FFFFFFF)
                & (pos < mb_static * block_size),
                blk * block_size + pos % block_size, trash)
            seq_lens = (start + chunk)[:, 0]
            last_idx = jnp.maximum(chunk - 1, 0)[:, 0]
            return pos, slots, bt, seq_lens, last_idx

        # Params as explicit jit args (avoid constant-embedding the weights).
        def make_prefill_step(step_cfg):
            @partial(jax.jit, donate_argnums=(1,),
                     static_argnames=("use_mask", "use_topk"))
            def prefill_step(params, cache, tokens, ptab, grammar_mask,
                             use_mask=False, use_topk=False):
                # First-token sampling is FUSED into the prefill program:
                # one dispatch and one packed [P, 2(+2K)] fetch cover a
                # whole prefill group (a separate sample call was an extra
                # dispatch plus two blocking fetches per sequence). TWO
                # uploads per group (tokens + ptab): per-array transfers
                # are blocking round-trips on the remote link.
                positions, slots, bts, seq_lens, last_idx = _prefill_derive(
                    ptab, tokens.shape[1])
                state_rows = ptab[:, 2]
                window = ptab[:, po["win"] : po["win"] + 64]
                # last_idx slices the hidden state before the LM head —
                # the [P,T,V] f32 logits buffer never materializes, which
                # is what used to memory-cap prefill group width.
                logits, cache = fwd(params, step_cfg, tokens, cache,
                                    positions, slots, bts,
                                    seq_lens, state_rows, last_idx=last_idx)
                last = logits[:, 0, :]
                sp_packed, sp_keys, bias_ids, bias_vals = unpack_tail(
                    ptab, po["sp"])
                sp = unpack_sampling(sp_packed, sp_keys)
                tok, logprobs = sample_tokens(
                    last, sp, window_tokens=window,
                    logit_bias_ids=bias_ids, logit_bias_vals=bias_vals,
                    grammar_mask=grammar_mask if use_mask else None,
                )
                lp = jnp.take_along_axis(logprobs, tok[:, None],
                                         axis=1)[:, 0]
                packed = _pack_row(tok, lp, logprobs, use_topk)
                return packed, last, cache
            return prefill_step

        prefill_step = make_prefill_step(cfg)

        # Sequence-parallel (ring attention) prefill under continuous
        # batching (VERDICT r2 #4; green-field SURVEY §5.7): long prompts
        # starting at position 0 shard the sequence over the mesh's ``sp``
        # axis — a SEPARATE jit whose closed-over config carries the ring
        # mesh, writing into the SAME paged cache. Same eligibility as the
        # single-stream path (executor.py ring_ok): llama family, no
        # softcap / ALiBi, no recurrent state. Sliding-window configs ride
        # the window-aware ring (parallel/ring_attention.py n_hops bound).
        sp_prefill_step = None
        self._sp = self.mesh.shape.get("sp", 1) if self.mesh else 1
        if self._sp > 1 and not self._needs_state_rows:
            from ..models.paged_multi import resolve_paged_kind

            att = cfg.attention
            if (resolve_paged_kind(cfg) == "llama" and att is not None
                    and not att.use_alibi
                    and not cfg.attn_logit_softcapping):
                import copy as _copy

                ring_cfg = _copy.copy(cfg)
                ring_cfg._sp_ring_mesh = self.mesh
                sp_prefill_step = make_prefill_step(ring_cfg)

        @partial(jax.jit, donate_argnums=(1,),
                 static_argnames=("use_mask", "use_topk"))
        def decode_step(params, cache, mtab, grammar_mask, use_mask=False,
                        use_topk=False):
            # ONE packed int32 upload per step: columns 0 token |
            # 1 position | 2 slot | 3 seq_len | 4 state_row | _ITAB_WIN
            # penalty window | _ITAB_BT: block table | sampling tail
            # (_mtab_offsets). Per-array H2D transfers are pure dispatch
            # overhead (and dominate step latency on high-RTT links —
            # measured ~15 ms per array through the tunnel).
            tokens = mtab[:, 0:1]
            positions = mtab[:, 1:2]
            slots = mtab[:, 2:3]
            seq_lens = mtab[:, 3]
            state_rows = mtab[:, 4]
            window = mtab[:, _ITAB_WIN]
            block_tables = mtab[:, _ITAB_BT : _ITAB_BT + mb_static]
            sp_packed, sp_keys, bias_ids, bias_vals = unpack_tail(
                mtab, mo["sp"])
            sp = unpack_sampling(sp_packed, sp_keys)
            logits, cache = fwd(params, cfg, tokens, cache,
                                positions, slots, block_tables,
                                seq_lens, state_rows)
            last = logits[:, -1, :]
            tok, logprobs = sample_tokens(
                last, sp, window_tokens=window,
                logit_bias_ids=bias_ids, logit_bias_vals=bias_vals,
                grammar_mask=grammar_mask if use_mask else None,
            )
            lp = jnp.take_along_axis(logprobs, tok[:, None], axis=1)[:, 0]
            packed = _pack_row(tok, lp, logprobs, use_topk)
            return packed, last, cache

        horizon = self._horizon

        @partial(jax.jit, donate_argnums=(1,),
                 static_argnames=("use_grammar", "use_topk"))
        def horizon_step(params, cache, mtab, gmask, gnext,
                         carry_tok, carry_win, carry_gstate,
                         use_grammar=False, use_topk=False):
            # Multi-step decode: up to `horizon` decode iterations in ONE
            # device program with ON-DEVICE token feedback (while_loop,
            # dynamic trip count). The host fetches a single packed
            # [horizon, b, 2] (token, logprob-bits) buffer per call —
            # per-step dispatch + fetch round-trips otherwise dominate
            # (31 tok/s engine vs 1974 tok/s model-level at B=32 through
            # the remote TPU link before this change).
            #
            # use_grammar: DFA-tier grammars advance ON DEVICE — gmask
            # [S, V] gates sampling per row state, gnext [S, V] is the
            # token-level transition table (grammar.py token_tables), so
            # constrained (JSON-mode) rows no longer force single-step
            # rounds. One compile per padded table height S.
            #
            # Pipelined rounds: carry_tok / carry_win / carry_gstate are
            # this program's own final loop carries from the PREVIOUS
            # round, still device-resident — rows with fresh=False resume
            # from them, so round N+1 can be dispatched before round N's
            # output is fetched (the host never needs the tokens to keep
            # the device busy). fresh=True rows (newly prefilled, or after
            # a pipeline flush) read token/window/grammar-state from the
            # host-built mtab instead.
            b = mtab.shape[0]
            pos0 = mtab[:, 1]
            state_rows = mtab[:, 4]
            fresh = mtab[:, mo["fresh"]] != 0
            has_g = mtab[:, mo["hasg"]] != 0
            t_steps = mtab[0, mo["t"]]
            tok0 = jnp.where(fresh, mtab[:, 0], carry_tok)
            window0 = jnp.where(fresh[:, None], mtab[:, _ITAB_WIN],
                                carry_win)
            gstate0 = jnp.where(fresh, mtab[:, mo["gst"]], carry_gstate)
            bt = mtab[:, _ITAB_BT : _ITAB_BT + mb_static]
            sp_packed, sp_keys, bias_ids, bias_vals = unpack_tail(
                mtab, mo["sp"])
            rln = jnp.minimum(sp_packed[:, 7].astype(jnp.int32),
                              window0.shape[1])
            sp_base = unpack_sampling(sp_packed, sp_keys)
            rows = jnp.arange(b)
            widx = jnp.arange(window0.shape[1])[None, :]
            out_w = 2 + 2 * TOPK_K if use_topk else 2
            out0 = jnp.zeros((horizon, b, out_w), dtype=jnp.int32)

            def body(carry):
                i, cache, tok, window, gstate, out = carry
                pos = pos0 + i
                blk = bt[rows, jnp.minimum(pos // block_size, mb_static - 1)]
                slot = jnp.where(
                    (blk != 0x7FFFFFFF) & (pos < mb_static * block_size),
                    blk * block_size + pos % block_size, trash)
                # Overrun iterations of rows that finish mid-horizon are
                # discarded host-side; clamp their rope positions in-range.
                posc = jnp.minimum(pos, max_pos)
                logits, cache = fwd(params, cfg, tok[:, None], cache,
                                    posc[:, None], slot[:, None], bt,
                                    pos + 1, state_rows)
                last = logits[:, -1, :]
                # Per-row sampling step index advances with the horizon.
                sp_i = dataclasses.replace(
                    sp_base,
                    key=sp_base.key.at[:, 1].add(i.astype(jnp.uint32)))
                if use_grammar:
                    srow = jnp.clip(gstate, 0, gmask.shape[0] - 1)
                    mask_b = jnp.where(has_g[:, None], gmask[srow], True)
                else:
                    mask_b = None
                newtok, logprobs = sample_tokens(
                    last, sp_i, window_tokens=window,
                    logit_bias_ids=bias_ids, logit_bias_vals=bias_vals,
                    grammar_mask=mask_b)
                lp = jnp.take_along_axis(logprobs, newtok[:, None],
                                         axis=1)[:, 0]
                out = out.at[i].set(_pack_row(newtok, lp, logprobs,
                                              use_topk))
                if use_grammar:
                    ns = gnext[srow, newtok]
                    # Dead transition (stuck grammar): keep the old state —
                    # identical to the host path, whose accept_token also
                    # refuses to advance.
                    gstate = jnp.where(has_g & (ns >= 0), ns, gstate)
                # In-device penalty-window update, exact make_window
                # semantics: insert while under repeat_last_n, then
                # shift-left within the valid region.
                fill = jnp.sum(window >= 0, axis=1)
                rolled = jnp.where(widx < rln[:, None] - 1,
                                   jnp.roll(window, -1, axis=1), window)
                rolled = rolled.at[rows, jnp.maximum(rln - 1, 0)].set(newtok)
                inserted = window.at[
                    rows, jnp.minimum(fill, window.shape[1] - 1)].set(newtok)
                wnew = jnp.where((fill < rln)[:, None], inserted, rolled)
                window = jnp.where((rln > 0)[:, None], wnew, window)
                return i + 1, cache, newtok, window, gstate, out

            _, cache, tok_f, win_f, gs_f, out = jax.lax.while_loop(
                lambda c: c[0] < t_steps, body,
                (jnp.int32(0), cache, tok0, window0, gstate0, out0))
            return out, tok_f, win_f, gs_f, cache

        if self._draft is not None:
            d_cfg = self._draft.cfg
            dfwd = self._dfwd
            d_trash = self._d_trash
            spec_k = self._spec_k

            @partial(jax.jit, donate_argnums=(1,))
            def draft_chain(d_params, d_cache, dtab):
                # k greedy draft steps with ON-DEVICE token feedback —
                # the whole chain is one dispatch; the host fetches only
                # the [B, k] proposals. Slots derive from the target's
                # block tables (the draft cache shares block geometry).
                # dtab: 0 tok0 | 1 pos0 | 2.. block table — one upload.
                tok0 = dtab[:, 0]
                pos0 = dtab[:, 1]
                bt = dtab[:, 2:]
                b = tok0.shape[0]
                rows = jnp.arange(b)
                zero_rows = jnp.zeros((b,), dtype=jnp.int32)
                tok = tok0
                cache = d_cache
                drafts = []
                for j in range(spec_k):
                    pos = pos0 + j
                    blk = bt[rows,
                             jnp.minimum(pos // block_size, mb_static - 1)]
                    slot = jnp.where(
                        (blk != 0x7FFFFFFF) & (pos < mb_static * block_size),
                        blk * block_size + pos % block_size, d_trash)
                    posc = jnp.minimum(pos, max_pos)
                    logits, cache = dfwd(d_params, d_cfg, tok[:, None],
                                         cache, posc[:, None],
                                         slot[:, None], bt, pos + 1,
                                         zero_rows)
                    tok = jnp.argmax(logits[:, -1, :],
                                     axis=-1).astype(jnp.int32)
                    drafts.append(tok)
                return jnp.stack(drafts, axis=1), cache

            @partial(jax.jit, donate_argnums=(1,))
            def draft_prefill(d_params, d_cache, tokens, ptab):
                # Mirror of the target prefill (same ptab, zero re-upload):
                # keeps the draft cache in sync over the same blocks.
                # Logits are discarded.
                b = tokens.shape[0]
                zero_rows = jnp.zeros((b,), dtype=jnp.int32)
                positions, slots, bts, seq_lens, _ = _prefill_derive(
                    ptab, tokens.shape[1])
                _, d_cache = dfwd(d_params, d_cfg, tokens, d_cache,
                                  positions, slots, bts,
                                  seq_lens, zero_rows)
                return d_cache

            def bind_draft(fn):
                if self.mesh is None:
                    return lambda *a: fn(self._draft.params, *a)

                def call(*a):
                    with jax.set_mesh(self.mesh):
                        return fn(self._draft.params, *a)
                return call

            self._draft_chain = bind_draft(draft_chain)
            self._draft_prefill = bind_draft(draft_prefill)

        spec_k1 = self._spec_k + 1

        @partial(jax.jit, donate_argnums=(1,))
        def verify_step(params, cache, vtab):
            # Multi-token step for speculative verification: full logits
            # [B, k+1, V]; drafts' K/V land in their real slots (accepted
            # prefixes keep them; rejected slots are overwritten when the
            # real token reaches that position). ONE packed upload —
            # columns: 0 pos0 | 1 span | 2 state_row | 3:3+k1 tokens |
            # 3+k1: block table. Positions, slots and seq_lens derive
            # in-jit (slots clamp to trash outside the row's span).
            b = vtab.shape[0]
            pos0 = vtab[:, 0:1]
            span = vtab[:, 1:2]
            state_rows = vtab[:, 2]
            tokens = vtab[:, 3 : 3 + spec_k1]
            bt = vtab[:, 3 + spec_k1 :]
            rows = jnp.arange(b)[:, None]
            j = jnp.arange(spec_k1)[None, :]
            pos = pos0 + j                                    # [B, k+1]
            blk = bt[rows, jnp.minimum(pos // block_size, mb_static - 1)]
            slot = jnp.where(
                (j < span) & (blk != 0x7FFFFFFF)
                & (pos < mb_static * block_size),
                blk * block_size + pos % block_size, trash)
            posc = jnp.minimum(pos, max_pos)
            seq_lens = (pos0 + span)[:, 0]
            logits, cache = fwd(params, cfg, tokens, cache,
                                posc, slot, bt, seq_lens, state_rows)
            return logits, cache

        @partial(jax.jit, static_argnames=("use_mask", "use_topk"))
        def spec_finish(logits, stab, grammar_mask, use_mask=False,
                        use_topk=False):
            # Post-verify fusion: position-0 sampling + the full argmax
            # chain in one program, packed [B, k+3] (argmax…, tok,
            # lp-bits) so the accept loop costs ONE fetch (it was three
            # plus two eager device ops). stab = [window 64 | sampling
            # tail] — one upload. use_topk appends the fused top-K
            # logprob ids/values of the position-0 distribution so
            # logprobs rows can RIDE ALONG in a spec batch instead of
            # forcing the whole batch onto the plain path (they never
            # draft — _spec_eligible excludes them — so position 0 is
            # the only position they sample from).
            window = stab[:, :64]
            sp_packed, sp_keys, bias_ids, bias_vals = unpack_tail(stab, 64)
            sp = unpack_sampling(sp_packed, sp_keys)
            last0 = logits[:, 0, :]
            tok, logprobs = sample_tokens(
                last0, sp, window_tokens=window,
                logit_bias_ids=bias_ids, logit_bias_vals=bias_vals,
                grammar_mask=grammar_mask if use_mask else None)
            lp = jnp.take_along_axis(logprobs, tok[:, None], axis=1)[:, 0]
            am = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            cols = [am, tok[:, None],
                    jax.lax.bitcast_convert_type(lp, jnp.int32)[:, None]]
            if use_topk:
                top_lp, top_ids = jax.lax.top_k(logprobs, TOPK_K)
                cols += [top_ids.astype(jnp.int32),
                         jax.lax.bitcast_convert_type(top_lp, jnp.int32)]
            packed = jnp.concatenate(cols, axis=1)
            return packed, last0

        def bind(fn, with_params=True):
            if self.mesh is None:
                if with_params:
                    return lambda *a, **kw: fn(self.model.params, *a, **kw)
                return fn

            def call(*a, **kw):
                with jax.set_mesh(self.mesh):
                    if with_params:
                        return fn(self.model.params, *a, **kw)
                    return fn(*a, **kw)
            return call

        self._prefill_step = bind(prefill_step)
        self._sp_prefill_step = (bind(sp_prefill_step)
                                 if sp_prefill_step is not None else None)
        self._decode_step = bind(decode_step)
        self._horizon_step = bind(horizon_step)
        self._verify_step = bind(verify_step)
        self._spec_finish = bind(spec_finish, with_params=False)
        # Raw jitted fns for retrace detection (tests assert that serving
        # after warmup() never grows these tracing caches — a retrace is
        # seconds of serve-time stall on the real chip).
        self._jit_fns = {"prefill": prefill_step, "decode": decode_step,
                         "horizon": horizon_step, "verify": verify_step,
                         "spec_finish": spec_finish}

        # Host fetch across a MULTI-PROCESS mesh: a jit output that spans
        # non-addressable devices can't be np.asarray'd directly — route
        # it through a replicating identity jit first (tiny arrays only:
        # tokens/logprobs/argmax). Single-process meshes fetch directly.
        if self.mesh is not None and jax.process_count() > 1:
            from jax.sharding import NamedSharding, PartitionSpec

            rep = jax.jit(lambda a: a, out_shardings=NamedSharding(
                self.mesh, PartitionSpec()))

            def to_host(x):
                with jax.set_mesh(self.mesh):
                    return np.asarray(rep(x))
            self._to_host = to_host
        else:
            self._to_host = np.asarray

        # Device-cached constants: the dummy grammar mask/tables and the
        # fresh-round carry zeros. Re-uploading them every round is a
        # blocking round-trip apiece on the remote link.
        self._dummy_mask = jnp.asarray(np.ones((1, 1), dtype=bool))
        self._gdummy = (jnp.asarray(np.ones((1, 1), dtype=bool)),
                        jnp.asarray(np.zeros((1, 1), dtype=np.int32)))
        self._carry_zeros: dict[int, tuple] = {}

    def _carry_zero(self, bmax: int) -> tuple:
        z = self._carry_zeros.get(bmax)
        if z is None:
            z = (jnp.asarray(np.zeros((bmax,), np.int32)),
                 jnp.asarray(np.full((bmax, 64), PAD_TOKEN, np.int32)),
                 jnp.asarray(np.zeros((bmax,), np.int32)))
            self._carry_zeros[bmax] = z
        return z

    def _fill_tail(self, tab: np.ndarray, off: int, cfgs, steps) -> None:
        """Host-side fill of the sampling/config tail (see unpack_tail)."""
        sp, keys = pack_sampling_host(cfgs, step=steps)
        tab[:, off : off + 8] = sp.view(np.int32)
        tab[:, off + 8 : off + 10] = keys.view(np.int32)
        ids, vals = make_bias_rows(cfgs)
        tab[:, off + 10 : off + 10 + _BIAS_W] = ids
        tab[:, off + 10 + _BIAS_W : off + 10 + 2 * _BIAS_W] = \
            vals.view(np.int32)

    # ------------------------------------------------------------------
    def warmup(self, t_buckets: Optional[list[int]] = None,
               warm_topk: bool = True) -> float:
        """Pre-compile EVERY serve-time shape: the full prefill grid
        (pow-2 group sizes × pow-2 token buckets up to the chunk), every
        pow-2 decode bucket, the horizon program, and speculative
        chain/verify shapes.

        Without this, shapes compile at serve time — the continuous-
        batching analogue of the reference's warmup.rs. On the real chip
        a cold compile is minutes through the remote link; one mid-burst
        prefill compile measured a 23 s TTFT p50 where warm steady-state
        is ~100 ms. The persistent compilation cache makes this a
        once-per-machine cost.

        ``t_buckets`` restricts the prefill grid to the given pow-2 token
        buckets (benchmarks with a known prompt length warm only their
        own shapes)."""
        t0 = time.time()
        chunk = min(_next_pow2(self._chunk), _next_pow2(self.max_seq_len))
        mb = self.max_blocks_per_seq

        # Full prefill grid: every (group, bucket) shape _prefill_group
        # can produce (SSM prefill is per-sequence, group 1).
        if self._needs_state_rows:
            p_values = [1]
        else:
            p_values = []
            p = 1
            while p <= _PREFILL_GROUP:
                p_values.append(p)
                p *= 2
        if t_buckets is None:
            t_buckets = []
            t = 16
            while t <= chunk:
                t_buckets.append(t)
                t *= 2
        for t in t_buckets:
            # Grouped bursts of very long chunks are rare; warming every
            # p at t > 1024 would dominate warmup wall time (a [8, 4096]
            # prefill executes 32k tokens). One runtime compile for that
            # corner beats minutes of warmup for everyone.
            for p in (p_values if t <= 1024 else p_values[:1]):
                cfgs_p = [GenerationConfig() for _ in range(p)]
                toks = np.zeros((p, t), dtype=np.int32)
                ptab = np.zeros((p, self._po["w"]), dtype=np.int32)
                ptab[:, 1] = t                    # chunk_len
                if self._needs_state_rows:
                    # SSM prefill uses exact pow-2 sub-chunks — same shapes.
                    ptab[:, 2] = self.max_batch
                ptab[:, self._po["win"] : self._po["win"] + 64] = PAD_TOKEN
                ptab[:, self._po["bt"] : self._po["bt"] + mb] = 0x7FFFFFFF
                self._fill_tail(ptab, self._po["sp"], cfgs_p, 0)
                # NOTE every call site passes the FULL static-kwarg set:
                # jax's tracing cache keys on the kwargs-dict STRUCTURE,
                # so omitting a default (use_topk) here while serve-time
                # calls spell it out forces a serve-time RETRACE of the
                # whole program — measured ~3 s apiece for the 7B prefill
                # and horizon programs through the remote link, paid on
                # the first real request after a "complete" warmup.
                _, _, self.cache = self._prefill_step(
                    self.cache, jnp.asarray(toks), jnp.asarray(ptab),
                    self._dummy_mask, use_mask=False, use_topk=False)
                if warm_topk and t <= 256:
                    # use_topk=True is a separate compile of the whole
                    # program; without it the first logprobs request pays
                    # a serve-time compile (ADVICE r3). Long-chunk topk
                    # prefills stay cold — rare, and the t>256 grid would
                    # double warmup wall time.
                    _, _, self.cache = self._prefill_step(
                        self.cache, jnp.asarray(toks), jnp.asarray(ptab),
                        self._dummy_mask, use_mask=False, use_topk=True)
                if self._draft is not None:
                    self._draft_cache = self._draft_prefill(
                        self._draft_cache, jnp.asarray(toks),
                        jnp.asarray(ptab))

        # Decode at every pow-2 batch bucket (and spec verify if enabled).
        b = 1
        while b <= self.max_batch:
            cfgs = [GenerationConfig() for _ in range(b)]
            mtab = np.zeros((b, self._mo["w"]), dtype=np.int32)
            mtab[:, 2] = self._trash
            mtab[:, 4] = self.max_batch
            mtab[:, _ITAB_WIN] = PAD_TOKEN
            mtab[:, _ITAB_BT : _ITAB_BT + mb] = 0x7FFFFFFF
            mtab[:, 3] = 1
            mtab[:, self._mo["fresh"]] = 1
            mtab[0, self._mo["t"]] = 1
            self._fill_tail(mtab, self._mo["sp"], cfgs, 0)
            tok_dev, _, self.cache = self._decode_step(
                self.cache, jnp.asarray(mtab), self._dummy_mask,
                use_mask=False, use_topk=False)
            if warm_topk:
                tok_dev, _, self.cache = self._decode_step(
                    self.cache, jnp.asarray(mtab), self._dummy_mask,
                    use_mask=False, use_topk=True)
            if self._horizon > 1:
                ct, cw, cg = self._carry_zero(b)
                out_dev, _, _, _, self.cache = self._horizon_step(
                    self.cache, jnp.asarray(mtab), *self._gdummy,
                    ct, cw, cg, use_grammar=False, use_topk=False)
                if warm_topk:
                    out_dev, _, _, _, self.cache = self._horizon_step(
                        self.cache, jnp.asarray(mtab), *self._gdummy,
                        ct, cw, cg, use_grammar=False, use_topk=True)
                tok_dev = out_dev
            if self._draft is not None:
                dtab = np.full((b, 2 + mb), 0x7FFFFFFF, dtype=np.int32)
                dtab[:, :2] = 0
                _, self._draft_cache = self._draft_chain(
                    self._draft_cache, jnp.asarray(dtab))
            if self._spec_k:
                k1 = self._spec_k + 1
                vtab = np.zeros((b, 3 + k1 + mb), dtype=np.int32)
                vtab[:, 1] = 1
                vtab[:, 2] = self.max_batch
                vtab[:, 3 + k1:] = 0x7FFFFFFF
                lg, self.cache = self._verify_step(
                    self.cache, jnp.asarray(vtab))
                stab = np.zeros((b, 64 + 10 + 2 * _BIAS_W), dtype=np.int32)
                stab[:, :64] = PAD_TOKEN
                self._fill_tail(stab, 64, cfgs, 0)
                tok_dev, _ = self._spec_finish(
                    lg, jnp.asarray(stab), self._dummy_mask, use_mask=False,
                    use_topk=False)
                if warm_topk:
                    tok_dev, _ = self._spec_finish(
                        lg, jnp.asarray(stab), self._dummy_mask,
                        use_mask=False, use_topk=True)
            b *= 2
        self._to_host(tok_dev)          # one sync: all compiles flushed
        dt = time.time() - t0
        logger.info("batch-engine warmup done in %.2fs", dt)
        return dt

    # ------------------------------------------------------------------
    # submission API (reference RequestScheduler::submit)
    # ------------------------------------------------------------------
    def submit(self, prompt_tokens: list[int],
               gen_cfg: Optional[GenerationConfig] = None) -> RequestHandle:
        gen_cfg = gen_cfg or GenerationConfig()
        gen_cfg.validate()
        # Everything that can REJECT the request (grammar compile) runs
        # before the scheduler mutation — a failure after add_request
        # would leave an orphaned sequence queued for decode.
        g = self._grammar_for(gen_cfg)
        seq_id = self.scheduler.add_request(prompt_tokens, gen_cfg)
        handle = RequestHandle(seq_id=seq_id, queue=asyncio.Queue(),
                               prompt_tokens=len(prompt_tokens))
        self._handles[seq_id] = handle
        if g is not None:
            self._grammars[seq_id] = g
        self._windows[seq_id] = list(prompt_tokens)
        from .samplers import MirostatState, needs_host_sampling

        if needs_host_sampling(gen_cfg):
            self._host_states[seq_id] = {
                "mirostat": (MirostatState.from_config(gen_cfg)
                             if gen_cfg.mirostat == 2 else None),
                "rng": np.random.default_rng(
                    gen_cfg.seed if gen_cfg.seed is not None else 0),
                "breakers": (self._dry_breaker_ids(gen_cfg)
                             if gen_cfg.dry_multiplier > 0 else None),
            }
        self._notify.set()
        return handle

    def _dry_breaker_ids(self, cfg: GenerationConfig) -> set[int]:
        out: set[int] = set()
        for s in cfg.dry_sequence_breakers:
            if hasattr(self.tokenizer, "encode"):
                out.update(self.tokenizer.encode(s))
        return out

    def _host_pick(self, seq: Sequence, logits_row: np.ndarray) -> int:
        """Per-row host sampler chain on the raw decode logits."""
        from .samplers import host_sample

        st = self._host_states[seq.seq_id]
        logits_row = np.asarray(logits_row, dtype=np.float32)
        g = self._grammars.get(seq.seq_id)
        if g is not None:
            # Pad-vocab models: ids past the tokenizer vocab never legal.
            m = g.mask()
            mfull = np.zeros(len(logits_row), dtype=bool)
            mfull[: min(len(m), len(logits_row))] = m[: len(logits_row)]
            logits_row = np.where(mfull, logits_row, -np.inf)
        return host_sample(logits_row, seq.gen_cfg,
                           self._windows[seq.seq_id],
                           st["mirostat"], st["breakers"], st["rng"])

    def cancel(self, seq_id: int) -> None:
        self.scheduler.abort_sequence(seq_id)
        self._finish(seq_id, None)

    def stop(self) -> None:
        self._stop = True
        self._notify.set()

    # ------------------------------------------------------------------
    def _grammar_for(self, cfg: GenerationConfig) -> Optional[GrammarState]:
        src = cfg.grammar or (
            json_schema_to_gbnf(cfg.json_schema) if cfg.json_schema
            else JSON_GRAMMAR if cfg.json_mode else None)
        if src is None:
            return None
        if self._vocab_bytes is None:
            self._vocab_bytes = self.tokenizer.vocab_bytes()
        return make_grammar_state(src, self._vocab_bytes,
                                  eos_token_id=self.tokenizer.eos_token_id)

    # ------------------------------------------------------------------
    # main loop (reference BatchEngine::run, batch_engine.rs:93-143)
    # ------------------------------------------------------------------
    async def run(self) -> None:
        # Support repeated run() cycles (stop() then run() again) without
        # callers reaching into private state (ADVICE r3).
        self._stop = False
        # Token emits happen on to_thread workers; a plain
        # Queue.put_nowait from a foreign thread appends the item but
        # does NOT wake the event loop, so streaming consumers only
        # observed tokens when the whole worker call returned — measured
        # on-chip: every request in a 32-burst "received" its first token
        # at the LAST prefill group's fetch (TTFT p50 == p95 == 665 ms)
        # even though group 0's tokens were emitted ~500 ms earlier.
        # call_soon_threadsafe writes the loop's self-pipe and delivers
        # each token the moment it is emitted.
        import threading

        self._loop = asyncio.get_running_loop()
        self._loop_thread = threading.get_ident()
        logger.info("batch engine started (max_batch=%d, blocks=%d)",
                    self.max_batch, self.allocator.num_blocks)
        while not self._stop:
            if not self.scheduler.has_work:
                # No running rows → any in-flight pipelined rounds are
                # pure overrun of finished/aborted sequences; drop them.
                self._pipe_q.clear()
                self._notify.clear()
                await self._notify.wait()
                continue
            try:
                if not await self.step_once():
                    await asyncio.sleep(0.001)  # backoff (reference :134-137)
                    continue
            except Exception:
                logger.exception("batch failed; aborting batch sequences")
                self._pipe_q.clear()   # in-flight rounds aborted with them
                for seq in list(self.scheduler.running.values()):
                    self.scheduler.abort_sequence(seq.seq_id)
                    self._finish(seq.seq_id, None)
        logger.info("batch engine stopped")

    # ------------------------------------------------------------------
    async def step_once(self) -> bool:
        """One scheduling iteration: schedule, run chunked prefills, run
        ONE fused decode batch, clean up. Returns False when the batch was
        empty. Deterministic given engine state — the multi-host lockstep
        driver (distributed/lockstep.py) replays the identical iteration on
        every process so all hosts issue the same SPMD calls."""
        t0 = time.perf_counter()
        batch = self.scheduler.schedule()
        self.perf["schedule"] += time.perf_counter() - t0
        if batch.is_empty:
            return False
        # Prefill DISPATCH → decode dispatch+fetch → prefill FETCH: the
        # prefill programs execute (and their outputs transfer) while the
        # host runs the decode round — the donated-cache threading keeps
        # device execution in dispatch order, so the decode round simply
        # queues behind the prefills it must observe.
        pending: list = []
        cold = not any(s.state == SequenceState.RUNNING
                       for s in batch.decode_sequences)
        if batch.prefill_sequences:
            with tracing_span("prefill", backend="paged",
                              batch=len(batch.prefill_sequences)):
                t0 = time.perf_counter()
                pending = await asyncio.to_thread(self._dispatch_prefills,
                                                  batch.prefill_sequences,
                                                  cold)
                self.perf["prefill"] += time.perf_counter() - t0
                self.perf["prefill_n"] += 1
        decodes = [s for s in batch.decode_sequences
                   if s.state == SequenceState.RUNNING]
        if decodes:
            with tracing_span("decode", backend="paged", batch=len(decodes)):
                t0 = time.perf_counter()
                await asyncio.to_thread(self._process_decode_batch, decodes)
                self.perf["decode"] += time.perf_counter() - t0
                self.perf["decode_n"] += 1
        if pending:
            t0 = time.perf_counter()
            await asyncio.to_thread(self._finish_prefills, pending)
            self.perf["p_finish"] += time.perf_counter() - t0
        moe_rt = getattr(self.model, "moe_offload_rt", None)
        if moe_rt is not None:
            # Offload-transformed params (installed by the Executor that
            # loaded this model): drive usage decay + hot-set rebalance
            # once per engine step (reference executor_cache.rs:235-348).
            moe_rt.tick(self.model.params)
        self.scheduler.cleanup_finished()
        return True

    def sync_device(self) -> None:
        """Block until every dispatched device program has completed.

        Multi-process lockstep must not overlap its op-stream broadcast
        (a host-level collective) with still-executing SPMD programs
        (whose tp/sp psums ride the same gloo/DCN transport): concurrent
        collectives interleave on the TCP pairs and corrupt each other
        (observed as gloo "received data size doesn't match expected"
        aborts in the 2-process tp=2 test). The donated-cache threading
        makes every program a dependency of the newest cache buffer, so
        blocking on it drains the whole dispatch queue; in-flight horizon
        outputs are blocked explicitly as well for safety."""
        import jax

        if self.cache is not None:
            leaves = jax.tree.leaves(self.cache)
            if leaves:
                jax.block_until_ready(leaves[0])
        for p in self._pipe_q:
            jax.block_until_ready(p["out"])

    def detach_handle(self, seq_id: int) -> None:
        """Stop streaming tokens for a sequence while letting it keep
        decoding (lockstep follower processes run every sequence but serve
        no clients — without this their per-request queues grow unread)."""
        self._handles.pop(seq_id, None)

    # ------------------------------------------------------------------
    # SSM state-slot management (mamba2/hybrid families only)
    # ------------------------------------------------------------------
    def _row_for(self, seq_id: int) -> int:
        """Slot row owning ``seq_id``'s recurrent state (assigns lazily;
        reclaims rows of preempted/aborted sequences under pressure)."""
        row = self._seq_rows.get(seq_id)
        if row is None:
            if not self._free_rows:
                running = set(self.scheduler.running)
                for sid, r in list(self._seq_rows.items()):
                    if sid not in running:
                        self._seq_rows.pop(sid)
                        self._free_rows.append(r)
            row = self._free_rows.pop()
            self._seq_rows[seq_id] = row
        return row

    # ------------------------------------------------------------------
    def _process_prefills(self, seqs: list[Sequence]) -> None:
        """Dispatch + finish in one call (non-overlapped path)."""
        pending = self._dispatch_prefills(seqs)
        if pending:
            self._finish_prefills(pending)

    def _dispatch_prefills(self, seqs: list[Sequence],
                           cold: bool = False) -> list:
        """Dispatch this step's prefill chunks, batching same-bucket
        chunks into ONE [P ≤ 8, T] step; first-token sampling is fused
        into each program. Returns the un-fetched outputs so the fetch
        (+ emit) can overlap this step's decode dispatch.

        Per-sequence prefill was a dispatch plus two blocking fetches
        each; with 64 concurrent 128-token prompts that serialized to a
        measured 11.9 s p50 TTFT on the remote-attached chip. Batched
        rows also amortize the quantized weight stream (each prefill
        step reads the full model from HBM regardless of row count)."""
        if self._needs_state_rows:
            for seq in seqs:
                self._process_prefill_ssm(seq)
            return []
        chunk_cfg = self._chunk
        # Sequence-parallel rows: long whole-prompt prefills ride the
        # ring-attention program (sequence sharded over ``sp``), one row
        # per dispatch, UNCHUNKED — sp exists precisely so one pass covers
        # the prompt that chunking would split.
        sp_rows: list[Sequence] = []
        if self._sp_prefill_step is not None:
            thr = self.app_cfg.inference.sp_prefill_threshold
            rest = []
            for seq in seqs:
                if (seq.prefilled_tokens == 0
                        and len(seq.prompt_tokens) >= thr):
                    sp_rows.append(seq)
                else:
                    rest.append(seq)
            seqs = rest
        # Mixed-phase interleave (VERDICT r4 #6): with decode rows active,
        # cap this step's prefill work so ITL is bounded by one group's
        # wall, not the burst's. Deferred rows keep needs_prefill and are
        # re-offered by the scheduler next step — a decode round runs in
        # between (the reference's chunked-prefill interleave,
        # batch_engine.rs:171-319). Cold bursts are untouched: they keep
        # the median-first slab (no ITL to protect).
        if not cold:
            inf = self.app_cfg.inference
            cap = inf.mixed_prefill_rows
            if cap is None:
                cap = getattr(inf, "prefill_first_group", 8)
            if cap and cap > 0 and len(seqs) > cap:
                fin_all, cont_all = [], []
                for s in seqs:
                    rem = len(s.prompt_tokens) - s.prefilled_tokens
                    (fin_all if rem <= chunk_cfg else cont_all).append(s)
                # Finishing rows (each carries a first token) get the cap;
                # mid-prompt chunk rows keep at most one full-width group
                # so long prompts still progress every step.
                kept = fin_all[:max(1, cap)] + cont_all[:_PREFILL_GROUP]
                self.perf["p_deferred_n"] += len(seqs) - len(kept)
                seqs = kept
        groups: dict[int, list[Sequence]] = {}
        for seq in seqs:
            remaining = len(seq.prompt_tokens) - seq.prefilled_tokens
            bucket = _next_pow2(min(chunk_cfg, remaining))
            groups.setdefault(bucket, []).append(seq)
        # Dispatch EVERY group before fetching ANY first token: the
        # device runs the groups back-to-back while the host's fetch of
        # group k blocks only until group k completes — total wall is
        # device-time + one RTT instead of (device + RTT) per group
        # (measured 836 ms for 4 groups of [8, 128] on the remote chip,
        # ~2x the device time).
        pending = []
        t0 = time.perf_counter()
        for seq in sp_rows:
            n = len(seq.prompt_tokens)
            bucket = _next_pow2(n, minimum=max(16, self._sp * 16))
            pending.append(self._prefill_group(
                [seq], bucket, n, step=self._sp_prefill_step))
        first = getattr(self.app_cfg.inference, "prefill_first_group", 8)
        for bucket in sorted(groups):
            group = groups[bucket]
            # Finishing rows carry the request's FIRST token — pace them
            # in a ramp so early groups land early (TTFT p50 ~halves on a
            # one-shot burst); mid-prompt chunk rows emit nothing and keep
            # full-width slabs (ramping them would just multiply weight
            # streams and dispatches every chunked round).
            fin = [s for s in group
                   if len(s.prompt_tokens) - s.prefilled_tokens <= chunk_cfg]
            cont = [s for s in group
                    if len(s.prompt_tokens) - s.prefilled_tokens > chunk_cfg]
            off = 0
            pace = _median_first_sizes if cold else _ramp_sizes
            for sz in pace(len(fin), first, _PREFILL_GROUP):
                pending.append(self._prefill_group(
                    fin[off:off + sz], bucket, chunk_cfg))
                off += sz
            for off in range(0, len(cont), _PREFILL_GROUP):
                pending.append(self._prefill_group(
                    cont[off:off + _PREFILL_GROUP], bucket, chunk_cfg))
        t1 = time.perf_counter()
        self.perf["p_dispatch"] += t1 - t0
        return pending

    def _finish_prefills(self, pending: list) -> None:
        """Fetch dispatched prefill outputs and emit first tokens."""
        for group, chunks, finishing, packed, last in pending:
            for i, seq in enumerate(group):
                self.scheduler.prefill_complete(seq.seq_id, chunks[i])
            if not finishing:
                continue
            t2 = time.perf_counter()
            out = np.array(self._to_host(packed))          # ONE fetch
            self.perf["p_fetch"] += time.perf_counter() - t2
            self.perf["p_fetch_n"] += 1
            lps = out[:, 1].copy().view(np.float32)
            host_rows = [i for seq, i in finishing
                         if seq.seq_id in self._host_states]
            last_np = self._to_host(last) if host_rows else None
            self._defer_puts = []
            try:
                for seq, i in finishing:
                    if seq.seq_id in self._host_states:
                        self._emit(seq, self._host_pick(seq, last_np[i]),
                                   float("nan"),
                                   top=self._top_row(seq, out[i]))
                    else:
                        self._emit(seq, int(out[i, 0]), float(lps[i]),
                                   top=self._top_row(seq, out[i]))
            finally:
                buf, self._defer_puts = self._defer_puts, None
                self._flush_puts(buf)

    def _prefill_group(self, group: list[Sequence], bucket: int,
                       chunk_cfg: int, step=None):
        """Dispatch one [P, T] prefill step over same-bucket chunks,
        first-token sampling fused in; returns the un-fetched outputs.
        ``step`` overrides the compiled program (sp ring-prefill rows)."""
        p2 = _next_pow2(len(group), minimum=1)
        mb = self.max_blocks_per_seq
        po = self._po
        toks = np.zeros((p2, bucket), dtype=np.int32)
        ptab = np.zeros((p2, po["w"]), dtype=np.int32)
        ptab[:, 1] = 1                     # pad rows: chunk_len 1
        ptab[:, po["win"] : po["win"] + 64] = PAD_TOKEN
        ptab[:, po["bt"] : po["bt"] + mb] = 0x7FFFFFFF
        finishing: list[tuple[Sequence, int]] = []
        chunks: list[int] = []
        cfgs: list[GenerationConfig] = []
        ids: list[int] = []
        any_mask = False
        for i, seq in enumerate(group):
            prompt = seq.prompt_tokens
            start = seq.prefilled_tokens
            chunk = min(chunk_cfg, len(prompt) - start)
            piece = prompt[start : start + chunk]
            chunks.append(len(piece))
            toks[i, : len(piece)] = piece
            ptab[i, 0] = start
            ptab[i, 1] = len(piece)
            ptab[i, po["bt"] : po["bt"] + mb] = pad_block_table(
                seq.block_table, mb)
            ptab[i, po["win"] : po["win"] + 64] = make_window(
                self._windows[seq.seq_id], seq.gen_cfg.repeat_last_n)
            cfgs.append(seq.gen_cfg)
            if start + chunk >= len(prompt):
                finishing.append((seq, i))
                ids.append(seq.seq_id)
                any_mask |= seq.seq_id in self._grammars
            else:
                ids.append(-1)
        for _ in range(len(group), p2):
            cfgs.append(_PAD_CFG)
            ids.append(-1)
        self._fill_tail(ptab, po["sp"], cfgs, 0)
        mask = (jnp.asarray(self._grammar_mask(ids, p2)) if any_mask
                else self._dummy_mask)
        use_topk = any((s, i) in finishing and s.gen_cfg.logprobs
                       for i, s in enumerate(group))
        toks_dev = jnp.asarray(toks)
        ptab_dev = jnp.asarray(ptab)
        packed, last, self.cache = (step or self._prefill_step)(
            self.cache, toks_dev, ptab_dev, mask, use_mask=any_mask,
            use_topk=use_topk,
        )
        if self._draft is not None:
            # Keep the draft cache in sync over the same blocks (its
            # chain attends the full history when proposing tokens);
            # reuses the already-uploaded tokens/ptab.
            self._draft_cache = self._draft_prefill(
                self._draft_cache, toks_dev, ptab_dev)
        if finishing:
            try:
                # Queue the D2H transfer now: first tokens start moving
                # the moment this group completes on device, so the
                # per-group fetch in _finish_prefills lands group k's
                # TTFT at group k's completion, not the full slab's.
                packed.copy_to_host_async()
            except Exception:   # pragma: no cover — backend-optional
                pass
        return group, chunks, finishing, packed, last

    def _process_prefill_ssm(self, seq: Sequence) -> None:
        """Recurrent-state prefill: PAD TOKENS MUST NEVER ENTER THE SCAN
        (they would shift the conv window / update the SSM state), so run
        exact-shaped sub-chunks of power-of-two length per sequence — a
        bounded set of compiled shapes with zero padding."""
        chunk_cfg = self._chunk
        prompt = seq.prompt_tokens
        start = seq.prefilled_tokens
        remaining = len(prompt) - start
        chunk = min(chunk_cfg, remaining)
        piece = prompt[start : start + chunk]
        is_last = start + chunk >= len(prompt)

        row = self._row_for(seq.seq_id)
        if start == 0:
            # Fresh admission or preemption restart: recurrent state
            # must start from zero.
            self.cache = zero_state_rows(self.cache, int(row))

        po = self._po
        mb = self.max_blocks_per_seq
        ptab0 = np.zeros((1, po["w"]), dtype=np.int32)
        ptab0[0, 2] = row
        ptab0[0, po["win"] : po["win"] + 64] = make_window(
            self._windows[seq.seq_id], seq.gen_cfg.repeat_last_n)
        ptab0[0, po["bt"] : po["bt"] + mb] = pad_block_table(
            seq.block_table, mb)
        self._fill_tail(ptab0, po["sp"], [seq.gen_cfg], 0)
        any_mask = seq.seq_id in self._grammars
        mask = (jnp.asarray(self._grammar_mask([seq.seq_id])) if any_mask
                else self._dummy_mask)
        sub_start = start
        packed = last = None
        while sub_start < start + len(piece):
            rem = start + len(piece) - sub_start
            sub = 1
            while sub * 2 <= rem:
                sub *= 2
            sp_ = prompt[sub_start : sub_start + sub]
            toks = np.asarray(sp_, dtype=np.int32)[None, :]
            ptab = ptab0.copy()
            ptab[0, 0] = sub_start
            ptab[0, 1] = sub
            packed, last, self.cache = self._prefill_step(
                self.cache, jnp.asarray(toks), jnp.asarray(ptab),
                mask, use_mask=any_mask, use_topk=False,
            )
            sub_start += sub
        self.scheduler.prefill_complete(seq.seq_id, len(piece))
        if not is_last:
            return
        if seq.seq_id in self._host_states:
            self._emit(seq, self._host_pick(seq, self._to_host(last)[0]),
                       float("nan"))
            return
        out = np.array(self._to_host(packed))
        self._emit(seq, int(out[0, 0]),
                   float(out[0, 1:2].copy().view(np.float32)[0]))

    # ------------------------------------------------------------------
    def _spec_eligible(self, seq: Sequence) -> bool:
        """Argmax verification is exact only for pure greedy rows.
        Logprobs rows are excluded: the verify path has no fused top-K
        fetch, so they ride the plain (horizon) programs instead."""
        g = seq.gen_cfg
        return (g.temperature == 0.0 and g.repeat_penalty == 1.0
                and g.frequency_penalty == 0.0 and g.presence_penalty == 0.0
                and not g.logit_bias and not g.logprobs
                and seq.seq_id not in self._grammars
                and seq.seq_id not in self._host_states)

    def _side_row(self, seq: Sequence) -> bool:
        """Rows that need host work EVERY step (host sampler chain, or an
        exact-PDA grammar whose mask must be rebuilt host-side) — they run
        in a T=1 side batch so they never force the whole batch off the
        horizon/spec fast paths (VERDICT r3 weak #4; reference samples
        per-sequence and never couples rows, sampling.rs:93)."""
        if seq.seq_id in self._host_states:
            return True
        g = self._grammars.get(seq.seq_id)
        return g is not None and not isinstance(g, GrammarState)

    def _process_decode_batch(self, decodes: list[Sequence]) -> None:
        # Spec rounds run whenever an eligible (greedy) row is present.
        # Eligibility is STATIC per sequence (gen_cfg, grammar and host-
        # sampler membership are fixed at submit), so eligible rows hit
        # the spec path on every one of their rounds — which is what
        # keeps the draft cache continuous for them (the chain's first
        # step writes each row's latest token). Batches with no eligible
        # row take the plain path and its multi-step horizon; their
        # draft-cache staleness is harmless because they never draft.
        if self._horizon > 1 or self._spec_k:
            side = [s for s in decodes if self._side_row(s)]
            if side and len(side) < len(decodes):
                # Mixed batch: host-coupled rows single-step on their own
                # (their sequences are never in the horizon pipeline, so
                # no flush); the rest keeps its fast path. Partition
                # BEFORE the side step — a side row finishing mid-step is
                # cleaned up and would otherwise leak into the rest batch.
                rest = [s for s in decodes if not self._side_row(s)]
                self._single_step_batch(side, flush=False)
                decodes = rest
        if self._spec_k and any(self._spec_eligible(s) for s in decodes):
            return self._process_decode_batch_spec(decodes)
        return self._process_decode_batch_plain(decodes)

    def _process_decode_batch_spec(self, decodes: list[Sequence]) -> None:
        """Speculative batched decode: ONE fused [B, k+1] verify step.

        Greedy rows carry k prompt-lookup draft tokens; each accepts the
        longest prefix matching the model's argmax chain and emits
        accepted+1 tokens. Non-eligible rows ride along consuming only
        position 0 — identical numerics to the plain step (their extra
        positions write to the trash slot)."""
        from .speculative import prompt_lookup_draft

        # Spec rounds read host-side last tokens: land any pipelined
        # horizon round first.
        self._flush_pipe()

        k = self._spec_k
        bmax = min(_next_pow2(len(decodes), minimum=1), self.max_batch)
        decodes = decodes[:bmax]
        n = len(decodes)

        device_drafts = None
        if self._draft is not None:
            # One on-device greedy chain proposes k tokens for every row
            # (dtab: tok0 | pos0 | block table — one upload).
            dtab = np.full((bmax, 2 + self.max_blocks_per_seq), 0x7FFFFFFF,
                           dtype=np.int32)
            dtab[:, :2] = 0
            for i, seq in enumerate(decodes):
                dtab[i, 0] = seq.all_tokens[-1]
                dtab[i, 1] = seq.total_len - 1
                # Blocks for chain writes (pos..pos+k-1) and verify
                # writes (pos..pos+k); clamped to the context limit so the
                # table never outgrows max_blocks_per_seq (pad_block_table
                # would raise and abort the whole batch). On failure the
                # in-jit clamp sends overflow writes to the trash slot
                # (drafts degrade, verification stays exact).
                self.scheduler._ensure_block_for(
                    seq, min(seq.total_len - 1 + k, self.max_seq_len - 1))
                dtab[i, 2:] = pad_block_table(seq.block_table,
                                              self.max_blocks_per_seq)
            d_dev, self._draft_cache = self._draft_chain(
                self._draft_cache, jnp.asarray(dtab))
            device_drafts = np.array(self._to_host(d_dev))

        # ONE packed upload (see verify_step's column map): 0 pos0 |
        # 1 span | 2 state_row | 3:3+k1 tokens | 3+k1: block table.
        mb = self.max_blocks_per_seq
        vtab = np.zeros((bmax, 3 + (k + 1) + mb), dtype=np.int32)
        vtab[:, 1] = 1
        vtab[:, 2] = self.max_batch      # pad rows → state-pool trash row
        vtab[:, 3 + (k + 1):] = 0x7FFFFFFF
        stab = np.zeros((bmax, 64 + 10 + 2 * _BIAS_W), dtype=np.int32)
        stab[:, :64] = PAD_TOKEN
        cfgs = []
        drafts: list[list[int]] = []
        any_mask = False
        for i, seq in enumerate(decodes):
            pos = seq.total_len - 1
            history = seq.all_tokens
            draft: list[int] = []
            if self._spec_eligible(seq):
                budget = min(self._spec_depth, seq.gen_cfg.max_tokens
                             - seq.emitted,
                             self.max_seq_len - 1 - seq.total_len)
                if budget > 0:
                    if device_drafts is not None:
                        draft = [int(t) for t in device_drafts[i, :budget]]
                    else:
                        draft = prompt_lookup_draft(history, budget)
                if draft and not self.scheduler._ensure_block_for(
                        seq, pos + len(draft)):
                    draft = []            # allocator pressure: plain row
            drafts.append(draft)
            vtab[i, 0] = pos
            vtab[i, 1] = 1 + len(draft)
            if self._needs_state_rows:
                vtab[i, 2] = self._row_for(seq.seq_id)
            vtab[i, 3] = history[-1]
            vtab[i, 4 : 4 + len(draft)] = draft
            vtab[i, 3 + (k + 1):] = pad_block_table(seq.block_table, mb)
            stab[i, :64] = make_window(self._windows[seq.seq_id],
                                       seq.gen_cfg.repeat_last_n)
            cfgs.append(seq.gen_cfg)
            any_mask |= seq.seq_id in self._grammars
        for i in range(n, bmax):
            cfgs.append(_PAD_CFG)

        logits_dev, self.cache = self._verify_step(
            self.cache, jnp.asarray(vtab))

        # Position-0 sampling for every row — the exact plain-step path
        # (grammar masks, bias, windows all apply to non-greedy rows) —
        # fused with the argmax chain into ONE packed fetch.
        steps = [s.emitted for s in decodes]
        steps += [0] * (len(cfgs) - len(steps))
        self._fill_tail(stab, 64, cfgs, steps)
        mask = (jnp.asarray(self._grammar_mask(
                    [s.seq_id for s in decodes], bmax))
                if any_mask else self._dummy_mask)
        use_topk = any(s.gen_cfg.logprobs for s in decodes)
        packed_dev, last0_dev = self._spec_finish(
            logits_dev, jnp.asarray(stab), mask, use_mask=any_mask,
            use_topk=use_topk)
        out = np.array(self._to_host(packed_dev))  # [B, k+3(+2K)], ONE fetch
        argmax_np = out[:, : k + 1]
        toks = out[:, k + 1].copy()
        lps = out[:, k + 2 : k + 3].copy().view(np.float32)[:, 0]

        host_rows = [i for i, s in enumerate(decodes)
                     if s.seq_id in self._host_states]
        if host_rows:
            last_np = self._to_host(last0_dev)
            for i in host_rows:
                toks[i] = self._host_pick(decodes[i], last_np[i])
                lps[i] = float("nan")

        drafted0, accepted0 = self.spec_drafted, self.spec_accepted
        for i, seq in enumerate(decodes):
            draft = drafts[i]
            if not draft:
                top = None
                if use_topk and seq.gen_cfg.logprobs:
                    kk = min(seq.gen_cfg.top_logprobs or 5, TOPK_K)
                    top = self._top_entries(
                        out[i, k + 3 : k + 3 + kk],
                        out[i, k + 3 + TOPK_K : k + 3 + TOPK_K + kk])
                self._emit(seq, int(toks[i]), float(lps[i]), top=top)
                continue
            # Greedy chain: accept drafts while they match argmax, then
            # emit the first correction token.
            self.spec_drafted += len(draft)
            emitted = 0
            for j in range(len(draft)):
                if draft[j] != argmax_np[i, j]:
                    break
                self.spec_accepted += 1
                self._emit(seq, int(draft[j]), float("nan"))
                emitted += 1
                if seq.state != SequenceState.RUNNING:
                    break                 # finished (EOS / length) mid-chain
            if seq.state == SequenceState.RUNNING:
                self._emit(seq, int(argmax_np[i, emitted]), float("nan"))

        self._adapt_spec_depth(self.spec_drafted - drafted0,
                               self.spec_accepted - accepted0)

    def _adapt_spec_depth(self, drafted: int, accepted: int) -> None:
        """Step the adaptive speculation depth from one round's acceptance
        (reference SpeculativeConfig.adaptive_depth): rounds that actually
        drafted feed a rolling window; every 8 such rounds the depth steps
        toward [1, spec_k] — >80% acceptance grows it, <40% shrinks it."""
        if not self._spec_adaptive or drafted <= 0:
            return
        self._spec_win[0] += drafted
        self._spec_win[1] += accepted
        self._spec_rounds += 1
        if self._spec_rounds % 8 == 0:
            rate = self._spec_win[1] / max(1, self._spec_win[0])
            if rate > 0.8:
                self._spec_depth = min(self._spec_depth + 1, self._spec_k)
            elif rate < 0.4:
                self._spec_depth = max(self._spec_depth - 1, 1)
            self._spec_win = [0, 0]

    def _process_decode_batch_plain(self, decodes: list[Sequence]) -> None:
        """ONE fused forward+sample for all running sequences
        (reference process_decode_batch, batch_decode.rs:35-209).

        Horizon-eligible batches run PIPELINED: round N+1 is dispatched
        from round N's device-resident loop carries (token / penalty
        window / grammar state) BEFORE round N's output is fetched, so
        the host's fetch + emit + schedule work overlaps device compute
        instead of leaving the chip idle between rounds. Correctness of
        free-then-reuse under an in-flight round rests on the donated
        cache threading: every device program consumes ``self.cache``
        and produces the next one, so programs execute in dispatch order
        — a freed block's stray writes always land BEFORE its next
        owner's, and stale outputs are discarded host-side by the
        ``state != RUNNING`` check in the emit loop."""
        bmax = _next_pow2(len(decodes), minimum=1)
        bmax = min(bmax, self.max_batch)
        decodes = decodes[:bmax]

        any_mask = any(s.seq_id in self._grammars for s in decodes)
        host_rows = [i for i, s in enumerate(decodes)
                     if s.seq_id in self._host_states]

        # Horizon eligibility. Host samplers need raw logits each step →
        # T=1 (only hit when the WHOLE batch is host rows — mixed batches
        # were already split off in _process_decode_batch). Grammar rows
        # ride the horizon when their DFAs advance on device
        # (token_tables); otherwise they also force T=1.
        g_tables = None
        eligible = self._horizon > 1 and not host_rows
        if eligible and any_mask:
            g_tables = self._grammar_tables(decodes)
            eligible = g_tables is not None
        if eligible:
            return self._horizon_round(decodes, bmax, g_tables)
        self._single_step_batch(decodes, flush=True, bmax=bmax)

    def _single_step_batch(self, decodes: list[Sequence], flush: bool,
                           bmax: Optional[int] = None) -> None:
        """One T=1 fused decode step over ``decodes``. ``flush`` lands any
        pipelined horizon rounds first — required when these sequences may
        themselves be in the pipeline (their itab token would be stale);
        the side batch passes flush=False because its rows never enter the
        pipeline."""
        if bmax is None:
            bmax = min(_next_pow2(len(decodes), minimum=1), self.max_batch)
            decodes = decodes[:bmax]
        any_mask = any(s.seq_id in self._grammars for s in decodes)
        host_rows = [i for i, s in enumerate(decodes)
                     if s.seq_id in self._host_states]
        if flush:
            # Any pending pipelined round must land first (its tokens
            # feed this step's itab).
            self._flush_pipe()
        n = len(decodes)
        mtab, cfgs = self._build_itab(
            [s if i < n else None for i, s in
             enumerate(decodes + [None] * (bmax - n))],
            [0] * bmax)
        steps = [s.emitted for s in decodes]
        steps += [0] * (len(cfgs) - len(steps))
        self._fill_tail(mtab, self._mo["sp"], cfgs, steps)
        if any_mask:
            mask = jnp.asarray(
                self._grammar_mask([s.seq_id for s in decodes], bmax))
        else:
            # mask is unused under use_mask=False — the cached one-byte
            # dummy, zero upload.
            mask = self._dummy_mask
        use_topk = any(s.gen_cfg.logprobs for s in decodes)
        packed_dev, last_dev, self.cache = self._decode_step(
            self.cache, jnp.asarray(mtab), mask,
            use_mask=any_mask, use_topk=use_topk,
        )
        out = np.array(self._to_host(packed_dev))
        toks = out[:, 0].copy()
        lps = out[:, 1].copy().view(np.float32)
        # Rows needing the host sampler chain re-sample from the raw
        # logits (one [B, V] fetch, only when such a row exists).
        if host_rows:
            last_np = self._to_host(last_dev)
            for i in host_rows:
                toks[i] = self._host_pick(decodes[i], last_np[i])
                lps[i] = float("nan")
        for i, seq in enumerate(decodes):
            self._emit(seq, int(toks[i]), float(lps[i]),
                       top=self._top_row(seq, out[i]))

    # ------------------------------------------------------------------
    def _build_itab(self, rows: list[Optional[Sequence]], lag: list[int]
                    ) -> tuple[np.ndarray, list[GenerationConfig]]:
        """Packed int table for one decode round over a fixed row layout.

        ``lag[i]`` is the number of in-flight (dispatched, un-fetched)
        tokens of row i's sequence — host token/window columns are stale
        by that much, which is fine: pipelined rows read them from the
        device carries instead (fresh=False)."""
        bmax = len(rows)
        mb = self.max_blocks_per_seq
        itab = np.zeros((bmax, self._mo["w"]), dtype=np.int32)
        itab[:, 2] = self._trash
        itab[:, 4] = self.max_batch      # pad rows → state-pool trash row
        itab[:, _ITAB_WIN] = PAD_TOKEN
        itab[:, _ITAB_BT : _ITAB_BT + mb] = 0x7FFFFFFF
        cfgs: list[GenerationConfig] = []
        for i, seq in enumerate(rows):
            if seq is None:
                cfgs.append(_PAD_CFG)
                continue
            pos = seq.total_len - 1 + lag[i]   # position of the last token
            itab[i, 0] = seq.all_tokens[-1]
            itab[i, 1] = pos
            itab[i, 2] = compute_slot_mapping(
                seq.block_table, pos, 1, self.block_size,
                self._trash)[0]
            itab[i, 3] = pos + 1
            if self._needs_state_rows:
                itab[i, 4] = self._row_for(seq.seq_id)
            itab[i, _ITAB_WIN] = make_window(self._windows[seq.seq_id],
                                             seq.gen_cfg.repeat_last_n)
            itab[i, _ITAB_BT : _ITAB_BT + mb] = pad_block_table(
                seq.block_table, mb)
            cfgs.append(seq.gen_cfg)
        return itab, cfgs

    def _horizon_round(self, decodes: list[Sequence], bmax_now: int,
                       g_tables) -> None:
        """Dispatch one (possibly chained) multi-step horizon round onto
        the decode pipeline, then fetch + emit the OLDEST round once the
        pipeline exceeds its depth."""
        newest = self._pipe_q[-1] if self._pipe_q else None
        gkey = id(g_tables) if g_tables is not None else None
        use_topk = any(s.gen_cfg.logprobs for s in decodes)

        chain = (newest is not None and newest["bmax"] == bmax_now
                 and newest["gkey"] == gkey and newest["topk"] == use_topk)
        if newest is not None and not chain:
            self._flush_pipe()              # flush: layout/tables changed
            newest = None
            # The flush's emits can FINISH sequences still in this call's
            # decode list (their remaining budget was in flight) — keep
            # only live rows, or the itab build below reads state that
            # _cleanup_seq already dropped.
            decodes = [s for s in decodes
                       if s.state == SequenceState.RUNNING]
            if not decodes:
                return

        # Row layout: chained sequences keep their previous row (their
        # carry lives there); newcomers take free rows as fresh.
        bmax = bmax_now
        if chain:
            byid = {s.seq_id for s in decodes}
            rows: list[Optional[Sequence]] = []
            placed = set()
            for r in newest["rows"]:
                keep = (r is not None and r.seq_id in byid
                        and r.state == SequenceState.RUNNING)
                rows.append(r if keep else None)
                if keep:
                    placed.add(r.seq_id)
            free = [i for i, r in enumerate(rows) if r is None]
            for s in decodes:
                if s.seq_id not in placed:
                    rows[free.pop(0)] = s
            fresh = np.array([r is None or r.seq_id not in placed
                              for r in rows], dtype=bool)
            # lag[i] = in-flight (dispatched, un-fetched) tokens of the
            # sequence occupying row i: sum over queued rounds that carry
            # the SAME sequence in that row (identity check — a row reused
            # by a newcomer doesn't inherit the old occupant's lag).
            lag = [0 if fresh[i] or rows[i] is None else
                   sum(q["t"] for q in self._pipe_q
                       if q["rows"][i] is rows[i])
                   for i in range(bmax)]
        else:
            rows = list(decodes) + [None] * (bmax - len(decodes))
            fresh = np.ones((bmax,), dtype=bool)
            lag = [0] * bmax

        live = [(i, s) for i, s in enumerate(rows) if s is not None]
        rem_max = max(s.gen_cfg.max_tokens - s.emitted - lag[i]
                      for i, s in live)
        if rem_max <= 0:
            # Every live row's budget is already covered by in-flight
            # rounds — dispatching more is pure overrun. Land the oldest
            # round instead (finishing rows / shrinking lag).
            if self._pipe_q:
                self._emit_round(self._pipe_q.popleft())
            return
        t_steps = min(self._horizon, rem_max)
        # Block tables MUST cover the whole horizon BEFORE the itab
        # snapshot — the device derives write slots from the snapshot,
        # and a write into a block it can't see clamps to the trash
        # slot, silently losing that token's KV.
        for trial_t in (t_steps, 1):
            t_steps = trial_t
            ok = True
            for i, seq in enumerate(rows):
                if seq is None:
                    continue
                target = min(seq.total_len + lag[i] + t_steps - 1,
                             self.max_seq_len - 1)
                if not self.scheduler._ensure_block_for(seq, target):
                    ok = False
                    break
            if ok:
                break
        if not ok and self._pipe_q:
            # Allocator pressure while carrying in-flight tokens: land
            # the oldest round (shrinking lag) and let the scheduler's
            # preemption logic resolve the pressure next step.
            self._emit_round(self._pipe_q.popleft())
            return
        if not ok:
            t_steps = 1   # fresh round: pos0 is covered by schedule()

        mo = self._mo
        mtab, cfgs = self._build_itab(rows, lag)
        steps = [s.emitted + lag[i] if s is not None else 0
                 for i, s in enumerate(rows)]
        self._fill_tail(mtab, mo["sp"], cfgs, steps)
        mtab[:, mo["fresh"]] = fresh
        mtab[0, mo["t"]] = t_steps

        if g_tables is not None:
            gmask_dev, gnext_dev = g_tables
            for i, s in enumerate(rows):
                g = self._grammars.get(s.seq_id) if s is not None else None
                if g is not None:
                    mtab[i, mo["gst"]] = g.state
                    mtab[i, mo["hasg"]] = 1
        else:
            gmask_dev, gnext_dev = self._gdummy

        if chain:
            carry_tok, carry_win, carry_gs = (newest["tok"], newest["win"],
                                              newest["gs"])
        else:
            carry_tok, carry_win, carry_gs = self._carry_zero(bmax)

        t0 = time.perf_counter()
        out_dev, tok_f, win_f, gs_f, self.cache = self._horizon_step(
            self.cache, jnp.asarray(mtab), gmask_dev, gnext_dev,
            carry_tok, carry_win, carry_gs,
            use_grammar=g_tables is not None, use_topk=use_topk)
        self.perf["h_dispatch"] += time.perf_counter() - t0
        self._pipe_q.append({"out": out_dev, "tok": tok_f, "win": win_f,
                             "gs": gs_f, "rows": rows, "t": t_steps,
                             "bmax": bmax, "gkey": gkey, "topk": use_topk})
        try:
            # Queue the D2H transfer NOW: it starts the moment the round
            # completes on device, overlapping later dispatches + host
            # work instead of paying transfer latency inside the blocking
            # fetch.
            out_dev.copy_to_host_async()
        except Exception:       # pragma: no cover — backend-optional
            pass
        self.horizon_dispatches += 1
        self.horizon_steps += t_steps
        while len(self._pipe_q) > self._pipe_depth:
            self._emit_round(self._pipe_q.popleft())
        # If nothing survives the emits, the in-flight rounds are pure
        # overrun — drop them unfetched (their cache writes are inert).
        if self._pipe_q and not any(
                r is not None and r.state == SequenceState.RUNNING
                for r in self._pipe_q[-1]["rows"]):
            self._pipe_q.clear()

    def _emit_round(self, p: dict) -> None:
        """Fetch a dispatched horizon round and emit its tokens."""
        t0 = time.perf_counter()
        out = np.array(self._to_host(p["out"]))   # [H, B, 2(+2K)], ONE fetch
        t1 = time.perf_counter()
        self.perf["h_fetch"] += t1 - t0
        self.perf["h_fetch_n"] += 1
        lps_h = out[:, :, 1].copy().view(np.float32)
        # Deferred delivery: a horizon round emits up to H·B tokens, and
        # one call_soon_threadsafe PER TOKEN (lock + waker write each)
        # measured 8.5 ms/round at b64·H8 — ~6% of the decode wall. Queue
        # puts buffer during the loop and flush in ONE loop wake-up.
        self._defer_puts = []
        try:
            for s_i in range(p["t"]):
                for i, seq in enumerate(p["rows"]):
                    if seq is None or seq.state != SequenceState.RUNNING:
                        continue  # finished mid-horizon: discard overrun
                    self._emit(seq, int(out[s_i, i, 0]),
                               float(lps_h[s_i, i]),
                               top=self._top_row(seq, out[s_i, i]))
        finally:
            buf, self._defer_puts = self._defer_puts, None
            self._flush_puts(buf)
        self.perf["h_emit"] += time.perf_counter() - t1

    def _flush_pipe(self) -> None:
        while self._pipe_q:
            self._emit_round(self._pipe_q.popleft())

    # ------------------------------------------------------------------
    def _grammar_tables(self, decodes: list[Sequence]):
        """Device-resident grammar tables (mask + token transitions) for a
        horizon round, or None when device stepping can't apply (PDA-tier
        grammar, mixed DFAs, automaton too large). Tables upload once per
        DFA and live on device — the returned tuple is identity-stable
        across rounds, which the pipelined chainer keys on."""
        dfa = None
        for s in decodes:
            g = self._grammars.get(s.seq_id)
            if g is None:
                continue
            if not isinstance(g, GrammarState):
                return None                     # exact-PDA tier: host-only
            if dfa is not None and g.dfa is not dfa:
                return None                     # mixed grammars in batch
            dfa = g.dfa
        if dfa is None:
            return None
        cached = self._dev_gram.get(id(dfa))
        if cached is None:
            if self._vocab_bytes is None:
                self._vocab_bytes = self.tokenizer.vocab_bytes()
            tables = dfa.token_tables(
                self._vocab_bytes,
                eos_token_id=self.tokenizer.eos_token_id)
            if tables is None:
                return None                     # too many states
            masks, nxt = tables
            v = self.model.vocab_size
            s2 = _next_pow2(masks.shape[0])     # bucket compile count by S
            gm = np.zeros((s2, v), dtype=bool)
            gn = np.full((s2, v), -1, dtype=np.int32)
            tv = min(masks.shape[1], v)
            gm[: masks.shape[0], :tv] = masks[:, :tv]
            gn[: masks.shape[0], :tv] = nxt[:, :tv]
            # Token ids past the tokenizer vocab stay ILLEGAL (gm zeros)
            # — same as the host _grammar_mask padding.
            cached = (jnp.asarray(gm), jnp.asarray(gn))
            self._dev_gram[id(dfa)] = cached
        return cached

    # ------------------------------------------------------------------
    def _grammar_mask(self, seq_ids: list[int], bmax: Optional[int] = None
                      ) -> np.ndarray:
        v = self.model.vocab_size
        b = bmax or len(seq_ids)
        mask = np.ones((b, v), dtype=bool)
        for i, sid in enumerate(seq_ids):
            g = self._grammars.get(sid)
            if g is not None:
                m = g.mask()
                # Pad-vocab models: ids past the tokenizer vocab are
                # never legal for a constrained row.
                mask[i, :] = False
                mask[i, : min(len(m), v)] = m[:v]
        return mask

    # ------------------------------------------------------------------
    def _top_row(self, seq: Sequence,
                 out_row: np.ndarray) -> Optional[list]:
        """Decode a packed output row's top-K tail into TokenLogprob
        entries (only for rows that requested logprobs; rows of a
        non-topk program have no tail and return None)."""
        if not seq.gen_cfg.logprobs or out_row.shape[0] < 2 + 2 * TOPK_K:
            return None
        k = min(seq.gen_cfg.top_logprobs or 5, TOPK_K)
        return self._top_entries(out_row[2 : 2 + k],
                                 out_row[2 + TOPK_K : 2 + TOPK_K + k])

    def _top_entries(self, ids: np.ndarray,
                     lps_bits: np.ndarray) -> list:
        """TokenLogprob entries from packed (ids, f32-bit) column slices."""
        from .types import TokenLogprob

        lps = np.ascontiguousarray(lps_bits, dtype=np.int32).view(np.float32)
        return [TokenLogprob(int(t), float(l), self._token_text(int(t)))
                for t, l in zip(ids, lps)]

    def _emit(self, seq: Sequence, token: int, logprob: float,
              top: Optional[list] = None) -> None:
        """Record a sampled token, stream it, and finish on EOS/length."""
        self.scheduler.append_token(seq.seq_id, token)
        self._windows[seq.seq_id].append(token)
        g = self._grammars.get(seq.seq_id)
        if g is not None:
            g.accept_token(token)

        is_eos = self.tokenizer.is_eos(token)
        hit_len = seq.emitted >= seq.gen_cfg.max_tokens or \
            seq.total_len >= self.max_seq_len - 1
        text = "" if is_eos else self._token_text(token)
        gt = GeneratedToken(token_id=token, text=text,
                            logprob=None if logprob != logprob else logprob,
                            top_logprobs=top)
        fin = (FinishReason.EOS if is_eos
               else FinishReason.LENGTH if hit_len else None)
        handle = self._handles.get(seq.seq_id)
        if handle is not None:
            self._queue_put(handle.queue, (gt, fin))
        if fin is not None:
            self.scheduler.finish_sequence(seq.seq_id)
            self._cleanup_seq(seq.seq_id)

    def _queue_put(self, q: "asyncio.Queue", item) -> None:
        """Thread-safe token delivery: emits happen on to_thread workers,
        where a bare put_nowait would not wake the event loop (see run()).
        During a deferred-delivery section (_emit_round) puts buffer and
        flush in one loop wake-up instead of one per token."""
        buf = getattr(self, "_defer_puts", None)
        if buf is not None:
            buf.append((q, item))
            return
        self._put_now(q, item)

    def _put_now(self, q: "asyncio.Queue", item) -> None:
        import threading

        loop = getattr(self, "_loop", None)
        if loop is not None and threading.get_ident() != self._loop_thread:
            loop.call_soon_threadsafe(q.put_nowait, item)
        else:
            q.put_nowait(item)

    def _flush_puts(self, buf: list) -> None:
        """Deliver a deferred batch of queue puts in ONE loop wake-up."""
        if not buf:
            return
        import threading

        loop = getattr(self, "_loop", None)

        def drain():
            for q, item in buf:
                q.put_nowait(item)

        if loop is not None and threading.get_ident() != self._loop_thread:
            loop.call_soon_threadsafe(drain)
        else:
            drain()

    def _finish(self, seq_id: int, fin: Optional[FinishReason]) -> None:
        handle = self._handles.get(seq_id)
        if handle is not None:
            self._queue_put(handle.queue, (None, fin or FinishReason.STOP))
        self._cleanup_seq(seq_id)

    def _cleanup_seq(self, seq_id: int) -> None:
        self._handles.pop(seq_id, None)
        self._grammars.pop(seq_id, None)
        self._windows.pop(seq_id, None)
        self._host_states.pop(seq_id, None)
        if self._needs_state_rows:
            row = self._seq_rows.pop(seq_id, None)
            if row is not None:
                self._free_rows.append(row)

    def _token_text(self, tok: int) -> str:
        try:
            return self.tokenizer.decode([tok])
        except Exception:
            return ""
