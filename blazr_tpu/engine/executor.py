"""Executor: model + tokenizer + caches + compiled step functions.

TPU-native equivalent of the reference Executor (src/engine/executor.rs:31-65)
and its streaming generate loop (src/engine/executor_generate.rs:43-409).

The XLA translation of the reference's machinery:
  * CUDA graphs (cuda_graphs.rs) → one jitted fixed-shape decode step with
    donated cache buffers; XLA replays the compiled program every token.
  * `to_vec_pipelined`/record_event → jax async dispatch: the next step is
    dispatched with the *device* token array before the previous token is
    read back, overlapping D2H with compute (executor_generate.rs:182-340).
  * Prefill buckets (pow-2 padding to the cache trash slot) keep the
    number of compiled programs logarithmic in context length.
  * Sampling is fused into the decode program (sampling.rs:445-460).
  * PTX preload/warmup (warmup.rs) → `warmup()` pre-compiles the step fns.
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.app import AppConfig
from ..config.generation import GenerationConfig
from ..models.registry import Model
from .grammar import GrammarState, compile_grammar_to_dfa, make_grammar_state
from .grammar_json import JSON_GRAMMAR, json_schema_to_gbnf
from .samplers import MirostatState, host_sample, needs_host_sampling
from .sampling import (
    PAD_TOKEN,
    PENALTY_WINDOW,
    SamplingParams,
    make_bias_rows,
    make_window,
    sample_tokens,
)
from .types import FinishReason, GeneratedToken, TokenLogprob
from ..utils.tracing import span as tracing_span

logger = logging.getLogger(__name__)


def _next_bucket(n: int, minimum: int = 16) -> int:
    b = minimum
    while b < n:
        b *= 2
    return b


class Executor:
    """Single-model inference executor (contiguous-cache path).

    The paged / continuous-batching path lives in ``batch_engine.py``.
    """

    def __init__(self, model: Model, tokenizer, app_cfg: Optional[AppConfig] = None):
        self.model = model
        self.tokenizer = tokenizer
        self.app_cfg = app_cfg or AppConfig(model=model.cfg)
        self.capacity = min(
            self.app_cfg.effective_max_seq_len() or 4096,
            model.cfg.max_seq_len or 4096,
        )
        self._vocab_bytes: Optional[list[bytes]] = None
        # Last completed session's (fed tokens, device cache) — reused when
        # the next prompt extends it (reference prefix reuse,
        # executor_generate.rs:230-249). Restore COPIES the pytree: the
        # retained buffers must never flow into a donating jit.
        self._session: Optional[tuple[list[int], Any]] = None
        self.load_time = time.time()

        # Tensor-parallel serving: build the mesh and shard the params in
        # place so every jitted step below runs GSPMD-partitioned
        # (reference wires TP into the model lifecycle the same way,
        # scheduler.rs:160-206). Streaming (host-offload) models stay
        # single-device — their layers live in host RAM.
        self.mesh = None
        if not getattr(model, "is_streaming", False):
            from ..quant.qtensor import apply_quant_compute

            model.params = apply_quant_compute(
                model.params, self.app_cfg.inference.quant_compute)
            from ..parallel.tp import maybe_serving_mesh, shard_params

            self.mesh = maybe_serving_mesh(self.app_cfg.inference,
                                           model.cfg, model.params)
            if self.mesh is not None:
                if (self.mesh.shape.get("ep", 1) > 1
                        and model.cfg.moe is not None):
                    # Route MoE forwards through the all-to-all EP path
                    # (parallel/ep.py); expert stacks shard over ``ep``.
                    model.cfg.moe.use_ep = True
                model.params = shard_params(model.params, self.mesh,
                                            model.cfg)

        # MoE expert offload (reference executor_cache.rs:235-348): swap
        # params to resident-stack form and keep the host mirror; the
        # generate loops call _moe_tick() once per forward pass.
        self._moe_rt = None
        if (self.app_cfg.inference.moe_offload and self.mesh is None
                and not getattr(model, "is_streaming", False)):
            from .moe_offload import install_offload

            model.params, self._moe_rt = install_offload(
                model.params, model.cfg, self.app_cfg.inference)
            # A BatchEngine built over the same (transformed) model drives
            # the manager from its own step loop.
            model.moe_offload_rt = self._moe_rt

        fwd = model.forward_fn
        cfg = model.cfg

        # NOTE: params are explicit jit ARGS everywhere — closure capture
        # would embed the weights as constants in the lowered HLO (GBs
        # serialized through the compile path).
        @partial(jax.jit, donate_argnums=(1,))
        def prefill_step(params, cache, tokens, positions, seq_lens, last_idx):
            logits, cache = fwd(params, cfg, tokens, cache, positions, seq_lens)
            last = jnp.take_along_axis(
                logits, last_idx[:, None, None], axis=1
            )[:, 0, :]
            return last, cache

        @partial(jax.jit, donate_argnums=(1,), static_argnames=("use_mask",))
        def decode_step(params, cache, token, window, positions, seq_lens,
                        sp: SamplingParams, bias_ids, bias_vals, grammar_mask,
                        use_mask=False):
            logits, cache = fwd(params, cfg, token, cache, positions, seq_lens)
            last = logits[:, -1, :]
            tok, logprobs = sample_tokens(
                last, sp,
                window_tokens=window,
                logit_bias_ids=bias_ids,
                logit_bias_vals=bias_vals,
                grammar_mask=grammar_mask if use_mask else None,
            )
            chosen_lp = jnp.take_along_axis(logprobs, tok[:, None], axis=1)[:, 0]
            top_lp, top_ids = jax.lax.top_k(logprobs, 20)
            return tok, cache, chosen_lp, top_lp, top_ids

        @partial(jax.jit, donate_argnums=(1,))
        def forward_step(params, cache, token, positions, seq_lens):
            logits, cache = fwd(params, cfg, token, cache, positions, seq_lens)
            return logits[:, -1, :], cache

        @partial(jax.jit, donate_argnums=(1,))
        def verify_step(params, cache, tokens, positions, seq_lens):
            # Full-logits multi-token step (speculative verification).
            logits, cache = fwd(params, cfg, tokens, cache, positions, seq_lens)
            return logits, cache

        @jax.jit
        def sample_only(last, window, sp: SamplingParams, bias_ids, bias_vals,
                        grammar_mask):
            tok, logprobs = sample_tokens(
                last, sp, window_tokens=window,
                logit_bias_ids=bias_ids, logit_bias_vals=bias_vals,
                grammar_mask=grammar_mask,
            )
            chosen_lp = jnp.take_along_axis(logprobs, tok[:, None], axis=1)[:, 0]
            top_lp, top_ids = jax.lax.top_k(logprobs, 20)
            return tok, chosen_lp, top_lp, top_ids

        def bind(fn):
            if self.mesh is None:
                return lambda *a, **kw: fn(self.model.params, *a, **kw)

            def call(*a, **kw):
                with jax.set_mesh(self.mesh):
                    return fn(self.model.params, *a, **kw)
            return call

        if getattr(model, "is_streaming", False):
            # Host-offloaded layers stream in Python between per-layer
            # jits (offload_stream.StreamingModel); the full step cannot
            # be one jit, so compose model.forward + the jitted sampler.
            def prefill_streaming(cache, tokens, positions, seq_lens,
                                  last_idx):
                logits, cache = model.forward(tokens, cache, positions,
                                              seq_lens)
                last = jnp.take_along_axis(
                    logits, last_idx[:, None, None], axis=1)[:, 0, :]
                return last, cache

            def decode_streaming(cache, token, window, positions, seq_lens,
                                 sp, bias_ids, bias_vals, grammar_mask,
                                 use_mask=False):
                logits, cache = model.forward(token, cache, positions,
                                              seq_lens)
                tok, chosen_lp, top_lp, top_ids = sample_only(
                    logits[:, -1, :], window, sp, bias_ids, bias_vals,
                    grammar_mask if use_mask else None)
                return tok, cache, chosen_lp, top_lp, top_ids

            def forward_streaming(cache, token, positions, seq_lens):
                logits, cache = model.forward(token, cache, positions,
                                              seq_lens)
                return logits[:, -1, :], cache

            def verify_streaming(cache, tokens, positions, seq_lens):
                return model.forward(tokens, cache, positions, seq_lens)

            self._prefill_step = prefill_streaming
            self._decode_step = decode_streaming
            self._forward_step = forward_streaming
            self._verify_step = verify_streaming
        else:
            self._prefill_step = bind(prefill_step)
            self._decode_step = bind(decode_step)
            self._forward_step = bind(forward_step)
            self._verify_step = bind(verify_step)
        if self.mesh is not None:
            def sample_in_mesh(*a, **kw):
                with jax.set_mesh(self.mesh):
                    return sample_only(*a, **kw)
            self._sample_only = sample_in_mesh
        else:
            self._sample_only = sample_only

        # Ring-attention (sequence-parallel) prefill: a SEPARATE jit whose
        # closed-over config carries the sp mesh, so the ordinary prefill
        # buckets never alias its compiled programs. Long prompts whose
        # attention is pure in-chunk causal (start_pos 0, one chunk) shard
        # the sequence over ``sp`` and rotate KV blocks over ICI
        # (parallel/ring_attention.py; green-field BASELINE SP row).
        self._ring_prefill_step = None
        self._sp = self.mesh.shape.get("sp", 1) if self.mesh else 1
        if self._sp > 1 and not getattr(model, "is_streaming", False):
            from ..models import llama as _llama

            att = cfg.attention
            ring_ok = (
                fwd is _llama.forward
                and att is not None
                and not cfg.attn_logit_softcapping
                and not self.model.needs_ssm_state
            )
            if ring_ok:
                import copy

                ring_cfg = copy.copy(cfg)
                ring_cfg._sp_ring_mesh = self.mesh

                @partial(jax.jit, donate_argnums=(1,))
                def ring_prefill_step(params, cache, tokens, positions,
                                      seq_lens, last_idx):
                    logits, cache = fwd(params, ring_cfg, tokens, cache,
                                        positions, seq_lens)
                    last = jnp.take_along_axis(
                        logits, last_idx[:, None, None], axis=1)[:, 0, :]
                    return last, cache

                self._ring_prefill_step = bind(ring_prefill_step)

    # ------------------------------------------------------------------
    def vocab_bytes(self) -> list[bytes]:
        if self._vocab_bytes is None:
            self._vocab_bytes = self.tokenizer.vocab_bytes()
        return self._vocab_bytes

    def _grammar_for(self, cfg: GenerationConfig) -> Optional[GrammarState]:
        src = None
        if cfg.grammar:
            src = cfg.grammar
        elif cfg.json_schema:
            src = json_schema_to_gbnf(cfg.json_schema)
        elif cfg.json_mode:
            src = JSON_GRAMMAR
        if src is None:
            return None
        return make_grammar_state(src, self.vocab_bytes(),
                                  eos_token_id=self.tokenizer.eos_token_id)

    def _init_cache(self, batch: int):
        """Model cache honoring inference.kv_cache_dtype (int8/int4 KV on
        the contiguous cache; int8 on paged/MLA; other backends ignore)."""
        kv_dtype = self.app_cfg.inference.kv_cache_dtype
        kv_quant = (kv_dtype in ("int8", "int4")
                    and not self.model.needs_ssm_state
                    and self.model.cfg.attention is not None
                    and not self.model.cfg.hybrid_layers)
        try:
            cache = self.model.init_cache(batch, self.capacity,
                                          kv_quant=kv_quant,
                                          kv_dtype=kv_dtype)
        except TypeError:      # model types without the kv_quant arg
            cache = self.model.init_cache(batch, self.capacity)
        if self.mesh is not None and hasattr(cache, "k"):
            from ..parallel.tp import shard_cache

            cache = shard_cache(cache, self.mesh)
        return cache

    # ------------------------------------------------------------------
    # single-stream session KV reuse (contiguous cache)
    # ------------------------------------------------------------------
    _MIN_REUSE_TOKENS = 16   # below this a fresh prefill beats the copy

    def _session_restore(self, prompt_ids: list[int]):
        """(cache, start) reusing the previous session's device-resident KV
        when the new prompt extends it; (None, 0) on miss. Recurrent-state
        backends (SSM/hybrid) can't be partially replayed and never match."""
        if not self.app_cfg.inference.prefix_cache or self._session is None:
            return None, 0
        toks, cache = self._session
        limit = min(len(toks), len(prompt_ids) - 1)
        n = 0
        while n < limit and toks[n] == prompt_ids[n]:
            n += 1
        if n < self._MIN_REUSE_TOKENS:
            return None, 0
        import dataclasses

        fresh = jax.tree.map(jnp.copy, cache)
        # Trim to the matched prefix; later slots get overwritten by the
        # suffix prefill or masked by the per-sequence length.
        return dataclasses.replace(
            fresh, length=jnp.minimum(fresh.length, n)), n

    def _session_save(self, fed_tokens: list[int], cache) -> None:
        # Positional caches only (contiguous KV, MLA latent): hybrid/SSM
        # recurrent state reflects every token fed and cannot be trimmed
        # back to a prefix.
        if (self.app_cfg.inference.prefix_cache
                and (hasattr(cache, "k") or hasattr(cache, "latent"))
                and not hasattr(cache, "ssm")
                and hasattr(cache, "trash_position")):
            self._session = (list(fed_tokens), cache)

    # ------------------------------------------------------------------
    def prefill(self, cache, prompt_ids: list[int], start_pos: int = 0):
        """Bucketed prefill. Returns (last_logits [1, V] device, cache).

        Models with recurrent (SSM) state run exact-shaped power-of-two
        sub-chunks instead of padded buckets: a pad token has nowhere
        harmless to go in a recurrence — it would shift the conv window
        and update the SSM state (KV models park pads on the trash slot).
        """
        n = len(prompt_ids)
        assert n > 0, "empty prompt"
        if (self._ring_prefill_step is not None and start_pos == 0
                and n >= self.app_cfg.inference.sp_prefill_threshold):
            return self._ring_prefill(cache, prompt_ids)
        bucket = min(_next_bucket(n), self.capacity)
        chunk_cfg = self.app_cfg.inference.prefill_chunk_size
        chunk = min(chunk_cfg or bucket, bucket)

        if self.model.needs_ssm_state:
            pos = start_pos
            last = None
            idx = 0
            while idx < n:
                rem = min(chunk, n - idx)
                sub = 1
                while sub * 2 <= rem:
                    sub *= 2
                piece = prompt_ids[idx : idx + sub]
                toks = np.asarray(piece, dtype=np.int32)[None, :]
                positions = np.arange(pos, pos + sub, dtype=np.int32)[None, :]
                seq_lens = np.array([pos + sub], dtype=np.int32)
                last_idx = np.array([sub - 1], dtype=np.int32)
                last, cache = self._prefill_step(
                    cache, jnp.asarray(toks), jnp.asarray(positions),
                    jnp.asarray(seq_lens), jnp.asarray(last_idx),
                )
                pos += sub
                idx += sub
                self._moe_tick()
            return last, cache

        trash = cache.trash_position if hasattr(cache, "trash_position") else None
        pos = start_pos
        last = None
        idx = 0
        while idx < n:
            piece = prompt_ids[idx : idx + chunk]
            padded = min(_next_bucket(len(piece)), chunk)
            toks = np.zeros((1, padded), dtype=np.int32)
            toks[0, : len(piece)] = piece
            positions = np.full((1, padded),
                                trash if trash is not None else 0,
                                dtype=np.int32)
            positions[0, : len(piece)] = np.arange(pos, pos + len(piece))
            seq_lens = np.array([pos + len(piece)], dtype=np.int32)
            last_idx = np.array([len(piece) - 1], dtype=np.int32)
            last, cache = self._prefill_step(
                cache, jnp.asarray(toks), jnp.asarray(positions),
                jnp.asarray(seq_lens), jnp.asarray(last_idx),
            )
            pos += len(piece)
            idx += chunk
            self._moe_tick()
        return last, cache

    # ------------------------------------------------------------------
    def _ring_prefill(self, cache, prompt_ids: list[int]):
        """Whole-prompt sequence-parallel prefill: one jitted pass with the
        sequence sharded over ``sp``, ring attention in every layer. Pads
        (to an sp-divisible bucket) park on the cache trash slot; their
        local indices sit after every real token, so in-chunk causal
        masking keeps them invisible to real queries."""
        n = len(prompt_ids)
        step = self._sp * 16
        bucket = -(-n // step) * step     # pads write to the trash slot
        trash = cache.trash_position if hasattr(cache, "trash_position") else 0
        toks = np.zeros((1, bucket), dtype=np.int32)
        toks[0, :n] = prompt_ids
        positions = np.full((1, bucket), trash, dtype=np.int32)
        positions[0, :n] = np.arange(n)
        seq_lens = np.array([n], dtype=np.int32)
        last_idx = np.array([n - 1], dtype=np.int32)
        last, cache = self._ring_prefill_step(
            cache, jnp.asarray(toks), jnp.asarray(positions),
            jnp.asarray(seq_lens), jnp.asarray(last_idx),
        )
        self._moe_tick()
        return last, cache

    # ------------------------------------------------------------------
    def generate(
        self,
        prompt_ids: list[int],
        gen_cfg: Optional[GenerationConfig] = None,
    ) -> Iterator[GeneratedToken]:
        """Streaming generation (reference generate(), executor_generate.rs:43).

        Yields GeneratedToken; the caller handles stop sequences / text
        assembly (generate_text.py).
        """
        cfg = gen_cfg or self.app_cfg.generation
        cfg.validate()
        max_new = min(cfg.max_tokens, self.capacity - len(prompt_ids))
        if max_new <= 0:
            return

        grammar = self._grammar_for(cfg)
        host_path = needs_host_sampling(cfg)
        mirostat = MirostatState.from_config(cfg) if cfg.mirostat == 2 else None
        host_rng = np.random.default_rng(cfg.seed if cfg.seed is not None else 0)

        backend = ("mamba2" if self.model.needs_ssm_state and
                   not self.model.needs_kv_cache else "contiguous")
        cache, start = self._session_restore(prompt_ids)
        if cache is None:
            cache = self._init_cache(1)
        t0 = time.time()
        with tracing_span("prefill", backend=backend,
                          tokens=len(prompt_ids) - start, cached=start):
            last_logits, cache = self.prefill(cache, prompt_ids[start:],
                                              start_pos=start)
        prefill_time = time.time() - t0
        # Tokens whose KV the cache holds (grows as decode feeds tokens).
        kv_tokens = list(prompt_ids)

        history = list(prompt_ids)
        window = jnp.asarray(make_window(history, cfg.repeat_last_n)[None, :])
        bias_ids, bias_vals = make_bias_rows([cfg])
        bias_ids = jnp.asarray(bias_ids)
        bias_vals = jnp.asarray(bias_vals)
        breaker_ids = self._breaker_ids(cfg) if cfg.dry_multiplier > 0 else None

        emitted = 0
        pos = len(prompt_ids)
        # Unused under use_mask=False — one byte, not a [1, vocab] fill
        # per decode step (hot-loop allocation + dispatch).
        dummy_mask = jnp.ones((1, 1), dtype=bool)

        def grammar_mask_dev():
            if grammar is None:
                return dummy_mask
            m = grammar.mask()
            v = self.model.vocab_size
            if len(m) < v:
                m = np.concatenate([m, np.zeros(v - len(m), dtype=bool)])
            return jnp.asarray(m[None, :v])

        def pick_token(last_logits_dev, step) -> tuple[int, float, Any, Any]:
            """Sample the next token from [1, V] device logits."""
            sp = SamplingParams.from_config([cfg], step=step)
            if host_path:
                logits_np = np.asarray(last_logits_dev)[0]
                if grammar is not None:
                    # Pad-vocab models: logits may be longer than the
                    # tokenizer mask — padded ids are never legal.
                    m = grammar.mask()
                    mfull = np.zeros(len(logits_np), dtype=bool)
                    mfull[: min(len(m), len(logits_np))] = \
                        m[: len(logits_np)]
                    logits_np = np.where(mfull, logits_np, -np.inf)
                tok = host_sample(logits_np, cfg, history, mirostat,
                                  breaker_ids, host_rng)
                return tok, float("nan"), None, None
            tok_dev, lp, top_lp, top_ids = self._sample_only(
                last_logits_dev, window, sp, bias_ids, bias_vals,
                grammar_mask_dev(),
            )
            return int(tok_dev[0]), float(lp[0]), top_lp, top_ids

        # First token from prefill logits.
        tok, lp, top_lp, top_ids = pick_token(last_logits, 0)

        try:
            for step in range(max_new):
                finished, tok = self._postprocess_token(tok, grammar)
                gt = GeneratedToken(
                    token_id=tok,
                    text="" if self.tokenizer.is_eos(tok)
                         else self._token_text(tok),
                    logprob=None if np.isnan(lp) else lp,
                    top_logprobs=self._top_logprobs(cfg, top_lp, top_ids),
                )
                history.append(tok)
                # Rebuild the penalty window from history each step (a pure
                # shift-append evicts prompt tokens early while PAD slots
                # remain whenever len(prompt) < window — reference keeps
                # last-repeat_last_n semantics, batch_engine does the same).
                window = jnp.asarray(
                    make_window(history, cfg.repeat_last_n)[None, :])
                yield gt
                emitted += 1
                if finished or self.tokenizer.is_eos(tok) or emitted >= max_new:
                    return
                if pos + 1 >= self.capacity:
                    return

                positions = jnp.asarray([[pos]], dtype=jnp.int32)
                seq_lens = jnp.asarray([pos + 1], dtype=jnp.int32)
                if host_path:
                    # Host-sampler path: forward only, then sample on host
                    # from the raw logits (reference CPU-side samplers).
                    last_logits, cache = self._forward_step(
                        cache, jnp.asarray([[tok]], dtype=jnp.int32),
                        positions, seq_lens,
                    )
                    kv_tokens.append(tok)
                    pos += 1
                    tok, lp, top_lp, top_ids = pick_token(last_logits, step + 1)
                else:
                    # Fused path: forward + sample in one compiled program.
                    sp = SamplingParams.from_config([cfg], step=step + 1)
                    use_mask = grammar is not None
                    tok_dev, cache, lp_dev, top_lp, top_ids = self._decode_step(
                        cache, jnp.asarray([[tok]], dtype=jnp.int32), window,
                        positions, seq_lens, sp, bias_ids, bias_vals,
                        grammar_mask_dev() if use_mask else dummy_mask,
                        use_mask=use_mask,
                    )
                    kv_tokens.append(tok)
                    pos += 1
                    tok = int(tok_dev[0])
                    lp = float(lp_dev[0])
                self._moe_tick()
        finally:
            # Retain the device cache for prefix reuse by the next request
            # (runs on normal finish AND client-disconnect GeneratorExit).
            self._session_save(kv_tokens, cache)

    # ------------------------------------------------------------------
    # LoRA hot-swap (reference lora.rs: adapters apply to the live model;
    # params are explicit jit ARGS everywhere, so swapping the tree takes
    # effect at the next step with no recompile for dense merges).
    # ------------------------------------------------------------------
    def set_lora(self, adapter) -> None:
        """Activate a LoRA adapter: merge over the CLEAN base params
        (adapters replace each other rather than stacking)."""
        if self.mesh is not None:
            raise ValueError("LoRA under mesh-sharded serving is not "
                             "supported yet")
        from .lora import merge_lora

        if getattr(self, "_lora_base", None) is None:
            self._lora_base = self.model.params
        self.model.params = merge_lora(self._lora_base, adapter,
                                       model_cfg=self.model.cfg)
        self._active_lora = adapter.name
        logger.info("LoRA adapter %r active", adapter.name)

    def clear_lora(self) -> None:
        if getattr(self, "_lora_base", None) is not None:
            self.model.params = self._lora_base
            self._lora_base = None
        self._active_lora = None

    @property
    def active_lora(self) -> Optional[str]:
        return getattr(self, "_active_lora", None)

    # ------------------------------------------------------------------
    def close(self) -> None:
        """Release host-side resources on model unload — the MoE offload
        runtime holds a global-registry reference to its host expert
        mirror (needed for io_callback dispatch) that would otherwise
        outlive the model."""
        if self._moe_rt is not None:
            self._moe_rt.close()
            self._moe_rt = None
            if getattr(self.model, "moe_offload_rt", None) is not None:
                self.model.moe_offload_rt = None

    # ------------------------------------------------------------------
    def _moe_tick(self) -> None:
        """One forward pass completed → drive the MoE offload manager
        (usage decay + periodic hot-set rebalance)."""
        if self._moe_rt is not None:
            self._moe_rt.tick(self.model.params)

    # ------------------------------------------------------------------
    def _postprocess_token(self, tok: int, grammar) -> tuple[bool, int]:
        if grammar is not None:
            ok = grammar.accept_token(tok)
            if not ok:
                # Token rejected by grammar (shouldn't happen with masking);
                # finish the stream.
                return True, tok
            if grammar.is_complete and self.tokenizer.is_eos(tok):
                return True, tok
        return False, tok

    def _token_text(self, tok: int) -> str:
        try:
            return self.tokenizer.decode([tok])
        except Exception:
            return ""

    def _top_logprobs(self, cfg: GenerationConfig, top_lp, top_ids):
        if not cfg.logprobs or top_lp is None:
            return None
        k = min(cfg.top_logprobs, 20)
        lps = np.asarray(top_lp)[0, :k]
        ids = np.asarray(top_ids)[0, :k]
        return [TokenLogprob(int(i), float(l), self._token_text(int(i)))
                for i, l in zip(ids, lps)]

    def _breaker_ids(self, cfg: GenerationConfig) -> set[int]:
        out: set[int] = set()
        for s in cfg.dry_sequence_breakers:
            ids = self.tokenizer.encode(s) if hasattr(self.tokenizer, "encode") else []
            # ALL tokens of each breaker string reset the DRY match window
            # (same semantics as BatchEngine._dry_breaker_ids — keeping
            # only the last token made the two engines sample differently
            # for identical requests).
            out.update(ids)
        return out

    # ------------------------------------------------------------------
    def get_embeddings(self, prompt_ids: list[int]) -> np.ndarray:
        """Token embeddings (reference executor_embed.rs:38): final-norm
        hidden states would need a dedicated forward; embeddings here are
        the model's token embedding rows (pooling is server-side)."""
        from ..models.llama import forward_embed

        emb = forward_embed(self.model.params, self.model.cfg,
                            jnp.asarray([prompt_ids], dtype=jnp.int32))
        return np.asarray(emb[0], dtype=np.float32)

    def warmup(self) -> float:
        """Pre-compile prefill (smallest bucket) + decode step
        (reference warmup.rs:38; saves first-token latency)."""
        t0 = time.time()
        for _ in self.generate([1, 2, 3], GenerationConfig(max_tokens=2,
                                                           temperature=0.0)):
            pass
        dt = time.time() - t0
        logger.info("warmup done in %.2fs", dt)
        return dt
