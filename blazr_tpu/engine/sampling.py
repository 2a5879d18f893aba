"""Fused on-device sampling.

TPU-native equivalent of boostr's ``SamplingOps::logits_to_token`` — the
reference's single fused CUDA launch doing narrow + penalties + temperature
+ top-k/top-p/min-p + seeded sampling (src/engine/sampling.rs:445-460).
Here the whole chain is one jitted XLA program over fixed shapes, so it
fuses into the decode step and adds no dispatch overhead.

Host-side "exotic" samplers (mirostat / DRY / typical / dynatemp) live in
``samplers.py``, mirroring the reference's CPU-side split.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.generation import GenerationConfig

# Static shape for the penalty window (reference repeat_last_n default 64,
# src/config/generation.rs). Fixed so the decode step never recompiles.
PENALTY_WINDOW = 64
PAD_TOKEN = -1


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SamplingParams:
    """Per-sequence device-side sampling parameters [B]-shaped."""

    temperature: jax.Array       # [B] f32; 0 → greedy
    top_k: jax.Array             # [B] i32; 0 → disabled
    top_p: jax.Array             # [B] f32; 1 → disabled
    min_p: jax.Array             # [B] f32; 0 → disabled
    repeat_penalty: jax.Array    # [B] f32; 1 → disabled
    freq_penalty: jax.Array      # [B] f32
    presence_penalty: jax.Array  # [B] f32
    key: jax.Array               # [B, 2] u32 (seed, step) pairs — folded
                                 # into PRNG keys INSIDE sample_tokens.
                                 # Host-side PRNGKey/fold_in would be a
                                 # per-row device round-trip (dispatch +
                                 # blocking fetch) on remote backends —
                                 # measured ~1 s/step at B=32 through the
                                 # TPU tunnel.

    @classmethod
    def from_config(cls, cfgs: list[GenerationConfig],
                    step: "int | list[int]" = 0) -> "SamplingParams":
        """Build batched device params from per-request GenerationConfigs.

        ``step`` may be per-row (each sequence's own emitted-token count)
        so staggered batches — rows admitted at different times, or
        advancing at different rates under speculative decoding — keep
        per-sequence seeded sampling deterministic."""
        def arr(get, dtype=np.float32):
            return jnp.asarray(np.array([get(c) for c in cfgs], dtype=dtype))

        steps = step if isinstance(step, (list, tuple)) else [step] * len(cfgs)
        keys = np.empty((len(cfgs), 2), dtype=np.uint32)
        for i, c in enumerate(cfgs):
            seed = c.seed if c.seed is not None else 0x5EED ^ (i * 7919)
            keys[i] = (np.uint32(seed & 0xFFFFFFFF), np.uint32(steps[i]))
        return cls(
            temperature=arr(lambda c: c.temperature),
            top_k=arr(lambda c: c.top_k, np.int32),
            top_p=arr(lambda c: c.top_p),
            min_p=arr(lambda c: c.min_p),
            repeat_penalty=arr(lambda c: c.repeat_penalty),
            freq_penalty=arr(lambda c: c.frequency_penalty),
            presence_penalty=arr(lambda c: c.presence_penalty),
            key=jnp.asarray(keys),
        )


def pack_sampling_host(cfgs: list[GenerationConfig],
                       step: "int | list[int]" = 0
                       ) -> tuple[np.ndarray, np.ndarray]:
    """Host-side pack of SamplingParams into TWO arrays ([B, 8] f32 +
    [B, 2] u32 (seed, step) pairs) so a decode step uploads 2 buffers
    instead of 8 — per-array host→device transfers dominate step latency
    on high-RTT links and are pure dispatch overhead locally. Column 7
    (repeat_last_n) is not a SamplingParams field; the horizon decode
    loop reads it for in-device penalty-window updates."""
    steps = step if isinstance(step, (list, tuple)) else [step] * len(cfgs)
    f = np.empty((len(cfgs), 8), dtype=np.float32)
    keys = np.empty((len(cfgs), 2), dtype=np.uint32)
    for i, c in enumerate(cfgs):
        f[i] = (c.temperature, float(c.top_k), c.top_p, c.min_p,
                c.repeat_penalty, c.frequency_penalty, c.presence_penalty,
                float(c.repeat_last_n))
        seed = c.seed if c.seed is not None else 0x5EED ^ (i * 7919)
        keys[i] = (np.uint32(seed & 0xFFFFFFFF), np.uint32(steps[i]))
    return f, keys


def unpack_sampling(packed: jax.Array, keys: jax.Array) -> SamplingParams:
    """In-jit inverse of :func:`pack_sampling_host`."""
    return SamplingParams(
        temperature=packed[:, 0],
        top_k=packed[:, 1].astype(jnp.int32),
        top_p=packed[:, 2],
        min_p=packed[:, 3],
        repeat_penalty=packed[:, 4],
        freq_penalty=packed[:, 5],
        presence_penalty=packed[:, 6],
        key=keys,
    )


def apply_penalties(
    logits: jax.Array,            # [B, V] f32
    window_tokens: jax.Array,     # [B, W] i32, PAD_TOKEN for empty slots
    repeat_penalty: jax.Array,    # [B]
    freq_penalty: jax.Array,      # [B]
    presence_penalty: jax.Array,  # [B]
) -> jax.Array:
    """Repetition (CTRL-style), frequency and presence penalties over the
    recent-token window (reference sampling.rs penalty stage).

    Sparse formulation: penalties only change the ≤W logits named by the
    window, so the stage gathers those, transforms them, and scatters
    them back — O(B·W²) VPU work instead of the dense O(B·V) scatter-add
    + elementwise chain over the [B, V] plane (the count is computed per
    SLOT via a W×W equality sum). Pad slots (token id 0 after clamping)
    write token 0's own final value, so duplicate scatter writes are
    always identical and the nondeterministic write order is harmless.
    """
    b, v = logits.shape
    valid = window_tokens >= 0
    safe = jnp.where(valid, window_tokens, 0)
    # counts[j] = occurrences of safe[j] among VALID slots (its own
    # included), i.e. the dense one_hot_counts gathered at safe[j].
    eq = (safe[:, :, None] == safe[:, None, :]) & valid[:, None, :]
    counts = eq.sum(axis=2).astype(jnp.float32)            # [B, W]
    in_win = counts > 0
    cur = jnp.take_along_axis(logits, safe, axis=1)        # [B, W]
    rp = repeat_penalty[:, None]
    penalized = jnp.where(cur > 0, cur / rp, cur * rp)
    val = jnp.where(
        in_win,
        penalized - counts * freq_penalty[:, None]
        - presence_penalty[:, None],
        cur)
    return logits.at[jnp.arange(b)[:, None], safe].set(val)


def apply_top_k(logits: jax.Array, top_k: jax.Array) -> jax.Array:
    """Mask all but the k highest logits (0 → disabled). Vector-k per row."""
    v = logits.shape[-1]
    sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]
    k = jnp.where(top_k <= 0, v, jnp.minimum(top_k, v))
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    return jnp.where(logits >= kth, logits, -jnp.inf)


def apply_top_p(logits: jax.Array, top_p: jax.Array) -> jax.Array:
    """Nucleus filtering: keep the smallest prefix of sorted probs whose sum
    exceeds p (always keeps the argmax, including at top_p == 0)."""
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # Token i is kept if the cumulative mass BEFORE it is < p.
    keep_sorted = (cum - probs) < top_p[:, None]
    keep_sorted = keep_sorted.at[:, 0].set(True)       # argmax always kept
    # Threshold = smallest kept logit.
    threshold = jnp.min(
        jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True
    )
    return jnp.where(logits >= threshold, logits, -jnp.inf)


def apply_top_k_top_p(logits: jax.Array, top_k: jax.Array,
                      top_p: jax.Array) -> jax.Array:
    """Fused top-k → nucleus filtering over ONE [B, V] sort.

    Matches apply_top_p(apply_top_k(logits, k), p) exactly: the top-k
    cut keeps sorted ranks < k; nucleus mass is computed over the
    k-filtered distribution in the same sorted space. Sorting the vocab
    is the sampler's dominant cost — the split implementation paid it
    twice per decode step (top_p == 0 keeps the argmax, as above)."""
    v = logits.shape[-1]
    sorted_desc = jnp.sort(logits, axis=-1)[:, ::-1]
    ranks = jnp.arange(v)[None, :]
    k = jnp.where(top_k <= 0, v, jnp.minimum(top_k, v))
    keep_k = ranks < k[:, None]
    kept = jnp.where(keep_k, sorted_desc, -jnp.inf)
    probs = jax.nn.softmax(kept, axis=-1)              # mass over kept set
    cum = jnp.cumsum(probs, axis=-1)
    keep_p = (cum - probs) < top_p[:, None]
    keep = keep_k & keep_p
    keep = keep.at[:, 0].set(True)                     # argmax always kept
    threshold = jnp.min(
        jnp.where(keep, sorted_desc, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits >= threshold, logits, -jnp.inf)


def apply_min_p(logits: jax.Array, min_p: jax.Array) -> jax.Array:
    """Drop tokens with prob < min_p * max_prob (reference min_p stage)."""
    probs = jax.nn.softmax(logits, axis=-1)
    max_p = jnp.max(probs, axis=-1, keepdims=True)
    keep = probs >= (min_p[:, None] * max_p)
    return jnp.where(keep, logits, -jnp.inf)


def sample_tokens(
    logits: jax.Array,                       # [B, V] f32
    params: SamplingParams,
    window_tokens: Optional[jax.Array] = None,   # [B, W]
    logit_bias_ids: Optional[jax.Array] = None,  # [B, Nb] i32 (PAD_TOKEN pad)
    logit_bias_vals: Optional[jax.Array] = None, # [B, Nb] f32
    grammar_mask: Optional[jax.Array] = None,    # [B, V] bool (True=allowed)
) -> tuple[jax.Array, jax.Array]:
    """The fused sampling chain. Returns (tokens [B] i32, logprobs [B, V]).

    Order matches the reference: penalties → bias → grammar mask → temp →
    top-k → top-p → min-p → seeded categorical; temp==0 short-circuits to
    argmax per row.
    """
    logits = logits.astype(jnp.float32)

    if window_tokens is not None:
        logits = apply_penalties(
            logits, window_tokens, params.repeat_penalty,
            params.freq_penalty, params.presence_penalty,
        )
    if logit_bias_ids is not None:
        b = logits.shape[0]
        valid = logit_bias_ids >= 0
        safe = jnp.where(valid, logit_bias_ids, 0)
        logits = logits.at[jnp.arange(b)[:, None], safe].add(
            jnp.where(valid, logit_bias_vals, 0.0)
        )
    if grammar_mask is not None:
        logits = jnp.where(grammar_mask, logits, -jnp.inf)

    # Log-probs of the (penalized, masked) distribution for logprob output.
    logprobs = jax.nn.log_softmax(logits, axis=-1)

    greedy_tokens = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    def _sampled_chain(_):
        temp = jnp.maximum(params.temperature, 1e-6)[:, None]
        scaled = logits / temp
        scaled = apply_top_k_top_p(scaled, params.top_k, params.top_p)
        scaled = apply_min_p(scaled, params.min_p)

        # Gumbel-max seeded sampling, one key per row. The key is derived
        # in-trace from the (seed, step) pair — identical threefry ops to
        # a host-side fold_in, but zero per-row host↔device round-trips.
        def row_sample(seed_step, row_logits):
            key = jax.random.fold_in(jax.random.PRNGKey(seed_step[0]),
                                     seed_step[1])
            g = jax.random.gumbel(key, row_logits.shape, dtype=jnp.float32)
            safe = jnp.where(jnp.isfinite(row_logits), row_logits + g,
                             -jnp.inf)
            return jnp.argmax(safe).astype(jnp.int32)

        return jax.vmap(row_sample)(params.key, scaled)

    # The stochastic chain costs a full [B, V] sort + softmax + 1M-element
    # gumbel draw per step; all-greedy batches (temperature 0 everywhere —
    # the dominant serving regime) skip it entirely via a scalar-predicate
    # branch. When ANY row samples, the chain runs exactly as before and
    # greedy rows still take the argmax via the final where.
    any_sampled = jnp.any(params.temperature > 0.0)
    sampled = jax.lax.cond(any_sampled, _sampled_chain,
                           lambda _: greedy_tokens, None)

    tokens = jnp.where(params.temperature <= 0.0, greedy_tokens, sampled)
    return tokens, logprobs


@partial(jax.jit, static_argnames=())
def greedy_token(logits: jax.Array) -> jax.Array:
    """argmax over the last position (reference decode_graph::argmax_to_buf)."""
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


# ---------------------------------------------------------------------------
# Host-side helpers for windows / bias (fixed-shape padding)
# ---------------------------------------------------------------------------

def make_window(history: list[int], repeat_last_n: int = PENALTY_WINDOW,
                width: int = PENALTY_WINDOW) -> np.ndarray:
    """Last ``repeat_last_n`` tokens padded to a fixed [W] row."""
    n = min(repeat_last_n, width)
    recent = history[-n:] if n > 0 else []
    row = np.full((width,), PAD_TOKEN, dtype=np.int32)
    if recent:
        row[: len(recent)] = np.asarray(recent[-width:], dtype=np.int32)
    return row


def make_bias_rows(cfgs: list[GenerationConfig], width: int = 16
                   ) -> tuple[np.ndarray, np.ndarray]:
    ids = np.full((len(cfgs), width), PAD_TOKEN, dtype=np.int32)
    vals = np.zeros((len(cfgs), width), dtype=np.float32)
    for i, c in enumerate(cfgs):
        for j, (tid, v) in enumerate(list(c.logit_bias.items())[:width]):
            ids[i, j] = tid
            vals[i, j] = v
    return ids, vals
