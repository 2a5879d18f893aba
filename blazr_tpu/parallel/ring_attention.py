"""Ring attention: sequence-parallel causal attention over the mesh.

Green-field design (SURVEY §5.7 — the reference has NO sequence/context
parallelism; BASELINE requires long-context prefill beyond single-chip
HBM). The sequence axis is sharded over the ``sp`` mesh axis; each device
holds a [B, S/p, H, D] slice of Q/K/V. K/V blocks rotate around the ring
with ``jax.lax.ppermute`` (ICI neighbor exchange) while every device
accumulates its queries' attention with an online-softmax (flash-style)
running max/denominator — p steps, each overlapping a block of compute
with one neighbor hop.

Causality across blocks: with query block index q_i and incoming KV block
index kv_i (both in rotation order), a block is
  * fully visible  if kv_i < q_i   (all keys before all queries)
  * diagonal       if kv_i == q_i  (per-position causal mask)
  * invisible      if kv_i > q_i   (skipped via full mask)
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _block_attend(q, k, v, m_prev, l_prev, acc_prev, mask):
    """One online-softmax accumulation step.

    q [B,Sq,H,D], k/v [B,Skv,H,D], mask [Sq,Skv] bool (True = visible).
    Carries: m (running max [B,H,Sq]), l (denominator), acc [B,Sq,H,D].
    """
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    logits = jnp.where(mask[None, None, :, :], logits, -jnp.inf)

    m_new = jnp.maximum(m_prev, jnp.max(logits, axis=-1))
    # Renormalize previous accumulator. Guard -inf - -inf.
    m_safe = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    alpha = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_safe), 0.0)
    p = jnp.exp(jnp.where(jnp.isfinite(logits),
                          logits - m_safe[..., None], -jnp.inf))
    p = jnp.where(jnp.isnan(p), 0.0, p)
    l_new = l_prev * alpha + jnp.sum(p, axis=-1)
    acc_new = (acc_prev * alpha.transpose(0, 2, 1)[..., None]
               + jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32)))
    return m_new, l_new, acc_new


def ring_attention_sharded(q, k, v, axis_name: str = "sp",
                           sliding_window: Optional[int] = None,
                           n_hops: Optional[int] = None):
    """Inside-shard_map body: [B, S_local, H, D] per device → same shape.

    Rotation: at step s, this device (index i) holds the KV block that
    originated on device (i - s) mod p. Visibility is computed from
    GLOBAL positions (gq = i·S_local + local, gk = src·S_local + local):
    causal ``gk <= gq`` covers the full/diagonal/wrapped-block cases in
    one compare, and a sliding window adds ``gk > gq − W`` (the same
    convention as layers.attend / the PA kernel: the last W keys
    including self are visible).

    ``n_hops`` statically truncates the ring: a window spans at most
    ceil((W−1)/S_local) + 1 consecutive KV blocks, so later hops carry
    blocks wholly below every query's lower bound — skipping them drops
    both the masked-out compute AND the ppermute traffic (VERDICT r3 #3:
    window-aware ring prefill *reduces* ring traffic).
    """
    p_size = jax.lax.psum(1, axis_name)
    my_idx = jax.lax.axis_index(axis_name)
    b, s_local, h, d = q.shape
    if n_hops is None:
        n_hops = p_size

    m0 = jnp.full((b, h, s_local), -jnp.inf, dtype=jnp.float32)
    l0 = jnp.zeros((b, h, s_local), dtype=jnp.float32)
    acc0 = jnp.zeros((b, s_local, h, d), dtype=jnp.float32)

    pos = jnp.arange(s_local, dtype=jnp.int32)
    gq = my_idx * s_local + pos                    # [S_local] global query
    perm = [(i, (i + 1) % p_size) for i in range(p_size)]

    def step(carry, s):
        m, l, acc, kb, vb = carry
        src = (my_idx - s) % p_size          # origin block index of kb
        gk = src * s_local + pos             # [S_local] global key pos
        mask = gk[None, :] <= gq[:, None]
        if sliding_window is not None:
            mask &= gk[None, :] > gq[:, None] - sliding_window
        m, l, acc = _block_attend(q, kb, vb, m, l, acc, mask)
        kb = jax.lax.ppermute(kb, axis_name, perm)
        vb = jax.lax.ppermute(vb, axis_name, perm)
        return (m, l, acc, kb, vb), None

    (m, l, acc, _, _), _ = jax.lax.scan(
        step, (m0, l0, acc0, k, v), jnp.arange(n_hops))
    denom = jnp.maximum(l, 1e-30).transpose(0, 2, 1)[..., None]
    return (acc / denom).astype(q.dtype)


def ring_hops(p_size: int, s_local: int,
              sliding_window: Optional[int]) -> int:
    """Number of ring hops that can contribute under a sliding window.

    Hop s delivers block src = i − s; the lowest block any query on
    device i can see is floor((i·S_local − W + 1)/S_local), so at most
    ceil((W−1)/S_local) + 1 hops ever contribute — later hops carry KV
    wholly below every query's window lower bound."""
    if sliding_window is None or s_local <= 0:
        return p_size
    return min(p_size, -(-(sliding_window - 1) // s_local) + 1)


def ring_attention(q, k, v, mesh: Mesh, axis_name: str = "sp",
                   sliding_window: Optional[int] = None):
    """[B, S, H, D] causal attention with S sharded over ``axis_name``."""
    from jax import shard_map

    p_size = mesh.shape[axis_name]
    n_hops = ring_hops(p_size, q.shape[1] // p_size, sliding_window)
    spec = P(None, axis_name, None, None)
    fn = shard_map(
        functools.partial(ring_attention_sharded, axis_name=axis_name,
                          sliding_window=sliding_window, n_hops=n_hops),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    return fn(q, k, v)


def reference_causal_attention(q, k, v, sliding_window: Optional[int] = None):
    """Dense causal attention (golden reference for the ring tests)."""
    b, s, h, d = q.shape
    scale = 1.0 / math.sqrt(d)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32)) * scale
    mask = jnp.tril(jnp.ones((s, s), dtype=bool))
    if sliding_window is not None:
        pos = jnp.arange(s)
        mask &= pos[None, :] > pos[:, None] - sliding_window
    logits = jnp.where(mask[None, None], logits, -jnp.inf)
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", probs,
                      v.astype(jnp.float32)).astype(q.dtype)
