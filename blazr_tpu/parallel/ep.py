"""Expert parallelism: experts sharded over the ``ep`` mesh axis with
all-to-all dispatch.

The true-EP design BASELINE.json requires (SURVEY §2.8 EP row: the
reference only has in-model routing + host offload, no cross-device EP).
GSPMD formulation: a capacity-based one-hot dispatch tensor turns MoE into
two einsums whose expert dimension is sharded over ``ep`` — XLA lowers the
resharding into all-to-all over ICI:

    dispatch  [T, E, C]  (one-hot: token t → expert e, slot c)
    expert_in [E, C, H]  = einsum('th,tec->ech', x, dispatch)   ← all-to-all
    expert_out[E, C, H]  = ffn_e(expert_in)                     ← local
    y         [T, H]     = einsum('ech,tec->th', out, combine)  ← all-to-all

Tokens over capacity are dropped (standard MoE capacity discipline —
"ragged everything vs XLA static shapes", SURVEY §7 hard parts); with
capacity ≥ the true max load the result matches the dense path exactly.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.model_config import MoeConfig
from ..models.moe import route


# Host-side accumulator for capacity drops (io_callback target; read by
# the /metrics gauge ``moe_ep_tokens_dropped_total``). Counting is OPT-IN
# per MoeConfig.ep_count_drops — a scalar callback per MoE layer per step
# is observability cost the hot path shouldn't pay by default.
DROPPED_TOKENS = {"count": 0}


def _accum_dropped(n) -> None:
    DROPPED_TOKENS["count"] += int(n)


def make_dispatch(topk_idx: jax.Array, topk_w: jax.Array, num_experts: int,
                  capacity: int
                  ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Build (dispatch [T, E, C] bool, combine [T, E, C] f32,
    dropped scalar int32).

    Slot assignment = order of arrival per expert (cumsum over the token
    axis); (token, choice) pairs past ``capacity`` are dropped — the
    dropped count is returned so callers can surface it.
    """
    t, k = topk_idx.shape
    e = num_experts
    # [T, K, E] one-hot of expert choices
    onehot = jax.nn.one_hot(topk_idx, e, dtype=jnp.int32)          # [T,K,E]
    flat = onehot.reshape(t * k, e)
    # position of each (token, choice) within its expert's queue
    pos_in_expert = jnp.cumsum(flat, axis=0) - flat                 # [T*K, E]
    slot = jnp.sum(pos_in_expert * flat, axis=1).reshape(t, k)      # [T, K]
    keep = slot < capacity
    slot = jnp.where(keep, slot, 0)

    slot_oh = jax.nn.one_hot(slot, capacity, dtype=jnp.float32)     # [T,K,C]
    disp = (onehot.astype(jnp.float32)[..., None] * slot_oh[:, :, None, :]
            * keep.astype(jnp.float32)[:, :, None, None])           # [T,K,E,C]
    combine = jnp.einsum("tkec,tk->tec", disp, topk_w.astype(jnp.float32))
    dispatch = disp.sum(axis=1)                                     # [T,E,C]
    dropped = jnp.sum(~keep).astype(jnp.int32)
    return dispatch, combine, dropped


def moe_ffn_ep(x: jax.Array, p: dict[str, Any], moe: MoeConfig,
               capacity_factor: float = 1.25,
               capacity: Optional[int] = None) -> jax.Array:
    """Expert-parallel MoE FFN over [B, T, H].

    Expert weights are expected sharded over ``ep`` on axis 0 (see
    ``tp.llama_param_specs`` expert rows); under ``jax.set_mesh`` GSPMD
    inserts the all-to-alls. Falls back to a correct single-device compute
    with no mesh.
    """
    b, t, h = x.shape
    flat = x.reshape(b * t, h)
    topk_idx, topk_w = route(flat, p["router"], moe, p.get("correction_bias"))
    e = moe.num_experts
    if capacity is None:
        capacity = max(1, int(math.ceil(
            (b * t * moe.experts_per_tok / e) * capacity_factor)))
        # static shapes: round capacity up to a multiple of 8 sublanes
        capacity = (capacity + 7) // 8 * 8

    dispatch, combine, dropped = make_dispatch(topk_idx, topk_w, e, capacity)
    if getattr(moe, "ep_count_drops", False):
        jax.experimental.io_callback(_accum_dropped, None, dropped,
                                     ordered=False)

    def dense(w):
        # Quantized expert stacks dequant per-expert (elementwise over the
        # ep-sharded expert axis → each shard only touches its local
        # experts; no resharding is induced).
        from ..quant.qtensor import QuantTensor, dequantize_stack_jnp

        if isinstance(w, QuantTensor):
            return dequantize_stack_jnp(w, jnp.float32)
        return w.astype(jnp.float32)

    expert_in = jnp.einsum("th,tec->ech", flat.astype(jnp.float32), dispatch)
    g = jnp.einsum("ech,ehi->eci", expert_in, dense(p["experts_gate"]))
    u = jnp.einsum("ech,ehi->eci", expert_in, dense(p["experts_up"]))
    a = jax.nn.silu(g) * u
    expert_out = jnp.einsum("eci,eih->ech", a, dense(p["experts_down"]))

    y = jnp.einsum("ech,tec->th", expert_out, combine)
    if p.get("shared_gate") is not None:
        from ..models.layers import swiglu_mlp

        y = y + swiglu_mlp(flat, p["shared_gate"], p["shared_up"],
                           p["shared_down"]).astype(jnp.float32)
    return y.reshape(b, t, h).astype(x.dtype)


def shard_moe_params(p: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    """Place stacked expert weights over the ep axis; router replicated."""
    out = dict(p)
    for key in ("experts_gate", "experts_up", "experts_down"):
        if key in out and out[key] is not None:
            out[key] = jax.device_put(
                out[key], NamedSharding(mesh, P("ep", None, None)))
    for key in ("router", "correction_bias", "shared_gate", "shared_up",
                "shared_down"):
        if out.get(key) is not None:
            out[key] = jax.device_put(out[key], NamedSharding(mesh, P()))
    return out
