"""Mixture-of-experts FFN: routing + expert compute + shared experts.

TPU-native equivalent of boostr's MoE top-k router + shared expert
(SURVEY §2.9; MoE config loader/gguf.rs:271-286). Supports both scoring
families:

  * softmax top-k (Mixtral / DeepSeek-V2)
  * sigmoid + e-score correction bias with group-limited routing
    (DeepSeek-V3: n_group / topk_group), norm_topk_prob and
    routed_scaling_factor

Expert compute in this correctness tier is the dense one-hot einsum over
stacked expert weights [E, K, N] (every expert computed, weighted by the
routing mask) — exact and XLA-friendly. The EP path (experts sharded over
the ``ep`` mesh axis with all-to-all dispatch) replaces it at scale; the
routing math is shared.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config.model_config import MoeConfig, UniversalConfig
from .layers import linear


def route(
    x: jax.Array,                  # [N_tok, H]
    router_w: jax.Array,           # [H, E]
    moe: MoeConfig,
    correction_bias: Optional[jax.Array] = None,   # [E] (V3)
) -> tuple[jax.Array, jax.Array]:
    """Returns (topk_idx [N_tok, k], topk_weights [N_tok, k])."""
    logits = jnp.dot(x.astype(jnp.float32), router_w.astype(jnp.float32))
    e = logits.shape[-1]
    k = moe.experts_per_tok

    if moe.scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)

    choice = scores
    if correction_bias is not None:
        choice = scores + correction_bias[None, :]

    if moe.n_group > 1:
        # Group-limited routing (DeepSeek-V3): keep topk_group groups by
        # their top-2 sum, mask the rest.
        n_tok = choice.shape[0]
        per_group = e // moe.n_group
        grouped = choice.reshape(n_tok, moe.n_group, per_group)
        top2 = jax.lax.top_k(grouped, min(2, per_group))[0].sum(axis=-1)
        _, group_idx = jax.lax.top_k(top2, moe.topk_group)
        group_mask = jnp.zeros((n_tok, moe.n_group)).at[
            jnp.arange(n_tok)[:, None], group_idx].set(1.0)
        choice = (grouped * group_mask[:, :, None]).reshape(n_tok, e) + \
            jnp.where(jnp.repeat(group_mask, per_group, axis=1) > 0, 0.0, -1e9)

    _, topk_idx = jax.lax.top_k(choice, k)
    topk_w = jnp.take_along_axis(scores, topk_idx, axis=-1)
    if moe.norm_topk_prob:
        topk_w = topk_w / (topk_w.sum(axis=-1, keepdims=True) + 1e-20)
    topk_w = topk_w * moe.routed_scaling_factor
    return topk_idx, topk_w


def _expert_mlp_all(x: jax.Array, gate_w: jax.Array, up_w: jax.Array,
                   down_w: jax.Array) -> jax.Array:
    """[N_tok, H] through every expert: weights [E, H, I] / [E, I, H] →
    [N_tok, E, H]."""
    g = jnp.einsum("nh,ehi->nei", x, gate_w.astype(x.dtype))
    u = jnp.einsum("nh,ehi->nei", x, up_w.astype(x.dtype))
    a = jax.nn.silu(g) * u
    return jnp.einsum("nei,eih->neh", a, down_w.astype(x.dtype))


def _weighted_expert_sum(flat: jax.Array, gate, up, down,
                         weights: jax.Array) -> jax.Array:
    """``Σ_e weights[:, e] · down_e(silu(gate_e(x)) · up_e(x))`` via
    ``lax.scan`` over the expert axis — peak memory is ONE expert's
    activations, and quantized expert stacks (stacked QuantTensor) dequant
    inside the scan body through the fused quant matmul. [N, H] f32."""
    from ..quant.qtensor import expert_slice
    from .layers import linear

    n, h = flat.shape

    def body(acc, e):
        g = linear(flat, expert_slice(gate, e))
        u = linear(flat, expert_slice(up, e))
        a = jax.nn.silu(g) * u
        o = linear(a, expert_slice(down, e))
        return acc + o.astype(jnp.float32) * jnp.take(
            weights, e, axis=1)[:, None], None

    acc0 = jnp.zeros((n, h), dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, acc0,
                          jnp.arange(weights.shape[1], dtype=jnp.int32))
    return acc


def _scatter_weights(topk_idx: jax.Array, topk_w: jax.Array,
                     num_experts: int) -> jax.Array:
    """[N, k] top-k routing → dense [N, E] weight matrix."""
    n = topk_idx.shape[0]
    return jnp.zeros((n, num_experts), dtype=jnp.float32).at[
        jnp.arange(n)[:, None], topk_idx].add(topk_w)


def _shared_expert_add(out: jax.Array, flat: jax.Array,
                       p: dict[str, Any]) -> jax.Array:
    if p.get("shared_gate") is not None:
        from .layers import swiglu_mlp

        out = out + swiglu_mlp(flat, p["shared_gate"], p["shared_up"],
                               p["shared_down"]).astype(jnp.float32)
    return out


def moe_ffn(x: jax.Array, p: dict[str, Any], moe: MoeConfig) -> jax.Array:
    """Full MoE FFN over [B, T, H] (router + experts + shared experts)."""
    from ..quant.qtensor import QuantTensor

    b, t, h = x.shape
    flat = x.reshape(b * t, h)
    topk_idx, topk_w = route(flat, p["router"], moe,
                             p.get("correction_bias"))
    e = moe.num_experts
    weights = _scatter_weights(topk_idx, topk_w, e)

    if isinstance(p["experts_gate"], QuantTensor):
        # Quantized expert stacks: scan (one expert live at a time, fused
        # dequant matmul) — the einsum path would materialize the dense
        # stack.
        out = _weighted_expert_sum(flat, p["experts_gate"], p["experts_up"],
                                   p["experts_down"], weights)
    else:
        all_out = _expert_mlp_all(flat, p["experts_gate"], p["experts_up"],
                                  p["experts_down"])              # [N, E, H]
        out = jnp.einsum("neh,ne->nh", all_out.astype(jnp.float32), weights)

    out = _shared_expert_add(out, flat, p)
    return out.reshape(b, t, h).astype(x.dtype)


def moe_ffn_offload(x: jax.Array, p: dict[str, Any],
                    moe: MoeConfig) -> jax.Array:
    """MoE FFN with expert offload: device holds only the resident expert
    stack (rows ``p['resident_ids']``); cold experts compute on HOST via
    ``pure_callback`` against the offload runtime's RAM mirror, and expert
    usage flows back through ``io_callback`` so the manager can rebalance
    the hot set (TPU-native equivalent of the reference's per-forward MoE
    offload drive, src/engine/executor_cache.rs:235-348)."""
    from jax.experimental import io_callback

    from ..engine import moe_offload as _off

    b, t, h = x.shape
    flat = x.reshape(b * t, h)
    n = flat.shape[0]
    topk_idx, topk_w = route(flat, p["router"], moe,
                             p.get("correction_bias"))
    e = moe.num_experts
    weights = _scatter_weights(topk_idx, topk_w, e)

    rt_key = p["offload_rt"]                       # int32 [2]: (runtime, layer)
    io_callback(_off._record_usage_cb, None, rt_key, topk_idx, ordered=False)

    res_ids = p["resident_ids"]                    # int32 [K_resident]
    res_w = jnp.take(weights, res_ids, axis=1)     # [N, K_resident]
    out = _weighted_expert_sum(flat, p["experts_gate"], p["experts_up"],
                               p["experts_down"], res_w)

    mask = jnp.zeros((e,), dtype=jnp.float32).at[res_ids].set(1.0)
    cold_w = weights * (1.0 - mask)[None, :]
    cold_shape = jax.ShapeDtypeStruct((n, h), jnp.float32)

    def cold_branch(xf, cw):
        return jax.pure_callback(_off._cold_compute_cb, cold_shape,
                                 rt_key, xf, cw)

    out = out + jax.lax.cond(
        jnp.any(cold_w != 0.0), cold_branch,
        lambda xf, cw: jnp.zeros((n, h), dtype=jnp.float32),
        flat.astype(jnp.float32), cold_w)

    out = _shared_expert_add(out, flat, p)
    return out.reshape(b, t, h).astype(x.dtype)


def moe_forward(x: jax.Array, p: dict[str, Any], moe: MoeConfig) -> jax.Array:
    """Serving-path MoE dispatch: offload → EP → dense, chosen by what the
    executor installed in the params / config (the model code stays one
    call site; reference dispatches per ModelWeights variant)."""
    if p.get("resident_ids") is not None:
        return moe_ffn_offload(x, p, moe)
    if getattr(moe, "use_ep", False):
        from ..parallel.ep import moe_ffn_ep

        return moe_ffn_ep(x, p, moe)
    return moe_ffn(x, p, moe)


def build_moe_params(pb, pfx: str, cfg: UniversalConfig) -> dict:
    """Stack per-expert weights into [E, ...] arrays (HF deepseek/mixtral
    naming; GGUF checkpoints arrive pre-stacked via the name mapping)."""
    import numpy as np

    from ..quant.qtensor import QuantTensor

    moe = cfg.moe
    p: dict[str, Any] = {
        "router": pb.get(pfx + "mlp.gate.weight",
                         pfx + "block_sparse_moe.gate.weight", transpose=True),
        "correction_bias": pb.get(
            pfx + "mlp.gate.e_score_correction_bias", required=False,
            dtype=jnp.float32),
    }
    # Pre-stacked (GGUF) or per-expert (HF)?
    stacked = pfx + "mlp.experts.gate_proj.weight"
    if stacked in pb.vm:
        for part, key in (("gate_proj", "experts_gate"), ("up_proj", "experts_up"),
                          ("down_proj", "experts_down")):
            w = pb.vm.take(pfx + f"mlp.experts.{part}.weight")
            if isinstance(w, QuantTensor):
                p[key] = w            # stacked QuantTensor, already canonical
            else:
                arr = jnp.asarray(np.asarray(w), dtype=pb.dtype)
                # GGUF stacks [E, out, in] → transpose to [E, in, out]
                p[key] = jnp.transpose(arr, (0, 2, 1))
    else:
        gates, ups, downs = [], [], []
        for ei in range(moe.num_experts):
            for base in (pfx + f"mlp.experts.{ei}.",
                         pfx + f"block_sparse_moe.experts.{ei}."):
                if base + "gate_proj.weight" in pb.vm or base + "w1.weight" in pb.vm:
                    break
            gates.append(pb.get(base + "gate_proj.weight", base + "w1.weight",
                                transpose=True))
            ups.append(pb.get(base + "up_proj.weight", base + "w3.weight",
                              transpose=True))
            downs.append(pb.get(base + "down_proj.weight", base + "w2.weight",
                                transpose=True))
        from ..quant.qtensor import stack_quant

        def _stack(ws):
            if isinstance(ws[0], QuantTensor):
                return stack_quant(ws)     # per-expert AWQ/GPTQ → [E] stack
            return jnp.stack(ws)

        p["experts_gate"] = _stack(gates)
        p["experts_up"] = _stack(ups)
        p["experts_down"] = _stack(downs)

    sg = pb.get(pfx + "mlp.shared_experts.gate_proj.weight", transpose=True,
                required=False)
    if sg is not None:
        p["shared_gate"] = sg
        p["shared_up"] = pb.get(pfx + "mlp.shared_experts.up_proj.weight",
                                transpose=True)
        p["shared_down"] = pb.get(pfx + "mlp.shared_experts.down_proj.weight",
                                  transpose=True)
    return p
