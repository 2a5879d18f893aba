"""Tensor-parallel sharding rules.

TPU-native equivalent of boostr's Megatron-style ColumnParallelLinear /
RowParallelLinear + NCCL all-reduce (SURVEY §2.8 TP row): instead of
explicit sharded-layer classes, PartitionSpecs over the ``tp`` mesh axis;
GSPMD partitions the matmuls and inserts the psum the row-parallel layers
need. Quantized weights shard the same way — qweight/scales/mins all split
along N for column-parallel and along K (whole groups) for row-parallel,
matching the group-size divisibility constraints the reference validates
(tensor_parallel.rs:76-103).

Column-parallel (shard out-features N): q/k/v projections, gate/up, lm_head.
Row-parallel    (shard in-features K):  o projection, down; psum after.
Vocab-parallel: embedding table rows.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..quant.qtensor import QuantTensor

# Param-key classification for the llama family tree.
_COL_KEYS = {"q", "k", "v", "gate", "up", "lm_head",
             "q_b", "kv_b"}                       # MLA up-projections
_ROW_KEYS = {"o", "down"}
_COL_BIAS = {"q_bias", "k_bias", "v_bias"}
_VOCAB_KEYS = {"embed"}
_EXPERT_COL = {"experts_gate", "experts_up"}      # [E, K, N] stacked
_EXPERT_ROW = {"experts_down"}


def _spec_for_quant(qt: QuantTensor, dim_spec: P) -> QuantTensor:
    """Build a QuantTensor whose array leaves are PartitionSpecs."""
    n_spec = dim_spec
    return QuantTensor(
        qweight=n_spec, scales=n_spec, mins=n_spec,
        perm=None if qt.perm is None else P(),
        bits=qt.bits, group_size=qt.group_size, signed=qt.signed,
        in_features=qt.in_features, out_features=qt.out_features, fmt=qt.fmt,
    )


def _leaf_spec(key: str, value: Any):
    if value is None:
        return None
    if isinstance(value, dict):
        # Nested param groups (the "moe" subtree): spec per inner key so
        # expert stacks pick up their ep/tp axes.
        return {k: _leaf_spec(k, v) for k, v in value.items()}
    is_quant = isinstance(value, QuantTensor)
    if key in _COL_KEYS:
        spec = P(None, "tp")
        return _spec_for_quant(value, spec) if is_quant else spec
    if key in _ROW_KEYS:
        spec = P("tp", None)
        return _spec_for_quant(value, spec) if is_quant else spec
    if key in _COL_BIAS:
        return P("tp")
    if key in _VOCAB_KEYS:
        return P("tp", None)
    if key in _EXPERT_COL:
        spec = P("ep", None, "tp")
        return _spec_for_quant(value, spec) if is_quant else spec
    if key in _EXPERT_ROW:
        spec = P("ep", "tp", None)
        return _spec_for_quant(value, spec) if is_quant else spec
    # norms, biases, scalars → replicated
    return jax.tree.map(lambda _: P(), value) if is_quant else P()


def llama_param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching a llama-family param tree."""
    out: dict[str, Any] = {}
    for key, val in params.items():
        if key == "layers":
            out["layers"] = [
                {k: _leaf_spec(k, v) for k, v in layer.items()}
                for layer in val
            ]
        else:
            out[key] = _leaf_spec(key, val)
    return out


def _slice_n(w, a: int, b: int):
    """Slice a weight along out_features (trivial in the K-packed layout:
    N is the lane axis of qweight/scales/mins alike)."""
    import dataclasses

    if isinstance(w, QuantTensor):
        return dataclasses.replace(
            w, qweight=w.qweight[:, a:b], scales=w.scales[:, a:b],
            mins=w.mins[:, a:b], out_features=b - a)
    return w[:, a:b]


def unfuse_projections(params: dict, model_cfg) -> dict:
    """Split fused qkv / gateup projections into per-role weights.

    Fused projections are the right single-chip layout (one wide MXU
    matmul) but shard badly: a plain last-axis split cuts across the
    q/k/v boundaries, so every attention reshape would reshard. Unfused,
    each projection column-shards cleanly on its own head axis — the
    Megatron layout the reference's ColumnParallelLinear uses."""
    att = model_cfg.attention
    if att is None or not params.get("layers"):
        return params
    hd = att.resolved_head_dim(model_cfg.hidden_size)
    q_dim = att.num_heads * hd
    kv_dim = att.kv_heads() * hd
    inter = model_cfg.resolved_intermediate_size()
    out_layers = []
    changed = False
    for layer in params["layers"]:
        layer = dict(layer)
        qkv = layer.pop("qkv", None)
        if qkv is not None:
            layer["q"] = _slice_n(qkv, 0, q_dim)
            layer["k"] = _slice_n(qkv, q_dim, q_dim + kv_dim)
            layer["v"] = _slice_n(qkv, q_dim + kv_dim, q_dim + 2 * kv_dim)
            bias = layer.pop("qkv_bias", None)
            if bias is not None:
                layer["q_bias"] = bias[:q_dim]
                layer["k_bias"] = bias[q_dim : q_dim + kv_dim]
                layer["v_bias"] = bias[q_dim + kv_dim :]
            changed = True
        gu = layer.pop("gateup", None)
        if gu is not None:
            layer["gate"] = _slice_n(gu, 0, inter)
            layer["up"] = _slice_n(gu, inter, 2 * inter)
            changed = True
        out_layers.append(layer)
    if not changed:
        return params
    out = dict(params)
    out["layers"] = out_layers
    return out


def shard_params(params: dict, mesh: Mesh, model_cfg=None) -> dict:
    """Place params on the mesh according to the TP rules."""
    if model_cfg is not None and mesh.shape.get("tp", 1) > 1:
        params = unfuse_projections(params, model_cfg)
        # Post-unfuse pass: per-role q/k/v/gate/up widths (and nested
        # expert stacks) get the clean divisibility error here rather
        # than an obscure GSPMD failure inside device_put.
        validate_quant_tp(params, mesh.shape["tp"])
    specs = llama_param_specs(params)

    def place(p, spec):
        if p is None:
            return None
        return jax.device_put(p, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs,
                        is_leaf=lambda x: x is None)


def _iter_named_quant(params: dict):
    def walk(d):
        for key, val in d.items():
            if isinstance(val, QuantTensor):
                yield key, val
            elif isinstance(val, dict):
                # Nested groups (the "moe" subtree with expert stacks).
                yield from walk(val)

    for layer in params.get("layers", []):
        yield from walk(layer)
    for key in ("lm_head",):
        if isinstance(params.get(key), QuantTensor):
            yield key, params[key]


def validate_quant_tp(params: dict, tp: int) -> None:
    """Quantized-weight divisibility validation before sharding
    (reference tensor_parallel.rs:76-103: the reference refuses TP splits
    that cut through a quantization group; here the same constraints are
    checked against the canonical K-packed layout).

    Column-parallel weights shard out_features: N % tp == 0.
    Row-parallel weights shard in_features in whole groups:
    (K / tp) % group_size == 0 and the packed word rows split evenly.
    """
    if tp <= 1:
        return
    for key, qt in _iter_named_quant(params):
        if key in ("qkv", "gateup"):
            # Fused projections are validated on total width here (a
            # necessary condition); shard_params re-validates per-role
            # widths after unfuse_projections.
            if qt.out_features % tp:
                raise ValueError(
                    f"cannot tensor-parallel fused weight {key!r}: "
                    f"out_features {qt.out_features} not divisible by "
                    f"tp={tp}")
            continue
        if key in _COL_KEYS or key in _EXPERT_COL:
            if qt.out_features % tp:
                raise ValueError(
                    f"cannot tensor-parallel quantized weight {key!r}: "
                    f"out_features {qt.out_features} not divisible by tp={tp}")
        elif key in _ROW_KEYS or key in _EXPERT_ROW:
            k = qt.in_features
            if k % tp or (k // tp) % qt.group_size:
                raise ValueError(
                    f"cannot tensor-parallel quantized weight {key!r}: "
                    f"in_features {k} / tp={tp} must be a multiple of "
                    f"group_size {qt.group_size}")
            # shape[-2] is the packed-K axis for both plain [rows, N] and
            # stacked-expert [E, rows, N] layouts.
            if qt.qweight.shape[-2] % tp:
                raise ValueError(
                    f"cannot tensor-parallel quantized weight {key!r}: "
                    f"{qt.qweight.shape[-2]} packed rows not divisible by "
                    f"tp={tp}")
            if qt.perm is not None:
                # desc-act permutation mixes K rows across shards.
                raise ValueError(
                    f"cannot tensor-parallel {key!r}: GPTQ desc-act "
                    f"activation permutation is incompatible with "
                    f"row-parallel sharding")


def maybe_serving_mesh(inference_cfg, model_cfg, params: dict | None = None):
    """Build the serving mesh from InferenceConfig parallelism knobs, or
    None when everything is 1 (reference scheduler.rs:160-206 wires TP
    into the model lifecycle the same way).

    Validates head/vocab divisibility and — when the params are quantized —
    group-size divisibility, before any sharding happens.
    """
    from .mesh import MeshConfig, make_mesh, validate_tp_size

    tp = inference_cfg.tensor_parallel_size
    ep = inference_cfg.expert_parallel_size
    sp = inference_cfg.sequence_parallel_size
    # data_parallel_size is replica ROUTING (engine/data_parallel.py), the
    # reference's DP scope — not SPMD batch sharding — so it contributes
    # no mesh axis here.
    if tp * ep * sp <= 1:
        return None
    validate_tp_size(model_cfg, tp)
    if params is not None:
        validate_quant_tp(params, tp)
    return make_mesh(MeshConfig(tp=tp, dp=1, ep=ep, sp=sp))


def shard_paged_cache(cache, mesh: Mesh):
    """Shard a PagedKVCache over the kv-head axis of the tp mesh axis
    ([L, NB*BS+1, H_kv, D]; scale planes follow minus the head-dim axis).

    KV heads that don't divide tp (MQA under wide TP) stay replicated —
    the attention QKV heads are still tp-sharded; GSPMD broadcasts the
    shared KV."""
    import dataclasses

    tp = mesh.shape.get("tp", 1)
    head_axis = "tp" if (tp > 1 and cache.kv_heads % tp == 0) else None
    kv = NamedSharding(mesh, P(None, None, head_axis, None))
    out = dataclasses.replace(
        cache,
        k=jax.device_put(cache.k, kv),
        v=jax.device_put(cache.v, kv),
    )
    if cache.k_scale is not None:
        ss = NamedSharding(mesh, P(None, None, head_axis))
        out = dataclasses.replace(
            out,
            k_scale=jax.device_put(cache.k_scale, ss),
            v_scale=jax.device_put(cache.v_scale, ss),
        )
    return out


def kv_cache_spec() -> P:
    """[L, B, S, H_kv, D]: batch over dp, kv heads over tp
    (the 'KV-cache tensor-sharded over the mesh' requirement)."""
    return P(None, "dp", None, "tp", None)


def data_spec() -> P:
    """[B, T] token/position arrays: batch over dp."""
    return P("dp", None)


def shard_cache(cache, mesh: Mesh):
    import dataclasses

    tp = mesh.shape.get("tp", 1)
    # MQA under wide TP: kv heads that don't divide tp stay replicated
    # (validate_tp_size allows tp % kv == 0; GSPMD broadcasts shared KV).
    head_axis = "tp" if (tp > 1 and cache.k.shape[3] % tp == 0) else None
    kv = NamedSharding(mesh, P(None, "dp", None, head_axis, None))
    out = dataclasses.replace(
        cache,
        k=jax.device_put(cache.k, kv),
        v=jax.device_put(cache.v, kv),
        length=jax.device_put(cache.length, NamedSharding(mesh, P("dp"))),
    )
    if getattr(cache, "k_scale", None) is not None:
        # int8 KV: scale planes shard like K/V minus the head-dim axis.
        sspec = NamedSharding(mesh, P(None, "dp", None, head_axis))
        out = dataclasses.replace(
            out,
            k_scale=jax.device_put(cache.k_scale, sspec),
            v_scale=jax.device_put(cache.v_scale, sspec),
        )
    return out
