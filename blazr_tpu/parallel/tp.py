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


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place params on the mesh according to the TP rules."""
    specs = llama_param_specs(params)

    def place(p, spec):
        if p is None:
            return None
        return jax.device_put(p, NamedSharding(mesh, spec))

    return jax.tree.map(place, params, specs,
                        is_leaf=lambda x: x is None)


def kv_cache_spec() -> P:
    """[L, B, S, H_kv, D]: batch over dp, kv heads over tp
    (the 'KV-cache tensor-sharded over the mesh' requirement)."""
    return P(None, "dp", None, "tp", None)


def data_spec() -> P:
    """[B, T] token/position arrays: batch over dp."""
    return P("dp", None)


def cache_shardings(mesh: Mesh, cache) -> Any:
    """NamedSharding pytree for a KVCache."""
    from ..kvcache.contiguous import KVCache

    return KVCache(
        k=NamedSharding(mesh, kv_cache_spec()),
        v=NamedSharding(mesh, kv_cache_spec()),
        length=NamedSharding(mesh, P("dp")),
    )


def shard_cache(cache, mesh: Mesh):
    import dataclasses

    s = cache_shardings(mesh, cache)
    out = dataclasses.replace(
        cache,
        k=jax.device_put(cache.k, s.k),
        v=jax.device_put(cache.v, s.v),
        length=jax.device_put(cache.length, s.length),
    )
    if getattr(cache, "k_scale", None) is not None:
        # int8 KV: scale planes shard like K/V minus the head-dim axis.
        sspec = NamedSharding(mesh, P(None, "dp", None, "tp"))
        out = dataclasses.replace(
            out,
            k_scale=jax.device_put(cache.k_scale, sspec),
            v_scale=jax.device_put(cache.v_scale, sspec),
        )
    return out
