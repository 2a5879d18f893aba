"""Device mesh construction.

TPU-native replacement for the reference's NCCL/nexar communicator
bootstrap (src/engine/tensor_parallel.rs:125-163): instead of rank
handshakes, a ``jax.sharding.Mesh`` over the device grid with named axes;
XLA inserts the collectives (psum over ICI) that NCCL all-reduce provided.

Axes:
  * ``dp``  — data parallel (request replicas, SURVEY §2.8 DP row)
  * ``tp``  — tensor parallel (Megatron col/row sharding, TP row)
  * ``ep``  — expert parallel (MoE experts, EP row; folded into tp when
    unused)
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    tp: int = 1
    dp: int = 1
    ep: int = 1
    sp: int = 1          # sequence parallel (ring-attention prefill)

    @property
    def total(self) -> int:
        return self.tp * self.dp * self.ep * self.sp


def validate_tp_size(cfg, tp: int) -> None:
    """Divisibility validation (reference tensor_parallel.rs:76-103)."""
    if tp <= 1:
        return
    att = cfg.attention
    if att is not None:
        if att.num_heads % tp != 0:
            raise ValueError(
                f"num_heads {att.num_heads} not divisible by tp={tp}")
        kv = att.kv_heads()
        if kv % tp != 0 and tp % kv != 0:
            raise ValueError(
                f"num_kv_heads {kv} not divisible by (or a divisor of) tp={tp}")
    inter = cfg.resolved_intermediate_size()
    if inter % tp != 0:
        raise ValueError(
            f"intermediate_size {inter} not divisible by tp={tp}")
    if cfg.vocab_size % tp != 0:
        raise ValueError(f"vocab_size {cfg.vocab_size} not divisible by tp={tp}")


def make_mesh(mesh_cfg: Optional[MeshConfig] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (dp, ep, tp) mesh. With no config, all devices go to tp.

    tp is innermost so tensor-parallel collectives ride the
    fastest-varying (ICI-adjacent) axis.
    """
    devices = list(devices if devices is not None else jax.devices())
    if mesh_cfg is None:
        mesh_cfg = MeshConfig(tp=len(devices))
    if mesh_cfg.total > len(devices):
        raise ValueError(
            f"mesh needs {mesh_cfg.total} devices, have {len(devices)}")
    grid = np.array(devices[: mesh_cfg.total]).reshape(
        mesh_cfg.dp, mesh_cfg.ep, mesh_cfg.sp, mesh_cfg.tp
    )
    return Mesh(grid, axis_names=("dp", "ep", "sp", "tp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, PartitionSpec())
