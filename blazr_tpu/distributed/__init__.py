"""Distributed serving (SURVEY §2.8/§2.9/§3.4/§3.5).

Data plane between chips = XLA collectives over ICI (see ``parallel/``);
this package is the cross-HOST layer: TCP control plane (nexar
equivalent), swarm pipeline parallelism, disaggregated prefill/decode.
"""

from .disagg import DecodeWorker, DisaggConfig, DisaggRouter, PrefillWorker
from .kv_serialize import (
    deserialize_arrays,
    deserialize_kv_cache,
    serialize_arrays,
    serialize_kv_cache,
)
from .swarm import SwarmLeader, SwarmWorker
from .topology import (
    LayerAssignment,
    PipelineSchedule,
    SwarmConfig,
    SwarmManager,
    SwarmNode,
    SwarmRole,
)
from .transport import TcpMesh, tags
