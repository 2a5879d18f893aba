"""Swarm pipeline parallelism: layer stages across nodes.

TPU-native port of the reference swarm mode (SURVEY §3.4;
cli/swarm.rs + cli/swarm_forward.rs + boostr SwarmWorker):

  leader: register nodes → compute_layer_assignment → PipelineSchedule →
          send model path → await WORKER_READY acks → drive generation
  worker: connect → receive assignment → load model locally (full
          checkpoint, uses only its layer range) → compute loop
          (recv activation → forward_layers_range → send onward)

Activations hop over the TCP mesh (DCN-equivalent); within a stage the
forward is ordinary jitted XLA. First stage embeds tokens; last stage
runs the LM head and returns logits to the leader
(swarm_forward.rs:77-272 wire behavior, activation format replaced by the
typed array serializer).
"""

from __future__ import annotations

import logging
import struct
from dataclasses import dataclass
from typing import Optional

import numpy as np

from .kv_serialize import deserialize_arrays, serialize_arrays
from .topology import (
    LayerAssignment,
    PipelineSchedule,
    SwarmConfig,
    SwarmManager,
    SwarmNode,
    SwarmRole,
)
from .transport import TcpMesh, tags

logger = logging.getLogger(__name__)


@dataclass
class StageRuntime:
    """One pipeline stage's model slice + cache."""

    model: object
    stage: object                 # PipelineStage
    cache: object
    capacity: int


def _build_stage(model_path: str, stage, capacity: int, dtype: str = "f32"):
    from ..kvcache.contiguous import init_kv_cache
    from ..loader import load_model

    model, _ = load_model(model_path, dtype=dtype)
    n_layers = stage.end_layer - stage.start_layer
    att = model.cfg.attention
    cache = init_kv_cache(n_layers, 1, capacity, att.kv_heads(),
                          att.resolved_head_dim(model.cfg.hidden_size),
                          dtype=model.dtype)
    return StageRuntime(model=model, stage=stage, cache=cache,
                        capacity=capacity)


class SwarmWorker:
    """Compute-loop worker (reference SwarmWorker::run_compute_loop)."""

    def __init__(self, mesh: TcpMesh, capacity: int = 256, dtype: str = "f32"):
        self.mesh = mesh
        self.capacity = capacity
        self.dtype = dtype

    def receive_assignment(self):
        payload = self.mesh.recv(0, tags.ASSIGNMENT)
        start, end, has_emb, has_head = struct.unpack("<IIBB", payload[:10])
        from .topology import PipelineStage

        self.stage = PipelineStage(rank=self.mesh.rank, start_layer=start,
                                   end_layer=end, has_embedding=bool(has_emb),
                                   has_lm_head=bool(has_head))
        return self.stage

    def send_ready(self) -> None:
        self.mesh.send(0, tags.WORKER_READY, b"ok")

    def run_compute_loop(self) -> None:
        """recv → forward layer range → send (reference run_compute_loop)."""
        import jax.numpy as jnp

        from ..models.llama import forward_embed, forward_head, forward_layers_range

        model_path = self.mesh.recv(0, tags.MODEL_PATH).decode()
        rt = _build_stage(model_path, self.stage, self.capacity, self.dtype)
        self.send_ready()
        m = rt.model
        nxt = self.mesh.rank + 1 if not self.stage.has_lm_head else 0

        while True:
            # timeout=None: a worker legitimately idles between requests —
            # the transport's default 60 s recv would kill the pipeline.
            payload = self.mesh.recv(0 if self.stage.has_embedding
                                     else self.mesh.rank - 1, tags.ACTIVATION,
                                     timeout=None)
            if payload == b"__shutdown__":
                if not self.stage.has_lm_head:
                    self.mesh.send(nxt, tags.ACTIVATION, b"__shutdown__")
                return
            if payload == b"__reset__":
                # New request: drop the previous one's KV (its stale
                # entries would otherwise leak into the new attention).
                from ..kvcache.contiguous import init_kv_cache

                att = m.cfg.attention
                n_layers = self.stage.end_layer - self.stage.start_layer
                rt.cache = init_kv_cache(
                    n_layers, 1, self.capacity, att.kv_heads(),
                    att.resolved_head_dim(m.cfg.hidden_size), dtype=m.dtype)
                if not self.stage.has_lm_head:
                    self.mesh.send(nxt, tags.ACTIVATION, b"__reset__")
                continue
            arrays = deserialize_arrays(payload)
            positions = jnp.asarray(arrays[-1])
            if self.stage.has_embedding:
                tokens = jnp.asarray(arrays[0])
                hidden = forward_embed(m.params, m.cfg, tokens)
            else:
                hidden = jnp.asarray(arrays[0])
            hidden, rt.cache = forward_layers_range(
                m.params, m.cfg, hidden, rt.cache, positions,
                self.stage.start_layer, self.stage.end_layer)
            if self.stage.has_lm_head:
                logits = forward_head(m.params, m.cfg, hidden)
                self.mesh.send(0, tags.LOGITS, serialize_arrays(
                    [np.asarray(logits[:, -1, :], dtype=np.float32)]))
            else:
                self.mesh.send(nxt, tags.ACTIVATION, serialize_arrays(
                    [np.asarray(hidden, dtype=np.float32),
                     np.asarray(positions, dtype=np.int32)]))


class SwarmLeader:
    """Leader: topology + assignment broadcast + generation driver."""

    def __init__(self, mesh: TcpMesh, model_path: str,
                 num_layers: int, weights: Optional[list[float]] = None):
        self.mesh = mesh
        self.model_path = model_path
        mgr = SwarmManager(SwarmConfig(world_size=mesh.world_size,
                                       model_path=model_path))
        for r in range(1, mesh.world_size):
            w = weights[r - 1] if weights else 1.0
            mgr.register_node(SwarmNode(rank=r, role=SwarmRole.WORKER, weight=w))
        assignments = mgr.compute_layer_assignment(num_layers)
        self.schedule = PipelineSchedule.from_assignments(assignments)

    def start_workers(self) -> None:
        """Send assignments + model path; await readiness
        (reference swarm.rs:180-216)."""
        for stage in self.schedule.stages:
            self.mesh.send(stage.rank, tags.ASSIGNMENT, struct.pack(
                "<IIBB", stage.start_layer, stage.end_layer,
                int(stage.has_embedding), int(stage.has_lm_head)))
        for stage in self.schedule.stages:
            self.mesh.send(stage.rank, tags.MODEL_PATH,
                           self.model_path.encode())
        for stage in self.schedule.stages:
            ack = self.mesh.recv(stage.rank, tags.WORKER_READY, timeout=300)
            assert ack == b"ok"
        logger.info("swarm ready: %d stages", len(self.schedule.stages))

    def generate_greedy(self, prompt_ids: list[int], max_tokens: int
                        ) -> list[int]:
        """Greedy pipeline generation: prompt prefill then per-token hops."""
        first = self.schedule.stages[0].rank
        last = self.schedule.stages[-1].rank
        # Fresh request: flush every stage's KV from the previous one.
        self.mesh.send(first, tags.ACTIVATION, b"__reset__")
        out: list[int] = []
        tokens = np.asarray([prompt_ids], dtype=np.int32)
        positions = np.asarray([list(range(len(prompt_ids)))], dtype=np.int32)
        for _ in range(max_tokens):
            self.mesh.send(first, tags.ACTIVATION, serialize_arrays(
                [tokens, positions]))
            logits = deserialize_arrays(
                self.mesh.recv(last, tags.LOGITS, timeout=300))[0]
            nxt = int(logits[0].argmax())
            out.append(nxt)
            pos = int(positions[0, -1]) + 1
            tokens = np.asarray([[nxt]], dtype=np.int32)
            positions = np.asarray([[pos]], dtype=np.int32)
        return out

    def shutdown(self) -> None:
        self.mesh.send(self.schedule.stages[0].rank, tags.ACTIVATION,
                       b"__shutdown__")
