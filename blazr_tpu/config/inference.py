"""Inference engine feature flags.

TPU-native equivalent of the reference's InferenceConfig
(src/config/inference.rs:63-175): device/dtype selection, paged attention
sizing, prefix caches, chunked prefill, speculative decoding, tensor
parallelism, MoE offload and decode-graph flags — translated to their XLA
analogues (decode "graphs" are simply jitted fixed-shape steps on TPU).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional


@dataclass
class SpeculativeDecodingConfig:
    """Speculative decoding knobs (reference src/config/inference.rs:199-208)."""

    draft_model: Optional[str] = None
    num_speculative_tokens: int = 5
    adaptive_depth: bool = True


@dataclass
class InferenceConfig:
    # Device / precision
    device: str = "auto"             # auto | tpu | cpu
    dtype: str = "bf16"              # f32 | f16 | bf16 (TPU prefers bf16)
    flash_attention: bool = True

    # KV cache
    kv_cache: bool = True
    # auto (model dtype) | int8 (per-token-per-head absmax, halves KV HBM
    # traffic; contiguous cache only)
    kv_cache_dtype: str = "auto"
    max_batch_size: int = 8
    max_seq_len: Optional[int] = None

    # Quantized-matmul compute mode for signed 4/8-bit weights:
    #   auto  — platform default: w4a8-prefill on TPU, w4a16 elsewhere
    #   w4a16 — int4 HBM stream, bf16 MXU (bit-exact dequant)
    #   w4a8-prefill — prefill-shaped matmuls (≥256 rows) ride the int8
    #           MXU (r4 race: 94 vs 77 TF/s at m=1024, 145 vs 107 at
    #           m=4096); decode stays bit-exact w4a16. The TPU analogue
    #           of the reference preferring dp4a int8 CUDA kernels
    #           (README "Model Formats") — dp4a is int8 compute too.
    #   w4a8  — int4 HBM stream, dynamic int8 activation quant, int8 MXU
    #   w8a8  — int8-widened HBM stream (2× bytes, zero-op weight feed),
    #           dynamic int8 activation quant, int8 MXU
    quant_compute: str = "auto"

    # Paged attention. The reference defaults block_size to 16 (CUDA);
    # on TPU 64 measured 1.7x the decode throughput at B=32 — bigger KV
    # blocks amortize the PA kernel's per-program dispatch + MXU
    # weight-load overhead (tools/bench_paged_batch.py sweep).
    paged_attention: bool = True
    block_size: int = 64
    num_blocks: Optional[int] = None
    kv_pool_blocks: Optional[int] = None

    # Prefix caching
    prefix_cache: bool = False
    max_cached_blocks: int = 10000
    gpu_prefix_cache: bool = False           # device-resident radix cache
    prefix_cache_ram_tier: int = 5000

    # Chunked prefill (interleaves decode between chunks to protect ITL)
    prefill_chunk_size: Optional[int] = None

    # Prefill-priority pacing: a same-round burst of FINISHING prefill
    # rows dispatches in ramped groups [g, g, 2g, …] instead of one full
    # slab, so early requests' first tokens land when their small group
    # completes (TTFT p50 ~halves on a 1-shot burst for ~5% extra prefill
    # wall). 0 disables the ramp (always full-width groups).
    prefill_first_group: int = 8

    # Mixed-phase prefill interleave (reference chunked-prefill pattern,
    # batch_engine.rs:171-319): when a burst arrives WHILE decode rows are
    # active, at most this many finishing prefill rows are dispatched per
    # engine step — the rest stay needs_prefill and re-schedule next step,
    # so a decode round runs between every prefill group and the running
    # sequences' ITL is bounded by ONE group's wall instead of the whole
    # burst slab. Cold bursts (no active decodes) are unaffected and keep
    # median-first pacing. None = prefill_first_group; 0 disables the cap.
    mixed_prefill_rows: Optional[int] = None

    # Prompt tokens the scheduler may ADMIT per scheduling round (reference
    # max_batch_tokens, src/config/inference.rs). Distinct from
    # prefill_chunk_size (the per-sequence chunk): grouped prefill runs
    # whole [8, chunk] batches per dispatch, so a budget of one chunk
    # starves admission to chunk/prompt_len sequences per round and
    # serializes TTFT. None = prefill_chunk_size x 8 (one full group).
    max_batch_tokens: Optional[int] = None

    # Continuous-batching decode horizon: the batch engine runs up to this
    # many decode steps in ONE device program (token feedback stays on
    # device; one host fetch per horizon). Amortizes dispatch + fetch
    # latency — on remote-attached TPUs the per-step host round-trip
    # otherwise dominates (measured 31 tok/s vs 1974 tok/s model-level at
    # B=32). 1 disables. Grammar- and host-sampler rows fall back to
    # single-step rounds automatically.
    decode_horizon: int = 8
    # Decode pipeline depth: number of dispatched-but-unfetched horizon
    # rounds kept in flight. Depth D hides (D-1) fetch round-trips behind
    # later dispatches — the dominant per-round cost on remote-attached
    # chips. Token delivery lags by (depth-1) rounds; 1 restores
    # fetch-every-round.
    decode_pipe_depth: int = 2

    # Speculative decoding
    speculative: Optional[SpeculativeDecodingConfig] = None

    # Parallelism
    tensor_parallel_size: int = 1
    data_parallel_size: int = 1
    expert_parallel_size: int = 1
    sequence_parallel_size: int = 1
    # Prompts at least this long take the ring-attention (sequence-
    # parallel) prefill when the mesh has an ``sp`` axis; shorter prompts
    # use the ordinary bucketed prefill (ring pays p ppermute hops).
    sp_prefill_threshold: int = 256

    # MoE expert offload: auto | gpu | cpu | hybrid (reference: hbm vs host)
    moe_offload: Optional[str] = None
    moe_gpu_experts: Optional[int] = None
    # Device-resident experts per layer under offload (None = strategy
    # default: half for hybrid, one for cpu) and how many forward passes
    # between hot-set rebalances (reference rebalance_interval).
    moe_device_experts: Optional[int] = None
    moe_rebalance_interval: int = 64

    # Layer offload (reference n-gpu-layers): layers resident on device;
    # the rest live in host RAM and stream per step (engine/offload_stream).
    num_device_layers: Optional[int] = None

    # Decode graphs: on TPU this toggles the AOT-compiled fixed-shape decode
    # step (the XLA analogue of CUDA graph capture — SURVEY §3.3).
    graphs: bool = True

    def to_dict(self) -> dict[str, Any]:
        d = dataclasses.asdict(self)
        return d

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "InferenceConfig":
        d = dict(d)
        if isinstance(d.get("speculative"), dict):
            known = {f.name for f in dataclasses.fields(SpeculativeDecodingConfig)}
            d["speculative"] = SpeculativeDecodingConfig(
                **{k: v for k, v in d["speculative"].items() if k in known}
            )
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in known})
