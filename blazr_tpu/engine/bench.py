"""Benchmark harness.

TPU-native port of the reference bench machinery (src/cli/bench.rs:24-34 +
src/engine/bench_config.rs): prompt-length sweep with 1 warmup + N runs
measuring prefill/decode throughput, TTFT and ITL; the standard workload
profiles and concurrency sweep from bench_config.rs:133-202.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Optional

import numpy as np


# Standard workload profiles (reference bench_config.rs:133-196).
WORKLOAD_PROFILES = {
    "short": (32, 64),
    "medium": (128, 256),
    "long": (512, 256),
    "long_context": (2048, 128),
    "code_gen": (256, 512),
}

# Concurrency sweep (reference bench_config.rs:200-203).
CONCURRENCY_SWEEP = [1, 2, 4, 8, 16, 32]


@dataclass
class BenchMetrics:
    """Serializable results (reference bench_config.rs:108-130)."""

    prompt_tokens: int
    decode_tokens: int
    prefill_tok_s: float
    decode_tok_s: float
    ttft_ms: float
    itl_p50_ms: float
    itl_p95_ms: float
    itl_p99_ms: float
    e2e_ms: float
    runs: int

    def to_dict(self) -> dict:
        return self.__dict__


def _percentiles(vals: list[float]) -> tuple[float, float, float]:
    if not vals:
        return 0.0, 0.0, 0.0
    a = np.asarray(vals)
    return (float(np.percentile(a, 50)), float(np.percentile(a, 95)),
            float(np.percentile(a, 99)))


def bench_executor(executor, prompt_len: int, decode_tokens: int,
                   runs: int = 3, warmup: int = 1) -> BenchMetrics:
    from ..config.generation import GenerationConfig

    rng = np.random.default_rng(0)
    vocab = executor.model.vocab_size
    cfg = GenerationConfig(max_tokens=decode_tokens, temperature=0.0)

    def once() -> tuple[float, float, list[float], int]:
        prompt = rng.integers(1, vocab, prompt_len).tolist()
        t0 = time.time()
        first = None
        last = None
        itls = []
        n = 0
        for gt in executor.generate(prompt, cfg):
            now = time.time()
            if first is None:
                first = now
            elif last is not None:
                itls.append((now - last) * 1e3)
            last = now
            n += 1
        return t0, first or t0, itls, n

    for _ in range(warmup):
        once()

    ttfts, itls_all, decode_rates, prefill_rates, e2es = [], [], [], [], []
    for _ in range(runs):
        t0, first, itls, n = once()
        end = time.time()
        ttfts.append((first - t0) * 1e3)
        itls_all.extend(itls)
        if itls:
            decode_rates.append(1e3 / (sum(itls) / len(itls)))
        prefill_rates.append(prompt_len / max(first - t0, 1e-9))
        e2es.append((end - t0) * 1e3)

    p50, p95, p99 = _percentiles(itls_all)
    return BenchMetrics(
        prompt_tokens=prompt_len,
        decode_tokens=decode_tokens,
        prefill_tok_s=float(np.mean(prefill_rates)),
        decode_tok_s=float(np.mean(decode_rates)) if decode_rates else 0.0,
        ttft_ms=float(np.mean(ttfts)),
        itl_p50_ms=p50, itl_p95_ms=p95, itl_p99_ms=p99,
        e2e_ms=float(np.mean(e2es)),
        runs=runs,
    )


def run_benchmark(model_path: Optional[str] = None,
                  prompt_lens: list[int] = (32, 128, 512),
                  decode_tokens: int = 128, runs: int = 3,
                  dtype: Optional[str] = None) -> dict:
    """CLI bench entry (reference cli/bench.rs): loads the model (or a
    synthetic one) and sweeps prompt lengths."""
    import jax

    if model_path:
        from ..engine.executor import Executor
        from ..loader import load_model
        from ..tokenizer import load_tokenizer
        from pathlib import Path

        model, app_cfg = load_model(model_path, dtype=dtype)
        p = Path(model_path)
        tok = load_tokenizer(p.parent if p.is_file() else p,
                             gguf_path=p if p.suffix == ".gguf" else None)
        executor = Executor(model, tok, app_cfg)
        name = str(model_path)
    else:
        from ..engine.executor import Executor
        from ..utils.synthetic import synth_model, tiny_llama_config
        import jax.numpy as jnp

        model = synth_model(tiny_llama_config(), quant="dense",
                            dtype=jnp.float32)
        from ..tokenizer.byte_tok import ByteTokenizer

        executor = Executor(model, ByteTokenizer())
        name = "synthetic-tiny"

    results = {
        "model": name,
        "platform": jax.default_backend(),
        "decode_tokens": decode_tokens,
        "profiles": {},
    }
    for plen in prompt_lens:
        m = bench_executor(executor, plen, decode_tokens, runs=runs)
        results["profiles"][str(plen)] = m.to_dict()
    return results
