"""Command-line interface.

TPU-native port of the reference CLI tree (src/cli/commands.rs:87-354,
dispatched from src/main.rs:20-188): run/generate, chat, serve, bench,
info, list, ps, tokenize, convert.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time
from pathlib import Path


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="blazr-tpu",
        description="TPU-native quantized LLM inference engine",
    )
    p.add_argument("-v", "--verbose", action="store_true")
    p.add_argument("--coordinator", default=None,
                   help="multi-host coordinator address host:port")
    p.add_argument("--num-processes", type=int, default=None,
                   help="multi-host world size")
    p.add_argument("--process-id", type=int, default=None,
                   help="this process's rank in the multi-host world")
    p.add_argument("--device", choices=["auto", "tpu", "cpu"],
                   default=os.environ.get("BLAZR_TPU_DEVICE", "auto"),
                   help="compute backend (auto = TPU if healthy, else CPU)")
    sub = p.add_subparsers(dest="command", required=True)

    # Flags shared by every model-loading generation command — a parent
    # parser so run/generate can never drift apart again.
    loadopts = argparse.ArgumentParser(add_help=False)
    loadopts.add_argument("--dtype", choices=["f32", "f16", "bf16"])
    loadopts.add_argument("--device-layers", type=int, default=None,
                          help="decoder layers kept on device; the rest "
                               "stream from host RAM (reference "
                               "n-gpu-layers)")
    loadopts.add_argument("--kv-cache-dtype", choices=["auto", "int8", "int4"],
                          default="auto", help="int8 halves KV-cache HBM "
                          "traffic")
    loadopts.add_argument("--prefix-cache", action="store_true",
                          help="reuse the previous request's KV when the "
                               "new prompt extends it (suffix-only prefill)")
    loadopts.add_argument("--tp", default=None, metavar="N",
                          help="tensor-parallel degree over the device "
                               "mesh ('auto' = all local devices)")
    loadopts.add_argument("--sp", default=None, metavar="N",
                          help="sequence-parallel degree: long prompts "
                               "prefill with ring attention over an 'sp' "
                               "mesh axis")
    loadopts.add_argument("--ep", default=None, metavar="N",
                          help="expert-parallel degree: MoE expert stacks "
                               "shard over an 'ep' mesh axis with "
                               "all-to-all dispatch")
    loadopts.add_argument("--moe-offload",
                          choices=["auto", "gpu", "cpu", "hybrid"],
                          default=None,
                          help="MoE expert offload: keep only the hot "
                               "expert set in HBM, cold experts in host "
                               "RAM (reference --moe-offload)")
    loadopts.add_argument("--moe-device-experts", type=int, default=None,
                          metavar="K",
                          help="device-resident experts per layer under "
                               "--moe-offload (default: half for hybrid, "
                               "one for cpu)")
    loadopts.add_argument("--mmproj", default=None, metavar="PATH",
                          help="GGUF vision projector (mmproj) sidecar for "
                               "multimodal models (auto-detected when "
                               "colocated with the model)")
    loadopts.add_argument("--quant-compute",
                          choices=["auto", "w4a16", "w4a8", "w8a8"],
                          default=None,
                          help="matmul compute for int-quantized weights: "
                               "w4a16 bit-exact bf16 MXU; w4a8/w8a8 dynamic "
                               "int8 activation quant on the int8 MXU")

    run = sub.add_parser("run", help="run a model (one-shot or REPL)",
                         parents=[loadopts])
    run.add_argument("model", help="model dir / file")
    run.add_argument("--prompt", "-p", help="prompt (omits REPL)")
    run.add_argument("--max-tokens", "-n", type=int, default=256)
    run.add_argument("--temperature", "-t", type=float, default=0.7)
    run.add_argument("--top-p", type=float, default=0.9)
    run.add_argument("--top-k", type=int, default=40)
    run.add_argument("--seed", type=int)
    run.add_argument("--grammar", help="GBNF grammar file or inline")
    run.add_argument("--json", action="store_true", dest="json_mode")
    run.add_argument("--no-warmup", action="store_true")
    run.add_argument("--draft-model", help="enable speculative decoding "
                     "with this draft model")
    run.add_argument("--num-speculative-tokens", type=int, default=5)
    run.add_argument("--prompt-lookup", action="store_true",
                     help="draft-model-free speculation: draft from n-gram "
                          "matches in the sequence's own history")

    gen = sub.add_parser("generate", help="alias of run --prompt",
                         parents=[loadopts])
    gen.add_argument("model")
    gen.add_argument("prompt")
    gen.add_argument("--max-tokens", "-n", type=int, default=256)
    gen.add_argument("--temperature", "-t", type=float, default=0.7)

    chat = sub.add_parser("chat", help="multi-turn chat REPL")
    chat.add_argument("model")
    chat.add_argument("--system", help="system prompt")
    chat.add_argument("--template", help="chat template override")
    chat.add_argument("--max-tokens", "-n", type=int, default=512)
    chat.add_argument("--temperature", "-t", type=float, default=0.7)
    chat.add_argument("--dtype", choices=["f32", "f16", "bf16"])

    serve = sub.add_parser("serve", help="start the OpenAI-compatible server")
    serve.add_argument("--model", default=os.environ.get("BLAZR_TPU_MODEL_DIR", "."))
    serve.add_argument("--host", default="0.0.0.0")
    serve.add_argument("--port", type=int, default=8080)
    serve.add_argument("--api-key", action="append", default=None,
                       help="require bearer token(s); env BLAZR_TPU_API_KEY")
    serve.add_argument("--max-inflight-tokens", type=int)
    serve.add_argument("--dtype", choices=["f32", "f16", "bf16"])
    serve.add_argument("--max-loaded", type=int, default=1)
    serve.add_argument("--no-warmup", action="store_true")
    serve.add_argument("--continuous-batching", action="store_true",
                       help="serve through the paged-KV batch engine "
                            "(reference serve.rs:156-222 wiring)")
    serve.add_argument("--max-batch-size", type=int, default=8)
    serve.add_argument("--decode-horizon", type=int, default=8,
                       help="decode steps per device program (token "
                            "feedback on device, one fetch per horizon); "
                            "1 disables")
    serve.add_argument("--prompt-lookup", action="store_true",
                       help="batched speculative decoding: greedy rows "
                            "verify n-gram drafts in one fused step")
    serve.add_argument("--draft-model", default=None, metavar="PATH",
                       help="batched draft-model speculation: an on-device "
                            "greedy chain on this (smaller) model proposes "
                            "tokens; the target verifies in one fused step")
    serve.add_argument("--num-speculative-tokens", type=int, default=5)
    serve.add_argument("--kv-cache-dtype", choices=["auto", "int8", "int4"],
                       default="auto")
    serve.add_argument("--tp", default=None, metavar="N",
                       help="tensor-parallel degree over the device mesh "
                            "('auto' = all local devices)")
    serve.add_argument("--quant-compute",
                       choices=["auto", "w4a16", "w4a8", "w8a8"], default=None)

    bench = sub.add_parser("bench", help="benchmark a model")
    bench.add_argument("model", nargs="?", help="model dir (synthetic if omitted)")
    bench.add_argument("--prompt-lens", default="32,128,512")
    bench.add_argument("--decode-tokens", type=int, default=128)
    bench.add_argument("--runs", type=int, default=3)
    bench.add_argument("--json", dest="json_out", help="write JSON results to file")
    bench.add_argument("--dtype", choices=["f32", "f16", "bf16"])
    bench.add_argument("--profile", metavar="DIR",
                       help="capture a jax.profiler trace (view with "
                            "TensorBoard / xprof)")

    info = sub.add_parser("info", help="show checkpoint metadata")
    info.add_argument("model")

    lst = sub.add_parser("list", help="list local models")
    lst.add_argument("--dir", default=os.environ.get("BLAZR_TPU_MODEL_DIR", "."))

    ps = sub.add_parser("ps", help="query a running server for loaded models")
    ps.add_argument("--host", default="localhost")
    ps.add_argument("--port", type=int, default=8080)

    tok = sub.add_parser("tokenize", help="tokenize text with a model's tokenizer")
    tok.add_argument("model")
    tok.add_argument("text")

    swarm = sub.add_parser("swarm", help="pipeline-parallel swarm node")
    swarm.add_argument("role", choices=["leader", "worker"])
    swarm.add_argument("--model", help="model dir (leader)")
    swarm.add_argument("--seed", default="127.0.0.1:29500",
                       help="seed address host:port")
    swarm.add_argument("--world-size", type=int, default=2)
    swarm.add_argument("--capacity", type=int, default=2048)
    swarm.add_argument("--dtype", choices=["f32", "f16", "bf16"])
    swarm.add_argument("--mdns", action="store_true",
                       help="LAN auto-discovery (reference --mdns, "
                            "cli/commands.rs:300-302): the leader beacons "
                            "its seed address; workers join without --seed")

    disagg = sub.add_parser("disagg",
                            help="disaggregated prefill/decode node")
    disagg.add_argument("role", choices=["router", "prefill", "decode"])
    disagg.add_argument("--model", help="model dir (workers)")
    disagg.add_argument("--seed", default="127.0.0.1:29501")
    disagg.add_argument("--world-size", type=int, default=3)
    disagg.add_argument("--prefill-ranks", default="1")
    disagg.add_argument("--decode-ranks", default="2")
    disagg.add_argument("--capacity", type=int, default=2048)
    disagg.add_argument("--dtype", choices=["f32", "f16", "bf16"])
    disagg.add_argument("--port", type=int,
                        help="router: serve HTTP /v1/completions on this "
                             "port instead of the stdin JSON REPL")

    comp = sub.add_parser("completions", help="emit a shell completion script")
    comp.add_argument("shell", choices=["bash", "zsh"], nargs="?", default="bash")

    pull = sub.add_parser("pull", help="download a model from HF Hub")
    pull.add_argument("repo_id")
    pull.add_argument("--dest", default=None)
    pull.add_argument("--revision", default="main")

    conv = sub.add_parser("convert", help="convert checkpoint formats")
    conv.add_argument("src")
    conv.add_argument("dst")
    conv.add_argument("--quant", default=None,
                      help="ggml quant type for GGUF output (Q8_0, Q4_K, ...)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="%(asctime)s %(levelname).1s %(name)s: %(message)s",
    )
    if args.coordinator or args.num_processes:
        # jax.distributed.initialize() must run BEFORE any backend is
        # initialized — _pin_backend's jax.devices() probe would make
        # every multi-host run with a healthy accelerator crash with
        # "initialize() must be called before ...". Pin config flags
        # (they don't touch backends) after rendezvous.
        from ..parallel.multihost import init_distributed, is_primary

        if args.device == "cpu":
            import jax

            jax.config.update("jax_platforms", "cpu")
        multi = init_distributed(args.coordinator, args.num_processes,
                                 args.process_id)
        _pin_backend(args.device)
        if multi and args.command == "serve":
            # Multi-NODE SPMD serving: HTTP binds on process 0 only; every
            # process (0 included) drives the engine through the lockstep
            # request broadcast so the SPMD steps stay world-synchronous.
            if not args.continuous_batching:
                print("serve: multi-host world — forcing continuous "
                      "batching (lockstep SPMD serving requires it)",
                      file=sys.stderr)
                args.continuous_batching = True
            if not is_primary():
                print("serve: lockstep follower (HTTP on process 0 only)",
                      file=sys.stderr)
    else:
        _pin_backend(args.device)
    return {
        "run": cmd_run, "generate": cmd_generate, "chat": cmd_chat,
        "serve": cmd_serve, "bench": cmd_bench, "info": cmd_info,
        "list": cmd_list, "ps": cmd_ps, "tokenize": cmd_tokenize,
        "convert": cmd_convert, "swarm": cmd_swarm, "disagg": cmd_disagg,
        "pull": cmd_pull, "completions": cmd_completions,
    }[args.command](args)


# ---------------------------------------------------------------------------

def _pin_backend(device: str) -> None:
    """Pin the JAX backend, falling back to CPU when the TPU plugin is
    unhealthy (the axon tunnel in this environment can drop)."""
    import jax

    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    if device == "cpu":
        jax.config.update("jax_platforms", "cpu")
        return
    try:
        jax.devices()
    except RuntimeError as e:
        if device == "tpu":
            raise
        logging.getLogger(__name__).warning(
            "accelerator backend unavailable (%s); falling back to CPU",
            str(e).splitlines()[0][:120])
        jax.config.update("jax_platforms", "cpu")


def _resolve_tp(tp) -> int:
    """'auto' → every local device; None/'' → 1."""
    if tp in (None, "", "1"):
        return 1
    if tp == "auto":
        import jax

        return len(jax.devices())
    return int(tp)


def _load_executor(model_path: str, dtype, device_layers=None,
                   kv_cache_dtype=None, prefix_cache=False, tp=None,
                   quant_compute=None, mmproj=None, ep=None, sp=None,
                   moe_offload=None, moe_device_experts=None):
    from ..engine.executor import Executor
    from ..loader import load_model
    from ..tokenizer import load_tokenizer

    t0 = time.time()
    model, app_cfg = load_model(model_path, dtype=dtype,
                                device_layers=device_layers, mmproj=mmproj)
    if kv_cache_dtype:
        app_cfg.inference.kv_cache_dtype = kv_cache_dtype
    if prefix_cache:
        app_cfg.inference.prefix_cache = True
    app_cfg.inference.tensor_parallel_size = _resolve_tp(tp)
    if ep:
        app_cfg.inference.expert_parallel_size = int(ep)
    if sp:
        app_cfg.inference.sequence_parallel_size = int(sp)
    if moe_offload:
        app_cfg.inference.moe_offload = moe_offload
    if moe_device_experts is not None:
        app_cfg.inference.moe_device_experts = moe_device_experts
    if quant_compute:
        app_cfg.inference.quant_compute = quant_compute
    p = Path(model_path)
    gguf = p if p.suffix == ".gguf" else None
    tok = load_tokenizer(p.parent if p.is_file() else p, gguf_path=gguf)
    ex = Executor(model, tok, app_cfg)
    print(f"loaded {model.cfg.model_type} "
          f"({model.hidden_size}d x{model.num_layers}L, "
          f"vocab {model.vocab_size}) in {time.time()-t0:.1f}s",
          file=sys.stderr)
    return ex


def _print_stream(executor, prompt_ids, cfg) -> None:
    from ..engine.generate_text import stream_generation

    t0 = time.time()
    first = None
    count = 0
    for delta, fin in stream_generation(executor, prompt_ids, cfg):
        if delta:
            if first is None:
                first = time.time()
            count += 1
            print(delta, end="", flush=True)
    dt = time.time() - (first or t0)
    print()
    if count > 1 and dt > 0:
        print(f"[{count} tokens, {count/dt:.1f} tok/s, "
              f"ttft {((first or t0)-t0)*1e3:.0f} ms]", file=sys.stderr)


def cmd_run(args) -> int:
    from ..config.generation import GenerationConfig

    ex = _load_executor(args.model, args.dtype,
                        device_layers=getattr(args, "device_layers", None),
                        kv_cache_dtype=getattr(args, "kv_cache_dtype", None),
                        prefix_cache=getattr(args, "prefix_cache", False),
                        tp=getattr(args, "tp", None),
                        mmproj=getattr(args, "mmproj", None),
                        quant_compute=getattr(args, "quant_compute", None),
                        ep=getattr(args, "ep", None),
                        sp=getattr(args, "sp", None),
                        moe_offload=getattr(args, "moe_offload", None),
                        moe_device_experts=getattr(args, "moe_device_experts",
                                                   None))
    if not args.no_warmup:
        ex.warmup()
    cfg = GenerationConfig(
        max_tokens=args.max_tokens, temperature=args.temperature,
        top_p=args.top_p, top_k=args.top_k, seed=args.seed,
        json_mode=getattr(args, "json_mode", False),
    )
    if args.grammar:
        g = Path(args.grammar)
        cfg.grammar = g.read_text() if g.exists() else args.grammar
    if args.prompt:
        spec = None
        if getattr(args, "prompt_lookup", False):
            from ..engine.speculative import PromptLookupExecutor

            spec = PromptLookupExecutor(
                ex, num_speculative_tokens=args.num_speculative_tokens)
        elif getattr(args, "draft_model", None):
            from ..config.inference import SpeculativeDecodingConfig
            from ..engine.speculative import SpeculativeExecutor

            draft = _load_executor(args.draft_model, args.dtype)
            spec = SpeculativeExecutor(
                draft, ex, SpeculativeDecodingConfig(
                    num_speculative_tokens=args.num_speculative_tokens))
        if spec is not None:
            t0 = time.time()
            n = 0
            for gt in spec.generate(ex.tokenizer.encode(args.prompt), cfg):
                print(gt.text, end="", flush=True)
                n += 1
            dt = time.time() - t0
            print(f"\n[{n} tokens, {n/max(dt,1e-9):.1f} tok/s, "
                  f"acceptance {spec.stats.acceptance_rate:.0%}]",
                  file=sys.stderr)
            return 0
        _print_stream(ex, ex.tokenizer.encode(args.prompt), cfg)
        return 0
    # REPL (reference run.rs:215-307)
    history: list[str] = []
    print("interactive mode — /exit to quit, /clear to reset", file=sys.stderr)
    while True:
        try:
            line = input(">>> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if line in ("/exit", "/quit"):
            break
        if line == "/clear":
            history.clear()
            continue
        if line == "/history":
            print("\n".join(history))
            continue
        if not line:
            continue
        history.append(line)
        _print_stream(ex, ex.tokenizer.encode(line), cfg)
    return 0


def cmd_generate(args) -> int:
    from ..config.generation import GenerationConfig

    ex = _load_executor(args.model, args.dtype,
                        device_layers=getattr(args, "device_layers", None),
                        kv_cache_dtype=getattr(args, "kv_cache_dtype", None),
                        prefix_cache=getattr(args, "prefix_cache", False),
                        tp=getattr(args, "tp", None),
                        mmproj=getattr(args, "mmproj", None),
                        quant_compute=getattr(args, "quant_compute", None),
                        ep=getattr(args, "ep", None),
                        sp=getattr(args, "sp", None),
                        moe_offload=getattr(args, "moe_offload", None),
                        moe_device_experts=getattr(args, "moe_device_experts",
                                                   None))
    cfg = GenerationConfig(max_tokens=args.max_tokens,
                           temperature=args.temperature)
    _print_stream(ex, ex.tokenizer.encode(args.prompt), cfg)
    return 0


def cmd_chat(args) -> int:
    from ..config.generation import GenerationConfig
    from ..model_meta.chat_template import ChatMessage, ChatTemplate, TemplateFormat

    # Chat turns extend the same history — session KV reuse means each
    # turn prefills only the new tokens.
    ex = _load_executor(args.model, args.dtype, prefix_cache=True)
    template = (ChatTemplate(TemplateFormat.from_name(args.template))
                if args.template
                else ChatTemplate.detect(model_type=ex.model.cfg.model_type))
    msgs: list[ChatMessage] = []
    if args.system:
        msgs.append(ChatMessage("system", args.system))
    cfg = GenerationConfig(max_tokens=args.max_tokens,
                           temperature=args.temperature)
    print("chat mode — /exit to quit", file=sys.stderr)
    while True:
        try:
            line = input("user> ").strip()
        except (EOFError, KeyboardInterrupt):
            break
        if line in ("/exit", "/quit"):
            break
        if not line:
            continue
        msgs.append(ChatMessage("user", line))
        prompt = template.apply(msgs)
        from ..engine.generate_text import collect_generation

        res = collect_generation(ex, ex.tokenizer.encode(prompt), cfg)
        print(f"assistant> {res.text}")
        msgs.append(ChatMessage("assistant", res.text))
    return 0


def cmd_serve(args) -> int:
    from ..config.server import ServerConfig
    from ..engine.model_scheduler import ModelScheduler
    from ..server import run_server

    api_keys = args.api_key or []
    env_key = os.environ.get("BLAZR_TPU_API_KEY")
    if env_key:
        api_keys.append(env_key)
    scheduler = ModelScheduler(args.model, max_loaded=args.max_loaded,
                               dtype=args.dtype,
                               tp=_resolve_tp(getattr(args, "tp", None)),
                               quant_compute=getattr(args, "quant_compute",
                                                     None))
    if not args.no_warmup and not args.continuous_batching:
        # Under continuous batching the serving path is the batch engine
        # (warmed below, after its config overrides are applied); the
        # executor only backs force_direct/multimodal requests, which can
        # compile lazily. Warming both would double the cold-compile bill.
        try:
            ex = scheduler.get_executor("default")
            ex.warmup()
        except FileNotFoundError:
            print("no default model found; loading on demand", file=sys.stderr)
    cfg = ServerConfig(host=args.host, port=args.port, api_keys=api_keys,
                       max_inflight_tokens=args.max_inflight_tokens)
    batch_engine = None
    if args.continuous_batching:
        from ..engine.batch_engine import BatchEngine

        try:
            ex = scheduler.get_executor("default")
        except FileNotFoundError as e:
            # Distinguish "no model dir" from a model dir whose load
            # failed on a missing artifact (e.g. no tokenizer files —
            # the error already names the expected ones).
            print("error: --continuous-batching requires a loadable "
                  f"default model: {e}", file=sys.stderr)
            return 2
        ex.app_cfg.inference.max_batch_size = args.max_batch_size
        ex.app_cfg.inference.prefix_cache = True
        ex.app_cfg.inference.kv_cache_dtype = args.kv_cache_dtype
        ex.app_cfg.inference.decode_horizon = args.decode_horizon
        draft = None
        if getattr(args, "draft_model", None):
            from ..config.inference import SpeculativeDecodingConfig
            from ..loader import load_model

            draft, _ = load_model(args.draft_model, dtype=args.dtype)
            ex.app_cfg.inference.speculative = SpeculativeDecodingConfig(
                draft_model=args.draft_model,
                num_speculative_tokens=args.num_speculative_tokens)
        elif getattr(args, "prompt_lookup", False):
            from ..config.inference import SpeculativeDecodingConfig

            ex.app_cfg.inference.speculative = SpeculativeDecodingConfig(
                num_speculative_tokens=args.num_speculative_tokens)
        batch_engine = BatchEngine(ex.model, ex.tokenizer, ex.app_cfg,
                                   draft_model=draft)
        if not args.no_warmup:
            dt = batch_engine.warmup()
            print(f"batch engine warmed in {dt:.1f}s", file=sys.stderr)
        print(f"continuous batching enabled (max_batch={args.max_batch_size})",
              file=sys.stderr)

    import jax

    if jax.process_count() > 1:
        from ..distributed.lockstep import LockstepEngine
        from ..parallel.multihost import is_primary

        if batch_engine is None:
            # Lockstep replays BatchEngine steps on every process; without
            # one it would crash with an obscure AttributeError at runtime.
            print("error: multi-process serving requires --continuous-batching",
                  file=sys.stderr)
            return 2
        lockstep = LockstepEngine(batch_engine)
        if not is_primary():
            # Follower: no HTTP; mirror the primary's op stream forever.
            import asyncio

            asyncio.run(lockstep.run())
            return 0
        batch_engine = lockstep
    run_server(scheduler, cfg, batch_engine=batch_engine)
    return 0


def cmd_bench(args) -> int:
    from ..config.generation import GenerationConfig
    from ..engine.bench import run_benchmark

    import contextlib

    prof: contextlib.AbstractContextManager = contextlib.nullcontext()
    if args.profile:
        import jax

        prof = jax.profiler.trace(args.profile)
    with prof:
        results = run_benchmark(
            model_path=args.model,
            prompt_lens=[int(x) for x in args.prompt_lens.split(",")],
            decode_tokens=args.decode_tokens,
            runs=args.runs,
            dtype=args.dtype,
        )
    if args.profile:
        print(f"profiler trace written to {args.profile}", file=sys.stderr)
    print(json.dumps(results, indent=2))
    if args.json_out:
        Path(args.json_out).write_text(json.dumps(results, indent=2))
    return 0


def cmd_info(args) -> int:
    from ..formats import Gguf, ModelFormat, detect_model_source
    from ..loader import resolve_config

    src = detect_model_source(args.model)
    out = {
        "format": src.format.value,
        "quant": src.quant.value,
        "path": str(src.path),
    }
    if src.format == ModelFormat.GGUF:
        with Gguf.open(src.path) as g:
            md = g.metadata()
            out.update({
                "architecture": md.architecture(),
                "hidden_size": md.embedding_length(),
                "num_layers": md.block_count(),
                "context_length": md.context_length(),
                "dominant_quant": g.dominant_quant_type(),
                "num_tensors": len(g.tensor_names()),
                "is_mla": md.get_u32(
                    f"{md.architecture()}.attention.kv_lora_rank") is not None,
                "is_moe": md.get_u32(
                    f"{md.architecture()}.expert_count") is not None,
            })
    else:
        cfg = resolve_config(src, None if src.config_path else
                             __import__("blazr_tpu.loader", fromlist=["load_varmap"]
                                        ).load_varmap(src))
        m = cfg.model
        out.update({
            "architecture": m.model_type,
            "hidden_size": m.hidden_size,
            "num_layers": m.num_layers,
            "vocab_size": m.vocab_size,
            "is_mla": bool(m.attention and m.attention.is_mla),
            "is_moe": m.moe is not None,
            "is_ssm": m.ssm is not None,
        })
    print(json.dumps(out, indent=2))
    return 0


def cmd_list(args) -> int:
    from ..engine.model_scheduler import ModelScheduler

    s = ModelScheduler(args.dir)
    for name in s.discover_models():
        print(name)
    return 0


def cmd_ps(args) -> int:
    import urllib.request

    url = f"http://{args.host}:{args.port}/api/ps"
    with urllib.request.urlopen(url, timeout=10) as r:
        print(r.read().decode())
    return 0


def cmd_tokenize(args) -> int:
    from ..tokenizer import load_tokenizer

    p = Path(args.model)
    tok = load_tokenizer(p.parent if p.is_file() else p,
                         gguf_path=p if p.suffix == ".gguf" else None)
    ids = tok.encode(args.text)
    print(json.dumps({"tokens": ids, "count": len(ids)}))
    return 0


def cmd_swarm(args) -> int:
    """Pipeline-parallel swarm mode (reference cli/swarm.rs)."""
    from ..distributed.swarm import SwarmLeader, SwarmWorker
    from ..distributed.transport import TcpMesh, announce_seed, discover_seed

    host, port = args.seed.rsplit(":", 1)
    if args.role == "worker" and args.mdns:
        host, port = discover_seed()
        print(f"discovered leader at {host}:{port}", file=sys.stderr)
    if args.role == "leader":
        if not args.model:
            print("--model required for the leader", file=sys.stderr)
            return 2
        from ..loader import resolve_config
        from ..formats import detect_model_source

        cfg = resolve_config(detect_model_source(args.model))
        beacon = (announce_seed(host, int(port)) if args.mdns else None)
        mesh = TcpMesh.bootstrap_leader(args.world_size, host=host,
                                        seed_port=int(port))
        if beacon is not None:
            beacon.set()        # all workers connected; stop beaconing
        leader = SwarmLeader(mesh, args.model, cfg.model.num_layers)
        leader.start_workers()
        print(f"swarm ready: {len(leader.schedule.stages)} stages; "
              f"starting HTTP server", file=sys.stderr)
        # Minimal serving loop on the leader (reference serves HTTP here).
        import json as _json

        while True:
            try:
                line = input()
            except EOFError:
                break
            req = _json.loads(line)
            toks = leader.generate_greedy(req["tokens"], req.get("max_tokens", 32))
            print(_json.dumps({"tokens": toks}), flush=True)
        leader.shutdown()
        return 0
    mesh = TcpMesh.bootstrap_worker((host, int(port)))
    w = SwarmWorker(mesh, capacity=args.capacity, dtype=args.dtype or "bf16")
    w.receive_assignment()
    w.run_compute_loop()
    return 0


def cmd_disagg(args) -> int:
    """Disaggregated prefill/decode mode (reference cli/disaggregated.rs)."""
    from ..distributed.disagg import (
        DecodeWorker,
        DisaggConfig,
        DisaggRouter,
        PrefillWorker,
    )
    from ..distributed.transport import TcpMesh

    host, port = args.seed.rsplit(":", 1)
    p_ranks = [int(x) for x in args.prefill_ranks.split(",")]
    d_ranks = [int(x) for x in args.decode_ranks.split(",")]
    if args.role == "router":
        mesh = TcpMesh.bootstrap_leader(args.world_size, host=host,
                                        seed_port=int(port))
        router = DisaggRouter(mesh, DisaggConfig(
            prefill_workers=p_ranks, decode_workers=d_ranks))
        router.wait_workers()
        if getattr(args, "port", None):
            # REAL HTTP serving on the router (reference serves
            # /v1/completions on its router, disaggregated_forward.rs:
            # 253-341). Tokenizer comes from --model (the router holds
            # no weights, just the vocab).
            from aiohttp import web as _web

            from ..distributed.disagg import make_router_app
            from ..tokenizer import load_tokenizer

            if not args.model:
                print("disagg router --port needs --model for the "
                      "tokenizer", file=sys.stderr)
                return 2
            tok = load_tokenizer(args.model)
            app = make_router_app(router, tok)
            print(f"disagg router serving on :{args.port}", file=sys.stderr)
            try:
                _web.run_app(app, port=args.port, print=None)
            finally:
                router.shutdown()
            return 0
        import json as _json

        print("disagg router ready", file=sys.stderr)
        while True:
            try:
                line = input()
            except EOFError:
                break
            req = _json.loads(line)
            toks = router.route_request(req["tokens"], req.get("max_tokens", 32))
            print(_json.dumps({"tokens": toks}), flush=True)
        router.shutdown()
        return 0
    mesh = TcpMesh.bootstrap_worker((host, int(port)))
    if args.role == "prefill":
        PrefillWorker(mesh, args.model, capacity=args.capacity,
                      dtype=args.dtype or "bf16").run_loop()
    else:
        DecodeWorker(mesh, args.model, capacity=args.capacity,
                     dtype=args.dtype or "bf16").run_loop()
    return 0


_COMPLETION_BASH = """_blazr_tpu() {
  local cur=${COMP_WORDS[COMP_CWORD]}
  local cmds="run generate chat serve bench info list ps tokenize convert \
swarm disagg pull completions"
  if [ $COMP_CWORD -eq 1 ]; then
    COMPREPLY=( $(compgen -W "$cmds" -- "$cur") )
  else
    COMPREPLY=( $(compgen -f -- "$cur") )
  fi
}
complete -F _blazr_tpu blazr-tpu
complete -F _blazr_tpu "python -m blazr_tpu.cli"
"""


def cmd_completions(args) -> int:
    """Shell completion script (reference clap_complete dispatch,
    main.rs:177-184). zsh consumes the bash script through its
    bash-compatibility layer."""
    if getattr(args, "shell", "bash") == "zsh":
        print("autoload -U +X bashcompinit && bashcompinit")
    print(_COMPLETION_BASH)
    return 0


def cmd_pull(args) -> int:
    """Download config/tokenizer/weights from the HF Hub
    (reference cli/pull.rs; requires network access)."""
    dest = Path(args.dest or args.repo_id.split("/")[-1])
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        print("huggingface_hub is not installed; cannot pull", file=sys.stderr)
        return 2
    try:
        snapshot_download(
            args.repo_id, revision=args.revision, local_dir=dest,
            allow_patterns=["*.safetensors", "*.json", "*.gguf", "*.model"],
        )
    except Exception as e:
        print(f"pull failed (network unavailable?): {e}", file=sys.stderr)
        return 1
    print(f"pulled {args.repo_id} -> {dest}")
    return 0


def cmd_convert(args) -> int:
    from ..loader.convert import convert_checkpoint

    convert_checkpoint(args.src, args.dst, quant=args.quant)
    print(f"converted {args.src} -> {args.dst}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
