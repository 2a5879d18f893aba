"""OpenAI-compatible HTTP server (aiohttp).

TPU-native port of the reference server layer (src/server/): route table
(routes.rs:28-61), AppState + token-budget admission control
(handlers.rs:30-103 — 503 + Retry-After when over max_inflight_tokens),
middleware stack (request-id/logging, bearer auth, CORS, body limit —
startup.rs:41-120), chat/completions endpoints with SSE streaming,
tokenize/detokenize/apply-template, health with device memory, Prometheus
metrics, Ollama-style management routes, and slots.
"""

from __future__ import annotations

import asyncio
import inspect
import json
import logging
import time
import uuid
from dataclasses import dataclass, field
from typing import Any, Optional

from aiohttp import web

from ..config.app import AppConfig
from ..config.generation import GenerationConfig
from ..config.server import ServerConfig
from ..engine.generate_text import StopScanner, collect_generation
from ..engine.model_scheduler import ModelScheduler
from ..engine.types import FinishReason
from ..model_meta.chat_template import ChatMessage, ChatTemplate, TemplateFormat
from ..model_meta.think import extract_thinking
from .api_types import (
    ApiError,
    chat_response,
    completion_logprobs_block,
    completion_response,
    gen_config_from_body,
    logprobs_block,
    new_id,
    usage_dict,
    validate_generation_params,
)
from .metrics import Metrics
from .slo import SloTracker
from .slots import SlotManager
from .tools import extract_tool_calls, tools_system_prompt

logger = logging.getLogger(__name__)


@dataclass
class AppState:
    """Shared server state (reference AppState, handlers.rs:30-42)."""

    scheduler: ModelScheduler
    server_cfg: ServerConfig
    metrics: Metrics = field(default_factory=Metrics)
    slots: SlotManager = field(default_factory=lambda: SlotManager())
    batch_engine: Any = None          # optional continuous-batching engine
    start_time: float = field(default_factory=time.time)
    inflight_tokens: int = 0
    slo: SloTracker = None            # type: ignore[assignment]
    user_config: Any = None           # hot-reloaded UserConfig (handlers.rs:33)

    def __post_init__(self) -> None:
        if self.slo is None:
            self.slo = SloTracker(self.server_cfg.slo, self.metrics)
        if self.user_config is None:
            from ..config.user import UserConfig

            self.user_config = UserConfig.load()

    # -- admission control (reference handlers.rs:72-103) ------------------
    def try_admit(self, tokens: int) -> bool:
        limit = self.server_cfg.max_inflight_tokens
        if limit is None:
            return True
        if self.inflight_tokens + tokens > limit:
            return False
        self.inflight_tokens += tokens
        self._update_budget_gauge()
        return True

    def release(self, tokens: int) -> None:
        self.inflight_tokens = max(0, self.inflight_tokens - tokens)
        self._update_budget_gauge()

    def _update_budget_gauge(self) -> None:
        limit = self.server_cfg.max_inflight_tokens
        if limit:
            self.metrics.token_budget_utilization.set(
                self.inflight_tokens / limit)


STATE_KEY = web.AppKey("state", AppState)
REAPER_KEY = web.AppKey("reaper", object)


# ---------------------------------------------------------------------------
# middleware (reference startup.rs:41-120)
# ---------------------------------------------------------------------------

@web.middleware
async def request_id_mw(request: web.Request, handler):
    rid = request.headers.get("x-request-id", uuid.uuid4().hex[:16])
    request["request_id"] = rid
    t0 = time.time()
    try:
        resp = await handler(request)
    except ApiError as e:
        resp = web.json_response(e.body(), status=e.status)
    except web.HTTPException:
        raise
    except Exception:
        logger.exception("unhandled error [%s] %s", rid, request.path)
        resp = web.json_response(
            {"error": {"message": "internal server error",
                       "type": "server_error"}}, status=500)
    resp.headers["x-request-id"] = rid
    dt = time.time() - t0
    logger.info("%s %s -> %d (%.1f ms) [%s]", request.method, request.path,
                resp.status, dt * 1e3, rid)
    return resp


def auth_middleware(api_keys: list[str]):
    unprotected = {"/health", "/metrics"}

    @web.middleware
    async def mw(request: web.Request, handler):
        if not api_keys or request.path in unprotected:
            return await handler(request)
        auth = request.headers.get("Authorization", "")
        key = auth[7:] if auth.startswith("Bearer ") else \
            request.headers.get("x-api-key", "")
        if key not in api_keys:
            return web.json_response(
                {"error": {"message": "invalid API key",
                           "type": "authentication_error"}}, status=401)
        return await handler(request)

    return mw


@web.middleware
async def cors_mw(request: web.Request, handler):
    if request.method == "OPTIONS":
        resp = web.Response(status=204)
    else:
        resp = await handler(request)
    resp.headers["Access-Control-Allow-Origin"] = "*"
    resp.headers["Access-Control-Allow-Methods"] = "GET, POST, DELETE, OPTIONS"
    resp.headers["Access-Control-Allow-Headers"] = "Content-Type, Authorization, x-api-key"
    return resp


def timeout_middleware(seconds: float):
    """Per-request timeout (reference TimeoutLayer, startup.rs:231-234 —
    408 when the handler doesn't complete in time). Streaming responses
    mark ``request["streaming"]`` once the SSE stream is in flight and are
    then allowed to run to completion, matching axum's semantics where the
    timeout covers the response *future*, not the streamed body."""

    @web.middleware
    async def mw(request: web.Request, handler):
        task = asyncio.ensure_future(handler(request))
        try:
            return await asyncio.wait_for(asyncio.shield(task), seconds)
        except asyncio.TimeoutError:
            if request.get("streaming"):
                return await task
            task.cancel()
            return web.json_response(
                {"error": {"message": "request timeout",
                           "type": "timeout_error"}}, status=408)

    return mw


def concurrency_middleware(limit: int):
    """Cap in-flight requests (reference ConcurrencyLimitLayer,
    startup.rs:236-238). Excess requests queue on the semaphore."""
    sem = asyncio.Semaphore(limit)

    @web.middleware
    async def mw(request: web.Request, handler):
        async with sem:
            return await handler(request)

    return mw


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

async def _json(request: web.Request) -> dict:
    try:
        return await request.json()
    except json.JSONDecodeError:
        raise ApiError(400, "invalid JSON body")


def _overloaded() -> web.Response:
    resp = web.json_response(
        {"error": {"message": "server overloaded, retry later",
                   "type": "overloaded_error"}}, status=503)
    resp.headers["Retry-After"] = "1"
    return resp


def _build_prompt(request_body: dict, executor, model_cfg) -> tuple[str, list]:
    """Apply the chat template (+ tools system prompt, sanitization)."""
    messages = [
        ChatMessage(m.get("role", "user"), _content_text(m.get("content")))
        for m in request_body.get("messages", [])
    ]
    if not messages:
        raise ApiError(400, "messages must not be empty")
    tools = request_body.get("tools")
    if tools:
        sys_prompt = tools_system_prompt(tools)
        if messages and messages[0].role == "system":
            messages[0].content += "\n\n" + sys_prompt
        else:
            messages.insert(0, ChatMessage("system", sys_prompt))

    override = request_body.get("template")
    if override:
        template = ChatTemplate(TemplateFormat.from_name(override))
    else:
        template = ChatTemplate.detect(model_type=model_cfg.model_type)
    if request_body.get("raw"):
        prompt = "\n".join(m.content for m in messages)
    else:
        prompt = template.apply(messages)
    return prompt, messages


def _content_text(content) -> str:
    """Flatten string-or-parts message content (reference multimodal.rs)."""
    from .multimodal import content_text

    return content_text(content)


# ---------------------------------------------------------------------------
# handlers
# ---------------------------------------------------------------------------

async def health(request: web.Request) -> web.Response:
    state = request.app[STATE_KEY]
    body = {
        "status": "ok",
        "uptime_seconds": round(time.time() - state.start_time, 1),
        "models_loaded": state.scheduler.num_loaded,
    }
    try:
        import jax

        dev = jax.devices()[0]
        stats = dev.memory_stats() or {}
        if stats:
            body["device_memory"] = {
                "bytes_in_use": stats.get("bytes_in_use"),
                "bytes_limit": stats.get("bytes_limit"),
            }
        body["device"] = str(dev)
    except Exception:
        pass
    return web.json_response(body)


async def metrics_handler(request: web.Request) -> web.Response:
    state = request.app[STATE_KEY]
    # Render-time gauge refresh (reference metrics.rs:197-244).
    state.metrics.models_loaded.set(state.scheduler.num_loaded)
    eng = state.batch_engine
    if eng is not None:
        st = eng.scheduler.stats()
        state.metrics.queue_depth.set(st["waiting"])
        state.metrics.active_decode_slots.set(st["running"])
        bs = st["block_stats"]
        if bs["total_blocks"]:
            state.metrics.kv_block_utilization.set(
                bs["allocated_blocks"] / bs["total_blocks"])
        inner = getattr(eng, "engine", eng)   # LockstepEngine wraps
        drafted = getattr(inner, "spec_drafted", 0)
        accepted = getattr(inner, "spec_accepted", 0)
        state.metrics.spec_drafted.set(drafted)
        state.metrics.spec_accepted.set(accepted)
        if drafted:
            state.metrics.spec_acceptance_rate.set(accepted / drafted)
        state.metrics.spec_depth.set(getattr(inner, "_spec_depth", 0))
        dispatches = getattr(inner, "horizon_dispatches", 0)
        if dispatches:
            state.metrics.horizon_steps_per_dispatch.set(
                getattr(inner, "horizon_steps", 0) / dispatches)
        from ..parallel.ep import DROPPED_TOKENS

        state.metrics.moe_tokens_dropped.set(DROPPED_TOKENS["count"])
    return web.Response(body=state.metrics.render(),
                        content_type="text/plain", charset="utf-8")


async def list_models(request: web.Request) -> web.Response:
    state = request.app[STATE_KEY]
    names = state.scheduler.discover_models() or ["default"]
    return web.json_response({
        "object": "list",
        "data": [{"id": n, "object": "model", "created": 0,
                  "owned_by": "blazr_tpu"} for n in names],
    })


async def get_model(request: web.Request) -> web.Response:
    state = request.app[STATE_KEY]
    mid = request.match_info["model_id"]
    names = state.scheduler.discover_models() or ["default"]
    if mid not in names:
        raise ApiError(404, f"model {mid!r} not found", "not_found_error")
    return web.json_response({"id": mid, "object": "model", "created": 0,
                              "owned_by": "blazr_tpu"})


def _get_executor(state: AppState, body: dict):
    name = body.get("model") or "default"
    try:
        return state.scheduler.get_executor(name, body.get("keep_alive"))
    except FileNotFoundError as e:
        raise ApiError(404, str(e), "not_found_error")


def _apply_request_lora(request: web.Request, executor, cfg) -> None:
    """Per-request adapter selection (GenerationConfig.lora_adapter):
    activate the named registry adapter on the serving model."""
    if not cfg.lora_adapter:
        return
    from .lora_routes import REGISTRY_KEY

    registry = request.app.get(REGISTRY_KEY)
    adapter = registry.get(cfg.lora_adapter) if registry else None
    if adapter is None:
        raise ApiError(404, f"LoRA adapter {cfg.lora_adapter!r} not loaded",
                       "not_found_error")
    if getattr(executor, "active_lora", None) != adapter.name:
        try:
            executor.set_lora(adapter)
        except ValueError as e:
            raise ApiError(400, str(e))


def _context_prefix(executor, body: dict) -> str:
    """Ollama-style ``context`` continuation: caller-supplied token ids
    from a previous turn, decoded to a string prefix prepended before the
    prompt (reference chat_types.rs:50, completions.rs:242, applied at
    chat.rs:56-65/152-156 via decode_context_prefix,
    generation.rs:374-387)."""
    ctx = body.get("context")
    if not ctx:
        return ""
    if not isinstance(ctx, list) or not all(
            isinstance(t, int) and not isinstance(t, bool) for t in ctx):
        raise ApiError(400, "context must be an array of token ids")
    try:
        return executor.tokenizer.decode([int(t) for t in ctx])
    except Exception as e:
        raise ApiError(400, f"Failed to decode context tokens: {e}")


async def completions(request: web.Request) -> web.Response:
    state = request.app[STATE_KEY]
    body = await _json(request)
    validate_generation_params(body)
    executor = await asyncio.to_thread(_get_executor, state, body)
    cfg = gen_config_from_body(body, executor.app_cfg.generation)
    _apply_request_lora(request, executor, cfg)

    ctx_prefix = _context_prefix(executor, body)
    prompt = body.get("prompt", "")
    prompts = prompt if isinstance(prompt, list) else [prompt]
    if prompts and all(isinstance(p, int) for p in prompts):
        # Flat token-id array = ONE pre-tokenized prompt (OpenAI allows
        # both [int, ...] and [[int, ...], ...]).
        prompt_ids_list = [list(map(int, prompts))]
    elif prompts and all(isinstance(p, str) for p in prompts):
        prompt_ids_list = [executor.tokenizer.encode(ctx_prefix + p)
                           for p in prompts]
        ctx_prefix = ""
    elif prompts and all(isinstance(p, list) for p in prompts):
        prompt_ids_list = [list(map(int, p)) for p in prompts]
    else:
        raise ApiError(400, "prompt must be a string or array")
    if ctx_prefix:
        # Pre-tokenized prompts: prepend the context token ids directly
        # (decode+re-encode could drift on byte-level merges).
        ctx_ids = [int(t) for t in body["context"]]
        prompt_ids_list = [ctx_ids + p for p in prompt_ids_list]
    if any(not p for p in prompt_ids_list):
        raise ApiError(400, "prompt must not be empty")

    n = max(1, int(body.get("n", 1)))
    if body.get("stream") and (len(prompt_ids_list) != 1 or n != 1):
        raise ApiError(400, "streaming supports a single prompt with n=1")
    total_prompt = sum(len(p) for p in prompt_ids_list)
    # n completions per prompt each count against the inflight budget.
    budget = total_prompt + cfg.max_tokens * len(prompt_ids_list) * n
    if not state.try_admit(budget):
        return _overloaded()
    state.metrics.requests_active.inc()
    t0 = time.time()
    try:
        if body.get("stream"):
            return await _stream_completion(request, state, executor,
                                            prompt_ids_list[0], cfg, body)
        echo = bool(body.get("echo", False))
        choices = []
        usage_p = usage_c = 0
        for ids in prompt_ids_list:
            for i in range(n):
                c = GenerationConfig.from_dict(cfg.to_dict())
                if c.seed is not None:
                    c.seed += i
                if state.batch_engine is not None:
                    res = await _collect_via_engine(state, ids, c)
                else:
                    res = await asyncio.to_thread(
                        collect_generation, executor, ids, c)
                text = res.text
                if echo:
                    text = executor.tokenizer.decode(ids) + text
                lp_block = None
                if cfg.logprobs and res.gen_tokens:
                    lp_block = completion_logprobs_block(
                        res.gen_tokens, min(cfg.top_logprobs, 20),
                        text_offset_base=len(executor.tokenizer.decode(ids))
                        if echo else 0)
                choices.append({
                    "index": len(choices),
                    "text": text,
                    "finish_reason": res.finish_reason.to_openai(),
                    "logprobs": lp_block,
                })
                usage_p += res.prompt_tokens
                usage_c += res.completion_tokens
        state.metrics.tokens_prompted.inc(usage_p)
        state.metrics.tokens_generated.inc(usage_c)
        if body.get("id_slot"):        # llama.cpp-style slot affinity
            state.slots.touch(str(body["id_slot"]), usage_p, usage_c)
        state.slo.record_e2e(time.time() - t0)
        model_name = body.get("model", "default")
        return web.json_response(completion_response(
            model_name, choices, usage_dict(usage_p, usage_c)))
    finally:
        state.release(budget)
        state.metrics.requests_active.dec()
        state.metrics.requests_total.labels(
            endpoint="completions", status="200").inc()
        state.metrics.request_duration.observe(time.time() - t0)


async def chat_completions(request: web.Request) -> web.Response:
    state = request.app[STATE_KEY]
    body = await _json(request)
    validate_generation_params(body)
    executor = await asyncio.to_thread(_get_executor, state, body)
    cfg = gen_config_from_body(body, executor.app_cfg.generation)
    _apply_request_lora(request, executor, cfg)

    prompt, _ = _build_prompt(body, executor, executor.model.cfg)
    prompt = _context_prefix(executor, body) + prompt
    prompt_ids = executor.tokenizer.encode(prompt)

    # Multimodal content parts: decode images/audio and bind them to a
    # MultimodalExecutor (reference chat.rs:70-118 + executor_multimodal.rs).
    from .multimodal import (MultimodalError, extract_media, has_audio,
                             has_images)

    messages = body.get("messages", [])
    mm_present = any(has_images(m.get("content")) or has_audio(m.get("content"))
                     for m in messages if isinstance(m, dict))
    if mm_present:
        # Cheap capability check BEFORE any remote media fetch.
        if not getattr(executor.model, "is_multimodal", False):
            raise ApiError(400, "model does not support image/audio input")
        try:
            images, audio = await extract_media(messages)
        except MultimodalError as e:
            raise ApiError(400, f"failed to decode multimodal content: {e}")
        from ..engine.executor_multimodal import (MediaBoundExecutor,
                                                  MultimodalExecutor)

        executor = MediaBoundExecutor(
            MultimodalExecutor(executor, executor.model.vision_params,
                               executor.model.vision_cfg), images, audio)
    n = max(1, int(body.get("n", 1)))
    budget = len(prompt_ids) + cfg.max_tokens * n
    if not state.try_admit(budget):
        return _overloaded()
    state.metrics.requests_active.inc()
    t0 = time.time()
    try:
        if body.get("stream"):
            return await _stream_chat(request, state, executor, prompt_ids,
                                      cfg, body, force_direct=mm_present)
        choices = []
        usage_p = usage_c = 0
        want_think = bool(body.get("think", True))
        for i in range(n):
            c = GenerationConfig.from_dict(cfg.to_dict())
            if c.seed is not None and i:
                c.seed += i
            if state.batch_engine is not None and not mm_present:
                res = await _collect_via_engine(state, prompt_ids, c)
                if want_think:
                    res.thinking, res.text = extract_thinking(res.text)
            else:
                # Respect think:false — stripping the <think> block while
                # discarding it would silently lose the thinking tokens.
                res = await asyncio.to_thread(
                    collect_generation, executor, prompt_ids, c, want_think)
            text = res.text
            tool_calls = extract_tool_calls(text) if body.get("tools") else None
            msg: dict[str, Any] = {"role": "assistant",
                                   "content": None if tool_calls else text}
            if res.thinking and want_think:
                msg["reasoning_content"] = res.thinking
            finish = res.finish_reason.to_openai()
            if tool_calls:
                msg["tool_calls"] = tool_calls
                finish = "tool_calls"
            choices.append({"index": i, "message": msg,
                            "finish_reason": finish,
                            "logprobs": (logprobs_block(res.gen_tokens)
                                         if cfg.logprobs and res.gen_tokens
                                         else None)})
            usage_p += res.prompt_tokens
            usage_c += res.completion_tokens
        state.metrics.tokens_prompted.inc(usage_p)
        state.metrics.tokens_generated.inc(usage_c)
        if body.get("id_slot"):        # llama.cpp-style slot affinity
            state.slots.touch(str(body["id_slot"]), usage_p, usage_c)
        state.slo.record_e2e(time.time() - t0)
        return web.json_response(chat_response(
            body.get("model", "default"), choices,
            usage_dict(usage_p, usage_c, eval_duration=time.time() - t0)))
    finally:
        state.release(budget)
        state.metrics.requests_active.dec()
        state.metrics.requests_total.labels(
            endpoint="chat", status="200").inc()
        state.metrics.request_duration.observe(time.time() - t0)


async def _collect_via_engine(state: AppState, prompt_ids, cfg):
    """Continuous-batching path (reference generate_via_scheduler,
    generation.rs:296): submit to the BatchEngine and assemble the result."""
    from ..engine.generate_text import StopScanner
    from ..engine.types import GenerationResult

    eng = state.batch_engine
    handle = eng.submit(prompt_ids, cfg)
    if inspect.isawaitable(handle):        # lockstep (multi-host) engine
        handle = await handle
    scanner = StopScanner(cfg.stop_sequences)
    pieces = []
    tokens = []
    gen_tokens = [] if cfg.logprobs else None
    finish = FinishReason.LENGTH
    while True:
        tok, fin = await handle.queue.get()
        if tok is not None:
            tokens.append(tok.token_id)
            if gen_tokens is not None:
                gen_tokens.append(tok)
            emit, stopped = scanner.push(tok.text)
            pieces.append(emit)
            if stopped:
                finish = FinishReason.STOP
                eng.cancel(handle.seq_id)
                break
        if fin is not None:
            finish = fin
            break
    pieces.append(scanner.flush())
    return GenerationResult(
        text="".join(pieces), tokens=tokens, finish_reason=finish,
        prompt_tokens=len(prompt_ids), completion_tokens=len(tokens),
        gen_tokens=gen_tokens,
    )


async def _stream_chat(request, state: AppState, executor, prompt_ids,
                       cfg: GenerationConfig, body: dict,
                       force_direct: bool = False) -> web.StreamResponse:
    from .streaming import SSE_DONE, SSE_HEADERS, ChatStream

    request["streaming"] = True       # exempt in-flight SSE from the timeout
    resp = web.StreamResponse(headers=SSE_HEADERS)
    await resp.prepare(request)
    stream = ChatStream(body.get("model", "default"))
    await resp.write(stream.role_chunk())

    loop = asyncio.get_running_loop()
    queue: asyncio.Queue = asyncio.Queue()

    def produce():
        try:
            from ..engine.generate_text import stream_generation

            for delta, fin, gt in stream_generation(executor, prompt_ids,
                                                    cfg, with_tokens=True):
                loop.call_soon_threadsafe(
                    queue.put_nowait,
                    (delta, fin, None, [gt] if gt is not None else []))
        except Exception as e:  # surfaced as SSE error event
            loop.call_soon_threadsafe(queue.put_nowait, ("", None, str(e), []))
        loop.call_soon_threadsafe(queue.put_nowait, None)

    seq_ref: dict = {}                 # engine seq id, for disconnect cancel

    async def produce_engine():
        from ..engine.generate_text import StopScanner

        try:
            eng = state.batch_engine
            handle = eng.submit(prompt_ids, cfg)
            if inspect.isawaitable(handle):   # lockstep (multi-host) engine
                handle = await handle
            seq_ref["id"] = handle.seq_id
            scanner = StopScanner(cfg.stop_sequences)
            while True:
                tok, fin = await handle.queue.get()
                gts = [tok] if tok is not None else []
                if tok is not None:
                    emit, stopped = scanner.push(tok.text)
                    if stopped:
                        eng.cancel(handle.seq_id)
                        queue.put_nowait((emit, FinishReason.STOP, None, gts))
                        break
                    if emit or gts:
                        queue.put_nowait((emit, None, None, gts))
                        gts = []
                if fin is not None:
                    queue.put_nowait((scanner.flush(), fin, None, gts))
                    break
        except Exception as e:
            queue.put_nowait(("", None, str(e), []))
        queue.put_nowait(None)

    if state.batch_engine is not None and not force_direct:
        task = asyncio.ensure_future(produce_engine())
    else:
        task = loop.run_in_executor(None, produce)
    t0 = time.time()
    first = True
    count = 0
    last_t = t0
    try:
        while True:
            item = await queue.get()
            if item is None:
                break
            delta, fin, err, gts = item
            if err is not None:
                await resp.write(stream.error(err))
                break
            now = time.time()
            if first and delta:
                state.slo.record_ttft(now - t0)
                state.metrics.ttft.observe(now - t0)
                first = False
            elif delta:
                state.slo.record_itl(now - last_t)
                state.metrics.itl.observe(now - last_t)
            last_t = now
            lpb = (logprobs_block(gts)
                   if cfg.logprobs and gts else None)
            if delta or lpb:
                count += 1 if delta else 0
                await resp.write(stream.delta(delta, logprobs=lpb))
            if fin is not None:
                await resp.write(stream.finish(
                    fin.to_openai(),
                    usage_dict(len(prompt_ids), count)))
                break
        await resp.write(SSE_DONE)
    except (ConnectionResetError, asyncio.CancelledError):
        # Abandoned generation must not keep burning decode slots and
        # budget until max_tokens — cancel the engine sequence.
        logger.info("client disconnected mid-stream")
        if seq_ref.get("id") is not None and state.batch_engine is not None:
            try:
                state.batch_engine.cancel(seq_ref["id"])
            except Exception:
                pass
    finally:
        await task
    await resp.write_eof()
    return resp


async def _stream_completion(request, state: AppState, executor, prompt_ids,
                             cfg, body) -> web.StreamResponse:
    from .streaming import SSE_DONE, SSE_HEADERS, CompletionStream

    request["streaming"] = True       # exempt in-flight SSE from the timeout
    resp = web.StreamResponse(headers=SSE_HEADERS)
    await resp.prepare(request)
    stream = CompletionStream(body.get("model", "default"))
    loop = asyncio.get_running_loop()
    queue: asyncio.Queue = asyncio.Queue()

    def produce():
        try:
            from ..engine.generate_text import stream_generation

            for delta, fin, gt in stream_generation(executor, prompt_ids,
                                                    cfg, with_tokens=True):
                loop.call_soon_threadsafe(
                    queue.put_nowait,
                    (delta, fin, [gt] if gt is not None else []))
        except Exception:
            logger.exception("stream failed")
            loop.call_soon_threadsafe(queue.put_nowait,
                                      ("", FinishReason.STOP, []))
        loop.call_soon_threadsafe(queue.put_nowait, None)

    seq_ref: dict = {}

    async def produce_engine():
        # Streamed completions ride the continuous-batching engine like
        # chat does (they previously always took the direct executor).
        from ..engine.generate_text import StopScanner

        try:
            eng = state.batch_engine
            handle = eng.submit(prompt_ids, cfg)
            if inspect.isawaitable(handle):
                handle = await handle
            seq_ref["id"] = handle.seq_id
            scanner = StopScanner(cfg.stop_sequences)
            while True:
                tok, fin = await handle.queue.get()
                gts = [tok] if tok is not None else []
                if tok is not None:
                    emit, stopped = scanner.push(tok.text)
                    if stopped:
                        eng.cancel(handle.seq_id)
                        queue.put_nowait((emit, FinishReason.STOP, gts))
                        break
                    if emit or gts:
                        queue.put_nowait((emit, None, gts))
                        gts = []
                if fin is not None:
                    queue.put_nowait((scanner.flush(), fin, gts))
                    break
        except Exception:
            logger.exception("stream failed")
            queue.put_nowait(("", FinishReason.STOP, []))
        queue.put_nowait(None)

    if state.batch_engine is not None:
        task = asyncio.ensure_future(produce_engine())
    else:
        task = loop.run_in_executor(None, produce)
    try:
        while True:
            item = await queue.get()
            if item is None:
                break
            delta, fin, gts = item
            lpb = (completion_logprobs_block(gts, min(cfg.top_logprobs, 20))
                   if cfg.logprobs and gts else None)
            if delta or lpb:
                await resp.write(stream.delta(delta, logprobs=lpb))
            if fin is not None:
                await resp.write(stream.delta("", finish_reason=fin.to_openai()))
                break
        await resp.write(SSE_DONE)
    except (ConnectionResetError, asyncio.CancelledError):
        if seq_ref.get("id") is not None and state.batch_engine is not None:
            try:
                state.batch_engine.cancel(seq_ref["id"])
            except Exception:
                pass
    finally:
        await task
    await resp.write_eof()
    return resp


# ---------------------------------------------------------------------------
# tokenize / detokenize / template (reference handlers.rs:201-348)
# ---------------------------------------------------------------------------

async def tokenize(request: web.Request) -> web.Response:
    state = request.app[STATE_KEY]
    body = await _json(request)
    executor = await asyncio.to_thread(_get_executor, state, body)
    text = body.get("content", body.get("text", ""))
    ids = executor.tokenizer.encode(text)
    return web.json_response({"tokens": ids, "count": len(ids)})


async def detokenize(request: web.Request) -> web.Response:
    state = request.app[STATE_KEY]
    body = await _json(request)
    executor = await asyncio.to_thread(_get_executor, state, body)
    ids = body.get("tokens", [])
    return web.json_response({"content": executor.tokenizer.decode(ids)})


async def apply_template(request: web.Request) -> web.Response:
    state = request.app[STATE_KEY]
    body = await _json(request)
    executor = await asyncio.to_thread(_get_executor, state, body)
    prompt, _ = _build_prompt(body, executor, executor.model.cfg)
    return web.json_response({"prompt": prompt})


# ---------------------------------------------------------------------------
# management (reference management.rs: /api/tags, show, ps, delete, copy)
# ---------------------------------------------------------------------------

async def api_tags(request: web.Request) -> web.Response:
    state = request.app[STATE_KEY]
    models = []
    for name in state.scheduler.discover_models():
        p = state.scheduler.model_dir / name
        size = 0
        mtime = 0.0
        if p.exists():
            files = [p] if p.is_file() else list(p.glob("*"))
            for f in files:
                if f.is_file():
                    st = f.stat()
                    size += st.st_size
                    mtime = max(mtime, st.st_mtime)
        models.append({
            "name": name, "model": name, "size": size,
            "modified_at": time.strftime(
                "%Y-%m-%dT%H:%M:%SZ", time.gmtime(mtime)) if mtime else None,
        })
    return web.json_response({"models": models})


async def api_ps(request: web.Request) -> web.Response:
    state = request.app[STATE_KEY]
    out = []
    for e in state.scheduler.loaded_models():
        out.append({
            "name": e.name,
            "model": e.name,
            "expires_at": (time.strftime("%Y-%m-%dT%H:%M:%SZ",
                                         time.gmtime(e.expires_at))
                           if e.expires_at else "never"),
            "size_vram": e.size_bytes,
        })
    return web.json_response({"models": out})


async def api_show(request: web.Request) -> web.Response:
    state = request.app[STATE_KEY]
    body = await _json(request)
    name = body.get("name", body.get("model", "default"))
    executor = await asyncio.to_thread(
        state.scheduler.get_executor, name)
    cfg = executor.model.cfg
    return web.json_response({
        "model_info": {
            "model_type": cfg.model_type,
            "hidden_size": cfg.hidden_size,
            "num_layers": cfg.num_layers,
            "vocab_size": cfg.vocab_size,
            "max_seq_len": cfg.max_seq_len,
            "num_heads": cfg.attention.num_heads if cfg.attention else None,
            "num_kv_heads": executor.model.num_kv_heads,
        },
        "details": {"family": cfg.model_type, "format": "auto"},
    })


async def api_delete(request: web.Request) -> web.Response:
    state = request.app[STATE_KEY]
    body = await _json(request)
    name = body.get("name", body.get("model"))
    if not name:
        raise ApiError(400, "name required")
    unloaded = state.scheduler.unload(name)
    return web.json_response({"unloaded": unloaded})


async def api_copy(request: web.Request) -> web.Response:
    """Copy/alias a model on disk (reference management.rs:140-195)."""
    import shutil

    state = request.app[STATE_KEY]
    body = await _json(request)
    source = body.get("source")
    destination = body.get("destination")
    if not source or not destination:
        raise ApiError(400, "source and destination required")
    if "/" in destination or destination in (".", ".."):
        raise ApiError(400, "destination must be a plain model name")

    src = state.scheduler.model_dir / source
    if not src.exists() and state.scheduler.model_dir.name == source:
        src = state.scheduler.model_dir    # model_dir IS the model
    if source not in state.scheduler.discover_models() or not src.exists():
        raise ApiError(404, f"source model '{source}' not found",
                       "not_found_error")
    dest = src.parent / destination
    if dest.exists():
        raise ApiError(409, f"destination '{destination}' already exists")

    def do_copy():
        if src.is_dir():
            shutil.copytree(src, dest)
        else:
            shutil.copy2(src, dest)

    await asyncio.to_thread(do_copy)
    logger.info("copied model '%s' -> '%s'", source, destination)
    return web.json_response({"copied": destination})


async def api_pull(request: web.Request) -> web.StreamResponse:
    """Pull a model from the HF Hub, streaming NDJSON progress lines
    (reference management.rs:213-300). Gated on ``huggingface_hub``
    availability and network access — errors stream as status lines."""
    state = request.app[STATE_KEY]
    body = await _json(request)
    name = body.get("name") or body.get("model")
    if not name:
        raise ApiError(400, "name required")

    request["streaming"] = True
    resp = web.StreamResponse(
        headers={"Content-Type": "application/x-ndjson"})
    await resp.prepare(request)

    async def send(obj: dict) -> None:
        await resp.write((json.dumps(obj) + "\n").encode())

    await send({"status": f"pulling manifest for {name}"})
    dest = state.scheduler.model_dir / name.split("/")[-1]
    try:
        from huggingface_hub import snapshot_download
    except ImportError:
        await send({"error": "huggingface_hub is not installed"})
        await resp.write_eof()
        return resp
    try:
        await send({"status": "downloading"})
        await asyncio.to_thread(
            snapshot_download, name, local_dir=dest,
            allow_patterns=["*.safetensors", "*.json", "*.gguf", "*.model"],
        )
        await send({"status": "success", "path": str(dest)})
    except Exception as e:  # network unavailable, bad repo, ...
        await send({"error": f"pull failed: {e}"})
    await resp.write_eof()
    return resp


# ---------------------------------------------------------------------------
# slots (reference handlers.rs:366-416, slots.rs)
# ---------------------------------------------------------------------------

async def slots_list(request: web.Request) -> web.Response:
    state = request.app[STATE_KEY]
    return web.json_response({"slots": state.slots.list()})


async def slots_create(request: web.Request) -> web.Response:
    state = request.app[STATE_KEY]
    body = await _json(request)
    slot = state.slots.create(body.get("model", "default"))
    return web.json_response(slot, status=201)


async def slots_delete(request: web.Request) -> web.Response:
    state = request.app[STATE_KEY]
    sid = request.match_info["slot_id"]
    if not state.slots.delete(sid):
        raise ApiError(404, f"slot {sid} not found", "not_found_error")
    return web.json_response({"deleted": sid})


# ---------------------------------------------------------------------------
# app factory
# ---------------------------------------------------------------------------

def create_app(scheduler: ModelScheduler,
               server_cfg: Optional[ServerConfig] = None,
               batch_engine=None) -> web.Application:
    server_cfg = server_cfg or ServerConfig()
    state = AppState(scheduler=scheduler, server_cfg=server_cfg,
                     batch_engine=batch_engine)

    middlewares = [request_id_mw]
    if server_cfg.enable_cors:
        middlewares.append(cors_mw)
    middlewares.append(auth_middleware(server_cfg.api_keys))
    # Request timeout + concurrency cap (reference startup.rs:223-245).
    if server_cfg.request_timeout_secs:
        middlewares.append(timeout_middleware(server_cfg.request_timeout_secs))
    if server_cfg.max_concurrent_requests:
        middlewares.append(
            concurrency_middleware(server_cfg.max_concurrent_requests))

    app = web.Application(middlewares=middlewares,
                          client_max_size=server_cfg.max_body_bytes)
    app[STATE_KEY] = state

    r = app.router
    # Route table (reference routes.rs:28-61)
    r.add_get("/health", health)
    r.add_get("/metrics", metrics_handler)
    r.add_get("/v1/models", list_models)
    r.add_get("/v1/models/{model_id}", get_model)
    r.add_post("/v1/completions", completions)
    r.add_post("/v1/chat/completions", chat_completions)
    r.add_post("/tokenize", tokenize)
    r.add_post("/detokenize", detokenize)
    r.add_post("/apply-template", apply_template)
    r.add_get("/api/tags", api_tags)
    r.add_get("/api/ps", api_ps)
    r.add_post("/api/show", api_show)
    r.add_delete("/api/delete", api_delete)
    r.add_post("/api/copy", api_copy)
    r.add_post("/api/pull", api_pull)
    r.add_get("/api/slots", slots_list)
    r.add_post("/api/slots", slots_create)
    r.add_delete("/api/slots/{slot_id}", slots_delete)

    from .embeddings import embeddings_handler
    from .anthropic import count_tokens_handler, messages_handler
    from .audio import speech_handler, transcriptions_handler
    from .infill import infill_handler
    from .lora_routes import REGISTRY_KEY, lora_delete, lora_list, lora_load
    from .rerank import rerank_handler
    from .responses import responses_handler
    from ..engine.lora import LoraAdapterRegistry

    r.add_post("/v1/embeddings", embeddings_handler)
    r.add_post("/v1/messages", messages_handler)
    r.add_post("/v1/messages/count_tokens", count_tokens_handler)
    r.add_post("/v1/responses", responses_handler)
    r.add_post("/rerank", rerank_handler)
    r.add_post("/v1/rerank", rerank_handler)
    r.add_post("/v1/infill", infill_handler)
    r.add_post("/v1/audio/speech", speech_handler)
    r.add_post("/v1/audio/transcriptions", transcriptions_handler)
    app[REGISTRY_KEY] = LoraAdapterRegistry()
    r.add_post("/v1/lora", lora_load)
    r.add_get("/v1/lora", lora_list)
    r.add_delete("/v1/lora/{name}", lora_delete)

    if batch_engine is not None:
        ENGINE_TASK_KEY = web.AppKey("engine_task", object)

        async def start_engine(app):
            app[ENGINE_TASK_KEY] = asyncio.create_task(batch_engine.run())

        async def stop_engine(app):
            batch_engine.stop()
            app[ENGINE_TASK_KEY].cancel()

        app.on_startup.append(start_engine)
        app.on_cleanup.append(stop_engine)

    async def start_reaper(app):
        async def reaper():
            while True:
                await asyncio.sleep(30)
                n = await asyncio.to_thread(scheduler.evict_expired)
                if n:
                    logger.info("reaper unloaded %d model(s)", n)
        app[REAPER_KEY] = asyncio.create_task(reaper())

    async def stop_reaper(app):
        app[REAPER_KEY].cancel()

    app.on_startup.append(start_reaper)
    app.on_cleanup.append(stop_reaper)

    # Config hot-reload watcher (reference startup.rs:179 →
    # config_watch.rs:18-47): poll the user config file and swap
    # state.user_config on change.
    WATCH_KEY = web.AppKey("config_watch", object)

    async def start_config_watch(app):
        from ..config.user import UserConfig, user_config_path
        from .config_watch import watch_config

        def on_change(data: dict) -> None:
            import dataclasses as _dc

            known = {f.name for f in _dc.fields(UserConfig)}
            state.user_config = UserConfig(
                **{k: v for k, v in (data or {}).items() if k in known})

        app[WATCH_KEY] = asyncio.create_task(
            watch_config(user_config_path(), on_change,
                         poll_interval=server_cfg.config_poll_interval))

    async def stop_config_watch(app):
        app[WATCH_KEY].cancel()

    app.on_startup.append(start_config_watch)
    app.on_cleanup.append(stop_config_watch)
    return app


def run_server(scheduler: ModelScheduler,
               server_cfg: Optional[ServerConfig] = None,
               batch_engine=None) -> None:
    server_cfg = server_cfg or ServerConfig()
    app = create_app(scheduler, server_cfg, batch_engine)
    logger.info("serving on %s:%d", server_cfg.host, server_cfg.port)
    ssl_ctx = None
    if server_cfg.tls_cert and server_cfg.tls_key:
        import ssl

        ssl_ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ssl_ctx.load_cert_chain(server_cfg.tls_cert, server_cfg.tls_key)
    web.run_app(app, host=server_cfg.host, port=server_cfg.port,
                ssl_context=ssl_ctx, access_log=None)
