"""Tests for the remaining engine subsystems: LoRA adapters, speculative
decoding, DP routing, cache router, MoE offload, model scheduler
(ports the reference unit tiers for tensor_parallel/moe_offload/
cache_router/slots, SURVEY §4)."""

import json

import numpy as np
import pytest

import jax.numpy as jnp

from blazr_tpu.config import GenerationConfig
from blazr_tpu.engine.cache_router import CacheAwareRouter, fnv1a
from blazr_tpu.engine.data_parallel import DataParallelGroup
from blazr_tpu.engine.executor import Executor
from blazr_tpu.engine.lora import LoraAdapterRegistry, load_lora_adapter, merge_lora
from blazr_tpu.engine.model_scheduler import ModelScheduler, parse_keep_alive
from blazr_tpu.engine.moe_offload import (
    ExpertFrequencyTracker,
    MoeOffloadManager,
    OffloadStrategy,
    resolve_strategy,
)
from blazr_tpu.engine.speculative import SpeculativeExecutor
from blazr_tpu.formats import write_safetensors
from blazr_tpu.loader import load_model
from fixtures import write_byte_tokenizer_json, write_tiny_llama_checkpoint
from tests_helpers import ByteTok


# ---------------------------------------------------------------------------
# LoRA
# ---------------------------------------------------------------------------

def _write_adapter(path, rng, rank=4, alpha=8.0):
    path.mkdir(exist_ok=True)
    weights = {}
    for proj, dims in [("q_proj", (64, 64)), ("v_proj", (32, 64))]:
        base = f"base_model.model.model.layers.0.self_attn.{proj}"
        weights[f"{base}.lora_A.weight"] = (
            rng.standard_normal((rank, dims[1])) * 0.05).astype(np.float32)
        weights[f"{base}.lora_B.weight"] = (
            rng.standard_normal((dims[0], rank)) * 0.05).astype(np.float32)
    write_safetensors(path / "adapter_model.safetensors", weights)
    (path / "adapter_config.json").write_text(json.dumps(
        {"r": rank, "lora_alpha": alpha}))


def test_lora_load_and_registry(tmp_path):
    rng = np.random.default_rng(0)
    _write_adapter(tmp_path / "ad1", rng)
    reg = LoraAdapterRegistry()
    a = reg.load(tmp_path / "ad1", "style")
    assert a.rank == 4 and a.alpha == 8.0 and a.num_modules() == 2
    assert reg.get("style") is a
    assert [x["name"] for x in reg.list()] == ["style"]
    assert reg.unload("style") and not reg.unload("style")


def test_lora_merge_changes_logits(tmp_path):
    rng = np.random.default_rng(1)
    mdir = tmp_path / "model"
    write_tiny_llama_checkpoint(mdir, rng)
    _write_adapter(tmp_path / "ad", rng)
    model, _ = load_model(mdir, dtype="f32")
    adapter = load_lora_adapter(tmp_path / "ad")

    tokens = jnp.asarray([[1, 2, 3]], dtype=jnp.int32)
    pos = jnp.asarray(np.arange(3, dtype=np.int32)[None, :])
    base_logits, _ = model.forward(tokens, model.init_cache(1, 8), pos)

    merged = merge_lora(model.params, adapter)
    model.params = merged
    lora_logits, _ = model.forward(tokens, model.init_cache(1, 8), pos)
    assert not np.allclose(np.asarray(base_logits), np.asarray(lora_logits))


def test_lora_executor_hot_swap_changes_generation(tmp_path):
    """set_lora must change what the EXECUTOR generates, and clear_lora
    must restore the base output exactly (regression: merge_lora had no
    production caller — adapters loaded but never applied)."""
    rng = np.random.default_rng(3)
    mdir = tmp_path / "model"
    write_tiny_llama_checkpoint(mdir, rng)
    _write_adapter(tmp_path / "ad", rng)
    model, app_cfg = load_model(mdir, dtype="f32")
    app_cfg.inference.max_seq_len = 64
    ex = Executor(model, ByteTok(), app_cfg)
    cfg = GenerationConfig(max_tokens=6, temperature=0.0)

    def gen():
        return [t.token_id for t in ex.generate([5, 6, 7], cfg)]

    base = gen()
    adapter = load_lora_adapter(tmp_path / "ad", "style")
    ex.set_lora(adapter)
    assert ex.active_lora == "style"
    with_lora = gen()
    assert with_lora != base
    ex.clear_lora()
    assert ex.active_lora is None
    assert gen() == base


def test_lora_quantized_base_activation_side(tmp_path):
    """Quantized base weights get the activation-side LoraLinear term
    (x@a)@b — logits must change while the base stays packed."""
    import jax.numpy as jnp

    from blazr_tpu.engine.lora import LoraLinear
    from blazr_tpu.utils.synthetic import synth_model
    from blazr_tpu.config.model_config import AttentionConfig, UniversalConfig

    cfg = UniversalConfig(
        model_type="llama", vocab_size=128, hidden_size=128, num_layers=1,
        max_seq_len=64, intermediate_size=256,
        attention=AttentionConfig(num_heads=8, num_kv_heads=4, head_dim=16))
    model = synth_model(cfg, quant="awq", dtype=jnp.float32)
    rng = np.random.default_rng(4)
    ad = tmp_path / "ad"
    ad.mkdir()
    base = "base_model.model.model.layers.0.self_attn.q_proj"
    write_safetensors(ad / "adapter_model.safetensors", {
        f"{base}.lora_A.weight":
            (rng.standard_normal((4, 128)) * 0.05).astype(np.float32),
        f"{base}.lora_B.weight":
            (rng.standard_normal((128, 4)) * 0.05).astype(np.float32),
    })
    (ad / "adapter_config.json").write_text(json.dumps(
        {"r": 4, "lora_alpha": 8.0}))
    adapter = load_lora_adapter(ad, "q")

    toks = jnp.asarray([[1, 2, 3]], dtype=jnp.int32)
    pos = jnp.asarray(np.arange(3, dtype=np.int32)[None, :])
    ref, _ = model.forward(toks, model.init_cache(1, 8), pos)
    # Synth AWQ params use the FUSED qkv layout — the adapter's q_proj
    # must land in the fused weight's output slice.
    merged = merge_lora(model.params, adapter, model_cfg=cfg)
    assert isinstance(merged["layers"][0]["qkv"], LoraLinear)
    old = model.params
    model.params = merged
    got, _ = model.forward(toks, model.init_cache(1, 8), pos)
    model.params = old
    assert not np.allclose(np.asarray(ref), np.asarray(got))


# ---------------------------------------------------------------------------
# speculative decoding
# ---------------------------------------------------------------------------

def test_speculative_matches_target_greedy(tmp_path):
    """Greedy speculative output must EXACTLY match target-only greedy
    (same model as draft+target → 100% acceptance)."""
    rng = np.random.default_rng(2)
    mdir = tmp_path / "m"
    write_tiny_llama_checkpoint(mdir, rng)
    model_t, cfg_t = load_model(mdir, dtype="f32")
    model_d, cfg_d = load_model(mdir, dtype="f32")
    cfg_t.inference.max_seq_len = 64
    cfg_d.inference.max_seq_len = 64
    target = Executor(model_t, ByteTok(), cfg_t)
    draft = Executor(model_d, ByteTok(), cfg_d)

    # NOTE: argmax near-ties can flip between differently-shaped compiled
    # programs (T=1 decode vs T=k verify) — outputs are deterministic per
    # config; this config is verified tie-free.
    gen = GenerationConfig(max_tokens=12, temperature=0.0, repeat_penalty=1.0)
    ref = [t.token_id for t in target.generate([5, 9, 13], gen)]

    spec = SpeculativeExecutor(draft, target)
    got = [t.token_id for t in spec.generate([5, 9, 13], gen)]
    assert got == ref
    assert spec.stats.drafted > 0
    assert spec.stats.acceptance_rate > 0.5


def test_speculative_divergent_draft_still_correct(tmp_path):
    """A DIFFERENT draft model must not change the greedy target output."""
    rng = np.random.default_rng(3)
    mdir1 = tmp_path / "target"
    mdir2 = tmp_path / "draft"
    write_tiny_llama_checkpoint(mdir1, np.random.default_rng(3))
    write_tiny_llama_checkpoint(mdir2, np.random.default_rng(99))
    model_t, cfg_t = load_model(mdir1, dtype="f32")
    model_d, cfg_d = load_model(mdir2, dtype="f32")
    cfg_t.inference.max_seq_len = 64
    cfg_d.inference.max_seq_len = 64
    target = Executor(model_t, ByteTok(), cfg_t)
    draft = Executor(model_d, ByteTok(), cfg_d)

    gen = GenerationConfig(max_tokens=8, temperature=0.0, repeat_penalty=1.0)
    ref = [t.token_id for t in target.generate([7, 11], gen)]
    spec = SpeculativeExecutor(draft, target)
    got = [t.token_id for t in spec.generate([7, 11], gen)]
    assert got == ref


# ---------------------------------------------------------------------------
# DP routing / cache router (ports cache_router.rs:148-176 tests)
# ---------------------------------------------------------------------------

def test_fnv1a_deterministic():
    assert fnv1a(b"hello") == fnv1a(b"hello")
    assert fnv1a(b"hello") != fnv1a(b"world")


def test_cache_router_sticky():
    r = CacheAwareRouter(4)
    a = r.route("common prefix A" * 10, [0, 0, 0, 0])
    assert r.route("common prefix A" * 10, [1, 1, 1, 1]) == a


def test_cache_router_overload_fallback():
    r = CacheAwareRouter(2, overload_factor=1.5)
    sticky = r.route("prompt X", [0, 0])
    loads = [0, 0]
    loads[sticky] = 100
    assert r.route("prompt X", loads) != sticky


def test_dp_group_round_robin_and_release():
    g = DataParallelGroup(["e0", "e1", "e2"], cache_aware=False)
    picks = [g.select().index for _ in range(6)]
    assert picks == [0, 1, 2, 0, 1, 2]
    for r in g.replicas:
        assert r.active == 2
    g.release(g.replicas[0])
    assert g.stats()[0]["active"] == 1


# ---------------------------------------------------------------------------
# MoE offload (ports moe_offload.rs:254-375 tests)
# ---------------------------------------------------------------------------

def test_frequency_tracker_decay():
    t = ExpertFrequencyTracker(1, 4, decay=0.5)
    t.record(0, [0, 0, 1])
    t.step()
    t.record(0, [2])
    assert t.hot_set(0, 2) == [2, 0] or t.hot_set(0, 2) == [0, 2]
    assert t.counts[0, 0] == pytest.approx(1.0)   # 2 * 0.5


def test_offload_rebalance_plan():
    m = MoeOffloadManager(num_layers=1, num_experts=4,
                          device_experts_per_layer=2, rebalance_interval=2)
    assert m.placement.on_device[0] == {0, 1}
    plans = []
    for _ in range(3):
        m.record_usage(0, [2, 3, 2, 3])
        p = m.step()
        if p:
            plans.append(p)
    assert plans, "rebalance expected"
    plan = plans[0]
    layer, to_device, to_host = plan[0]
    assert set(to_device) == {2, 3} and set(to_host) == {0, 1}
    assert m.placement.on_device[0] == {2, 3}


def test_resolve_strategy():
    GB = 1 << 30
    assert resolve_strategy(OffloadStrategy.AUTO, 1 * GB, 16 * GB) == OffloadStrategy.DEVICE
    assert resolve_strategy(OffloadStrategy.AUTO, 20 * GB, 13 * GB) == OffloadStrategy.HYBRID
    assert resolve_strategy(OffloadStrategy.AUTO, 100 * GB, 10 * GB) == OffloadStrategy.HOST
    assert resolve_strategy(OffloadStrategy.HOST, 1, 100 * GB) == OffloadStrategy.HOST


# ---------------------------------------------------------------------------
# model scheduler (ports scheduler.rs keep_alive tests)
# ---------------------------------------------------------------------------

def test_parse_keep_alive():
    assert parse_keep_alive(None) == 300.0
    assert parse_keep_alive(60) == 60.0
    assert parse_keep_alive("5m") == 300.0
    assert parse_keep_alive("1h") == 3600.0
    assert parse_keep_alive("30s") == 30.0
    assert parse_keep_alive("500ms") == 0.5
    assert parse_keep_alive(-1) is None          # forever
    assert parse_keep_alive(0) == 0.0            # unload now
    assert parse_keep_alive("garbage") == 300.0


def test_model_scheduler_lru_and_ttl(tmp_path):
    for name in ("a", "b"):
        d = tmp_path / name
        write_tiny_llama_checkpoint(d, np.random.default_rng(4))
        write_byte_tokenizer_json(d)
    s = ModelScheduler(tmp_path, max_loaded=1, dtype="f32")
    assert sorted(s.discover_models()) == ["a", "b"]
    s.get_executor("a")
    assert s.num_loaded == 1
    s.get_executor("b")                 # evicts a (LRU)
    assert s.num_loaded == 1 and s.evictions == 1
    s.get_executor("b", keep_alive=0)   # expires immediately
    assert s.evict_expired() == 1
    assert s.num_loaded == 0


# ---------------------------------------------------------------------------
# offloading plan (ports offloading.rs budget/placement logic)
# ---------------------------------------------------------------------------

def test_layer_device_map():
    from blazr_tpu.loader.offloading import DevicePlacement, LayerDeviceMap

    lm = LayerDeviceMap.with_device_layers(10, 6)
    assert lm.num_device_layers == 6
    assert not lm.fully_resident
    assert lm.placement(0) == DevicePlacement.DEVICE
    assert lm.placement(9) == DevicePlacement.HOST
    assert LayerDeviceMap.with_device_layers(4, 99).fully_resident


def test_device_layer_budget():
    from blazr_tpu.loader.offloading import compute_device_layer_budget

    GB = 1 << 30
    # 10 layers of 1 GB, 16 GB free, 2 GB KV reserve, 1 GB other → 13 fit
    assert compute_device_layer_budget(GB, 10, GB, free_bytes=16 * GB) == 10
    assert compute_device_layer_budget(GB, 10, GB, free_bytes=8 * GB) == 5
    assert compute_device_layer_budget(GB, 10, GB, free_bytes=2 * GB) == 0


def test_plan_offload_from_varmap(tmp_path):
    from blazr_tpu.loader import varmap_from_safetensors
    from blazr_tpu.loader.offloading import plan_offload

    write_tiny_llama_checkpoint(tmp_path, np.random.default_rng(0))
    vm = varmap_from_safetensors(tmp_path / "model.safetensors")
    lm = plan_offload(vm, 2, requested_device_layers=1)
    assert lm.num_device_layers == 1


def test_tracing_span(caplog):
    import logging

    from blazr_tpu.utils.tracing import span

    with caplog.at_level(logging.DEBUG, logger="blazr_tpu.trace"):
        with span("prefill", backend="paged", tokens=8):
            pass
    msgs = [r.message for r in caplog.records]
    assert any("phase=prefill_start" in m for m in msgs)
    assert any("phase=prefill_end" in m and "elapsed_ms" in m for m in msgs)


def test_prompt_lookup_matches_greedy(tmp_path):
    """N-gram (prompt-lookup) speculation must reproduce plain greedy
    exactly, with nonzero acceptance on repetitive context."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from blazr_tpu.config.generation import GenerationConfig
    from blazr_tpu.engine.executor import Executor
    from blazr_tpu.engine.speculative import PromptLookupExecutor
    from blazr_tpu.loader import load_model
    from blazr_tpu.tokenizer import load_tokenizer
    from fixtures import write_byte_tokenizer_json, write_tiny_llama_checkpoint

    write_tiny_llama_checkpoint(tmp_path, np.random.default_rng(31))
    write_byte_tokenizer_json(tmp_path)
    ex = Executor(load_model(tmp_path, dtype="f32")[0],
                  load_tokenizer(tmp_path))

    # repetitive prompt → the model's greedy continuation repeats too
    prompt = ex.tokenizer.encode("abc abc abc abc abc abc ")
    # speculation verifies with pure argmax: compare against the
    # penalty-free greedy preset
    cfg = GenerationConfig.greedy()
    cfg.max_tokens = 24

    plain = [ev.token_id for ev in ex.generate(prompt, cfg)
             if ev.token_id is not None]
    spec = PromptLookupExecutor(ex, num_speculative_tokens=6)
    looked = [gt.token_id for gt in spec.generate(prompt, cfg)]
    assert looked == plain
    assert spec.stats.drafted > 0
    assert spec.stats.accepted > 0     # repetition must draft successfully
