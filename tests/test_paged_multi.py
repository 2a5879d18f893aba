"""Continuous batching for MLA / Mamba2 / hybrid families: the batch
engine must serve every architecture the single-stream executor serves,
token-for-token (reference serves all archs through the batch engine via
forward_with_paged_kv_cache / forward_with_ssm_state,
executor_generate.rs:123-340)."""

import asyncio
import json

import numpy as np
import pytest

from blazr_tpu.config import AppConfig, GenerationConfig
from blazr_tpu.engine.batch_engine import BatchEngine
from blazr_tpu.engine.executor import Executor
from blazr_tpu.loader import load_model
from blazr_tpu.models.paged_multi import resolve_paged_kind
from tests_helpers import ByteTok

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


# ---------------------------------------------------------------------------
# fixtures (same tiny checkpoints as test_mla_moe / test_mamba2 / test_hybrid)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def deepseek_path(tmp_path_factory):
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    torch.manual_seed(0)
    cfg = DeepseekV3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=48, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4,
        n_routed_experts=8, n_shared_experts=1, num_experts_per_tok=2,
        n_group=2, topk_group=1, routed_scaling_factor=1.5,
        norm_topk_prob=True, first_k_dense_replace=1,
        kv_lora_rank=32, q_lora_rank=48, qk_rope_head_dim=16,
        qk_nope_head_dim=32, v_head_dim=32, max_position_embeddings=256,
        rope_theta=10000.0, rope_scaling=None, rope_interleave=True,
        attention_bias=False, tie_word_embeddings=False,
    )
    model = DeepseekV3ForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("deepseek_paged")
    model.save_pretrained(path, safe_serialization=True)
    return path


@pytest.fixture(scope="module")
def mamba2_path(tmp_path_factory):
    from transformers import Mamba2Config, Mamba2ForCausalLM

    torch.manual_seed(0)
    cfg = Mamba2Config(
        vocab_size=256, hidden_size=64, state_size=16, num_hidden_layers=2,
        expand=2, conv_kernel=4, n_groups=2, num_heads=8, head_dim=16,
        chunk_size=8, tie_word_embeddings=False,
        rescale_prenorm_residual=False, use_conv_bias=True, use_bias=False,
    )
    model = Mamba2ForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("mamba2_paged")
    model.save_pretrained(path, safe_serialization=True)
    return path


@pytest.fixture(scope="module")
def hybrid_path(tmp_path_factory):
    import test_hybrid as th

    path = tmp_path_factory.mktemp("hybrid_paged")
    th._write_hybrid(path, np.random.default_rng(8))
    return path


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

async def _collect(handle, limit=64):
    out = []
    async for tok in handle.tokens():
        out.append(tok.token_id)
        if len(out) >= limit:
            break
    return out


def _engine_tokens(model, prompts, max_tokens=6, concurrent=True,
                   max_batch=4):
    app = AppConfig(model=model.cfg)
    app.inference.max_seq_len = 96
    app.inference.max_batch_size = max_batch

    async def main():
        eng = BatchEngine(model, ByteTok(), app)
        task = asyncio.create_task(eng.run())
        if concurrent:
            hs = [eng.submit(p, GenerationConfig(max_tokens=max_tokens,
                                                 temperature=0.0))
                  for p in prompts]
            res = await asyncio.gather(*[
                asyncio.wait_for(_collect(h), timeout=300) for h in hs])
        else:
            res = []
            for p in prompts:
                h = eng.submit(p, GenerationConfig(max_tokens=max_tokens,
                                                   temperature=0.0))
                res.append(await asyncio.wait_for(_collect(h), timeout=300))
        eng.stop()
        await task
        return res

    return asyncio.run(main())


def _executor_tokens(model, prompts, max_tokens=6):
    ex = Executor(model, ByteTok())
    out = []
    for p in prompts:
        toks = [t.token_id for t in ex.generate(
            p, GenerationConfig(max_tokens=max_tokens, temperature=0.0))]
        out.append(toks)
    return out


# ---------------------------------------------------------------------------
# MLA (paged latent cache)
# ---------------------------------------------------------------------------

def test_mla_paged_kind(deepseek_path):
    model, _ = load_model(deepseek_path, dtype="f32")
    assert resolve_paged_kind(model.cfg) == "mla"


def test_mla_batch_engine_matches_executor(deepseek_path):
    prompts = [[1, 2, 3, 4, 5], [7, 9, 11]]
    model, _ = load_model(deepseek_path, dtype="f32")
    ref = _executor_tokens(model, prompts)
    model2, _ = load_model(deepseek_path, dtype="f32")
    got = _engine_tokens(model2, prompts)
    assert got == ref


def test_mla_paged_int8_latent_runs(deepseek_path):
    model, _ = load_model(deepseek_path, dtype="f32")
    app = AppConfig(model=model.cfg)
    app.inference.max_seq_len = 96
    app.inference.max_batch_size = 2
    app.inference.kv_cache_dtype = "int8"

    async def main():
        eng = BatchEngine(model, ByteTok(), app)
        assert eng.cache.quantized
        task = asyncio.create_task(eng.run())
        h = eng.submit([1, 2, 3], GenerationConfig(max_tokens=4,
                                                   temperature=0.0))
        toks = await asyncio.wait_for(_collect(h), timeout=300)
        eng.stop()
        await task
        return toks

    assert len(asyncio.run(main())) >= 1


# ---------------------------------------------------------------------------
# Mamba2 (state slots)
# ---------------------------------------------------------------------------

def test_mamba2_paged_kind(mamba2_path):
    model, _ = load_model(mamba2_path, dtype="f32")
    assert resolve_paged_kind(model.cfg) == "mamba2"


def test_mamba2_batch_engine_matches_executor(mamba2_path):
    prompts = [[1, 2, 3, 4, 5, 6, 7], [100, 101, 102]]
    model, _ = load_model(mamba2_path, dtype="f32")
    ref = _executor_tokens(model, prompts)
    model2, _ = load_model(mamba2_path, dtype="f32")
    got = _engine_tokens(model2, prompts)
    assert got == ref


def test_mamba2_concurrent_matches_sequential(mamba2_path):
    """State rows must isolate concurrent sequences."""
    prompts = [[1, 2, 3], [9, 8, 7, 6, 5], [42, 43, 44, 45]]
    model, _ = load_model(mamba2_path, dtype="f32")
    seq = _engine_tokens(model, prompts, concurrent=False)
    model2, _ = load_model(mamba2_path, dtype="f32")
    con = _engine_tokens(model2, prompts, concurrent=True)
    assert seq == con


# ---------------------------------------------------------------------------
# Hybrid (paged KV + state slots)
# ---------------------------------------------------------------------------

def test_hybrid_paged_kind(hybrid_path):
    model, _ = load_model(hybrid_path, dtype="f32")
    assert resolve_paged_kind(model.cfg) == "hybrid"


def test_hybrid_batch_engine_matches_executor(hybrid_path):
    prompts = [[1, 2, 3, 4, 5], [50, 60, 70]]
    model, _ = load_model(hybrid_path, dtype="f32")
    ref = _executor_tokens(model, prompts)
    model2, _ = load_model(hybrid_path, dtype="f32")
    got = _engine_tokens(model2, prompts)
    assert got == ref
