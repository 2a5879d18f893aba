"""MoE expert offload + expert parallelism through the PUBLIC entry points.

Round-2 "activate the dead wires" coverage (VERDICT items 6a/6b):
  * offload: Executor with ``inference.moe_offload`` drives the manager per
    forward, computes cold experts on host, and stays token-exact vs the
    all-resident path (reference executor_cache.rs:235-348 behavior).
  * EP: an ``ep`` mesh axis routes MoE forwards through the all-to-all
    dispatch path (parallel/ep.py) inside the real Executor.
  * quantized expert stacks: per-expert QuantTensors stack into one
    [E]-leading QuantTensor and run through moe_ffn / moe_ffn_ep.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blazr_tpu.config import GenerationConfig
from blazr_tpu.engine.executor import Executor
from blazr_tpu.loader import load_model

from test_executor import ByteTokenizer


@pytest.fixture(scope="module")
def mixtral_dir(tmp_path_factory):
    import torch
    from transformers import MixtralConfig, MixtralForCausalLM

    torch.manual_seed(5)
    cfg = MixtralConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    hf = MixtralForCausalLM(cfg)
    hf.eval()
    path = tmp_path_factory.mktemp("mixtral")
    hf.save_pretrained(path, safe_serialization=True)
    return path


def _generate(executor, n=10):
    cfg = GenerationConfig(max_tokens=n, temperature=0.0)
    return [t.token_id for t in executor.generate([7, 21, 42], cfg)]


def _executor(mixtral_dir, **inference_overrides):
    model, app_cfg = load_model(mixtral_dir, dtype="f32")
    app_cfg.inference.max_seq_len = 64
    for k, v in inference_overrides.items():
        setattr(app_cfg.inference, k, v)
    return Executor(model, ByteTokenizer(), app_cfg)


# ---------------------------------------------------------------------------
# Offload through the Executor
# ---------------------------------------------------------------------------

def test_offload_generate_parity(mixtral_dir):
    ref = _generate(_executor(mixtral_dir))
    ex = _executor(mixtral_dir, moe_offload="hybrid", moe_device_experts=2,
                   moe_rebalance_interval=4)
    assert ex._moe_rt is not None, "offload runtime should be installed"
    out = _generate(ex)
    assert out == ref
    # The manager was driven once per forward pass (prefill chunk + decodes).
    assert ex._moe_rt.manager.tracker.steps >= len(out)
    # With 2/4 experts resident and top-2 routing, host compute must have
    # been exercised at least once.
    assert ex._moe_rt.cold_accesses > 0


def test_offload_parity_after_rebalance(mixtral_dir):
    """Token parity must hold ACROSS rebalances (resident rows swapped
    mid-stream) — the core correctness property of the hot/cold split."""
    ref = _generate(_executor(mixtral_dir), n=16)
    ex = _executor(mixtral_dir, moe_offload="hybrid", moe_device_experts=2,
                   moe_rebalance_interval=2)
    out = _generate(ex, n=16)
    assert out == ref
    rt = ex._moe_rt
    # Resident maps stay consistent with the manager's placement.
    for layer, res in rt.resident.items():
        assert set(res) == rt.manager.placement.on_device[layer]
        ids = np.asarray(
            ex.model.params["layers"][layer]["moe"]["resident_ids"])
        assert list(ids) == res


def test_offload_cpu_strategy_minimal_resident(mixtral_dir):
    ex = _executor(mixtral_dir, moe_offload="cpu")
    assert ex._moe_rt is not None
    for layer in ex._moe_rt.resident:
        assert len(ex._moe_rt.resident[layer]) == 1
    assert _generate(ex, n=6) == _generate(_executor(mixtral_dir), n=6)


def test_offload_device_strategy_noop(mixtral_dir):
    ex = _executor(mixtral_dir, moe_offload="gpu")
    assert ex._moe_rt is None


# ---------------------------------------------------------------------------
# EP through the Executor (virtual 8-device CPU mesh)
# ---------------------------------------------------------------------------

def test_ep_executor_parity(mixtral_dir):
    ref = _generate(_executor(mixtral_dir), n=8)
    ex = _executor(mixtral_dir, expert_parallel_size=2)
    assert ex.mesh is not None and ex.mesh.shape["ep"] == 2
    assert ex.model.cfg.moe.use_ep
    out = _generate(ex, n=8)
    assert out == ref


def test_ep_tp_executor_parity(mixtral_dir):
    """ep × tp mesh: experts shard over ep, attention heads over tp."""
    ref = _generate(_executor(mixtral_dir), n=8)
    ex = _executor(mixtral_dir, expert_parallel_size=2,
                   tensor_parallel_size=2)
    assert ex.mesh is not None
    out = _generate(ex, n=8)
    assert out == ref


# ---------------------------------------------------------------------------
# Quantized expert stacks
# ---------------------------------------------------------------------------

def _rand_quant_stack(key, e, k, n, gs=16):
    from blazr_tpu.quant.qtensor import stack_quant
    from blazr_tpu.utils.synthetic import _rand_awq_qt

    keys = jax.random.split(key, e)
    return stack_quant([_rand_awq_qt(keys[i], k, n, group_size=gs)
                        for i in range(e)])


def test_quant_stack_moe_ffn_matches_dense():
    from blazr_tpu.config.model_config import MoeConfig
    from blazr_tpu.models.moe import moe_ffn
    from blazr_tpu.quant.qtensor import dequantize_stack_jnp

    moe = MoeConfig(num_experts=4, experts_per_tok=2)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    h, inter = 32, 48
    gate = _rand_quant_stack(ks[0], 4, h, inter)
    up = _rand_quant_stack(ks[1], 4, h, inter)
    down = _rand_quant_stack(ks[2], 4, inter, h)
    router = jax.random.normal(ks[3], (h, 4), dtype=jnp.float32)
    x = jax.random.normal(ks[4], (2, 3, h), dtype=jnp.float32)

    p_q = {"router": router, "experts_gate": gate, "experts_up": up,
           "experts_down": down}
    p_d = {"router": router,
           "experts_gate": dequantize_stack_jnp(gate),
           "experts_up": dequantize_stack_jnp(up),
           "experts_down": dequantize_stack_jnp(down)}
    np.testing.assert_allclose(np.asarray(moe_ffn(x, p_q, moe)),
                               np.asarray(moe_ffn(x, p_d, moe)),
                               rtol=2e-5, atol=2e-5)


def test_quant_stack_ep_matches_dense():
    from blazr_tpu.config.model_config import MoeConfig
    from blazr_tpu.models.moe import moe_ffn
    from blazr_tpu.parallel.ep import moe_ffn_ep
    from blazr_tpu.quant.qtensor import dequantize_stack_jnp

    moe = MoeConfig(num_experts=4, experts_per_tok=2)
    key = jax.random.PRNGKey(1)
    ks = jax.random.split(key, 5)
    h, inter = 32, 48
    gate = _rand_quant_stack(ks[0], 4, h, inter)
    up = _rand_quant_stack(ks[1], 4, h, inter)
    down = _rand_quant_stack(ks[2], 4, inter, h)
    router = jax.random.normal(ks[3], (h, 4), dtype=jnp.float32)
    x = jax.random.normal(ks[4], (1, 6, h), dtype=jnp.float32)

    p = {"router": router, "experts_gate": gate, "experts_up": up,
         "experts_down": down}
    p_d = {"router": router,
           "experts_gate": dequantize_stack_jnp(gate),
           "experts_up": dequantize_stack_jnp(up),
           "experts_down": dequantize_stack_jnp(down)}
    # capacity = all tokens → no drops → exact match with the dense path
    out_ep = moe_ffn_ep(x, p, moe, capacity=8)
    np.testing.assert_allclose(np.asarray(out_ep),
                               np.asarray(moe_ffn(x, p_d, moe)),
                               rtol=2e-5, atol=2e-5)


def test_stack_quant_roundtrip():
    from blazr_tpu.quant.qtensor import (dequantize_jnp, dequantize_stack_jnp,
                                         expert_slice)

    key = jax.random.PRNGKey(2)
    st = _rand_quant_stack(key, 3, 32, 48)
    dense = np.asarray(dequantize_stack_jnp(st))
    for e in range(3):
        np.testing.assert_allclose(
            np.asarray(dequantize_jnp(expert_slice(st, e))), dense[e],
            rtol=1e-6, atol=1e-6)


# ---------------------------------------------------------------------------
# Offload + EP through the BatchEngine (continuous batching)
# ---------------------------------------------------------------------------

def _run_batch(eng, prompts, n=8):
    import asyncio

    from blazr_tpu.config import GenerationConfig

    async def main():
        task = asyncio.create_task(eng.run())
        handles = [eng.submit(list(p),
                              GenerationConfig(max_tokens=n, temperature=0.0))
                   for p in prompts]

        async def collect(h):
            return [t.token_id async for t in h.tokens()]

        res = await asyncio.gather(*[
            asyncio.wait_for(collect(h), timeout=300) for h in handles])
        eng.stop()
        await task
        return res

    return asyncio.run(main())


def _batch_engine(mixtral_dir, **overrides):
    from blazr_tpu.engine.batch_engine import BatchEngine

    ex = _executor(mixtral_dir, **overrides)
    return BatchEngine(ex.model, ex.tokenizer, ex.app_cfg)


def test_batch_engine_offload_parity(mixtral_dir):
    """Continuous batching over offload-transformed params (resident
    stacks + host cold compute) matches the plain engine; the engine's
    step loop drives the rebalance manager."""
    prompts = [[7, 21, 42], [1, 2, 3, 4]]
    ref = _run_batch(_batch_engine(mixtral_dir), prompts)
    eng = _batch_engine(mixtral_dir, moe_offload="hybrid",
                        moe_device_experts=2, moe_rebalance_interval=3)
    rt = getattr(eng.model, "moe_offload_rt", None)
    assert rt is not None
    out = _run_batch(eng, prompts)
    assert out == ref
    assert rt.manager.tracker.steps > 0


def test_batch_engine_ep_parity(mixtral_dir):
    prompts = [[7, 21, 42], [9, 9, 9]]
    ref = _run_batch(_batch_engine(mixtral_dir), prompts)
    eng = _batch_engine(mixtral_dir, expert_parallel_size=2)
    assert eng.mesh is not None and eng.mesh.shape["ep"] == 2
    out = _run_batch(eng, prompts)
    assert out == ref
