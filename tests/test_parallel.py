"""TP sharding tests on the virtual 8-device CPU mesh (the CPU-simulated
multi-device tier SURVEY §4 prescribes)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from blazr_tpu.config import GenerationConfig
from blazr_tpu.loader import load_model
from blazr_tpu.parallel import (
    MeshConfig,
    make_mesh,
    shard_cache,
    shard_params,
    validate_tp_size,
)
from fixtures import write_tiny_llama_checkpoint


@pytest.fixture(scope="module")
def tp_model(tmp_path_factory):
    rng = np.random.default_rng(5)
    path = tmp_path_factory.mktemp("tp_model")
    # hidden 64, 4 heads, 2 kv heads — tp=2 divides everything
    write_tiny_llama_checkpoint(path, rng)
    model, app_cfg = load_model(path, dtype="f32")
    return model, app_cfg


def test_make_mesh_axes():
    mesh = make_mesh(MeshConfig(tp=4, dp=2))
    assert mesh.axis_names == ("dp", "ep", "sp", "tp")
    assert mesh.shape["tp"] == 4 and mesh.shape["dp"] == 2


def test_validate_tp_size(tp_model):
    model, _ = tp_model
    validate_tp_size(model.cfg, 2)
    with pytest.raises(ValueError):
        validate_tp_size(model.cfg, 3)   # 4 heads not divisible by 3


def test_tp_forward_matches_single_device(tp_model):
    """Sharded forward over tp=2 must match the unsharded logits."""
    model, _ = tp_model
    mesh = make_mesh(MeshConfig(tp=2))
    tokens = jnp.asarray(np.random.default_rng(1).integers(0, 256, (1, 8)),
                         dtype=jnp.int32)
    pos = jnp.asarray(np.arange(8, dtype=np.int32)[None, :])

    cache0 = model.init_cache(1, 16)
    ref, _ = model.forward(tokens, cache0, pos)

    sharded_params = shard_params(model.params, mesh)
    cache1 = shard_cache(model.init_cache(1, 16), mesh)
    with jax.set_mesh(mesh):
        got, _ = model.forward_fn(sharded_params, model.cfg, tokens, cache1, pos, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_tp_sharding_layout(tp_model):
    model, _ = tp_model
    mesh = make_mesh(MeshConfig(tp=2))
    sp = shard_params(model.params, mesh)
    l0 = sp["layers"][0]
    # column-parallel: out dim sharded
    q_shard = l0["q"].sharding.spec
    assert tuple(q_shard) == (None, "tp")
    down_shard = l0["down"].sharding.spec
    assert tuple(down_shard) == ("tp", None)


def test_tp_generate_runs(tp_model):
    """Whole generate loop with sharded params (dp=1, tp=2)."""
    model, app_cfg = tp_model
    mesh = make_mesh(MeshConfig(tp=2))
    import blazr_tpu.engine.executor as ex
    from tests_helpers import ByteTok

    model.params = shard_params(model.params, mesh)
    with jax.set_mesh(mesh):
        e = ex.Executor(model, ByteTok(), app_cfg)
        toks = [t.token_id for t in e.generate([3, 5, 7],
                GenerationConfig(max_tokens=4, temperature=0.0))]
    assert len(toks) >= 1


def test_tp_forward_int8_kv(tp_model):
    """Sharded forward over an int8 KV cache (scale planes shard on the
    kv-head axis) matches the unsharded int8 run."""
    model, _ = tp_model
    mesh = make_mesh(MeshConfig(tp=2))
    tokens = jnp.asarray(np.random.default_rng(2).integers(0, 256, (1, 8)),
                         dtype=jnp.int32)
    pos = jnp.asarray(np.arange(8, dtype=np.int32)[None, :])

    ref, _ = model.forward(tokens, model.init_cache(1, 16, kv_quant=True), pos)

    sharded_params = shard_params(model.params, mesh)
    cache = shard_cache(model.init_cache(1, 16, kv_quant=True), mesh)
    assert cache.quantized
    with jax.set_mesh(mesh):
        got, out_cache = model.forward_fn(sharded_params, model.cfg, tokens,
                                          cache, pos, None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
