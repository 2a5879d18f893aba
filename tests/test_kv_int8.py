"""int8 KV cache: quality + decode-consistency tests.

Per-token-per-head absmax quantization of cache K/V (halves KV HBM
traffic at decode — a TPU-side improvement; the reference keeps KV at
f16 only). Scales fold into the attention matmuls.
"""

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _cpu():
    import jax

    jax.config.update("jax_platforms", "cpu")


def test_int8_kv_close_to_float(tmp_path, rng):
    import jax.numpy as jnp

    from blazr_tpu.loader import load_model
    from fixtures import write_tiny_llama_checkpoint

    write_tiny_llama_checkpoint(tmp_path, np.random.default_rng(41))
    model, _ = load_model(tmp_path, dtype="f32")

    prompt = rng.integers(0, 250, size=(1, 24)).astype(np.int32)
    pos = np.arange(24, dtype=np.int32)[None, :]

    cf = model.init_cache(1, 64)
    lf, cf = model.forward(jnp.asarray(prompt), cf, jnp.asarray(pos))
    cq = model.init_cache(1, 64, kv_quant=True)
    assert cq.quantized and cq.k.dtype == jnp.int8
    lq, cq = model.forward(jnp.asarray(prompt), cq, jnp.asarray(pos))

    a, b = np.asarray(lf)[0, -1], np.asarray(lq)[0, -1]
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.999, cos
    # greedy decisions agree on a clear-margin distribution
    assert a.argmax() == b.argmax()


def test_int8_kv_incremental_matches_prefill(tmp_path, rng):
    """Token-by-token decode over an int8 cache must equal one-shot
    prefill (write/read roundtrip with running scales)."""
    import jax.numpy as jnp

    from blazr_tpu.loader import load_model
    from fixtures import write_tiny_llama_checkpoint

    write_tiny_llama_checkpoint(tmp_path, np.random.default_rng(42))
    model, _ = load_model(tmp_path, dtype="f32")
    toks = rng.integers(0, 250, size=12).astype(np.int32)

    cq = model.init_cache(1, 32, kv_quant=True)
    pos = np.arange(12, dtype=np.int32)[None, :]
    full, _ = model.forward(jnp.asarray(toks[None, :]), cq, jnp.asarray(pos))

    cq2 = model.init_cache(1, 32, kv_quant=True)
    for i in range(12):
        li, cq2 = model.forward(jnp.asarray([[toks[i]]], dtype=jnp.int32),
                                cq2, jnp.asarray([[i]], dtype=jnp.int32))
    np.testing.assert_allclose(np.asarray(li)[0, -1], np.asarray(full)[0, -1],
                               atol=1e-3, rtol=1e-3)


def test_int8_kv_through_executor(tmp_path):
    """Executor honors inference.kv_cache_dtype=int8 and generates."""
    import dataclasses

    from blazr_tpu.config.generation import GenerationConfig
    from blazr_tpu.engine.executor import Executor
    from blazr_tpu.loader import load_model
    from blazr_tpu.tokenizer import load_tokenizer
    from fixtures import write_byte_tokenizer_json, write_tiny_llama_checkpoint

    write_tiny_llama_checkpoint(tmp_path, np.random.default_rng(43))
    write_byte_tokenizer_json(tmp_path)
    model, app_cfg = load_model(tmp_path, dtype="f32")
    app_cfg.inference.kv_cache_dtype = "int8"
    ex = Executor(model, load_tokenizer(tmp_path), app_cfg)
    cfg = GenerationConfig(max_tokens=6, temperature=0.0)
    out = [e.token_id for e in ex.generate(ex.tokenizer.encode("hi"), cfg)
           if e.token_id is not None]
    assert len(out) == 6


def test_int8_paged_gather_close_to_float(rng):
    """Paged fallback attention with int8 blocks vs float blocks."""
    import jax.numpy as jnp

    from blazr_tpu.kvcache.paged import (
        init_paged_cache,
        pad_block_table,
        write_paged_layer,
    )

    L, NB, BS, H, D = 1, 4, 8, 2, 16
    cf = init_paged_cache(L, NB, BS, H, D, dtype=jnp.float32)
    cq = init_paged_cache(L, NB, BS, H, D, quantized=True)
    assert cq.quantized and cq.k.dtype == jnp.int8

    T = 20
    k = jnp.asarray(rng.standard_normal((1, T, H, D)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, T, H, D)), dtype=jnp.float32)
    blocks = [0, 1, 2]
    slots = np.array([[blocks[p // BS] * BS + p % BS for p in range(T)]],
                     dtype=np.int32)
    cf = write_paged_layer(cf, 0, k, v, jnp.asarray(slots))
    cq = write_paged_layer(cq, 0, k, v, jnp.asarray(slots))

    from blazr_tpu.kvcache.paged import gather_page_scales, gather_pages

    kf, vf = gather_pages(cf, 0, jnp.asarray([pad_block_table(blocks, 4)]))
    kq, vq = gather_pages(cq, 0, jnp.asarray([pad_block_table(blocks, 4)]))
    ks, vs = gather_page_scales(cq, 0,
                                jnp.asarray([pad_block_table(blocks, 4)]))
    deq = np.asarray(kq).astype(np.float32) * np.asarray(ks)[..., None]
    np.testing.assert_allclose(deq[:, :T], np.asarray(kf)[:, :T],
                               atol=2e-2, rtol=2e-2)


def test_int8_pa_kernel_matches_reference(rng):
    """Pallas PA kernel (interpret) with int8 KV vs the float reference."""
    import jax.numpy as jnp

    from blazr_tpu.attention.paged_attention import (
        paged_attention_decode,
        paged_attention_reference,
    )
    from blazr_tpu.kvcache.paged import (
        init_paged_cache,
        pad_block_table,
        write_paged_layer,
    )

    NB, BS, HKV, HQ, D = 6, 16, 2, 4, 128
    cq = init_paged_cache(1, NB, BS, HKV, D, quantized=True)
    cf = init_paged_cache(1, NB, BS, HKV, D, dtype=jnp.float32)

    seq_lens = [37, 18]
    tables = [[0, 1, 2], [3, 4]]
    for b, (n, blocks) in enumerate(zip(seq_lens, tables)):
        k = jnp.asarray(rng.standard_normal((1, n, HKV, D)), dtype=jnp.float32)
        v = jnp.asarray(rng.standard_normal((1, n, HKV, D)), dtype=jnp.float32)
        slots = np.array([[blocks[p // BS] * BS + p % BS for p in range(n)]],
                         dtype=np.int32)
        cq = write_paged_layer(cq, 0, k, v, jnp.asarray(slots))
        cf = write_paged_layer(cf, 0, k, v, jnp.asarray(slots))

    q = jnp.asarray(rng.standard_normal((2, HQ, D)), dtype=jnp.float32)
    bt = jnp.asarray(np.stack([pad_block_table(t, 3) for t in tables]))
    sl = jnp.asarray(np.array(seq_lens, dtype=np.int32))

    ref = paged_attention_reference(q, cf.k[0], cf.v[0], bt, sl,
                                    block_size=BS)
    got = paged_attention_decode(
        q, cq.k[0], cq.v[0], bt, sl, block_size=BS, num_blocks=NB,
        interpret=True, k_scale=cq.k_scale[0], v_scale=cq.v_scale[0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=3e-2, rtol=3e-2)


# ---------------------------------------------------------------------------
# int4 KV (contiguous path)
# ---------------------------------------------------------------------------

def test_int4_kv_close_to_float(tmp_path, rng):
    import jax.numpy as jnp

    from blazr_tpu.loader import load_model
    from fixtures import write_tiny_llama_checkpoint

    write_tiny_llama_checkpoint(tmp_path, np.random.default_rng(43))
    model, _ = load_model(tmp_path, dtype="f32")

    prompt = rng.integers(0, 250, size=(1, 24)).astype(np.int32)
    pos = np.arange(24, dtype=np.int32)[None, :]

    cf = model.init_cache(1, 64)
    lf, cf = model.forward(jnp.asarray(prompt), cf, jnp.asarray(pos))
    cq = model.init_cache(1, 64, kv_quant=True, kv_dtype="int4")
    assert cq.quantized and cq.k.dtype == jnp.int4
    lq, cq = model.forward(jnp.asarray(prompt), cq, jnp.asarray(pos))

    a, b = np.asarray(lf)[0, -1], np.asarray(lq)[0, -1]
    cos = float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))
    # int4 is lossier than int8 but must stay directionally faithful
    assert cos > 0.99, cos


def test_int4_kv_through_executor(tmp_path):
    """Executor honors inference.kv_cache_dtype=int4 and generates."""
    from blazr_tpu.config.generation import GenerationConfig
    from blazr_tpu.engine.executor import Executor
    from blazr_tpu.loader import load_model
    from blazr_tpu.tokenizer import load_tokenizer
    from fixtures import write_byte_tokenizer_json, write_tiny_llama_checkpoint

    write_tiny_llama_checkpoint(tmp_path, np.random.default_rng(44))
    write_byte_tokenizer_json(tmp_path)
    model, app_cfg = load_model(tmp_path, dtype="f32")
    app_cfg.inference.kv_cache_dtype = "int4"
    ex = Executor(model, load_tokenizer(tmp_path), app_cfg)
    cfg = GenerationConfig(max_tokens=6, temperature=0.0)
    out = [e.token_id for e in ex.generate(ex.tokenizer.encode("hi"), cfg)
           if e.token_id is not None]
    assert len(out) == 6


def test_int4_cache_shards_over_mesh():
    """int4 planes + f32 scales shard like the int8 cache (TP/DP mesh)."""
    import jax.numpy as jnp

    from blazr_tpu.kvcache.contiguous import init_kv_cache
    from blazr_tpu.parallel import MeshConfig, make_mesh
    from blazr_tpu.parallel.tp import shard_cache

    mesh = make_mesh(MeshConfig(tp=4, dp=2))
    c = init_kv_cache(2, 2, 32, 4, 16, quantized=True, kv_dtype="int4")
    cs = shard_cache(c, mesh)
    assert cs.k.dtype == jnp.int4
    assert cs.k_scale is not None
