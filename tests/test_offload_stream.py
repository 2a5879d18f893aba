"""Streaming host-offload executor: partially-resident model must match
full residency (the reference hard-errors here, offloading.rs:170-183 —
streaming is our improvement)."""

import numpy as np
import pytest


def _greedy(ex, prompt, n):
    from blazr_tpu.config.generation import GenerationConfig

    cfg = GenerationConfig(max_tokens=n, temperature=0.0)
    out = []
    for ev in ex.generate(prompt, cfg):
        if ev.token_id is not None:
            out.append(ev.token_id)
    return out


def test_streaming_matches_full(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from blazr_tpu.loader import load_model
    from fixtures import write_tiny_llama_checkpoint

    write_tiny_llama_checkpoint(tmp_path, np.random.default_rng(21))

    full, _ = load_model(tmp_path, dtype="f32")
    part, app_cfg = load_model(tmp_path, dtype="f32", device_layers=1)
    assert getattr(part, "is_streaming", False)
    assert part.num_device_layers == 1
    assert len(part.host_layers) == full.num_layers - 1
    assert app_cfg.inference.num_device_layers == 1

    prompt = [3, 17, 9, 40]
    pos = jnp.asarray(np.arange(4, dtype=np.int32)[None, :])
    toks = jnp.asarray([prompt], dtype=jnp.int32)

    lf, cf = full.forward(toks, full.init_cache(1, 32), pos)
    ls, cs = part.forward(toks, part.init_cache(1, 32), pos)
    np.testing.assert_allclose(np.asarray(ls), np.asarray(lf),
                               atol=1e-4, rtol=1e-4)

    # multi-step greedy parity (cache correctness across streamed layers)
    cur_f = int(np.asarray(lf)[0, -1].argmax())
    cur_s = int(np.asarray(ls)[0, -1].argmax())
    assert cur_f == cur_s
    for i in range(4):
        pf = jnp.asarray([[4 + i]], dtype=jnp.int32)
        lf, cf = full.forward(jnp.asarray([[cur_f]], dtype=jnp.int32), cf, pf)
        ls, cs = part.forward(jnp.asarray([[cur_s]], dtype=jnp.int32), cs, pf)
        cur_f = int(np.asarray(lf)[0, -1].argmax())
        cur_s = int(np.asarray(ls)[0, -1].argmax())
        assert cur_f == cur_s


def test_streaming_all_layers_host(tmp_path):
    """device_layers=0: everything streams; embed/head stay on device."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from blazr_tpu.loader import load_model
    from fixtures import write_tiny_llama_checkpoint

    write_tiny_llama_checkpoint(tmp_path, np.random.default_rng(22))
    part, _ = load_model(tmp_path, dtype="f32", device_layers=0)
    assert len(part.host_layers) == part.num_layers
    toks = jnp.asarray([[1, 2]], dtype=jnp.int32)
    pos = jnp.asarray([[0, 1]], dtype=jnp.int32)
    logits, _ = part.forward(toks, part.init_cache(1, 16), pos)
    assert logits.shape[-1] == part.vocab_size
    assert np.isfinite(np.asarray(logits)).all()


def test_streaming_executor_end_to_end(tmp_path):
    import jax

    jax.config.update("jax_platforms", "cpu")

    from blazr_tpu.engine.executor import Executor
    from blazr_tpu.loader import load_model
    from blazr_tpu.tokenizer import load_tokenizer
    from fixtures import write_byte_tokenizer_json, write_tiny_llama_checkpoint

    write_tiny_llama_checkpoint(tmp_path, np.random.default_rng(23))
    write_byte_tokenizer_json(tmp_path)

    tok = load_tokenizer(tmp_path)
    full_ex = Executor(load_model(tmp_path, dtype="f32")[0], tok)
    part_ex = Executor(load_model(tmp_path, dtype="f32", device_layers=1)[0],
                       tok)
    prompt = tok.encode("hi")
    assert _greedy(part_ex, prompt, 6) == _greedy(full_ex, prompt, 6)
