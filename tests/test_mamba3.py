"""Mamba3 SSM variant: rotational (complex) state update, trapezoidal
discretization, MIMO rank, conv gating (SURVEY §2.9 SsmConfig
{variant, complex_rope, mimo_rank, use_conv}; reference config surface
src/model/config.rs:51-57, 398-414 — the recurrence semantics live in the
unmounted boostr crate, so these tests assert SELF-consistency: the
chunked/parallel prefill path, the one-token recurrent decode path, and
the continuous-batching engine must agree token-for-token)."""

import asyncio
import json

import numpy as np
import pytest

import jax.numpy as jnp

from blazr_tpu.config import AppConfig, GenerationConfig
from blazr_tpu.engine.batch_engine import BatchEngine
from blazr_tpu.formats import write_safetensors
from blazr_tpu.loader import load_model
from tests_helpers import ByteTok

H = 64           # hidden
INNER = 128      # expand * hidden
NH, HD, N, G = 8, 16, 16, 2
G_STATE = G * N


def _write_mamba3(tmp_path, rng, mimo_rank=0, use_conv=False,
                  complex_rope=True, with_lam=True, with_omega=True):
    r_m = max(mimo_rank, 1)
    x_w, b_w, c_w = INNER * r_m, G_STATE * r_m, G_STATE
    conv_dim = x_w + b_w + c_w
    d_inproj = INNER + x_w + b_w + c_w + NH

    def w(*shape, scale=0.05):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    weights = {
        "backbone.embeddings.weight": w(256, H),
        "backbone.norm_f.weight": np.ones(H, np.float32),
        "lm_head.weight": w(256, H),
    }
    for i in range(2):
        p = f"backbone.layers.{i}."
        weights.update({
            p + "norm.weight": np.ones(H, np.float32),
            p + "mixer.in_proj.weight": w(d_inproj, H),
            p + "mixer.A_log": np.log(np.linspace(1, 4, NH)).astype(np.float32),
            p + "mixer.D": np.ones(NH, np.float32),
            p + "mixer.dt_bias": w(NH, scale=0.1),
            p + "mixer.norm.weight": np.ones(INNER, np.float32),
            p + "mixer.out_proj.weight": w(H, INNER),
        })
        if use_conv:
            weights[p + "mixer.conv1d.weight"] = w(conv_dim, 1, 4)
            weights[p + "mixer.conv1d.bias"] = w(conv_dim, scale=0.01)
        if with_lam:
            weights[p + "mixer.lam"] = w(NH, scale=1.0)
        if with_omega:
            weights[p + "mixer.omega"] = np.abs(w(NH, N // 2, scale=1.0)) + 0.1
    write_safetensors(tmp_path / "model.safetensors", weights)
    cfg = {
        "model_type": "mamba3",
        "vocab_size": 256, "hidden_size": H, "num_hidden_layers": 2,
        "state_size": N, "expand": 2, "conv_kernel": 4, "n_groups": G,
        "num_heads": NH, "head_dim": HD,
        "mamba3_complex_rope": complex_rope,
        "mamba3_mimo_rank": mimo_rank,
        "mamba3_use_conv": use_conv,
    }
    (tmp_path / "config.json").write_text(json.dumps(cfg))


def _load(tmp_path_factory, rng_seed, **kw):
    path = tmp_path_factory.mktemp("mamba3")
    _write_mamba3(path, np.random.default_rng(rng_seed), **kw)
    model, app_cfg = load_model(path, dtype="f32")
    return model, app_cfg


@pytest.fixture(scope="module")
def m3_default(tmp_path_factory):
    return _load(tmp_path_factory, 0)


def test_detection(m3_default):
    model, app_cfg = m3_default
    ssm = app_cfg.model.ssm
    assert ssm is not None and ssm.variant == "mamba3"
    assert ssm.complex_rope is True and ssm.use_conv is False
    assert model.needs_ssm_state and not model.needs_kv_cache


def test_state_shapes(m3_default):
    model, _ = m3_default
    state = model.init_cache(2, 32)
    # no conv window (use_conv off) + ONE prev-(x|B) carry column
    assert state.conv.shape == (2, 2, INNER + 2 * G_STATE, 1)
    assert state.ssm.shape == (2, 2, NH, HD, N)


@pytest.mark.parametrize("kw", [
    dict(),                                               # rot + trapezoid
    dict(use_conv=True),                                  # + causal conv
    dict(mimo_rank=2),                                    # MIMO rank 2
    dict(complex_rope=False, with_omega=False),           # plain trapezoid
    dict(with_lam=False),                                 # Euler (no trapezoid)
    dict(mimo_rank=2, use_conv=True, with_lam=True),      # everything on
], ids=["rot+trap", "conv", "mimo2", "no-rot", "no-lam", "all"])
def test_decode_matches_prefill(tmp_path_factory, kw):
    """One-call prefill must equal chunk + token-by-token decode: exercises
    the trapezoid prev-token carry, the rotation frame carry, and the conv
    window across call boundaries."""
    model, _ = _load(tmp_path_factory, 3, **kw)
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 256, (2, 12)).astype(np.int32)
    pos = np.broadcast_to(np.arange(12, dtype=np.int32), (2, 12))

    full, _ = model.forward(jnp.asarray(tokens), model.init_cache(2, 32),
                            jnp.asarray(pos))

    state = model.init_cache(2, 32)
    out, state = model.forward(jnp.asarray(tokens[:, :7]), state,
                               jnp.asarray(pos[:, :7]))
    pieces = [np.asarray(out)]
    for t in range(7, 12):
        out, state = model.forward(jnp.asarray(tokens[:, t:t + 1]), state,
                                   jnp.asarray(pos[:, t:t + 1]))
        pieces.append(np.asarray(out))
    inc = np.concatenate(pieces, axis=1)
    np.testing.assert_allclose(inc, np.asarray(full), rtol=2e-4, atol=2e-4)


def test_chunked_matches_associative(tmp_path_factory, monkeypatch):
    """Forcing the SSD chunked path (T > _CHUNK) must reproduce the direct
    associative scan, rotation and trapezoid included."""
    from blazr_tpu.models import mamba2 as m

    model, _ = _load(tmp_path_factory, 5, mimo_rank=2)
    rng = np.random.default_rng(2)
    tokens = rng.integers(0, 256, (1, 24)).astype(np.int32)
    pos = np.arange(24, dtype=np.int32)[None, :]

    ref, sref = model.forward(jnp.asarray(tokens), model.init_cache(1, 32),
                              jnp.asarray(pos))
    monkeypatch.setattr(m, "_CHUNK", 8)
    chk, schk = model.forward(jnp.asarray(tokens), model.init_cache(1, 32),
                              jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(chk), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(schk.ssm), np.asarray(sref.ssm),
                               rtol=2e-4, atol=2e-4)


def test_features_change_output(tmp_path_factory):
    """lam / omega / mimo must all be LIVE paths (same seed, different
    feature set ⇒ different logits)."""
    rng = np.random.default_rng(4)
    tokens = rng.integers(0, 256, (1, 8)).astype(np.int32)
    pos = np.arange(8, dtype=np.int32)[None, :]

    def logits(**kw):
        model, _ = _load(tmp_path_factory, 7, **kw)
        out, _ = model.forward(jnp.asarray(tokens), model.init_cache(1, 16),
                               jnp.asarray(pos))
        return np.asarray(out)

    base = logits()
    assert not np.allclose(base, logits(with_lam=False), atol=1e-6)
    assert not np.allclose(base, logits(complex_rope=False, with_omega=False),
                           atol=1e-6)


def test_batch_engine_serves_mamba3(m3_default):
    """Continuous batching (SSM state slots) serves mamba3 with the same
    tokens as direct greedy decode."""
    model, _ = m3_default
    rng = np.random.default_rng(6)
    prompts = [[int(t) for t in rng.integers(1, 250, 8)] for _ in range(3)]

    # direct greedy reference
    def direct(p):
        state = model.init_cache(1, 64)
        toks = jnp.asarray([p], dtype=jnp.int32)
        pos = jnp.asarray([list(range(len(p)))], dtype=jnp.int32)
        logits, state = model.forward(toks, state, pos)
        out = [int(np.asarray(logits)[0, -1].argmax())]
        for step in range(4):
            logits, state = model.forward(
                jnp.asarray([[out[-1]]], dtype=jnp.int32), state,
                jnp.asarray([[len(p) + step]], dtype=jnp.int32))
            out.append(int(np.asarray(logits)[0, -1].argmax()))
        return out[:5]

    refs = [direct(p) for p in prompts]

    app = AppConfig(model=model.cfg)
    app.inference.max_seq_len = 64
    app.inference.max_batch_size = 4

    async def main():
        eng = BatchEngine(model, ByteTok(), app)
        task = asyncio.create_task(eng.run())

        async def collect(h):
            out = []
            async for tok in h.tokens():
                out.append(tok.token_id)
            return out

        hs = [eng.submit(p, GenerationConfig(max_tokens=5, temperature=0.0,
                                             repeat_penalty=1.0))
              for p in prompts]
        res = await asyncio.gather(*[
            asyncio.wait_for(collect(h), timeout=300) for h in hs])
        eng.stop()
        await task
        return res

    got = asyncio.run(main())
    assert got == refs
