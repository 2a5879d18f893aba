"""Mamba2 golden parity vs torch/transformers + SSM-state decode tests
(BASELINE model family: Mamba2; SURVEY §2.9 Mamba2 selective scan)."""

import numpy as np
import pytest

import jax.numpy as jnp

from blazr_tpu.loader import load_model

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    from transformers import Mamba2Config, Mamba2ForCausalLM

    torch.manual_seed(0)
    cfg = Mamba2Config(
        vocab_size=256,
        hidden_size=64,
        state_size=16,
        num_hidden_layers=2,
        expand=2,
        conv_kernel=4,
        n_groups=2,
        num_heads=8,
        head_dim=16,
        chunk_size=8,
        tie_word_embeddings=False,
        rescale_prenorm_residual=False,
        use_conv_bias=True,
        use_bias=False,
    )
    model = Mamba2ForCausalLM(cfg)
    model.eval()
    path = tmp_path_factory.mktemp("mamba2")
    model.save_pretrained(path, safe_serialization=True)
    return path, model


def test_config_detection(hf_checkpoint):
    path, _ = hf_checkpoint
    model, app_cfg = load_model(path, dtype="f32")
    cfg = app_cfg.model
    assert cfg.ssm is not None
    assert cfg.ssm.state_size == 16
    assert cfg.ssm.num_heads == 8
    assert cfg.ssm.n_groups == 2
    assert model.needs_ssm_state and not model.needs_kv_cache


def test_forward_matches_transformers(hf_checkpoint):
    path, hf = hf_checkpoint
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, (2, 10)).astype(np.int64)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens)).logits.numpy()

    model, _ = load_model(path, dtype="f32")
    state = model.init_cache(2, 0)
    pos = np.broadcast_to(np.arange(10, dtype=np.int32), (2, 10))
    logits, _ = model.forward(jnp.asarray(tokens.astype(np.int32)), state,
                              jnp.asarray(pos))
    got = np.asarray(logits)
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=5e-4, atol=5e-4)


def test_incremental_decode_matches_full(hf_checkpoint):
    """O(1)-state decode: prefill 6 + 4 single-token steps == full forward."""
    path, _ = hf_checkpoint
    model, _ = load_model(path, dtype="f32")
    rng = np.random.default_rng(1)
    tokens = rng.integers(0, 256, (1, 10)).astype(np.int32)

    state = model.init_cache(1, 0)
    pos = np.arange(10, dtype=np.int32)[None, :]
    full, _ = model.forward(jnp.asarray(tokens), state, jnp.asarray(pos))

    state = model.init_cache(1, 0)
    out1, state = model.forward(jnp.asarray(tokens[:, :6]), state,
                                jnp.asarray(pos[:, :6]))
    pieces = [np.asarray(out1)]
    for t in range(6, 10):
        out, state = model.forward(jnp.asarray(tokens[:, t:t+1]), state,
                                   jnp.asarray(pos[:, t:t+1]))
        pieces.append(np.asarray(out))
    inc = np.concatenate(pieces, axis=1)
    np.testing.assert_allclose(inc, np.asarray(full), rtol=2e-3, atol=2e-3)


def test_greedy_decode_matches_transformers(hf_checkpoint):
    path, hf = hf_checkpoint
    prompt = np.array([[3, 17, 42, 7]], dtype=np.int64)
    with torch.no_grad():
        ref = hf.generate(torch.from_numpy(prompt), max_new_tokens=6,
                          do_sample=False).numpy()[0, 4:]

    model, _ = load_model(path, dtype="f32")
    state = model.init_cache(1, 0)
    pos = np.arange(4, dtype=np.int32)[None, :]
    logits, state = model.forward(jnp.asarray(prompt.astype(np.int32)), state,
                                  jnp.asarray(pos))
    toks = []
    cur = int(np.asarray(logits)[0, -1].argmax())
    for step in range(6):
        toks.append(cur)
        if step == 5:
            break
        logits, state = model.forward(
            jnp.asarray([[cur]], dtype=jnp.int32), state,
            jnp.asarray([[4 + step]], dtype=jnp.int32))
        cur = int(np.asarray(logits)[0, -1].argmax())
    np.testing.assert_array_equal(np.array(toks), ref)


def test_chunked_scan_matches_associative(rng):
    """The SSD chunked scan (prefill path, T>128) must match the direct
    associative scan at float32 tolerance, including initial-state carry
    and non-multiple chunk lengths."""
    import jax
    import jax.numpy as jnp

    from blazr_tpu.models import mamba2 as m

    B, T, H, HD, N = 2, 200, 3, 4, 8
    xh = jnp.asarray(rng.standard_normal((B, T, H, HD)), dtype=jnp.float32)
    bh = jnp.asarray(rng.standard_normal((B, T, H, N)), dtype=jnp.float32)
    ch = jnp.asarray(rng.standard_normal((B, T, H, N)), dtype=jnp.float32)
    dt = jnp.asarray(rng.uniform(0.01, 0.5, (B, T, H)), dtype=jnp.float32)
    a = jnp.asarray(-rng.uniform(0.5, 2.0, (H,)), dtype=jnp.float32)
    s0 = jnp.asarray(rng.standard_normal((B, H, HD, N)), dtype=jnp.float32)

    # Generalized scan signature: rank axis R=1, dt folded into the B
    # side, per-step log-decay instead of (dt, a).
    ldec = dt * a[None, None, :]
    bw = (bh * dt[..., None])[:, :, :, None, :]
    xr = xh[:, :, :, None, :]
    y_ref, s_ref = m._scan_associative(xr, bw, ch, ldec, s0)
    y_chk, s_chk = m._scan_chunked(xr, bw, ch, ldec, s0)
    np.testing.assert_allclose(np.asarray(y_chk), np.asarray(y_ref),
                               atol=2e-4, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(s_chk), np.asarray(s_ref),
                               atol=2e-4, rtol=2e-4)


def test_long_prefill_chunked_matches_transformers(hf_checkpoint):
    """T=160 prefill exercises the chunked SSD path; logits must still
    match the torch reference."""
    path, hf = hf_checkpoint
    model, _ = load_model(path, dtype="f32")
    rng = np.random.default_rng(9)
    ids = rng.integers(0, 255, size=(1, 160))
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    state = model.init_cache(1, 256)
    pos = np.arange(160, dtype=np.int32)[None, :]
    logits, _ = model.forward(jnp.asarray(ids, dtype=jnp.int32), state,
                              jnp.asarray(pos))
    np.testing.assert_allclose(np.asarray(logits), ref, atol=2e-3, rtol=2e-3)
