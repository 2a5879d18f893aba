"""Pallas paged-attention kernel golden tests (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blazr_tpu.attention.paged_attention import (
    paged_attention_decode,
    paged_attention_reference,
)
from blazr_tpu.kvcache.paged import PAD_BLOCK, pad_block_table


def _setup(rng, b=2, h_q=8, h_kv=2, d=128, nb=16, bs=8, mb=6):
    kc = jnp.asarray(rng.standard_normal((nb * bs + 1, h_kv, d)).astype(np.float32))
    vc = jnp.asarray(rng.standard_normal((nb * bs + 1, h_kv, d)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((b, h_q, d)).astype(np.float32))
    tables = np.stack([
        pad_block_table([3, 7, 1], mb),
        pad_block_table([5, 2, 9, 11], mb),
    ])
    seq_lens = jnp.asarray(np.array([19, 26], dtype=np.int32))
    return q, kc, vc, jnp.asarray(tables), seq_lens, bs, nb


def test_kernel_matches_reference(rng):
    q, kc, vc, bt, sl, bs, nb = _setup(rng)
    ref = paged_attention_reference(q, kc, vc, bt, sl, block_size=bs)
    got = paged_attention_decode(q, kc, vc, bt, sl, block_size=bs,
                                 num_blocks=nb, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_single_block_seq(rng):
    q, kc, vc, _, _, bs, nb = _setup(rng, b=2)
    bt = jnp.asarray(np.stack([pad_block_table([4], 6),
                               pad_block_table([2], 6)]))
    sl = jnp.asarray(np.array([1, 8], dtype=np.int32))
    ref = paged_attention_reference(q, kc, vc, bt, sl, block_size=bs)
    got = paged_attention_decode(q, kc, vc, bt, sl, block_size=bs,
                                 num_blocks=nb, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_gqa_grouping(rng):
    """h_q=8 over h_kv=4 (2 heads per group)."""
    q, kc, vc, bt, sl, bs, nb = _setup(rng, h_q=8, h_kv=4)
    ref = paged_attention_reference(q, kc, vc, bt, sl, block_size=bs)
    got = paged_attention_decode(q, kc, vc, bt, sl, block_size=bs,
                                 num_blocks=nb, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_sliding_window(rng):
    """Window lower bound masks keys below seq_len - W; the grid offset
    must still cover the straddled blocks exactly."""
    q, kc, vc, bt, sl, bs, nb = _setup(rng)
    for w in (8, 12, 16, 64):   # shorter and longer than both seqs
        ref = paged_attention_reference(q, kc, vc, bt, sl, block_size=bs,
                                        sliding_window=w)
        got = paged_attention_decode(q, kc, vc, bt, sl, block_size=bs,
                                     num_blocks=nb, interpret=True,
                                     sliding_window=w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5, err_msg=f"w={w}")


def test_kernel_logit_softcap(rng):
    q, kc, vc, bt, sl, bs, nb = _setup(rng)
    ref = paged_attention_reference(q, kc, vc, bt, sl, block_size=bs,
                                    logit_softcap=30.0)
    got = paged_attention_decode(q, kc, vc, bt, sl, block_size=bs,
                                 num_blocks=nb, interpret=True,
                                 logit_softcap=30.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_alibi(rng):
    from blazr_tpu.models.layers import alibi_slopes

    q, kc, vc, bt, sl, bs, nb = _setup(rng)
    slopes = np.asarray(alibi_slopes(q.shape[1])) * q.shape[2] ** -0.5
    ref = paged_attention_reference(q, kc, vc, bt, sl, block_size=bs,
                                    alibi=slopes)
    got = paged_attention_decode(q, kc, vc, bt, sl, block_size=bs,
                                 num_blocks=nb, interpret=True,
                                 alibi=slopes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_kernel_window_softcap_combined(rng):
    q, kc, vc, bt, sl, bs, nb = _setup(rng)
    ref = paged_attention_reference(q, kc, vc, bt, sl, block_size=bs,
                                    sliding_window=10, logit_softcap=20.0)
    got = paged_attention_decode(q, kc, vc, bt, sl, block_size=bs,
                                 num_blocks=nb, interpret=True,
                                 sliding_window=10, logit_softcap=20.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("fan", [1, 2, 3, 4, 6])
def test_kernel_fan_parity(rng, fan):
    """fan>1 streams several table slots per grid step (amortizing the
    per-grid-step Mosaic overhead that binds serving decode: B=64 x MB=8
    was 512 steps of ~20-30 us fixed cost). Every fan must be bit-exact
    vs fan=1, including non-divisible grids (mb=6, fan=4 -> pad slot)."""
    q, kc, vc, bt, sl, bs, nb = _setup(rng)
    base = paged_attention_decode(q, kc, vc, bt, sl, block_size=bs,
                                  num_blocks=nb, interpret=True, fan=1)
    got = paged_attention_decode(q, kc, vc, bt, sl, block_size=bs,
                                 num_blocks=nb, interpret=True, fan=fan)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


@pytest.mark.parametrize("fan", [2, 3])
def test_kernel_fan_windowed_quantized(rng, fan):
    """fan composes with the windowed grid offset and int8-KV scales."""
    q, kc, vc, bt, sl, bs, nb = _setup(rng)
    ks = jnp.asarray(rng.uniform(0.5, 2.0, kc.shape[:2]).astype(np.float32))
    vs = jnp.asarray(rng.uniform(0.5, 2.0, vc.shape[:2]).astype(np.float32))
    kw = dict(block_size=bs, num_blocks=nb, interpret=True,
              sliding_window=12, k_scale=ks, v_scale=vs)
    base = paged_attention_decode(q, kc, vc, bt, sl, fan=1, **kw)
    got = paged_attention_decode(q, kc, vc, bt, sl, fan=fan, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(base))


def test_default_fan_vmem_guard():
    """Fan default caps its double-buffered KV streaming window at ~4 MB
    (ADVICE r4): the 7B-GQA geometry keeps fan=4 at the default block
    size, while bs=256 degrades instead of blowing VMEM at compile."""
    from blazr_tpu.attention.paged_attention import default_fan

    # Mistral-7B GQA: h_kv=8, d=128, bf16. Per-fan double-buffered K+V =
    # 4*BS*8*128*2 bytes (bs=16: 128KB, bs=256: 2MB, bs=512: 4MB).
    assert default_fan(16, 8, 128, 2, mb_eff=32) == 4         # untouched
    assert default_fan(64, 8, 128, 2, mb_eff=8) == 4          # 0.5MB/fan
    assert default_fan(256, 8, 128, 2, mb_eff=8) == 2         # 2MB/fan
    assert default_fan(512, 8, 128, 2, mb_eff=8) == 1         # 4MB/fan
    assert default_fan(16, 8, 128, 2, mb_eff=2) == 2          # mb bound
    assert default_fan(16, 8, 128, 2, mb_eff=0) == 1          # floor
