"""EP all-to-all MoE + ring attention tests on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from blazr_tpu.config import MoeConfig
from blazr_tpu.models.moe import moe_ffn
from blazr_tpu.parallel import MeshConfig, make_mesh
from blazr_tpu.parallel.ep import make_dispatch, moe_ffn_ep, shard_moe_params
from blazr_tpu.parallel.ring_attention import (
    reference_causal_attention,
    ring_attention,
)


def _moe_params(rng, e=8, h=32, inter=64):
    w = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32) * 0.1)
    return {
        "router": w(h, e),
        "correction_bias": None,
        "experts_gate": w(e, h, inter),
        "experts_up": w(e, h, inter),
        "experts_down": w(e, inter, h),
    }


def test_dispatch_shapes_and_weights(rng):
    idx = jnp.asarray([[0, 1], [1, 2], [1, 0]])
    w = jnp.asarray([[0.6, 0.4], [0.9, 0.1], [0.5, 0.5]])
    dispatch, combine, dropped = make_dispatch(idx, w, num_experts=4,
                                               capacity=2)
    assert dispatch.shape == (3, 4, 2)
    # expert 1 got tokens 0,1,2 → capacity 2 keeps tokens 0 and 1
    assert float(dispatch[:, 1].sum()) == 2.0
    assert int(dropped) == 1
    # combine weights carried through
    assert float(combine[0, 0].sum()) == pytest.approx(0.6)


def test_ep_matches_dense_single_device(rng):
    moe = MoeConfig(num_experts=8, experts_per_tok=2, norm_topk_prob=True)
    p = _moe_params(rng)
    x = jnp.asarray(rng.standard_normal((2, 6, 32)).astype(np.float32))
    dense = moe_ffn(x, p, moe)
    # ample capacity → no drops → exact match
    ep = moe_ffn_ep(x, p, moe, capacity=16)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)


def test_ep_sharded_matches_dense(rng):
    moe = MoeConfig(num_experts=8, experts_per_tok=2, norm_topk_prob=True)
    p = _moe_params(rng)
    x = jnp.asarray(rng.standard_normal((2, 6, 32)).astype(np.float32))
    dense = moe_ffn(x, p, moe)

    mesh = make_mesh(MeshConfig(ep=8))
    ps = shard_moe_params(p, mesh)
    with jax.set_mesh(mesh):
        f = jax.jit(lambda x, ps: moe_ffn_ep(x, ps, moe, capacity=16))
        ep = f(x, ps)
    np.testing.assert_allclose(np.asarray(ep), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)
    # expert weights really are sharded over 8 devices
    assert len(ps["experts_gate"].sharding.device_set) == 8


def test_ep_capacity_drops_overflow(rng):
    """All tokens routed to one expert: capacity must drop the overflow."""
    moe = MoeConfig(num_experts=4, experts_per_tok=1)
    p = _moe_params(rng, e=4)
    # Router forced: correction bias sends every token to expert 2
    p["router"] = jnp.zeros((32, 4))
    p["correction_bias"] = jnp.asarray([0.0, 0.0, 100.0, 0.0])
    x = jnp.asarray(rng.standard_normal((1, 8, 32)).astype(np.float32))
    full = moe_ffn_ep(x, p, moe, capacity=8)
    dropped = moe_ffn_ep(x, p, moe, capacity=4)
    # First 4 tokens identical; later tokens zero contribution (dropped)
    np.testing.assert_allclose(np.asarray(full)[0, :4],
                               np.asarray(dropped)[0, :4], rtol=1e-5, atol=1e-5)
    assert np.allclose(np.asarray(dropped)[0, 4:], 0.0, atol=1e-6)


# ---------------------------------------------------------------------------
# ring attention
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sp", [2, 4, 8])
def test_ring_attention_matches_dense(sp, rng):
    mesh = make_mesh(MeshConfig(tp=sp))
    # reuse the tp axis as the ring axis by name
    import numpy as _np
    from jax.sharding import Mesh

    mesh = Mesh(_np.array(jax.devices()[:sp]).reshape(sp), axis_names=("sp",))

    b, s, h, d = 2, 32, 4, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))

    ref = reference_causal_attention(q, k, v)
    got = ring_attention(q, k, v, mesh, axis_name="sp")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_jits_under_mesh(rng):
    import numpy as _np
    from jax.sharding import Mesh

    mesh = Mesh(_np.array(jax.devices()[:4]).reshape(4), axis_names=("sp",))
    b, s, h, d = 1, 16, 2, 8
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    f = jax.jit(lambda q: ring_attention(q, q, q, mesh))
    out = f(q)
    assert out.shape == q.shape
    ref = reference_causal_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ep_adversarial_imbalance(rng):
    """Hot-expert workload (VERDICT r2 #8): with EVERY token routed to one
    expert, ample capacity still matches dense exactly; tight capacity
    drops the overflow with documented semantics (first-arrival kept,
    dropped tokens contribute zero) and surfaces the count."""
    from blazr_tpu.parallel import ep as ep_mod

    e, h, inter, tokens = 8, 32, 64, 24
    moe = MoeConfig(num_experts=e, experts_per_tok=1, norm_topk_prob=True,
                    ep_count_drops=True)
    p = _moe_params(rng, e=e, h=h, inter=inter)
    # Router forced input-independently: zero logits + a huge selection
    # bias on expert 0 (a weight pattern alone can flip sign with x).
    bias = np.zeros((e,), dtype=np.float32)
    bias[0] = 100.0
    p = dict(p, router=jnp.zeros((h, e)),
             correction_bias=jnp.asarray(bias))
    x = jnp.asarray(rng.standard_normal((1, tokens, h)).astype(np.float32))

    dense = moe_ffn(x, p, moe)

    # Ample capacity: exact parity even at 100% imbalance.
    ep_mod.DROPPED_TOKENS["count"] = 0
    full = moe_ffn_ep(x, p, moe, capacity=tokens)
    np.testing.assert_allclose(np.asarray(full), np.asarray(dense),
                               rtol=2e-5, atol=2e-5)
    assert ep_mod.DROPPED_TOKENS["count"] == 0

    # Tight capacity: first 8 arrivals kept (cumsum order), the other 16
    # dropped — their FFN contribution is exactly zero.
    ep_mod.DROPPED_TOKENS["count"] = 0
    cap = 8
    tight = moe_ffn_ep(x, p, moe, capacity=cap)
    jax.block_until_ready(tight)
    got, want = np.asarray(tight)[0], np.asarray(dense)[0]
    np.testing.assert_allclose(got[:cap], want[:cap], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(got[cap:], 0.0, atol=1e-6)
    assert ep_mod.DROPPED_TOKENS["count"] == tokens - cap

    # Default capacity_factor sizing also drops under this workload and
    # reports it (the engine's /metrics gauge reads the same counter).
    ep_mod.DROPPED_TOKENS["count"] = 0
    auto = moe_ffn_ep(x, p, moe)
    jax.block_until_ready(auto)
    assert ep_mod.DROPPED_TOKENS["count"] > 0
    ep_mod.DROPPED_TOKENS["count"] = 0


@pytest.mark.parametrize("window", [1, 5, 8, 17, 31])
def test_ring_attention_sliding_window_matches_dense(window, rng):
    """Window-aware ring (VERDICT r3 #3): per-element global-position
    masking + a static hop bound must reproduce dense windowed causal
    attention for windows smaller than / spanning / larger than a shard."""
    import numpy as _np
    from jax.sharding import Mesh

    mesh = Mesh(_np.array(jax.devices()[:4]).reshape(4), axis_names=("sp",))
    b, s, h, d = 2, 32, 4, 16
    q = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal((b, s, h, d)).astype(np.float32))

    ref = reference_causal_attention(q, k, v, sliding_window=window)
    got = ring_attention(q, k, v, mesh, axis_name="sp",
                         sliding_window=window)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_ring_hops_bound():
    """The hop count drops with the window: skipped hops are skipped
    ppermutes (less ICI traffic), not just masked compute."""
    from blazr_tpu.parallel.ring_attention import ring_hops

    assert ring_hops(8, 4096, None) == 8
    assert ring_hops(8, 4096, 4096) == 2       # window spans 2 blocks max
    assert ring_hops(8, 512, 4096) == 8        # window covers the ring
    assert ring_hops(8, 1024, 4096) == 5
    assert ring_hops(8, 1024, 1) == 1          # self-block only
    assert ring_hops(4, 8, 17) == 3
