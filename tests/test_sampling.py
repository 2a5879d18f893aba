"""Sampling chain + host samplers + grammar tests (ports the reference's
sampling/mirostat/grammar unit tiers, SURVEY §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from blazr_tpu.config import GenerationConfig
from blazr_tpu.engine.sampling import (
    PAD_TOKEN,
    SamplingParams,
    apply_min_p,
    apply_penalties,
    apply_top_k,
    apply_top_p,
    make_window,
    sample_tokens,
)
from blazr_tpu.engine.samplers import (
    MirostatState,
    apply_dry_penalty,
    apply_typical_p,
    dynamic_temperature,
    host_sample,
    needs_host_sampling,
)
from blazr_tpu.engine.grammar import (
    INVALID_STATE,
    GrammarState,
    compile_grammar_to_dfa,
)
from blazr_tpu.engine.grammar_json import JSON_GRAMMAR, json_schema_to_gbnf
from blazr_tpu.engine.types import FinishReason, is_valid_json


# ---------------------------------------------------------------------------
# device sampling chain
# ---------------------------------------------------------------------------

def _params(b=1, **over):
    cfgs = [GenerationConfig(**over) for _ in range(b)]
    return SamplingParams.from_config(cfgs)


def test_greedy_is_argmax():
    logits = jnp.asarray([[0.1, 3.0, -1.0, 2.9]])
    toks, _ = sample_tokens(logits, _params(temperature=0.0))
    assert int(toks[0]) == 1


def test_top_k_masks():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 4.0]])
    out = np.asarray(apply_top_k(logits, jnp.asarray([2])))
    assert np.isneginf(out[0, 0]) and np.isneginf(out[0, 2])
    assert out[0, 1] == 5.0 and out[0, 3] == 4.0


def test_top_k_zero_disabled():
    logits = jnp.asarray([[1.0, 5.0, 3.0, 4.0]])
    out = np.asarray(apply_top_k(logits, jnp.asarray([0])))
    assert np.isfinite(out).all()


def test_top_p_keeps_argmax():
    logits = jnp.asarray([[10.0, 0.0, 0.0, 0.0]])
    out = np.asarray(apply_top_p(logits, jnp.asarray([0.1])))
    assert out[0, 0] == 10.0
    assert np.isneginf(out[0, 1:]).all()


def test_top_p_one_disabled():
    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    out = np.asarray(apply_top_p(logits, jnp.asarray([1.0])))
    assert np.isfinite(out).all()


def test_top_p_zero_keeps_argmax():
    """top_p=0 (a common near-greedy idiom, allowed by validation) must
    keep exactly the argmax — not mask every token and emit id 0."""
    from blazr_tpu.engine.sampling import apply_top_k_top_p

    logits = jnp.asarray([[1.0, 5.0, 3.0, 0.5]])
    out = np.asarray(apply_top_p(logits, jnp.asarray([0.0])))
    assert out[0, 1] == 5.0 and np.isneginf(out[0, [0, 2, 3]]).all()
    out = np.asarray(apply_top_k_top_p(logits, jnp.asarray([0]),
                                       jnp.asarray([0.0])))
    assert out[0, 1] == 5.0 and np.isneginf(out[0, [0, 2, 3]]).all()


def test_fused_top_k_top_p_matches_split():
    """The single-sort fused path must reproduce
    apply_top_p(apply_top_k(x)) on random rows across k/p settings."""
    from blazr_tpu.engine.sampling import apply_top_k_top_p

    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(6, 64)).astype(np.float32))
    ks = jnp.asarray([0, 1, 5, 64, 16, 3])
    ps = jnp.asarray([1.0, 0.9, 0.5, 0.3, 1.0, 0.7])
    split = np.asarray(apply_top_p(apply_top_k(logits, ks), ps))
    fused = np.asarray(apply_top_k_top_p(logits, ks, ps))
    np.testing.assert_allclose(fused, split, rtol=1e-6)


def test_min_p():
    logits = jnp.log(jnp.asarray([[0.5, 0.3, 0.15, 0.05]]))
    out = np.asarray(apply_min_p(logits, jnp.asarray([0.5])))
    # threshold = 0.5 * 0.5 = 0.25 → keep 0.5, 0.3
    assert np.isfinite(out[0, :2]).all()
    assert np.isneginf(out[0, 2:]).all()


def test_repeat_penalty_discourages_seen():
    logits = jnp.asarray([[2.0, 2.0, 2.0, 2.0]])
    window = jnp.asarray([[1, PAD_TOKEN, PAD_TOKEN, PAD_TOKEN]], dtype=jnp.int32)
    out = np.asarray(apply_penalties(
        logits, window, jnp.asarray([2.0]), jnp.asarray([0.0]), jnp.asarray([0.0])
    ))
    assert out[0, 1] == pytest.approx(1.0)   # 2.0 / 2.0
    assert out[0, 0] == 2.0


def test_frequency_presence_penalties():
    logits = jnp.zeros((1, 4))
    window = jnp.asarray([[2, 2, 2, PAD_TOKEN]], dtype=jnp.int32)
    out = np.asarray(apply_penalties(
        logits, window, jnp.asarray([1.0]), jnp.asarray([0.5]), jnp.asarray([0.25])
    ))
    assert out[0, 2] == pytest.approx(-(3 * 0.5 + 0.25))
    assert out[0, 0] == 0.0


def test_seeded_sampling_deterministic():
    logits = jnp.asarray(np.random.default_rng(0).standard_normal((2, 100)), dtype=jnp.float32)
    cfgs = [GenerationConfig(temperature=1.0, seed=123),
            GenerationConfig(temperature=1.0, seed=123)]
    p1 = SamplingParams.from_config(cfgs, step=5)
    p2 = SamplingParams.from_config(cfgs, step=5)
    t1, _ = sample_tokens(logits, p1)
    t2, _ = sample_tokens(logits, p2)
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    p3 = SamplingParams.from_config(cfgs, step=6)
    t3, _ = sample_tokens(logits, p3)
    assert not np.array_equal(np.asarray(t1), np.asarray(t3))  # step varies


def test_grammar_mask_in_chain():
    logits = jnp.asarray([[5.0, 1.0, 0.0, -2.0]])
    mask = jnp.asarray([[False, True, True, True]])
    toks, _ = sample_tokens(logits, _params(temperature=0.0), grammar_mask=mask)
    assert int(toks[0]) == 1


def test_sample_tokens_jits():
    f = jax.jit(sample_tokens)
    logits = jnp.zeros((2, 50))
    toks, lp = f(logits, _params(b=2, temperature=0.7, top_k=10))
    assert toks.shape == (2,) and lp.shape == (2, 50)


def test_make_window():
    row = make_window([1, 2, 3], repeat_last_n=2, width=4)
    assert list(row) == [2, 3, PAD_TOKEN, PAD_TOKEN]


# ---------------------------------------------------------------------------
# host samplers
# ---------------------------------------------------------------------------

def test_mirostat_adapts_mu():
    rng = np.random.default_rng(0)
    st = MirostatState(tau=3.0, eta=0.2, rng=np.random.default_rng(1))
    mu0 = st.mu
    logits = rng.standard_normal(1000).astype(np.float32)
    for _ in range(20):
        t = st.sample(logits)
        assert 0 <= t < 1000
    assert st.mu != mu0


def test_dry_penalizes_repetition():
    # history ends with pattern [7, 8]; token 9 previously followed [7, 8].
    hist = [1, 7, 8, 9, 4, 7, 8]
    logits = np.zeros(16, dtype=np.float32)
    out = apply_dry_penalty(logits, hist, multiplier=1.0, base=2.0,
                            allowed_length=2)
    assert out[9] < 0.0
    assert out[5] == 0.0


def test_dry_respects_breakers():
    hist = [7, 8, 9, 99, 7, 8]       # 99 is a breaker → scan starts after it
    logits = np.zeros(16, dtype=np.float32)
    out = apply_dry_penalty(logits, hist, 1.0, 2.0, 2, breaker_ids={99})
    assert (out == 0.0).all()


def test_typical_p_filters():
    logits = np.log(np.asarray([0.5, 0.3, 0.15, 0.05], dtype=np.float32))
    out = apply_typical_p(logits, 0.5)
    assert np.isinf(out).any() and np.isfinite(out).any()
    assert apply_typical_p(logits, 1.0) is logits


def test_dynatemp_range():
    flat = np.zeros(100, dtype=np.float32)           # max entropy
    peaked = np.full(100, -50.0, dtype=np.float32)
    peaked[0] = 50.0                                  # ~zero entropy
    t_flat = dynamic_temperature(flat, 1.0, 0.5)
    t_peak = dynamic_temperature(peaked, 1.0, 0.5)
    assert t_flat == pytest.approx(1.5, abs=0.01)
    assert t_peak == pytest.approx(0.5, abs=0.05)
    assert dynamic_temperature(flat, 0.8, 0.0) == 0.8


def test_needs_host_sampling():
    assert not needs_host_sampling(GenerationConfig())
    assert needs_host_sampling(GenerationConfig(mirostat=2))
    assert needs_host_sampling(GenerationConfig(dry_multiplier=0.8))
    assert needs_host_sampling(GenerationConfig(typical_p=0.9))
    assert needs_host_sampling(GenerationConfig(dynatemp_range=0.3))


def test_host_sample_greedy():
    logits = np.asarray([0.0, 5.0, 1.0], dtype=np.float32)
    cfg = GenerationConfig(temperature=0.0, typical_p=0.9)
    assert host_sample(logits, cfg, []) == 1


# ---------------------------------------------------------------------------
# grammar (ports reference grammar.rs:279-313 tests)
# ---------------------------------------------------------------------------

def test_grammar_literal_alternation():
    dfa = compile_grammar_to_dfa('root ::= "yes" | "no"')
    s = dfa.start_state
    assert dfa.advance_bytes(s, b"yes") != INVALID_STATE
    assert dfa.is_accepting(dfa.advance_bytes(s, b"yes"))
    assert dfa.is_accepting(dfa.advance_bytes(s, b"no"))
    assert dfa.advance_bytes(s, b"maybe") == INVALID_STATE
    assert not dfa.is_accepting(dfa.advance_bytes(s, b"ye"))


def test_grammar_char_class_repeat():
    dfa = compile_grammar_to_dfa("root ::= [a-z]+ [0-9]{2}")
    assert dfa.is_accepting(dfa.advance_bytes(0, b"abc42"))
    assert not dfa.is_accepting(dfa.advance_bytes(0, b"abc4"))
    assert dfa.advance_bytes(0, b"4") == INVALID_STATE


def test_grammar_rule_refs():
    src = '''
root ::= greeting " " name
greeting ::= "hello" | "hi"
name ::= [A-Z] [a-z]*
'''
    dfa = compile_grammar_to_dfa(src)
    assert dfa.is_accepting(dfa.advance_bytes(0, b"hello World"))
    assert dfa.is_accepting(dfa.advance_bytes(0, b"hi X"))
    assert dfa.advance_bytes(0, b"hey") == INVALID_STATE


def test_grammar_token_mask():
    dfa = compile_grammar_to_dfa('root ::= "ab" | "cd"')
    vocab = [b"a", b"b", b"c", b"x", b"ab", b"cd", b"<eos>"]
    st = GrammarState(dfa, vocab, eos_token_id=6)
    m = st.mask()
    assert list(m) == [True, False, True, False, True, True, False]
    assert st.accept_token(0)          # "a"
    m2 = st.mask()
    assert m2[1] and not m2[0]         # now only "b" continues
    assert st.accept_token(1)
    assert st.is_complete
    assert st.mask()[6]                # EOS allowed at accept state


def test_json_grammar_accepts_json():
    dfa = compile_grammar_to_dfa(JSON_GRAMMAR)
    good = b'{"a": [1, 2.5, true, null], "b": "x"}'
    assert dfa.is_accepting(dfa.advance_bytes(0, good))
    assert dfa.is_accepting(dfa.advance_bytes(0, b"[1,2]"))
    assert not dfa.is_accepting(dfa.advance_bytes(0, b'{"a":'))
    assert dfa.advance_bytes(0, b"{]") == INVALID_STATE


def test_json_schema_to_gbnf():
    schema = {
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"}},
        },
        "required": ["name", "age"],
    }
    gbnf = json_schema_to_gbnf(schema)
    dfa = compile_grammar_to_dfa(gbnf)
    ok = b'{"name": "bob", "age": 42, "tags": ["x", "y"]}'
    assert dfa.is_accepting(dfa.advance_bytes(0, ok))
    assert not dfa.is_accepting(dfa.advance_bytes(0, b'{"name": 3'))


def test_schema_enum():
    gbnf = json_schema_to_gbnf({"enum": ["red", "green"]})
    dfa = compile_grammar_to_dfa(gbnf)
    assert dfa.is_accepting(dfa.advance_bytes(0, b'"red"'))
    assert not dfa.is_accepting(dfa.advance_bytes(0, b'"blue"'))


# ---------------------------------------------------------------------------
# types
# ---------------------------------------------------------------------------

def test_finish_reason_openai_names():
    assert FinishReason.EOS.to_openai() == "stop"
    assert FinishReason.LENGTH.to_openai() == "length"
    assert FinishReason.STOP.to_openai() == "stop"
    assert FinishReason.TOOL_CALLS.to_openai() == "tool_calls"


def test_is_valid_json():
    assert is_valid_json('{"a": 1}')
    assert not is_valid_json('{"a":')


def test_apply_penalties_sparse_matches_dense():
    """The sparse gather/scatter penalty stage must match the dense
    [B, V] formulation bit-for-bit (same FP expressions per token),
    including duplicate window entries and pad slots colliding with a
    real token id 0 in the window."""
    import jax.numpy as jnp
    import numpy as np

    from blazr_tpu.engine.sampling import PAD_TOKEN, apply_penalties

    rng = np.random.default_rng(11)
    b, v, w = 5, 97, 16
    logits = jnp.asarray(rng.standard_normal((b, v)).astype(np.float32))
    win = rng.integers(0, v, (b, w)).astype(np.int32)
    win[0, :] = PAD_TOKEN                 # empty window row
    win[1, 3:] = PAD_TOKEN                # short window
    win[2, 0] = 0                         # token 0 IS in the window...
    win[2, 5:] = PAD_TOKEN                # ...alongside pad slots
    win[3, :4] = 42                       # duplicates
    rp = jnp.asarray([1.3, 1.0, 1.1, 2.0, 0.9], dtype=jnp.float32)
    fp = jnp.asarray([0.0, 0.5, 0.1, 0.0, 0.2], dtype=jnp.float32)
    pp = jnp.asarray([0.2, 0.0, 0.3, 1.0, 0.0], dtype=jnp.float32)

    got = np.asarray(apply_penalties(logits, jnp.asarray(win), rp, fp, pp))

    # dense reference (the pre-r4 formulation)
    valid = win >= 0
    safe = np.where(valid, win, 0)
    counts = np.zeros((b, v), dtype=np.float32)
    np.add.at(counts, (np.arange(b)[:, None], safe),
              valid.astype(np.float32))
    seen = counts > 0
    lg = np.asarray(logits).copy()
    rpn = np.asarray(rp)[:, None]
    pen = np.where(lg > 0, lg / rpn, lg * rpn)
    ref = np.where(seen, pen, lg)
    ref = ref - counts * np.asarray(fp)[:, None]
    ref = ref - seen.astype(np.float32) * np.asarray(pp)[:, None]

    np.testing.assert_array_equal(got, ref)
