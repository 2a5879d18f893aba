"""Exact-PDA grammar tier: native engine vs the DFA tiers.

The PDA (engine/grammar_pda.py + native/pda.cpp) must be exact at
arbitrary nesting depth — strictly better than the depth-bounded DFA —
and must agree bit-for-bit with the DFA on grammars the DFA handles
exactly. Skipped when g++ is unavailable.
"""

import numpy as np
import pytest

pytest.importorskip("blazr_tpu.engine.grammar_pda")
from blazr_tpu.engine.grammar import (
    GrammarState,
    compile_grammar_to_dfa,
    make_grammar_state,
)
from blazr_tpu.engine.grammar_json import JSON_GRAMMAR

try:
    from blazr_tpu.engine.grammar_pda import (
        PdaGrammarState,
        compile_grammar_to_pda,
    )
    from blazr_tpu.engine import grammar_pda as gp

    gp._load()
    HAVE_NATIVE = True
except Exception:
    HAVE_NATIVE = False

needs_native = pytest.mark.skipif(not HAVE_NATIVE,
                                  reason="native pda lib unavailable")

BYTE_VOCAB = [bytes([i]) for i in range(256)] + [b""]
EOS = 256


def _pda_state(src):
    return PdaGrammarState(compile_grammar_to_pda(src), BYTE_VOCAB,
                           eos_token_id=EOS)


@needs_native
def test_deep_nesting_exact():
    """Six-deep JSON nesting — beyond the DFA's EXACT_DEPTH — stays exact."""
    st = _pda_state(JSON_GRAMMAR)
    for ch in b'[[[[[[1]]]]]]':
        assert st.mask()[ch]
        assert st.accept_token(ch)
    assert st.is_complete
    assert st.mask()[EOS]


@needs_native
def test_cross_context_closers_rejected_at_depth():
    """'[[[[{' must forbid ']' (the depth-bounded DFA admits it past its
    exact tier — the over-approximation this tier removes)."""
    st = _pda_state(JSON_GRAMMAR)
    for ch in b'[[[[{':
        assert st.accept_token(ch)
    m = st.mask()
    assert not m[ord(']')]
    assert m[ord('"')]
    assert not st.accept_token(ord(']'))


@needs_native
def test_agrees_with_exact_dfa():
    """On a grammar the DFA expands exactly, masks must be identical on
    every reachable state."""
    src = 'root ::= "yes" | "no" | [0-9]{1,3} " apples"'
    dfa = compile_grammar_to_dfa(src)
    assert dfa.exact
    lib = gp._load()
    frontier = [(GrammarState(dfa, BYTE_VOCAB, eos_token_id=EOS),
                 _pda_state(src))]
    checked = 0
    for _depth in range(7):
        nxt = []
        for da, pb in frontier[:40]:
            ma, mb = da.mask(), pb.mask()
            assert (ma == mb).all()
            checked += 1
            for t in np.where(ma[:256])[0]:
                da2 = GrammarState(dfa, BYTE_VOCAB, eos_token_id=EOS)
                da2.state = da.state
                assert da2.accept_token(int(t))
                pb2 = _pda_state(src)
                lib.pda_state_free(pb2._state)
                pb2._state = lib.pda_state_clone(pb._state)
                assert pb2.accept_token(int(t))
                nxt.append((da2, pb2))
        frontier = nxt
    assert checked > 50


@needs_native
def test_factory_picks_pda_for_deep_grammar():
    st = make_grammar_state(JSON_GRAMMAR, BYTE_VOCAB, eos_token_id=EOS)
    assert isinstance(st, PdaGrammarState)


def test_factory_picks_dfa_for_shallow_grammar():
    st = make_grammar_state('root ::= "a" | "b"', BYTE_VOCAB,
                            eos_token_id=EOS)
    assert isinstance(st, GrammarState)


@needs_native
def test_left_recursion_falls_back():
    """Left-recursive grammars overflow the PDA caps; the factory must
    hand back a usable state object regardless."""
    deep = 'root ::= item\nitem ::= item "x" | "y"\n'
    st = make_grammar_state(deep, BYTE_VOCAB, eos_token_id=EOS)
    m = st.mask()
    assert m.shape == (257,)


@needs_native
def test_repeat_bounds():
    st = _pda_state('root ::= [0-9]{2,4}')
    assert not st.mask()[EOS]
    assert st.accept_token(ord('1'))
    assert not st.is_complete
    assert st.accept_token(ord('2'))
    assert st.is_complete               # 2 digits: may stop
    assert st.mask()[ord('3')]          # or continue
    assert st.accept_token(ord('3'))
    assert st.accept_token(ord('4'))
    assert not st.mask()[ord('5')]      # 4 digits: must stop
    assert st.mask()[EOS]
