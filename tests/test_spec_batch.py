"""Batched speculative decoding (prompt-lookup drafts) in the BatchEngine.

Round-2 coverage for VERDICT item 8 tail: greedy rows verify n-gram
drafts in ONE fused [B, k+1] step; non-greedy / grammar / host-sampler
rows ride along with exact plain-step numerics. Everything must match
the plain engine token-for-token.
"""

import asyncio

import numpy as np
import pytest

from blazr_tpu.config import AppConfig, GenerationConfig
from blazr_tpu.config.inference import SpeculativeDecodingConfig
from blazr_tpu.engine.batch_engine import BatchEngine
from blazr_tpu.loader import load_model

from fixtures import write_tiny_llama_checkpoint
from tests_helpers import ByteTok


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("spec_model")
    write_tiny_llama_checkpoint(path, np.random.default_rng(23))
    return path


def _engine(ckpt, spec_k=0):
    model, _ = load_model(ckpt, dtype="f32")
    app = AppConfig(model=model.cfg)
    app.inference.max_seq_len = 96
    app.inference.max_batch_size = 4
    if spec_k:
        app.inference.speculative = SpeculativeDecodingConfig(
            num_speculative_tokens=spec_k)
    return BatchEngine(model, ByteTok(), app)


def _run(eng, jobs, timeout=300):
    """jobs: list of (prompt, GenerationConfig) → list of token lists."""
    async def main():
        task = asyncio.create_task(eng.run())
        handles = [eng.submit(list(p), c) for p, c in jobs]

        async def collect(h):
            return [t.token_id async for t in h.tokens()]

        res = await asyncio.gather(*[
            asyncio.wait_for(collect(h), timeout=timeout) for h in handles])
        eng.stop()
        await task
        return res

    return asyncio.run(main())


# A prompt with a strong repeating pattern → n-gram drafts hit.
_REPEAT = [5, 6, 7, 8, 5, 6, 7, 8, 5, 6, 7, 8, 5, 6]


def _greedy(n=12):
    return GenerationConfig(max_tokens=n, temperature=0.0,
                            repeat_penalty=1.0)


def test_spec_greedy_parity_and_acceptance(ckpt):
    jobs = [(_REPEAT, _greedy()), ([1, 2, 3, 1, 2, 3, 1, 2], _greedy())]
    ref = _run(_engine(ckpt), jobs)
    eng = _engine(ckpt, spec_k=4)
    assert eng._spec_k == 4
    out = _run(eng, jobs)
    assert out == ref
    assert eng.spec_drafted > 0


def test_spec_mixed_batch_parity(ckpt):
    """Greedy + seeded-sampled + json-grammar rows in one batch: spec
    applies to the greedy row only; the others must be bit-identical to
    the plain engine."""
    jobs = [
        (_REPEAT, _greedy()),
        ([9, 8, 7, 6], GenerationConfig(max_tokens=8, temperature=0.8,
                                        seed=7)),
        ([40, 41, 42], GenerationConfig(max_tokens=8, temperature=0.0,
                                        json_mode=True)),
    ]
    ref = _run(_engine(ckpt), jobs)
    out = _run(_engine(ckpt, spec_k=4), jobs)
    assert out == ref


def test_spec_respects_max_tokens(ckpt):
    """A draft chain must not blow past max_tokens."""
    jobs = [(_REPEAT, _greedy(n=3))]
    eng = _engine(ckpt, spec_k=6)
    out = _run(eng, jobs)
    assert len(out[0]) <= 3
    assert out == _run(_engine(ckpt), jobs)


# ---------------------------------------------------------------------------
# draft-MODEL speculation (on-device greedy chain + fused verify)
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def other_ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("spec_draft_model")
    write_tiny_llama_checkpoint(path, np.random.default_rng(99))
    return path


def _engine_draft(ckpt, draft_ckpt, spec_k=4):
    model, _ = load_model(ckpt, dtype="f32")
    draft, _ = load_model(draft_ckpt, dtype="f32")
    app = AppConfig(model=model.cfg)
    app.inference.max_seq_len = 96
    app.inference.max_batch_size = 4
    app.inference.speculative = SpeculativeDecodingConfig(
        draft_model=str(draft_ckpt), num_speculative_tokens=spec_k)
    return BatchEngine(model, ByteTok(), app, draft_model=draft)


def test_draft_model_identical_weights_full_acceptance(ckpt):
    """Draft == target ⇒ the greedy chain always matches argmax; every
    draft is accepted and output is exactly the plain engine's."""
    jobs = [(_REPEAT, _greedy()), ([10, 20, 30, 40], _greedy())]
    ref = _run(_engine(ckpt), jobs)
    eng = _engine_draft(ckpt, ckpt)
    out = _run(eng, jobs)
    assert out == ref
    assert eng.spec_drafted > 0
    assert eng.spec_accepted == eng.spec_drafted


def test_draft_model_divergent_weights_exact_output(ckpt, other_ckpt):
    """A BAD draft model (different random weights) must still produce
    the target's exact greedy output — verification is exact; drafts
    only change speed."""
    jobs = [(_REPEAT, _greedy()), ([1, 2, 3, 4, 5], _greedy(n=9))]
    ref = _run(_engine(ckpt), jobs)
    eng = _engine_draft(ckpt, other_ckpt)
    out = _run(eng, jobs)
    assert out == ref
    assert eng.spec_drafted > 0


def test_draft_model_mixed_batch_parity(ckpt, other_ckpt):
    """Sampled + grammar rows ride along every draft round untouched."""
    jobs = [
        (_REPEAT, _greedy()),
        ([9, 8, 7, 6], GenerationConfig(max_tokens=8, temperature=0.8,
                                        seed=7)),
        ([40, 41, 42], GenerationConfig(max_tokens=8, temperature=0.0,
                                        json_mode=True)),
    ]
    ref = _run(_engine(ckpt), jobs)
    out = _run(_engine_draft(ckpt, other_ckpt), jobs)
    assert out == ref


def test_draft_model_respects_max_tokens(ckpt):
    jobs = [(_REPEAT, _greedy(n=3))]
    out = _run(_engine_draft(ckpt, ckpt, spec_k=6), jobs)
    assert len(out[0]) <= 3
    assert out == _run(_engine(ckpt), jobs)


def test_draft_model_warmup(ckpt, other_ckpt):
    """warmup() compiles chain+verify buckets and leaves a working engine."""
    eng = _engine_draft(ckpt, other_ckpt)
    eng.warmup()
    out = _run(eng, [(_REPEAT, _greedy(n=5))])
    assert out == _run(_engine(ckpt), [(_REPEAT, _greedy(n=5))])


def test_spec_default_penalty_rows_stay_plain(ckpt):
    """Default GenerationConfig has repeat_penalty=1.1 → not spec-eligible;
    output must match the plain engine exactly."""
    jobs = [(_REPEAT, GenerationConfig(max_tokens=8, temperature=0.0))]
    eng = _engine(ckpt, spec_k=4)
    out = _run(eng, jobs)
    assert eng.spec_drafted == 0
    assert out == _run(_engine(ckpt), jobs)


def test_spec_logprobs_row_rides_along(ckpt):
    """A logprobs row must not force a spec-capable batch onto the plain
    path (VERDICT r3 weak #4b): the fused top-K fetch in spec_finish lets
    it ride along at position 0 while greedy rows keep drafting."""
    lp_cfg = GenerationConfig(max_tokens=8, temperature=0.0,
                              repeat_penalty=1.0, logprobs=True,
                              top_logprobs=3)
    prompt_lp = [11, 12, 13, 11, 12]

    async def run(spec_k):
        eng = _engine(ckpt, spec_k=spec_k)
        task = asyncio.create_task(eng.run())
        h_g = eng.submit(list(_REPEAT), _greedy())
        h_lp = eng.submit(list(prompt_lp),
                          GenerationConfig.from_dict(lp_cfg.to_dict()))
        toks_g = [t.token_id async for t in h_g.tokens()]
        gts = [t async for t in h_lp.tokens()]
        eng.stop()
        await task
        return eng, toks_g, gts

    eng0, ref_g, ref_gts = asyncio.run(run(0))
    eng, out_g, gts = asyncio.run(run(4))
    assert out_g == ref_g
    assert [t.token_id for t in gts] == [t.token_id for t in ref_gts]
    # Spec engaged despite the logprobs row...
    assert eng.spec_drafted > 0
    # ...and the logprobs row still got its fused top-K entries.
    assert all(t.top_logprobs and len(t.top_logprobs) == 3 for t in gts)
    for t, r in zip(gts, ref_gts):
        assert [e.token_id for e in t.top_logprobs] == \
            [e.token_id for e in r.top_logprobs]


def test_adaptive_depth_shrinks_on_bad_draft(ckpt, other_ckpt):
    """Adaptive speculation depth (reference SpeculativeConfig.
    adaptive_depth): a divergent draft model's near-zero acceptance must
    shrink the drafting budget toward 1 — and output stays exact."""
    jobs = [([1, 2, 3, 4, 5], _greedy(n=60))]

    eng_bad = _engine_draft(ckpt, other_ckpt, spec_k=4)
    out_bad = _run(eng_bad, jobs)
    assert eng_bad._spec_depth < 4, (
        f"depth stayed {eng_bad._spec_depth} despite acceptance "
        f"{eng_bad.spec_accepted}/{eng_bad.spec_drafted}")
    assert out_bad == _run(_engine(ckpt), jobs)


def test_adaptive_depth_steps_and_bounds(ckpt):
    """Depth unit dynamics: grows one step per 8 high-acceptance rounds
    up to spec_k, shrinks on low acceptance down to 1, holds in the
    middle band."""
    eng = _engine(ckpt, spec_k=4)
    assert eng._spec_adaptive and eng._spec_depth == 4

    for _ in range(8):                       # 0% acceptance → shrink
        eng._adapt_spec_depth(4, 0)
    assert eng._spec_depth == 3
    for _ in range(16):
        eng._adapt_spec_depth(4, 0)
    assert eng._spec_depth == 1
    for _ in range(80):                      # floor holds
        eng._adapt_spec_depth(4, 0)
    assert eng._spec_depth == 1
    for _ in range(8):                       # full acceptance → grow
        eng._adapt_spec_depth(1, 1)
    assert eng._spec_depth == 2
    for _ in range(80):                      # ceiling holds at spec_k
        eng._adapt_spec_depth(2, 2)
    assert eng._spec_depth == 4
    d = eng._spec_depth
    for _ in range(16):                      # middle band: no movement
        eng._adapt_spec_depth(10, 6)
    assert eng._spec_depth == d
