"""Ring-attention (sequence-parallel) prefill through the real Executor.

Round-2 integration of the green-field SP path (VERDICT item 7): long
prompts prefill with the sequence sharded over an ``sp`` mesh axis and
KV blocks rotating via ppermute, then decode proceeds normally against
the cache the ring pass populated. Must match the single-device path.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from blazr_tpu.config import GenerationConfig
from blazr_tpu.engine.executor import Executor
from blazr_tpu.loader import load_model

from fixtures import write_tiny_llama_checkpoint
from test_executor import ByteTokenizer


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    path = tmp_path_factory.mktemp("ring_model")
    write_tiny_llama_checkpoint(path, np.random.default_rng(13))
    return path


def _executor(ckpt, **overrides):
    model, app_cfg = load_model(ckpt, dtype="f32")
    app_cfg.inference.max_seq_len = 512
    for k, v in overrides.items():
        setattr(app_cfg.inference, k, v)
    return Executor(model, ByteTokenizer(), app_cfg)


def _prompt(n=300):
    rng = np.random.default_rng(3)
    return [int(t) for t in rng.integers(1, 250, n)]


def test_ring_prefill_logits_match(ckpt):
    ref_ex = _executor(ckpt)
    prompt = _prompt()
    ref_last, _ = ref_ex.prefill(ref_ex._init_cache(1), prompt)

    ex = _executor(ckpt, sequence_parallel_size=4, sp_prefill_threshold=64)
    assert ex._ring_prefill_step is not None
    assert ex.mesh is not None and ex.mesh.shape["sp"] == 4
    last, _ = ex.prefill(ex._init_cache(1), prompt)
    np.testing.assert_allclose(np.asarray(last), np.asarray(ref_last),
                               rtol=2e-4, atol=2e-4)


def test_ring_prefill_then_decode_parity(ckpt):
    """Decode after a ring prefill must track the single-device stream —
    the cache the ring pass wrote is what decode attends against."""
    prompt = _prompt()
    cfg = GenerationConfig(max_tokens=8, temperature=0.0)
    ref = [t.token_id for t in _executor(ckpt).generate(prompt, cfg)]

    ex = _executor(ckpt, sequence_parallel_size=4, sp_prefill_threshold=64)
    calls = []
    orig = ex._ring_prefill_step

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    ex._ring_prefill_step = spy
    out = [t.token_id for t in ex.generate(prompt, cfg)]
    assert calls, "long prompt should have taken the ring prefill path"
    assert out == ref


def test_short_prompt_skips_ring(ckpt):
    ex = _executor(ckpt, sequence_parallel_size=4, sp_prefill_threshold=64)
    calls = []
    orig = ex._ring_prefill_step
    ex._ring_prefill_step = lambda *a, **kw: calls.append(1) or orig(*a, **kw)
    cfg = GenerationConfig(max_tokens=4, temperature=0.0)
    ref = [t.token_id
           for t in _executor(ckpt).generate([5, 6, 7], cfg)]
    out = [t.token_id for t in ex.generate([5, 6, 7], cfg)]
    assert not calls
    assert out == ref


def test_sp_tp_combined_mesh(ckpt):
    """sp × tp: heads shard over tp while ring prefill shards the
    sequence over sp."""
    prompt = _prompt(200)
    cfg = GenerationConfig(max_tokens=6, temperature=0.0)
    ref = [t.token_id for t in _executor(ckpt).generate(prompt, cfg)]
    ex = _executor(ckpt, sequence_parallel_size=2, tensor_parallel_size=2,
                   sp_prefill_threshold=64)
    assert ex._ring_prefill_step is not None
    out = [t.token_id for t in ex.generate(prompt, cfg)]
    assert out == ref


# ---------------------------------------------------------------------------
# SP prefill under CONTINUOUS BATCHING (VERDICT r2 #4): long prompts in the
# BatchEngine ride the ring-attention program, writing into the paged cache;
# decode then proceeds against those pages.
# ---------------------------------------------------------------------------

def _engine(ckpt, **overrides):
    import asyncio

    from blazr_tpu.engine.batch_engine import BatchEngine

    model, app_cfg = load_model(ckpt, dtype="f32")
    app_cfg.inference.max_seq_len = 512
    app_cfg.inference.max_batch_size = 4
    for k, v in overrides.items():
        setattr(app_cfg.inference, k, v)
    return BatchEngine(model, ByteTokenizer(), app_cfg)


def _run_engine(eng, prompts, n=8):
    import asyncio

    async def main():
        task = asyncio.create_task(eng.run())
        handles = [eng.submit(list(p),
                              GenerationConfig(max_tokens=n, temperature=0.0))
                   for p in prompts]

        async def collect(h):
            return [tok.token_id async for tok in h.tokens()]

        res = await asyncio.gather(*[
            asyncio.wait_for(collect(h), timeout=300) for h in handles])
        eng.stop()
        await task
        return res

    return asyncio.run(main())


def test_batch_engine_sp_prefill_parity(ckpt):
    """Long-prompt continuous batching on the sp=4 mesh matches the
    single-device engine token-for-token; a short prompt in the same
    batch takes the ordinary grouped-prefill path."""
    long_p = _prompt(300)
    short_p = [5, 6, 7, 8]
    ref = _run_engine(_engine(ckpt), [long_p, short_p])

    eng = _engine(ckpt, sequence_parallel_size=4, sp_prefill_threshold=64)
    assert eng._sp_prefill_step is not None
    assert eng.mesh is not None and eng.mesh.shape["sp"] == 4
    calls = []
    orig = eng._sp_prefill_step
    eng._sp_prefill_step = lambda *a, **kw: calls.append(1) or orig(*a, **kw)
    out = _run_engine(eng, [long_p, short_p])
    assert len(calls) == 1, "exactly the long prompt rides the sp program"
    assert out == ref


def test_batch_engine_sp_windowed_model_parity(ckpt):
    """Sliding-window configs ride the WINDOW-AWARE ring (VERDICT r3 #3):
    sp prefill on a windowed model matches the single-device windowed
    engine token-for-token — the very config the synthetic flagship uses
    (utils/synthetic.py sliding_window=4096)."""
    from blazr_tpu.engine.batch_engine import BatchEngine

    def windowed_engine(**overrides):
        model, app_cfg = load_model(ckpt, dtype="f32")
        model.cfg.attention.sliding_window = 64
        app_cfg.inference.max_seq_len = 512
        app_cfg.inference.max_batch_size = 4
        for k, v in overrides.items():
            setattr(app_cfg.inference, k, v)
        return BatchEngine(model, ByteTokenizer(), app_cfg)

    long_p = _prompt(300)            # 300 > window 64: bound exercised
    ref = _run_engine(windowed_engine(), [long_p])

    eng = windowed_engine(sequence_parallel_size=4, sp_prefill_threshold=64)
    assert eng._sp_prefill_step is not None
    calls = []
    orig = eng._sp_prefill_step
    eng._sp_prefill_step = lambda *a, **kw: calls.append(1) or orig(*a, **kw)
    out = _run_engine(eng, [long_p])
    assert calls, "windowed long prompt must ride the sp program"
    assert out == ref
