"""Post-A/B follow-ups on the real chip:
A) XLA dequant-dot probes at the 7B decode shape — can pure XLA (770 GB/s
   streaming) beat the Pallas auto-pipeline on int8/int4 weights?
B) Long-context decode with int8 KV vs float KV (the unmeasured traffic win).
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from functools import partial

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() in ("tpu", "axon"), jax.default_backend()
import time as _t; _t0=_t.time()
print("alive: compute", float(jnp.sum(jnp.ones((128,128)) @ jnp.ones((128,128)))), f"{_t.time()-_t0:.1f}s", flush=True)

K, N = 4096, 14336
ITERS = 512
rng = np.random.default_rng(0)

def chain(fn):
    @jax.jit
    def run(x):
        def body(i, x):
            y = fn(x)
            return x + y[:, :K].astype(x.dtype) * 1e-30
        return jax.lax.fori_loop(0, ITERS, body, x)
    return run

def timeit(name, fn, m, bytes_per):
    x = jnp.asarray(rng.standard_normal((m, K)), dtype=jnp.bfloat16)
    r = chain(fn)
    y = r(x); float(jnp.sum(y.astype(jnp.float32)))
    t0 = time.time(); y = r(x); float(jnp.sum(y.astype(jnp.float32)))
    dt = (time.time() - t0) / ITERS
    print(f"{name:30s} m={m:3d} {dt*1e6:8.1f} us  {bytes_per/dt/1e9:7.1f} GB/s",
          flush=True)
    return dt

print("=== A) XLA dequant-dot probes, K=4096 N=14336 ===", flush=True)
wd = jnp.asarray(rng.standard_normal((K, N)), dtype=jnp.bfloat16)
w8 = jnp.asarray(rng.integers(-127, 127, (K, N)), dtype=jnp.int8)
s_row = jnp.asarray(rng.standard_normal((N,)).astype(np.float32) * 0.01)
w4 = jnp.asarray(rng.integers(-8, 7, (K, N)), dtype=jnp.int4)

for m in (1, 8):
    timeit("dense bf16 (ceiling)", lambda x: x @ wd, m, wd.size * 2)
    timeit("xla int8 dequant-dot",
           lambda x: (x @ w8.astype(jnp.bfloat16)) * s_row.astype(jnp.bfloat16),
           m, w8.size)
    def w8a8(x):
        xs = jnp.max(jnp.abs(x), axis=-1, keepdims=True) / 127.0
        xq = jnp.clip(jnp.round(x / xs), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w8, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return (acc.astype(jnp.float32) * xs.astype(jnp.float32)
                * s_row).astype(jnp.bfloat16)
    timeit("xla w8a8 int8-MXU", w8a8, m, w8.size)
    timeit("xla int4 dequant-dot",
           lambda x: (x @ w4.astype(jnp.bfloat16)) * s_row.astype(jnp.bfloat16),
           m, w4.size // 2)
    from blazr_tpu.utils.synthetic import _rand_awq_qt
    from blazr_tpu.quant.matmul import quant_matmul, quant_matmul_xla_grouped
    qt = _rand_awq_qt(jax.random.key(0), K, N, group_size=128)
    timeit("pallas int4 (current)", lambda x: quant_matmul(x, qt), m,
           qt.qweight.size * 4)
    timeit("xla grouped int4 (real)", lambda x: quant_matmul_xla_grouped(x, qt),
           m, qt.qweight.size * 4)

print("=== B) long-ctx decode: int8 KV vs float KV ===", flush=True)
from blazr_tpu.engine.sampling import greedy_token
from blazr_tpu.kvcache.contiguous import init_kv_cache
from blazr_tpu.models import llama
from blazr_tpu.utils.synthetic import synth_llama_params, mistral_7b_config

cfg = mistral_7b_config()
att = cfg.attention
params = synth_llama_params(cfg, quant="awq", dtype=jnp.bfloat16)

def bench_kv(batch, ctx, prompt_len, kv_quant, steps=32, warmup=3):
    cache = init_kv_cache(cfg.num_layers, batch, ctx, att.kv_heads(),
                          att.resolved_head_dim(cfg.hidden_size),
                          dtype=jnp.bfloat16, quantized=kv_quant)

    @partial(jax.jit, donate_argnums=(1,))
    def decode_step(params, cache, token, positions):
        logits, cache = llama.forward(params, cfg, token, cache, positions)
        tok = greedy_token(logits[:, -1, :])
        return tok[:, None], cache

    @partial(jax.jit, donate_argnums=(1,))
    def prefill(params, cache, tokens, positions):
        logits, cache = llama.forward(params, cfg, tokens, cache, positions)
        return greedy_token(logits[:, -1, :])[:, None], cache

    prompt = jnp.asarray(rng.integers(0, cfg.vocab_size, (batch, prompt_len)),
                         dtype=jnp.int32)
    ppos = jnp.asarray(np.broadcast_to(np.arange(prompt_len, dtype=np.int32),
                                       (batch, prompt_len)))
    tok, cache = prefill(params, cache, prompt, ppos)
    int(np.asarray(tok).reshape(-1)[0])
    pos = prompt_len
    for i in range(warmup):
        positions = jnp.full((batch, 1), pos, dtype=jnp.int32)
        tok, cache = decode_step(params, cache, tok, positions)
        pos += 1
    int(np.asarray(tok).reshape(-1)[0])
    t0 = time.time()
    for i in range(steps):
        positions = jnp.full((batch, 1), pos, dtype=jnp.int32)
        tok, cache = decode_step(params, cache, tok, positions)
        pos += 1
    int(np.asarray(tok).reshape(-1)[0])
    dt = time.time() - t0
    tps = steps * batch / dt
    print(f"B={batch} ctx={prompt_len} kv={'int8' if kv_quant else 'bf16'}: "
          f"{tps:7.1f} tok/s  ({dt/steps*1e3:6.1f} ms/step)", flush=True)
    return tps

# B=1 only: each config is ~2 full-model compiles (~minutes each through
# the tunnel); batched variants once the single-stream delta is known.
for kvq in (False, True):
    bench_kv(1, 4224, 4096, kvq)
print("done", flush=True)
