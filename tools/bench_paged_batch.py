"""Batched PAGED decode on the real chip: the actual serving path
(forward_paged) at B = 8/16/32, ctx 1024 — Pallas paged-attention kernel
vs the XLA gather fallback (BLAZR_TPU_FORCE_XLA_ATTN=1).

Usage: python tools/bench_paged_batch.py [xla|pa] [B ...]
"""
import os, sys, time
sys.path.insert(0, "/root/repo")
mode = sys.argv[1] if len(sys.argv) > 1 else "pa"
if mode == "xla":
    os.environ["BLAZR_TPU_FORCE_XLA_ATTN"] = "1"
import jax, jax.numpy as jnp, numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
assert jax.default_backend() in ("tpu", "axon")
print("alive:", float(jnp.sum(jnp.ones((8, 8)))), "mode:", mode, flush=True)

from functools import partial
from blazr_tpu.kvcache.paged import init_paged_cache, compute_slot_mapping, pad_block_table
from blazr_tpu.models.llama_paged import forward_paged
from blazr_tpu.engine.sampling import greedy_token
from blazr_tpu.utils.synthetic import synth_llama_params, mistral_7b_config

cfg = mistral_7b_config()
att = cfg.attention
BS = int(os.environ.get("PA_BS", "16"))
CTX = 1024
rng = np.random.default_rng(0)
params = synth_llama_params(cfg, quant="awq", dtype=jnp.bfloat16)

bs_list = [int(a) for a in sys.argv[2:]] or [8, 16, 32]
for B in bs_list:
    mb = CTX // BS
    nb = B * mb
    cache = init_paged_cache(cfg.num_layers, nb, BS, att.kv_heads(),
                             att.resolved_head_dim(cfg.hidden_size),
                             dtype=jnp.bfloat16)

    @partial(jax.jit, donate_argnums=(1,))
    def decode(params, cache, tokens, positions, slots, bts, seq_lens):
        logits, cache = forward_paged(params, cfg, tokens, cache, positions,
                                      slots, bts, seq_lens)
        return greedy_token(logits[:, -1, :]), cache

    pos0 = CTX - 64
    bts = np.stack([pad_block_table(list(range(i * mb, (i + 1) * mb)), mb)
                    for i in range(B)])
    toks = jnp.asarray(rng.integers(0, cfg.vocab_size, (B, 1)), dtype=jnp.int32)

    def step_args(p):
        positions = np.full((B, 1), p, dtype=np.int32)
        slots = np.stack([compute_slot_mapping(
            list(bts[i][:mb]), p, 1, BS, nb * BS) for i in range(B)])
        seq_lens = np.full((B,), p + 1, dtype=np.int32)
        return (jnp.asarray(positions), jnp.asarray(slots),
                jnp.asarray(seq_lens))

    p = pos0
    for _ in range(3):
        positions, slots, seq_lens = step_args(p)
        tok, cache = decode(params, cache, toks, positions, slots,
                            jnp.asarray(bts), seq_lens)
        toks = tok[:, None]
        p += 1
    int(np.asarray(tok)[0])
    steps = 24
    t0 = time.time()
    for _ in range(steps):
        positions, slots, seq_lens = step_args(p)
        tok, cache = decode(params, cache, toks, positions, slots,
                            jnp.asarray(bts), seq_lens)
        toks = tok[:, None]
        p += 1
    int(np.asarray(tok)[0])
    dt = (time.time() - t0) / steps
    print(f"B={B:3d} ctx~{CTX}  {dt*1e3:7.2f} ms/step  "
          f"{B/dt:8.1f} tok/s aggregate", flush=True)
print("done", flush=True)
