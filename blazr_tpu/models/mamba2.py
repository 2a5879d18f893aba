"""Mamba2 selective-state-space model.

TPU-native equivalent of boostr's Mamba2 forward passes
(``forward_with_ssm_state``, SURVEY §2.9 "Model layer" row). Functional
over an :class:`~blazr_tpu.kvcache.ssm_state.SSMState` carry:

  * in_proj → [z | xBC | dt] split (HF Mamba2 ordering)
  * causal depthwise conv over xBC with a rolling [conv_dim, k-1] state
  * selective scan: state' = exp(dt·A)·state + dt·(B ⊗ x); y = C·state + D·x
    (implemented as an associative scan over time — O(log T) depth on TPU —
    with the recurrent single-step form for decode)
  * gated RMSNorm (norm(y · silu(z))) → out_proj

Param tree per layer: input_norm, in_proj [H, d_inproj], conv_w
[conv_dim, k], conv_b [conv_dim], A_log [heads], D [heads],
dt_bias [heads], norm [d_inner], out_proj [d_inner, H].
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config.model_config import UniversalConfig
from ..kvcache.ssm_state import SSMState
from .layers import linear, rms_norm


def gated_rms_norm(y: jax.Array, z: jax.Array, weight: jax.Array,
                   eps: float) -> jax.Array:
    """HF MambaRMSNormGated: variance over y·silu(z)."""
    g = (y * jax.nn.silu(z)).astype(jnp.float32)
    var = jnp.mean(g * g, axis=-1, keepdims=True)
    return (g * jax.lax.rsqrt(var + eps) * weight.astype(jnp.float32)).astype(y.dtype)


def _split_proj(cfg: UniversalConfig, zxbcdt: jax.Array):
    ssm = cfg.ssm
    d_inner = ssm.inner_size
    g_state = ssm.n_groups * ssm.state_size
    z = zxbcdt[..., :d_inner]
    xbc = zxbcdt[..., d_inner : 2 * d_inner + 2 * g_state]
    dt = zxbcdt[..., 2 * d_inner + 2 * g_state :]
    return z, xbc, dt


def _conv_step(xbc: jax.Array, conv_state: jax.Array, conv_w: jax.Array,
               conv_b: Optional[jax.Array]):
    """Single-token causal depthwise conv using the rolling state.

    xbc [B, C], conv_state [B, C, k-1], conv_w [C, k] → (out [B, C], state').
    """
    window = jnp.concatenate([conv_state, xbc[:, :, None]], axis=-1)  # [B,C,k]
    out = jnp.sum(window * conv_w[None, :, :], axis=-1)
    if conv_b is not None:
        out = out + conv_b[None, :]
    new_state = window[:, :, 1:]
    return jax.nn.silu(out), new_state


def _conv_prefill(xbc: jax.Array, conv_state: jax.Array, conv_w: jax.Array,
                  conv_b: Optional[jax.Array]):
    """[B, T, C] causal depthwise conv; returns (out [B, T, C], state')."""
    b, t, c = xbc.shape
    k = conv_w.shape[-1]
    seq = jnp.concatenate([jnp.swapaxes(conv_state, 1, 2), xbc], axis=1)  # [B, k-1+T, C]
    # windows via gather: out[t] = sum_j seq[t+j] * w[j]
    out = jnp.zeros((b, t, c), dtype=xbc.dtype)
    for j in range(k):
        out = out + seq[:, j : j + t, :] * conv_w[None, None, :, j]
    if conv_b is not None:
        out = out + conv_b[None, None, :]
    new_state = jnp.swapaxes(seq[:, -(k - 1):, :], 1, 2) if k > 1 else conv_state
    return jax.nn.silu(out), new_state


def _ssm_scan(cfg: UniversalConfig, x: jax.Array, b_in: jax.Array,
              c_in: jax.Array, dt: jax.Array, ssm_state: jax.Array,
              params: dict[str, Any]):
    """Associative selective scan over time.

    x [B,T,Hd*h] grouped per head; B/C [B,T,G*N]; dt [B,T,H].
    Returns (y [B,T,d_inner], final_state [B,H,hd,N]).
    """
    ssm = cfg.ssm
    bsz, t, _ = x.shape
    h, hd, n, g = ssm.num_heads, ssm.head_dim, ssm.state_size, ssm.n_groups

    a = -jnp.exp(params["A_log"].astype(jnp.float32))                 # [H]
    dt = jax.nn.softplus(dt.astype(jnp.float32)
                         + params["dt_bias"].astype(jnp.float32))     # [B,T,H]
    xh = x.reshape(bsz, t, h, hd).astype(jnp.float32)
    bg = b_in.reshape(bsz, t, g, n).astype(jnp.float32)
    cg = c_in.reshape(bsz, t, g, n).astype(jnp.float32)
    heads_per_group = h // g
    bh = jnp.repeat(bg, heads_per_group, axis=2)                      # [B,T,H,N]
    ch = jnp.repeat(cg, heads_per_group, axis=2)

    if t > _CHUNK:
        y, final_state = _scan_chunked(xh, bh, ch, dt, a, ssm_state)
    else:
        y, final_state = _scan_associative(xh, bh, ch, dt, a, ssm_state)
    y = y + params["D"].astype(jnp.float32)[None, None, :, None] * xh
    return y.reshape(bsz, t, h * hd), final_state


def _scan_associative(xh, bh, ch, dt, a, ssm_state):
    """Direct associative scan — materializes the per-step state
    trajectory [T,B,H,hd,N] (fine for short T / single-token decode)."""
    decay = jnp.exp(dt * a[None, None, :])                            # [B,T,H]
    # contribution[t] = dt[t] * x[t] ⊗ B[t]  → [B,T,H,hd,N]
    contrib = (dt[..., None, None] * xh[..., :, None]
               * bh[..., None, :])

    # associative scan over time: s[t] = decay[t]*s[t-1] + contrib[t]
    def combine(left, right):
        d1, c1 = left
        d2, c2 = right
        return d1 * d2, c1 * d2[..., None, None] + c2

    dec_t = jnp.moveaxis(decay, 1, 0)                                  # [T,B,H]
    con_t = jnp.moveaxis(contrib, 1, 0)                                # [T,B,H,hd,N]
    _, states_t = jax.lax.associative_scan(combine, (dec_t, con_t), axis=0)
    # include the incoming state: s[t] += (prod decay[0..t]) * s_init
    cumdec = jnp.cumprod(dec_t, axis=0)                                # [T,B,H]
    states_t = states_t + cumdec[..., None, None] * ssm_state[None]
    y = jnp.einsum("tbhn,tbhdn->tbhd", jnp.moveaxis(ch, 1, 0), states_t)
    y = jnp.moveaxis(y, 0, 1)                                          # [B,T,H,hd]
    return y, states_t[-1]


_CHUNK = 128     # SSD chunk length (MXU-friendly; [Q,Q] decay-mask matmuls)


def _scan_chunked(xh, bh, ch, dt, a, ssm_state):
    """Chunked SSD scan (the Mamba2 paper's 'state-space dual' form; the
    XLA analogue of the reference's chunked CUDA scan): within a chunk
    the recurrence is a causal [Q,Q] matmul, across chunks a short scan
    over [B,H,hd,N] states. Memory O(T·Q) instead of O(T·hd·N), and the
    FLOPs land on the MXU as batched matmuls.

    y[t] = Σ_{s≤t} exp(L_t − L_s)·(C_t·B_s)·dt_s·x_s  +  exp(L_t)·(C_t·S_prev)
    """
    bsz, t, h, hd = xh.shape
    n = bh.shape[-1]
    q = _CHUNK
    pad = (-t) % q
    if pad:
        zlike = lambda arr: jnp.pad(arr, [(0, 0), (0, pad)] +
                                    [(0, 0)] * (arr.ndim - 2))
        xh_, bh_, ch_, dt_ = map(zlike, (xh, bh, ch, dt))
    else:
        xh_, bh_, ch_, dt_ = xh, bh, ch, dt
    tt = t + pad
    nc = tt // q
    xc = xh_.reshape(bsz, nc, q, h, hd)
    bc = bh_.reshape(bsz, nc, q, h, n)
    cc = ch_.reshape(bsz, nc, q, h, n)
    dc = dt_.reshape(bsz, nc, q, h)

    ldec = dc * a[None, None, None, :]                      # log decay ≤ 0
    lcum = jnp.cumsum(ldec, axis=2)                         # [B,NC,Q,H]

    # intra-chunk: att[b,c,h,t,s] = exp(L_t − L_s)·(C_t·B_s)·dt_s, s ≤ t
    cb = jnp.einsum("bcthn,bcshn->bchts", cc, bc)
    ldiff = lcum[..., :, None, :] - lcum[..., None, :, :]   # [B,NC,T,S,H]
    ldiff = jnp.moveaxis(ldiff, -1, 2)                      # [B,NC,H,T,S]
    mask = jnp.tril(jnp.ones((q, q), dtype=bool))
    att = jnp.where(mask, jnp.exp(ldiff) * cb, 0.0)
    att = att * jnp.moveaxis(dc, -1, 2)[..., None, :]       # × dt_s
    y_intra = jnp.einsum("bchts,bcshd->bcthd", att, xc)

    # per-chunk state contribution and total decay
    lend = lcum[:, :, -1:, :]                               # [B,NC,1,H]
    wdt = dc * jnp.exp(lend - lcum)                         # [B,NC,Q,H]
    chunk_state = jnp.einsum("bcsh,bcshd,bcshn->bchdn", wdt, xc, bc)
    chunk_decay = jnp.exp(lend[:, :, 0, :])                 # [B,NC,H]

    # states across chunks: S_{c+1} = chunk_decay[c]·S_c + chunk_state[c]
    def step(s_prev, inp):
        d, cs = inp
        s_next = d[..., None, None] * s_prev + cs
        return s_next, s_prev                               # emit S BEFORE c

    _, s_before = jax.lax.scan(
        step, ssm_state,
        (jnp.moveaxis(chunk_decay, 1, 0), jnp.moveaxis(chunk_state, 1, 0)))
    s_before = jnp.moveaxis(s_before, 0, 1)                 # [B,NC,H,hd,N]

    # inter-chunk: y[t] += exp(L_t)·(C_t·S_before)
    y_inter = jnp.einsum("bcthn,bchdn->bcthd",
                         cc * jnp.exp(lcum)[..., None], s_before)

    y = (y_intra + y_inter).reshape(bsz, tt, h, hd)[:, :t]
    final_state = (chunk_decay[:, -1, :, None, None] * s_before[:, -1]
                   + chunk_state[:, -1])
    return y, final_state


def mamba2_block(params: dict[str, Any], cfg: UniversalConfig, x: jax.Array,
                 state: SSMState, layer: int) -> tuple[jax.Array, SSMState]:
    """One Mamba2 mixer over [B, T, H] input with state carry."""
    ssm = cfg.ssm
    zxbcdt = linear(x, params["in_proj"])
    z, xbc, dt = _split_proj(cfg, zxbcdt)

    xbc_conv, new_conv = _conv_prefill(
        xbc, state.conv[layer], params["conv_w"], params.get("conv_b"))
    d_inner = ssm.inner_size
    g_state = ssm.n_groups * ssm.state_size
    xs = xbc_conv[..., :d_inner]
    bs = xbc_conv[..., d_inner : d_inner + g_state]
    cs = xbc_conv[..., d_inner + g_state :]

    y, new_ssm = _ssm_scan(cfg, xs, bs, cs, dt, state.ssm[layer], params)
    y = gated_rms_norm(y, z, params["norm"], cfg.rms_norm_eps)
    out = linear(y.astype(x.dtype), params["out_proj"])

    state = SSMState(
        conv=state.conv.at[layer].set(new_conv.astype(state.conv.dtype)),
        ssm=state.ssm.at[layer].set(new_ssm),
        length=state.length,
    )
    return out, state


def forward(
    params: dict[str, Any],
    cfg: UniversalConfig,
    tokens: jax.Array,
    state: SSMState,
    positions: jax.Array,              # unused (O(1) state) — API parity
    seq_lens: Optional[jax.Array] = None,
) -> tuple[jax.Array, SSMState]:
    """Mamba2 LM forward (reference forward_with_ssm_state)."""
    x = jnp.take(params["embed"], tokens, axis=0)
    for i, p in enumerate(params["layers"]):
        h = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
        out, state = mamba2_block(p, cfg, h, state, i)
        x = x + out
    state = SSMState(conv=state.conv, ssm=state.ssm,
                     length=state.length + tokens.shape[1])
    x = rms_norm(x, params["final_norm"], cfg.rms_norm_eps)
    lm_head = params.get("lm_head")
    if lm_head is None:
        logits = jnp.dot(x, params["embed"].T.astype(x.dtype),
                         preferred_element_type=jnp.float32)
    else:
        logits = linear(x, lm_head)
    return logits.astype(jnp.float32), state


# ---------------------------------------------------------------------------
# Param building (HF Mamba2 checkpoint names)
# ---------------------------------------------------------------------------

def build_mamba2_params(cfg: UniversalConfig, vm, dtype=jnp.bfloat16) -> dict:
    from .registry import ParamBuilder

    pb = ParamBuilder(vm, dtype)
    layers = []
    for i in range(cfg.num_layers):
        for prefix in (f"backbone.layers.{i}.", f"model.layers.{i}."):
            if prefix + "mixer.in_proj.weight" in vm or \
               prefix + "norm.weight" in vm:
                break
        conv_w = pb.get(prefix + "mixer.conv1d.weight")   # HF: [C, 1, k]
        if conv_w is not None and conv_w.ndim == 3:
            conv_w = conv_w[:, 0, :]
        layers.append({
            "input_norm": pb.get(prefix + "norm.weight",
                                 prefix + "input_layernorm.weight"),
            "in_proj": pb.get(prefix + "mixer.in_proj.weight", transpose=True),
            "conv_w": conv_w,
            "conv_b": pb.get(prefix + "mixer.conv1d.bias", required=False),
            "A_log": pb.get(prefix + "mixer.A_log", prefix + "mixer.A_log.weight",
                            dtype=jnp.float32),
            "D": pb.get(prefix + "mixer.D", prefix + "mixer.D.weight",
                        dtype=jnp.float32),
            "dt_bias": pb.get(prefix + "mixer.dt_bias",
                              prefix + "mixer.dt_bias.weight",
                              dtype=jnp.float32),
            "norm": pb.get(prefix + "mixer.norm.weight"),
            "out_proj": pb.get(prefix + "mixer.out_proj.weight", transpose=True),
        })
    params = {
        "embed": pb.get("backbone.embeddings.weight", "backbone.embedding.weight",
                        "model.embed_tokens.weight"),
        "final_norm": pb.get("backbone.norm_f.weight", "model.norm.weight"),
        "layers": layers,
        "lm_head": pb.get("lm_head.weight", transpose=True, required=False),
    }
    return params
