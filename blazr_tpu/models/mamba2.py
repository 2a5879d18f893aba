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
    """Associative selective scan over time (Mamba2 Euler/ZOH form).

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

    # Generalized scan inputs: contribution_t = Σ_r x[...,r,:] ⊗ bw[...,r,:]
    # (dt folded into the B side; rank axis R=1 for Mamba2).
    ldec = dt * a[None, None, :]                                      # [B,T,H]
    bw = (bh * dt[..., None])[:, :, :, None, :]                       # [B,T,H,1,N]
    xr = xh[:, :, :, None, :]                                         # [B,T,H,1,hd]
    if t > _CHUNK:
        y, final_state = _scan_chunked(xr, bw, ch, ldec, ssm_state)
    else:
        y, final_state = _scan_associative(xr, bw, ch, ldec, ssm_state)
    y = y + params["D"].astype(jnp.float32)[None, None, :, None] * xh
    return y.reshape(bsz, t, h * hd), final_state


def _scan_associative(xh, bw, ch, ldec, ssm_state):
    """Direct associative scan — materializes the per-step state
    trajectory [T,B,H,hd,N] (fine for short T / single-token decode).

    xh [B,T,H,R,hd], bw [B,T,H,R,N] (all scalar coefficients pre-folded),
    ch [B,T,H,N], ldec [B,T,H] log-decay. contribution_t = Σ_r x_r ⊗ b_r.
    """
    decay = jnp.exp(ldec)                                             # [B,T,H]
    contrib = jnp.einsum("bthrd,bthrn->bthdn", xh, bw)                # [B,T,H,hd,N]

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


def _scan_chunked(xh, bw, ch, ldec_in, ssm_state):
    """Chunked SSD scan (the Mamba2 paper's 'state-space dual' form; the
    XLA analogue of the reference's chunked CUDA scan): within a chunk
    the recurrence is a causal [Q,Q] matmul, across chunks a short scan
    over [B,H,hd,N] states. Memory O(T·Q) instead of O(T·hd·N), and the
    FLOPs land on the MXU as batched matmuls.

    xh [B,T,H,R,hd], bw [B,T,H,R,N] (scalar coefficients pre-folded into
    bw), ch [B,T,H,N], ldec_in [B,T,H] per-step log-decay.

    y[t] = Σ_{s≤t} Σ_r exp(L_t − L_s)·(C_t·B_{s,r})·x_{s,r} + exp(L_t)·(C_t·S_prev)
    """
    bsz, t, h, r, hd = xh.shape
    n = bw.shape[-1]
    q = _CHUNK
    pad = (-t) % q
    if pad:
        zlike = lambda arr: jnp.pad(arr, [(0, 0), (0, pad)] +
                                    [(0, 0)] * (arr.ndim - 2))
        xh_, bw_, ch_, ld_ = map(zlike, (xh, bw, ch, ldec_in))
    else:
        xh_, bw_, ch_, ld_ = xh, bw, ch, ldec_in
    tt = t + pad
    nc = tt // q
    xc = xh_.reshape(bsz, nc, q, h, r, hd)
    bc = bw_.reshape(bsz, nc, q, h, r, n)
    cc = ch_.reshape(bsz, nc, q, h, n)

    ldec = ld_.reshape(bsz, nc, q, h)                       # log decay ≤ 0
    lcum = jnp.cumsum(ldec, axis=2)                         # [B,NC,Q,H]

    # intra-chunk: att[b,c,h,t,s,r] = exp(L_t − L_s)·(C_t·B_{s,r}), s ≤ t
    cb = jnp.einsum("bcthn,bcshrn->bchtsr", cc, bc)
    ldiff = lcum[..., :, None, :] - lcum[..., None, :, :]   # [B,NC,T,S,H]
    ldiff = jnp.moveaxis(ldiff, -1, 2)                      # [B,NC,H,T,S]
    mask = jnp.tril(jnp.ones((q, q), dtype=bool))
    att = jnp.where(mask[:, :, None], jnp.exp(ldiff)[..., None] * cb, 0.0)
    y_intra = jnp.einsum("bchtsr,bcshrd->bcthd", att, xc)

    # per-chunk state contribution and total decay
    lend = lcum[:, :, -1:, :]                               # [B,NC,1,H]
    wend = jnp.exp(lend - lcum)                             # [B,NC,Q,H]
    chunk_state = jnp.einsum("bcsh,bcshrd,bcshrn->bchdn", wend, xc, bc)
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


# ---------------------------------------------------------------------------
# Mamba3 (SURVEY §2.9 SsmConfig {variant, complex_rope, mimo_rank, use_conv};
# reference config surface: src/model/config.rs:51-57, 398-414 — semantics
# live in unmounted boostr, so the recurrence here follows the Mamba-3
# paper's three changes over Mamba-2, expressed TPU-first through the same
# rank-generalized SSD scan):
#   * complex/rotational state update (complex_rope, default ON): the state
#     evolves as S_t = exp(dt·a)·R(dt·ω)·S_{t-1} + c_t with R a per-head
#     rotation of the N axis. Implemented with the RoPE trick: rotate B and
#     C by the data-dependent cumulative angle −Θ_t (Θ_t = Σ_{s≤t} dt_s·ω),
#     run the ordinary real scan, and rotate the final state forward by
#     +Θ_T so the carried state stays frame-relative (O(1) decode).
#   * trapezoidal discretization (enabled by a per-head `lam` parameter):
#     c_t = dt_t·[λ·B_t⊗x_t + (1−λ)·exp(dt_t·a)·B_{t-1}⊗x_{t-1}],
#     λ = σ(lam). The t-1 term rides an extra rank row of the SSD scan;
#     the previous token's post-activation (x|B) is carried in the last
#     column of the conv-state buffer across calls.
#   * MIMO rank r (mimo_rank): B and the SSM input become rank-r per head
#     (contribution Σ_j B_j⊗x_j — r outer products on the same state), C
#     stays rank-1; the D skip applies to input channel 0.
#   * use_conv (default OFF): Mamba-3 drops the short causal conv; the
#     SiLU activation on (x|B|C) is kept.
# ---------------------------------------------------------------------------


def _m3(ssm) -> Optional[dict]:
    if ssm.variant != "mamba3":
        return None
    return {
        "rot": True if ssm.complex_rope is None else bool(ssm.complex_rope),
        "r": int(ssm.mimo_rank or 0),
        "conv": False if ssm.use_conv is None else bool(ssm.use_conv),
    }


def _m3_widths(ssm) -> tuple[int, int, int, int]:
    """(r_m, x_width, b_width, c_width) of the post-z in_proj slices."""
    r_m = max(int(ssm.mimo_rank or 0), 1)
    g_state = ssm.n_groups * ssm.state_size
    return r_m, ssm.inner_size * r_m, g_state * r_m, g_state


def _rot_half(v: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Split-half rotation on the last axis: treat v as N/2 complex pairs
    (first half real, second half imaginary)."""
    half = v.shape[-1] // 2
    v1, v2 = v[..., :half], v[..., half:]
    return jnp.concatenate([v1 * cos - v2 * sin, v1 * sin + v2 * cos], axis=-1)


def _m3_default_omega(n: int, h: int) -> jax.Array:
    """RoPE-style log-spaced rotation frequencies [H, N/2] used when the
    checkpoint carries no learned `omega`."""
    half = n // 2
    inv = 10000.0 ** (-jnp.arange(half, dtype=jnp.float32) / max(half, 1))
    return jnp.broadcast_to(inv[None, :], (h, half))


def _ssm_scan_m3(cfg: UniversalConfig, params: dict[str, Any],
                 xs: jax.Array, bs: jax.Array, cs: jax.Array,
                 dt_raw: jax.Array, ssm_state: jax.Array,
                 prev_xb: jax.Array, flags: dict):
    """Mamba3 scan: rank-stacked trapezoidal contributions + rotational
    state via the RoPE trick, over the shared SSD/associative kernels.

    xs [B,T,x_w], bs [B,T,b_w], cs [B,T,c_w], dt_raw [B,T,H],
    prev_xb [B, x_w+b_w] post-activation carry of the previous token.
    Returns (y [B,T,d_inner], final_state [B,H,hd,N], new_prev [B, x_w+b_w]).
    """
    ssm = cfg.ssm
    bsz, t, _ = xs.shape
    h, hd, n, g = ssm.num_heads, ssm.head_dim, ssm.state_size, ssm.n_groups
    r_m, x_w, b_w, _ = _m3_widths(ssm)
    heads_per_group = h // g

    a = -jnp.exp(params["A_log"].astype(jnp.float32))                  # [H]
    dt = jax.nn.softplus(dt_raw.astype(jnp.float32)
                         + params["dt_bias"].astype(jnp.float32))      # [B,T,H]
    ldec = dt * a[None, None, :]

    def to_heads_x(flat):                                   # [..., x_w]
        xr = flat.reshape(*flat.shape[:-1], r_m, h, hd).astype(jnp.float32)
        return jnp.moveaxis(xr, -3, -2)                     # [..., H, R, hd]

    def to_heads_b(flat):                                   # [..., b_w]
        br = flat.reshape(*flat.shape[:-1], r_m, g, n).astype(jnp.float32)
        br = jnp.repeat(br, heads_per_group, axis=-2)       # [..., R, H, N]
        return jnp.moveaxis(br, -3, -2)                     # [..., H, R, N]

    xh = to_heads_x(xs)                                     # [B,T,H,R,hd]
    bh = to_heads_b(bs)                                     # [B,T,H,R,N]
    cg = cs.reshape(bsz, t, g, n).astype(jnp.float32)
    ch = jnp.repeat(cg, heads_per_group, axis=2)            # [B,T,H,N]

    lam_p = params.get("lam")
    if lam_p is not None:
        lam = jax.nn.sigmoid(lam_p.astype(jnp.float32))[None, None, :]
        # previous-token (x|B): shift by one step, t=0 from the carry
        xp = jnp.concatenate(
            [to_heads_x(prev_xb[:, :x_w])[:, None], xh[:, :-1]], axis=1)
        bp = jnp.concatenate(
            [to_heads_b(prev_xb[:, x_w:])[:, None], bh[:, :-1]], axis=1)
        decay = jnp.exp(ldec)
        scale_cur = (dt * lam)[..., None, None]
        scale_prev = (dt * (1.0 - lam) * decay)[..., None, None]
        xh_all = jnp.concatenate([xh, xp], axis=3)          # [B,T,H,2R,hd]
        bw_all = jnp.concatenate([bh * scale_cur, bp * scale_prev], axis=3)
    else:
        xh_all = xh
        bw_all = bh * dt[..., None, None]

    rot = flags["rot"]
    if rot:
        omega = params.get("omega")
        omega = (_m3_default_omega(n, h) if omega is None
                 else omega.astype(jnp.float32))            # [H, N/2]
        theta = jnp.cumsum(dt[..., None] * omega[None, None], axis=1)
        cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)       # [B,T,H,N/2]
        # rotate B and C by −Θ_t (trapezoid rows enter the state at t, so
        # every rank row of step t gets the same angle)
        bw_all = _rot_half(bw_all, cos_t[..., None, :], -sin_t[..., None, :])
        ch = _rot_half(ch, cos_t, -sin_t)

    if t > _CHUNK:
        y, final_state = _scan_chunked(xh_all, bw_all, ch, ldec, ssm_state)
    else:
        y, final_state = _scan_associative(xh_all, bw_all, ch, ldec, ssm_state)

    if rot:
        # carry the state in the current frame: S_T = R(+Θ_T)·S'_T
        final_state = _rot_half(final_state,
                                cos_t[:, -1, :, None, :],
                                sin_t[:, -1, :, None, :])
    y = y + params["D"].astype(jnp.float32)[None, None, :, None] * xh[..., 0, :]
    new_prev = jnp.concatenate([xs[:, -1], bs[:, -1]], axis=-1)
    return y.reshape(bsz, t, h * hd), final_state, new_prev


def _mamba3_mixer(params: dict[str, Any], cfg: UniversalConfig, x: jax.Array,
                  state: SSMState, layer: int, flags: dict
                  ) -> tuple[jax.Array, SSMState]:
    """One Mamba3 mixer over [B, T, H] input with state carry.

    Conv-state buffer layout (see init_ssm_state): columns [0 .. k-2] hold
    the raw causal-conv window when use_conv; the LAST column carries the
    previous token's post-activation (x|B) for the trapezoid term.
    """
    ssm = cfg.ssm
    d_inner = ssm.inner_size
    r_m, x_w, b_w, c_w = _m3_widths(ssm)

    zxbcdt = linear(x, params["in_proj"])
    z = zxbcdt[..., :d_inner]
    xbc = zxbcdt[..., d_inner : d_inner + x_w + b_w + c_w]
    dt_raw = zxbcdt[..., d_inner + x_w + b_w + c_w :]

    conv_buf = state.conv[layer]                     # [B, conv_dim, cols]
    if flags["conv"]:
        xbc_act, new_win = _conv_prefill(
            xbc, conv_buf[:, :, :-1], params["conv_w"], params.get("conv_b"))
    else:
        xbc_act, new_win = jax.nn.silu(xbc), None

    xs = xbc_act[..., :x_w]
    bs = xbc_act[..., x_w : x_w + b_w]
    cs = xbc_act[..., x_w + b_w :]
    prev_xb = conv_buf[:, : x_w + b_w, -1].astype(jnp.float32)

    y, new_ssm, new_prev = _ssm_scan_m3(
        cfg, params, xs, bs, cs, dt_raw, state.ssm[layer], prev_xb, flags)
    y = gated_rms_norm(y, z, params["norm"], cfg.rms_norm_eps)
    out = linear(y.astype(x.dtype), params["out_proj"])

    new_buf = conv_buf
    if new_win is not None:
        new_buf = new_buf.at[:, :, :-1].set(new_win.astype(new_buf.dtype))
    pad = new_buf.shape[1] - new_prev.shape[-1]
    if pad:
        new_prev = jnp.pad(new_prev, ((0, 0), (0, pad)))
    new_buf = new_buf.at[:, :, -1].set(new_prev.astype(new_buf.dtype))

    state = SSMState(
        conv=state.conv.at[layer].set(new_buf),
        ssm=state.ssm.at[layer].set(new_ssm),
        length=state.length,
    )
    return out, state


def mamba2_block(params: dict[str, Any], cfg: UniversalConfig, x: jax.Array,
                 state: SSMState, layer: int) -> tuple[jax.Array, SSMState]:
    """One Mamba2/Mamba3 mixer over [B, T, H] input with state carry."""
    ssm = cfg.ssm
    flags = _m3(ssm)
    if flags is not None:
        return _mamba3_mixer(params, cfg, x, state, layer, flags)
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
    last_idx: Optional[jax.Array] = None,   # [B] — head on this pos only
) -> tuple[jax.Array, SSMState]:
    """Mamba2/Mamba3 LM forward (reference forward_with_ssm_state)."""
    x = jnp.take(params["embed"], tokens, axis=0)
    for i, p in enumerate(params["layers"]):
        h = rms_norm(x, p["input_norm"], cfg.rms_norm_eps)
        out, state = mamba2_block(p, cfg, h, state, i)
        x = x + out
    state = SSMState(conv=state.conv, ssm=state.ssm,
                     length=state.length + tokens.shape[1])
    if last_idx is not None:
        # prefill head slice (see llama_paged.forward_paged)
        x = jnp.take_along_axis(x, last_idx[:, None, None], axis=1)
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
        # conv is optional for mamba3 (use_conv defaults off)
        need_conv = cfg.ssm.variant != "mamba3" or bool(cfg.ssm.use_conv)
        conv_w = pb.get(prefix + "mixer.conv1d.weight",
                        required=need_conv)               # HF: [C, 1, k]
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
            # mamba3-only (optional): trapezoid gate λ=σ(lam) per head and
            # learned rotation frequencies [H, N/2]
            "lam": pb.get(prefix + "mixer.lam", dtype=jnp.float32,
                          required=False),
            "omega": pb.get(prefix + "mixer.omega", dtype=jnp.float32,
                            required=False),
        })
    params = {
        "embed": pb.get("backbone.embeddings.weight", "backbone.embedding.weight",
                        "model.embed_tokens.weight"),
        "final_norm": pb.get("backbone.norm_f.weight", "model.norm.weight"),
        "layers": layers,
        "lm_head": pb.get("lm_head.weight", transpose=True, required=False),
    }
    return params
