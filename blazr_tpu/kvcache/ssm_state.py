"""Layered SSM state for Mamba2 models.

TPU-native equivalent of boostr ``LayeredSsmState`` (SURVEY §2.9 "KV
caches" row): per-layer convolution ring state + SSM recurrent state.
O(1) in sequence length (the reference cites ~1.5 MB for 6 layers,
docs/configuration.md:242-250).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..config.model_config import UniversalConfig


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class SSMState:
    conv: jax.Array     # [L, B, conv_dim, conv_kernel-1] — rolling window
    ssm: jax.Array      # [L, B, num_heads, head_dim, state_size]
    length: jax.Array   # [B] tokens absorbed so far

    @property
    def num_layers(self) -> int:
        return self.conv.shape[0]

    def reset(self) -> "SSMState":
        return SSMState(
            conv=jnp.zeros_like(self.conv),
            ssm=jnp.zeros_like(self.ssm),
            length=jnp.zeros_like(self.length),
        )


def init_ssm_state(cfg: UniversalConfig, batch: int, dtype=jnp.float32,
                   num_layers: int | None = None) -> SSMState:
    ssm = cfg.ssm
    assert ssm is not None
    d_inner = ssm.inner_size
    conv_dim = d_inner + 2 * ssm.n_groups * ssm.state_size
    cols = ssm.conv_kernel - 1
    if ssm.variant == "mamba3":
        # MIMO-widened (x|B|C) plus one extra column carrying the previous
        # token's post-activation (x|B) for the trapezoidal term; the conv
        # window occupies the leading columns only when use_conv is on
        # (models/mamba2.py _mamba3_mixer).
        from ..models.mamba2 import _m3_widths

        _, x_w, b_w, c_w = _m3_widths(ssm)
        conv_dim = x_w + b_w + c_w
        use_conv = False if ssm.use_conv is None else bool(ssm.use_conv)
        cols = (ssm.conv_kernel - 1 if use_conv else 0) + 1
    layers = num_layers if num_layers is not None else cfg.num_layers
    return SSMState(
        conv=jnp.zeros((layers, batch, conv_dim, cols),
                       dtype=dtype),
        ssm=jnp.zeros((layers, batch, ssm.num_heads, ssm.head_dim,
                       ssm.state_size), dtype=jnp.float32),
        length=jnp.zeros((batch,), dtype=jnp.int32),
    )
