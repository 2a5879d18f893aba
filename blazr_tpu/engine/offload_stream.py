"""Streaming execution over host-offloaded layers.

TPU-native replacement for the reference's partial-residency story: the
reference hard-errors when a model is not fully device-resident
(offloading.rs:170-183) and only the layers-range path touches host
layers. Here a ``StreamingModel`` runs device-resident layers in one
jitted prefix, then streams each host-resident layer's params over PCIe
while the PREVIOUS layer computes (JAX dispatch is async: ``device_put``
of layer i+1 is issued before layer i's compute is awaited), so transfer
and compute overlap.

The decode regime is transfer-bound (a 7B bf16 layer ≈ 0.4 GB ≈ 25 ms
over PCIe vs ≈ 1 ms compute), which is why the reference treats offload
as a loading convenience, not a serving mode — same trade-off here, but
streaming works end-to-end instead of erroring.

Supports the attention families whose params are ``{"layers": [...]}``
(llama/mistral/qwen/phi/gemma). The KV cache stays fully device-resident
(it is small next to weights and updated every step).
"""

from __future__ import annotations

import functools
import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..loader.offloading import LayerDeviceMap
from ..models import llama

logger = logging.getLogger(__name__)


class StreamingModel:
    """Drop-in ``Model``-like forward over a partially host-resident
    parameter set."""

    def __init__(self, model, layer_map: LayerDeviceMap):
        if "layers" not in model.params:
            raise ValueError(
                "streaming offload supports attention-family models "
                f"(params have no 'layers'): {model.cfg.model_type}")
        self.cfg = model.cfg
        self.dtype = model.dtype
        self.forward_fn = model.forward_fn     # introspection compat
        # Multimodal attributes must survive the rebind (attach_vision
        # runs before maybe_stream; dropping them silently disabled
        # image input under --device-layers).
        self.is_multimodal = getattr(model, "is_multimodal", False)
        self.vision_params = getattr(model, "vision_params", None)
        self.vision_cfg = getattr(model, "vision_cfg", None)
        self.layer_map = layer_map
        L = model.cfg.num_layers
        D = layer_map.num_device_layers
        self.num_device_layers = D

        self.device_params = dict(model.params)
        self.device_params["layers"] = list(model.params["layers"][:D])
        # Host copies of the offloaded layers (freed from device).
        self.host_layers = [jax.device_get(lp)
                            for lp in model.params["layers"][D:]]
        logger.info("streaming offload: %d device + %d host layers",
                    D, L - D)

        cfg = self.cfg

        @functools.partial(jax.jit, donate_argnums=(1,))
        def _prefix(dp, cache, tokens, positions, seq_lens):
            h = llama.forward_embed(dp, cfg, tokens)
            if D > 0:
                h, cache = llama.forward_layers_range(
                    dp, cfg, h, cache, positions, 0, D, seq_lens,
                    cache_layer_offset=0)
            return h, cache

        @functools.partial(jax.jit, donate_argnums=(1,))
        def _one_layer(lp, cache, h, positions, slot, seq_lens):
            return llama.forward_layers_range(
                {"layers": [lp]}, cfg, h, cache, positions, 0, 1, seq_lens,
                cache_layer_offset=slot)

        @jax.jit
        def _head(dp, h):
            return llama.forward_head(dp, cfg, h)

        self._prefix = _prefix
        self._one_layer = _one_layer
        self._head = _head

    # -- Model-compatible surface -----------------------------------------
    is_streaming = True

    @property
    def params(self):
        # Device-resident part (embed/head/early layers) — what
        # non-layer code paths (e.g. the embeddings endpoint) need.
        return self.device_params

    @property
    def num_layers(self) -> int:
        return self.cfg.num_layers

    @property
    def hidden_size(self) -> int:
        return self.cfg.hidden_size

    @property
    def vocab_size(self) -> int:
        return self.cfg.vocab_size

    @property
    def num_kv_heads(self) -> int:
        return self.cfg.attention.kv_heads()

    @property
    def head_dim(self) -> int:
        return self.cfg.attention.resolved_head_dim(self.cfg.hidden_size)

    needs_ssm_state = False
    needs_kv_cache = True

    def init_cache(self, batch: int, capacity: int):
        from ..kvcache.contiguous import init_kv_cache

        att = self.cfg.attention
        return init_kv_cache(
            self.cfg.num_layers, batch, capacity, att.kv_heads(),
            att.resolved_head_dim(self.cfg.hidden_size), dtype=self.dtype)

    def forward(self, tokens: jax.Array, cache, positions: jax.Array,
                seq_lens: Optional[jax.Array] = None):
        h, cache = self._prefix(self.device_params, cache, tokens,
                                positions, seq_lens)
        n_host = len(self.host_layers)
        if n_host:
            # Prefetch pipeline: layer i+1's transfer is in flight while
            # layer i computes (dispatch is async; nothing blocks until
            # the final fetch).
            staged = jax.device_put(self.host_layers[0])
            for i in range(n_host):
                nxt = (jax.device_put(self.host_layers[i + 1])
                       if i + 1 < n_host else None)
                slot = jnp.int32(self.num_device_layers + i)
                h, cache = self._one_layer(staged, cache, h, positions,
                                           slot, seq_lens)
                staged = nxt
        return self._head(self.device_params, h), cache


def maybe_stream(model, layer_map: Optional[LayerDeviceMap]):
    """Wrap ``model`` for streaming iff the placement map says some layers
    live on host."""
    if layer_map is None or layer_map.fully_resident:
        return model
    return StreamingModel(model, layer_map)
