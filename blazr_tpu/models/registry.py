"""Model registry: UniversalConfig + VarMap → (forward fn, params, cache init).

TPU-native equivalent of boostr ``LoadedModel::load(&UniversalConfig,
&mut VarBuilder)`` + its forward-dispatch surface (SURVEY §2.9 "Model
layer" row). The registry resolves the architecture (llama-family, mamba2,
MLA/DeepSeek, MoE, hybrid), pulls weights out of a VarMap, places them on
device in the requested dtype, and returns a ``Model`` handle exposing the
reference's introspection surface (num_layers/num_kv_heads/head_dim/...).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.model_config import (
    LAYER_ATTENTION,
    LAYER_MAMBA2,
    UniversalConfig,
)
from ..kvcache.contiguous import KVCache, init_kv_cache
from ..quant.qtensor import QuantTensor

if False:  # type-checking only; avoids loader<->models import cycle
    from ..loader.varmap import VarMap


def _place(w, dtype, transpose: bool = False):
    """VarMap weight → device array. Dense [out,in] transposes to [in,out];
    QuantTensors are already canonical [in,out]."""
    if w is None:
        return None
    if isinstance(w, QuantTensor):
        return w
    arr = np.asarray(w)
    if transpose and arr.ndim == 2:
        arr = arr.T
    return jnp.asarray(arr, dtype=dtype)


class ParamBuilder:
    """Helper around VarMap with fallback names and device placement."""

    def __init__(self, vm: "VarMap", dtype):
        self.vm = vm
        self.dtype = dtype

    def get(self, *names: str, transpose: bool = False, required: bool = True,
            dtype=None):
        for n in names:
            if n in self.vm:
                return _place(self.vm.take(n), dtype or self.dtype, transpose)
        if required:
            raise KeyError(f"Missing tensor (tried {names})")
        return None


# ---------------------------------------------------------------------------
# Llama-family params
# ---------------------------------------------------------------------------

def build_llama_layer_params(pb: ParamBuilder, i: int, cfg: UniversalConfig) -> dict:
    p = f"model.layers.{i}."
    out: dict[str, Any] = {
        "input_norm": pb.get(p + "input_layernorm.weight"),
        "post_norm": pb.get(p + "post_attention_layernorm.weight"),
        "o": pb.get(p + "self_attn.o_proj.weight",
                    p + "self_attn.dense.weight", transpose=True),
    }
    # Phi3-style fused projections map directly onto our fused fast path.
    qkv = pb.get(p + "self_attn.qkv_proj.weight", transpose=True,
                 required=False)
    if qkv is not None:
        out["qkv"] = qkv
    else:
        out["q"] = pb.get(p + "self_attn.q_proj.weight", transpose=True)
        out["k"] = pb.get(p + "self_attn.k_proj.weight", transpose=True)
        out["v"] = pb.get(p + "self_attn.v_proj.weight", transpose=True)
    is_moe_layer = cfg.moe is not None and (
        p + "mlp.gate.weight" in pb.vm
        or p + "block_sparse_moe.gate.weight" in pb.vm
        or p + "mlp.experts.gate_proj.weight" in pb.vm
        or p + "mlp.experts.0.gate_proj.weight" in pb.vm
        or p + "block_sparse_moe.experts.0.w1.weight" in pb.vm
    )
    if is_moe_layer:
        from .moe import build_moe_params

        out["moe"] = build_moe_params(pb, p, cfg)
    else:
        gu = pb.get(p + "mlp.gate_up_proj.weight", transpose=True,
                    required=False)
        fc = pb.get(p + "mlp.c_fc.weight", transpose=True, required=False)
        if fc is not None:                  # starcoder2 plain MLP
            out["fc"] = fc
            out["fc_bias"] = pb.get(p + "mlp.c_fc.bias", required=False)
            out["down"] = pb.get(p + "mlp.c_proj.weight", transpose=True)
            out["down_bias"] = pb.get(p + "mlp.c_proj.bias", required=False)
        elif gu is not None:
            out["gateup"] = gu
            out["down"] = pb.get(p + "mlp.down_proj.weight", transpose=True)
        else:
            out["gate"] = pb.get(p + "mlp.gate_proj.weight", transpose=True)
            out["up"] = pb.get(p + "mlp.up_proj.weight", transpose=True)
            out["down"] = pb.get(p + "mlp.down_proj.weight", transpose=True)
    for side in ("q", "k", "v", "o"):
        b = pb.get(p + f"self_attn.{side}_proj.bias", required=False)
        if b is not None:
            out[f"{side}_bias"] = b
    for nk, name in (("input_norm_bias", "input_layernorm.bias"),
                     ("post_norm_bias", "post_attention_layernorm.bias")):
        b = pb.get(p + name, required=False)
        if b is not None:
            out[nk] = b
    qn = pb.get(p + "self_attn.q_norm.weight", required=False)
    if qn is not None:
        out["q_norm"] = qn
        out["k_norm"] = pb.get(p + "self_attn.k_norm.weight")
    # Gemma2 sandwich norms
    pan = pb.get(p + "post_attention_layernorm.weight", required=False)         if False else None
    pre_ffw = pb.get(p + "pre_feedforward_layernorm.weight", required=False)
    if pre_ffw is not None:
        # Gemma2 naming: post_attention_layernorm is the POST-ATTN sandwich
        # norm; pre_feedforward replaces our "post_norm" slot.
        out["post_attn_norm"] = out["post_norm"]
        out["post_norm"] = pre_ffw
        out["post_ffw_norm"] = pb.get(
            p + "post_feedforward_layernorm.weight", required=False)
    return out


def _split_falcon_qkv(fused: np.ndarray, n_heads: int, n_kv: int,
                      head_dim: int) -> tuple[np.ndarray, ...]:
    """De-interleave HF falcon's fused query_key_value into contiguous
    q/k/v (HF FalconAttention._split_heads layouts). One reshape covers
    all three variants: grouped [n_kv, q_per+2, hd] is per-head
    interleaved [n, 3, hd] when n_kv == n_heads and contiguous q|k|v when
    n_kv == 1 (multi_query)."""
    q_per = n_heads // n_kv
    rest = fused.shape[1:]                   # (hidden,) for W, () for bias
    g = fused.reshape(n_kv, q_per + 2, head_dim, *rest)
    q = g[:, :q_per].reshape(n_heads * head_dim, *rest)
    k = g[:, -2].reshape(n_kv * head_dim, *rest)
    v = g[:, -1].reshape(n_kv * head_dim, *rest)
    return q, k, v


def build_falcon_params(cfg: UniversalConfig, vm: "VarMap",
                        dtype=jnp.bfloat16) -> dict:
    """Falcon family (reference gguf.rs:137-149 arch table + ALiBi detect
    :199-202): fused MQA/GQA query_key_value de-interleaved at load,
    LayerNorm, non-gated GELU MLP, parallel residual blocks.

    Accepts HF names (``transformer.h.{i}.``) and GGUF-normalized names
    (``model.layers.{i}.`` after formats/names.py mapping). Quantized
    falcon checkpoints keep q/k/v fused only if already split; a fused
    QuantTensor cannot be de-interleaved losslessly, so it is rejected."""
    att = cfg.attention
    head_dim = att.resolved_head_dim(cfg.hidden_size)
    n_heads, n_kv = att.num_heads, att.kv_heads()
    pb = ParamBuilder(vm, dtype)

    def first(*names, required=True):
        for n in names:
            if n in vm:
                return n
        if required:
            raise KeyError(f"Missing tensor (tried {names})")
        return None

    layers = []
    for i in range(cfg.num_layers):
        hf = f"transformer.h.{i}."
        gg = f"model.layers.{i}."
        out: dict[str, Any] = {}
        # Norms: old arch single input_layernorm (+post_attention_layernorm
        # when sequential); new arch ln_attn + ln_mlp.
        out["input_norm"] = pb.get(hf + "ln_attn.weight",
                                   hf + "input_layernorm.weight",
                                   gg + "input_layernorm.weight")
        out["input_norm_bias"] = pb.get(
            hf + "ln_attn.bias", hf + "input_layernorm.bias",
            gg + "input_layernorm.bias", required=False)
        pn = first(hf + "ln_mlp.weight",
                   hf + "post_attention_layernorm.weight",
                   gg + "pre_feedforward_layernorm.weight",
                   gg + "post_attention_layernorm.weight", required=False)
        if pn is not None:
            out["post_norm"] = pb.get(pn)
            out["post_norm_bias"] = pb.get(
                pn[: -len(".weight")] + ".bias", required=False)
        qkv_name = first(hf + "self_attention.query_key_value.weight",
                         gg + "self_attn.query_key_value.weight")
        fused = vm.take(qkv_name)
        if isinstance(fused, QuantTensor):
            raise ValueError(
                "quantized falcon checkpoints must store q/k/v unfused "
                "(fused query_key_value QuantTensor cannot be de-interleaved)")
        q, k, v = _split_falcon_qkv(np.asarray(fused), n_heads, n_kv, head_dim)
        out["q"], out["k"], out["v"] = (
            _place(q, dtype, transpose=True),
            _place(k, dtype, transpose=True),
            _place(v, dtype, transpose=True))
        bias_name = qkv_name[: -len(".weight")] + ".bias"
        if bias_name in vm:
            qb, kb, vb = _split_falcon_qkv(
                np.asarray(vm.take(bias_name)), n_heads, n_kv, head_dim)
            out["q_bias"] = _place(qb, dtype)
            out["k_bias"] = _place(kb, dtype)
            out["v_bias"] = _place(vb, dtype)
        out["o"] = pb.get(hf + "self_attention.dense.weight",
                          gg + "self_attn.o_proj.weight", transpose=True)
        out["o_bias"] = pb.get(hf + "self_attention.dense.bias",
                               gg + "self_attn.o_proj.bias", required=False)
        out["fc"] = pb.get(hf + "mlp.dense_h_to_4h.weight",
                           gg + "mlp.up_proj.weight", transpose=True)
        out["fc_bias"] = pb.get(hf + "mlp.dense_h_to_4h.bias",
                                gg + "mlp.up_proj.bias", required=False)
        out["down"] = pb.get(hf + "mlp.dense_4h_to_h.weight",
                             gg + "mlp.down_proj.weight", transpose=True)
        out["down_bias"] = pb.get(hf + "mlp.dense_4h_to_h.bias",
                                  gg + "mlp.down_proj.bias", required=False)
        layers.append(out)

    params: dict[str, Any] = {
        "embed": pb.get("transformer.word_embeddings.weight",
                        "model.embed_tokens.weight"),
        "final_norm": pb.get("transformer.ln_f.weight", "model.norm.weight"),
        "layers": layers,
    }
    fnb = pb.get("transformer.ln_f.bias", "model.norm.bias", required=False)
    if fnb is not None:
        params["final_norm_bias"] = fnb
    params["lm_head"] = pb.get("lm_head.weight", transpose=True,
                               required=False)
    if params["lm_head"] is None and not cfg.tie_word_embeddings:
        cfg.tie_word_embeddings = True
    return params


def build_llama_params(cfg: UniversalConfig, vm: "VarMap", dtype=jnp.bfloat16) -> dict:
    pb = ParamBuilder(vm, dtype)
    params: dict[str, Any] = {
        "embed": pb.get("model.embed_tokens.weight", "embed_tokens.weight"),
        "final_norm": pb.get("model.norm.weight"),
        "layers": [build_llama_layer_params(pb, i, cfg) for i in range(cfg.num_layers)],
    }
    fnb = pb.get("model.norm.bias", required=False)
    if fnb is not None:
        params["final_norm_bias"] = fnb
    params["lm_head"] = pb.get("lm_head.weight", transpose=True, required=False)
    if params["lm_head"] is None and not cfg.tie_word_embeddings:
        cfg.tie_word_embeddings = True
    return params


# ---------------------------------------------------------------------------
# Model handle
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class Model:
    """Loaded-model handle (the reference's LoadedModel introspection
    surface: num_layers/num_kv_heads/head_dim/hidden_size/vocab_size/
    needs_ssm_state/needs_kv_cache)."""

    cfg: UniversalConfig
    params: dict[str, Any]
    dtype: Any
    forward_fn: Callable[..., tuple[jax.Array, Any]]
    # Vision tower (multimodal checkpoints; reference LoadedModel::Multimodal)
    vision_params: Any = None
    vision_cfg: Any = None

    @property
    def is_multimodal(self) -> bool:
        return self.vision_params is not None

    # ---- introspection ---------------------------------------------------
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
        return self.cfg.attention.kv_heads() if self.cfg.attention else 0

    @property
    def head_dim(self) -> int:
        if self.cfg.attention is None:
            return 0
        return self.cfg.attention.resolved_head_dim(self.cfg.hidden_size)

    @property
    def needs_ssm_state(self) -> bool:
        return self.cfg.needs_ssm_state

    @property
    def needs_kv_cache(self) -> bool:
        return self.cfg.needs_kv_cache

    # ---- cache management ------------------------------------------------
    def init_cache(self, batch: int, capacity: int,
                   kv_quant: bool = False, kv_dtype: str = "int8") -> Any:
        if self.cfg.model_type in ("mamba2", "mamba3"):
            from ..kvcache.ssm_state import init_ssm_state

            return init_ssm_state(self.cfg, batch, dtype=self.dtype)
        if self.cfg.hybrid_layers or (self.needs_ssm_state and self.needs_kv_cache):
            from .hybrid import init_hybrid_state

            return init_hybrid_state(self.cfg, batch, capacity, dtype=self.dtype)
        if self.cfg.attention is not None and self.cfg.attention.is_mla:
            from .mla import init_mla_cache

            return init_mla_cache(self.cfg, batch, capacity, dtype=self.dtype,
                                  quantized=kv_quant)
        return init_kv_cache(
            self.num_layers, batch, capacity, self.num_kv_heads, self.head_dim,
            dtype=self.dtype, quantized=kv_quant, kv_dtype=kv_dtype,
        )

    # ---- forward ---------------------------------------------------------
    def forward(self, tokens: jax.Array, cache: Any, positions: jax.Array,
                seq_lens: Optional[jax.Array] = None):
        return self.forward_fn(self.params, self.cfg, tokens, cache, positions,
                               seq_lens)


def build_model(cfg: UniversalConfig, vm: "VarMap", dtype=jnp.bfloat16) -> Model:
    """Resolve architecture → build params → return Model handle."""
    types = set(cfg.layer_types())
    if types == {LAYER_MAMBA2}:
        from . import mamba2

        return Model(cfg, mamba2.build_mamba2_params(cfg, vm, dtype), dtype,
                     mamba2.forward)
    if LAYER_MAMBA2 in types:
        from . import hybrid

        return Model(cfg, hybrid.build_hybrid_params(cfg, vm, dtype), dtype,
                     hybrid.forward)
    if cfg.attention is not None and cfg.attention.is_mla:
        from . import mla

        return Model(cfg, mla.build_mla_params(cfg, vm, dtype), dtype, mla.forward)
    from . import llama

    if cfg.model_type == "falcon":
        return Model(cfg, build_falcon_params(cfg, vm, dtype), dtype,
                     llama.forward)
    return Model(cfg, build_llama_params(cfg, vm, dtype), dtype, llama.forward)
