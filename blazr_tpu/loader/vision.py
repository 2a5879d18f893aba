"""Vision tower / mmproj loading for multimodal checkpoints.

TPU-native port of the reference vision loader (src/loader/vision.rs:25-164):
GGUF ``mmproj`` sidecar files (llama.cpp clip convention, ``v.*``/``mm.*``
tensor names) and HF LLaVA-style checkpoints (``vision_tower.*`` +
``multi_modal_projector.*``) are normalized into the vision parameter
pytree consumed by :func:`blazr_tpu.models.vision.encode_images`.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Any, Optional

import jax.numpy as jnp
import numpy as np

from ..config.model_config import UniversalConfig, VisionConfig
from ..formats.gguf import Gguf
from .varmap import VarMap

logger = logging.getLogger(__name__)


# ---------------------------------------------------------------------------
# mmproj discovery + metadata
# ---------------------------------------------------------------------------

def find_mmproj(model_path: str | Path) -> Optional[Path]:
    """Locate a GGUF mmproj sidecar next to the model
    (llama.cpp convention: ``mmproj-*.gguf`` / ``*mmproj*.gguf``)."""
    p = Path(model_path)
    d = p if p.is_dir() else p.parent
    if not d.exists():
        return None
    for f in sorted(d.glob("*.gguf")):
        if "mmproj" in f.name.lower():
            return f
    return None


def detect_vision_config_from_mmproj(g: Gguf) -> Optional[VisionConfig]:
    """clip.vision.* metadata → VisionConfig (reference vision.rs:127-152)."""
    meta = g.metadata()
    image_size = meta.get_u32("clip.vision.image_size")
    patch_size = meta.get_u32("clip.vision.patch_size")
    hidden = meta.get_u32("clip.vision.embedding_length")
    layers = meta.get_u32("clip.vision.block_count")
    heads = meta.get_u32("clip.vision.head_count")
    if None in (image_size, patch_size, hidden, layers, heads):
        return None
    inter = meta.get_u32("clip.vision.feed_forward_length") or hidden * 4
    proj = meta.get_u32("clip.vision.projection_dim") or hidden
    return VisionConfig(
        hidden_size=hidden, num_layers=layers, num_heads=heads,
        image_size=image_size, patch_size=patch_size,
        intermediate_size=inter, projection_dim=proj,
    )


# ---------------------------------------------------------------------------
# GGUF mmproj tensor remap
# ---------------------------------------------------------------------------

def remap_mmproj_name(name: str) -> str:
    """GGUF clip tensor name → HF-style ``vision_model.*`` name
    (reference vision.rs:97-124). Accepts both ``v.enc.blk.`` (reference)
    and ``v.blk.`` (llama.cpp clip.cpp) encoder prefixes."""
    for pre in ("v.enc.blk.", "v.blk."):
        if name.startswith(pre):
            rest = name[len(pre):]
            rest = (rest.replace("attn_q.", "q_proj.")
                        .replace("attn_k.", "k_proj.")
                        .replace("attn_v.", "v_proj.")
                        .replace("attn_out.", "out_proj.")
                        .replace("ln1.", "layer_norm1.")
                        .replace("ln2.", "layer_norm2.")
                        .replace("ffn_down.", "fc1.")
                        .replace("ffn_up.", "fc2."))
            return f"vision_model.encoder.layers.{rest}"
    if name.startswith("v."):
        rest = (name[2:].replace("patch_embd", "patch_embedding")
                        .replace("position_embd.weight", "position_embedding")
                        .replace("position_embd", "position_embedding")
                        .replace("class_embd", "class_embedding")
                        .replace("pre_ln", "ln_pre")
                        .replace("post_ln", "ln_post"))
        return f"vision_model.{rest}"
    if name.startswith("mm."):
        rest = name[3:]
        if rest.startswith("0."):
            rest = "linear1." + rest[2:]
        elif rest.startswith("2."):
            rest = "linear2." + rest[2:]
        return f"vision_model.projector.{rest}"
    return f"vision_model.{name}"


def varmap_from_mmproj(path: str | Path) -> VarMap:
    """Load + remap a GGUF mmproj file into HF-orientation dense tensors
    (reference vision.rs:25-49). Vision weights are small; always dense."""
    vm = VarMap()
    with Gguf.open(path) as g:
        for name in g.tensor_names():
            vm.insert(remap_mmproj_name(name), g.load_numpy(name))
    logger.info("loaded %d tensors from mmproj %s", len(vm), path)
    return vm


# ---------------------------------------------------------------------------
# vision params builder (shared by GGUF-remapped and HF names)
# ---------------------------------------------------------------------------

def _get(vm: VarMap, *names: str, required: bool = True):
    for n in names:
        if n in vm:
            return np.asarray(vm.take(n))
    if required:
        raise KeyError(f"Missing vision tensor (tried {names})")
    return None


def build_vision_params(vm: VarMap, vcfg: VisionConfig,
                        dtype=jnp.float32) -> dict[str, Any]:
    """HF-convention vision tensors → the encode_images param pytree.

    Handles both the GGUF-remapped names (``vision_model.*``,
    ``vision_model.projector.linear{1,2}``) and HF LLaVA names
    (``vision_tower.vision_model.*``, ``multi_modal_projector.linear_{1,2}``).
    Linear weights arrive [out, in] and transpose to the [in, out] layout
    the kernels use.
    """
    P = ("vision_model.", "vision_tower.vision_model.")

    def g(suffixes: tuple[str, ...] | str, required=True):
        if isinstance(suffixes, str):
            suffixes = (suffixes,)
        return _get(vm, *[p + s for s in suffixes for p in P],
                    required=required)

    def lin(w):                                   # [out,in] → [in,out]
        return None if w is None else jnp.asarray(w.T, dtype=dtype)

    def vec(w):
        return None if w is None else jnp.asarray(w, dtype=dtype)

    patch = g(("embeddings.patch_embedding.weight", "patch_embedding.weight"))
    h = patch.shape[0]
    # Conv kernel [h, 3, ps, ps] → [3*ps*ps, h] matching the unfold order.
    patch = patch.reshape(h, -1).T

    cls = g(("embeddings.class_embedding", "class_embedding"), required=False)
    pos = g(("embeddings.position_embedding.weight", "position_embedding"))

    layers = []
    for i in range(vcfg.num_layers):
        lp = (f"encoder.layers.{i}.",)

        def lg(suffixes, required=True):
            if isinstance(suffixes, str):
                suffixes = (suffixes,)
            return g(tuple(l + s for l in lp for s in suffixes), required)

        fc1 = lg(("mlp.fc1.weight", "fc1.weight"))
        fc2 = lg(("mlp.fc2.weight", "fc2.weight"))
        # GGUF ffn_down/up naming can land swapped relative to CLIP's
        # fc1 (h→inter, stored [inter, h]) / fc2 (inter→h): fix by shape.
        if fc1.shape[1] != h:
            fc1, fc2 = fc2, fc1
        layers.append({
            "norm1": vec(lg(("layer_norm1.weight", "ln1.weight"))),
            "norm1_bias": vec(lg(("layer_norm1.bias", "ln1.bias"),
                                 required=False)),
            "norm2": vec(lg(("layer_norm2.weight", "ln2.weight"))),
            "norm2_bias": vec(lg(("layer_norm2.bias", "ln2.bias"),
                                 required=False)),
            "q": lin(lg(("self_attn.q_proj.weight", "q_proj.weight"))),
            "k": lin(lg(("self_attn.k_proj.weight", "k_proj.weight"))),
            "v": lin(lg(("self_attn.v_proj.weight", "v_proj.weight"))),
            "o": lin(lg(("self_attn.out_proj.weight", "out_proj.weight"))),
            "q_bias": vec(lg(("self_attn.q_proj.bias", "q_proj.bias"),
                             required=False)),
            "k_bias": vec(lg(("self_attn.k_proj.bias", "k_proj.bias"),
                             required=False)),
            "v_bias": vec(lg(("self_attn.v_proj.bias", "v_proj.bias"),
                             required=False)),
            "o_bias": vec(lg(("self_attn.out_proj.bias", "out_proj.bias"),
                             required=False)),
            "fc1": lin(fc1),
            "fc1_bias": vec(lg(("mlp.fc1.bias", "fc1.bias"), required=False)),
            "fc2": lin(fc2),
            "fc2_bias": vec(lg(("mlp.fc2.bias", "fc2.bias"), required=False)),
        })

    proj_fc1 = _get(vm, "vision_model.projector.linear1.weight",
                    "multi_modal_projector.linear_1.weight",
                    "multi_modal_projector.linear1.weight")
    proj_fc2 = _get(vm, "vision_model.projector.linear2.weight",
                    "multi_modal_projector.linear_2.weight",
                    "multi_modal_projector.linear2.weight")
    # The projector output IS the LLM embedding width — trust shapes over
    # any config default (HF CLIP projection_dim is the contrastive head,
    # not the LLaVA projector).
    vcfg.projection_dim = proj_fc2.shape[0]

    return {
        "patch_embed": jnp.asarray(patch, dtype=dtype),
        "cls_token": (jnp.asarray(cls.reshape(1, -1), dtype=dtype)
                      if cls is not None else None),
        "pos_embed": jnp.asarray(pos, dtype=dtype),
        "pre_norm": vec(g(("pre_layrnorm.weight", "pre_layernorm.weight",
                           "ln_pre.weight"), required=False)),
        "pre_norm_bias": vec(g(("pre_layrnorm.bias", "pre_layernorm.bias",
                                "ln_pre.bias"), required=False)),
        "post_norm": vec(g(("post_layernorm.weight", "ln_post.weight"),
                           required=False)),
        "post_norm_bias": vec(g(("post_layernorm.bias", "ln_post.bias"),
                                required=False)),
        "layers": layers,
        "proj_fc1": lin(proj_fc1),
        "proj_fc1_bias": vec(_get(
            vm, "vision_model.projector.linear1.bias",
            "multi_modal_projector.linear_1.bias", required=False)),
        "proj_fc2": lin(proj_fc2),
        "proj_fc2_bias": vec(_get(
            vm, "vision_model.projector.linear2.bias",
            "multi_modal_projector.linear_2.bias", required=False)),
    }


# ---------------------------------------------------------------------------
# top-level attach
# ---------------------------------------------------------------------------

def has_vision_tensors(vm: VarMap) -> bool:
    return any(n.startswith(("vision_tower.", "vision_model."))
               for n in vm.names())


def attach_vision(model, model_cfg: UniversalConfig,
                  source_path: str | Path, vm: VarMap,
                  mmproj_path: Optional[str | Path] = None) -> None:
    """Populate ``model.vision_params``/``model.vision_cfg`` from an
    mmproj sidecar or in-checkpoint vision tower, if either exists
    (reference load_gguf_with_mmproj, vision.rs:56-95)."""
    vcfg = model_cfg.vision
    vvm: Optional[VarMap] = None

    mmproj = Path(mmproj_path) if mmproj_path else find_mmproj(source_path)
    if mmproj is not None and mmproj.exists():
        with Gguf.open(mmproj) as g:
            detected = detect_vision_config_from_mmproj(g)
        vcfg = vcfg or detected
        vvm = varmap_from_mmproj(mmproj)
    elif has_vision_tensors(vm):
        vvm = vm

    if vvm is None or vcfg is None:
        if vvm is not None:
            logger.warning("vision tensors present but no vision config; "
                           "skipping vision tower")
        return
    model_cfg.vision = vcfg
    model.vision_params = build_vision_params(vvm, vcfg)
    model.vision_cfg = vcfg
    logger.info("vision tower attached: %d layers, image %d, patch %d",
                vcfg.num_layers, vcfg.image_size, vcfg.patch_size)
