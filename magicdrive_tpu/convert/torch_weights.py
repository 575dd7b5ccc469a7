"""Torch-checkpoint -> JAX pytree weight conversion.

Imports the released SD-v1.5 and MagicDrive checkpoints (diffusers
``save_pretrained`` layout, ref:magicdrive/misc/test_utils.py:100-116) into
this framework's NHWC flax parameter trees, handling:

* conv kernels OIHW -> HWIO; linear weights (out, in) -> (in, out);
* norm ``weight`` -> ``scale`` (flax GroupNorm/LayerNorm);
* structural renames (``to_out.0`` -> ``to_out``, ``ff.net.0.proj`` ->
  ``ff/net_0_proj``, flattened VAE block names, CLIP ``text_model`` prefix);
* MagicDrive extras: cross-view ``norm4``/``attn4``/``connector``
  (ref:magicdrive/networks/blocks.py:67-99), ControlNet ``cam2token``,
  ``uncond_cam`` embedding, bbox embedder ``_class_tokens``/null features
  (ref:magicdrive/networks/{unet_addon_rawbox,bbox_embedder}.py).

Strategy: walk OUR parameter tree, derive each leaf's torch key, fetch and
transform. Unconsumed torch keys are reported so conversion gaps are loud,
not silent (SURVEY.md §7.4 #2: conversion fidelity must be tensor-by-tensor).
"""
from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
from flax import traverse_util

# names whose trailing _<digit> is part of the name, not a list index
_PRE_RULES: Sequence[Tuple[str, str]] = (
    (r"/LayerNorm_0", ""),
    (r"/GroupNorm_0", ""),
    (r"net_0_proj", "net.0.proj"),
    (r"net_2", "net.2"),
    (r"mlp_fc1", "mlp.fc1"),
    (r"mlp_fc2", "mlp.fc2"),
    (r"second_linear_(\d+)", r"second_linear.\1"),
    # VAE flattened block names
    (r"mid_block_resnets_(\d+)", r"mid_block.resnets.\1"),
    (r"mid_block_attentions_(\d+)", r"mid_block.attentions.\1"),
    (r"down_blocks_(\d+)_resnets_(\d+)", r"down_blocks.\1.resnets.\2"),
    (r"down_blocks_(\d+)_downsamplers_0_conv",
     r"down_blocks.\1.downsamplers.0.conv"),
    (r"up_blocks_(\d+)_resnets_(\d+)", r"up_blocks.\1.resnets.\2"),
    (r"up_blocks_(\d+)_upsamplers_0_conv", r"up_blocks.\1.upsamplers.0.conv"),
)
_KEEP_UNDERSCORE_NUM = {"linear_1", "linear_2", "norm1", "norm2", "norm3",
                        "norm4", "layer_norm1", "layer_norm2", "mlp_fc1",
                        "mlp_fc2"}


def _flax_path_to_torch_key(path: Tuple[str, ...]) -> Optional[str]:
    """'/'-joined flax path -> dotted torch key (without .weight/.bias)."""
    *mods, leaf = path
    s = "/".join(mods)
    for pat, rep in _PRE_RULES:
        s = re.sub(pat, rep, s)
    # generic list-index segments: name_<i> -> name.<i>
    prev = None
    while prev != s:
        prev = s
        s = re.sub(r"([A-Za-z0-9.]+)_(\d+)(/|$|\.)",
                   lambda m: (m.group(0) if m.group(1) + "_" + m.group(2)
                              in _KEEP_UNDERSCORE_NUM
                              else f"{m.group(1)}.{m.group(2)}{m.group(3)}"),
                   s)
    s = s.replace("/", ".")
    s = re.sub(r"\bto_out\b", "to_out.0", s)
    # leaf mapping
    if leaf in ("kernel", "scale", "embedding"):
        return s + ".weight"
    if leaf == "bias":
        return s + ".bias"
    if leaf in ("mean", "var"):  # batch stats (inception)
        return s + (".running_mean" if leaf == "mean" else ".running_var")
    # direct parameters (e.g. position_embedding, uncond_cam, alpha, null_*)
    return s + "." + leaf if s else leaf


def _transform(value: np.ndarray, path: Tuple[str, ...]) -> np.ndarray:
    leaf = path[-1]
    if leaf == "kernel":
        if value.ndim == 4:  # conv OIHW -> HWIO
            return value.transpose(2, 3, 1, 0)
        return value.T  # linear
    return value


# per-module key prefixes / special parameter names
_SPECIALS = {
    # flax path (joined, collection stripped) -> torch key
    "uncond_cam": "uncond_cam.weight",            # Embedding(1, 21)
    "position_embedding": "text_model.embeddings.position_embedding.weight",
    "bbox_embedder/class_tokens": "bbox_embedder._class_tokens",
}


def _strip_collection(path: Tuple[str, ...]) -> Tuple[str, ...]:
    """Drop the flax variable-collection level (params / buffers / ...)."""
    return path[1:] if path and path[0] in (
        "params", "buffers", "batch_stats") else path


def convert_module(flax_params: Dict[str, Any],
                   torch_sd: Dict[str, np.ndarray],
                   prefix: str = "",
                   strict: bool = True) -> Tuple[Dict[str, Any], List[str]]:
    """Fill a flax params tree from a torch state dict.

    Returns (converted tree, missing torch keys). Shapes are checked leaf by
    leaf; mismatches raise.
    """
    flat = traverse_util.flatten_dict(flax_params)
    out = {}
    missing: List[str] = []
    for path, tmpl in flat.items():
        spath = _strip_collection(path)
        joined = "/".join(spath)
        if joined in _SPECIALS:
            tkey = _SPECIALS[joined]
        else:
            tkey = _flax_path_to_torch_key(spath)
        tkey = prefix + tkey if tkey else tkey
        if tkey not in torch_sd:
            missing.append(tkey)
            out[path] = tmpl
            continue
        v = _transform(np.asarray(torch_sd[tkey]), spath)
        if tuple(v.shape) != tuple(np.shape(tmpl)):
            if joined == "uncond_cam":
                v = v.reshape(np.shape(tmpl))
            else:
                raise ValueError(
                    f"shape mismatch {joined} <- {tkey}: "
                    f"{v.shape} vs {np.shape(tmpl)}")
        out[path] = v.astype(np.asarray(tmpl).dtype)
    if strict and missing:
        raise KeyError(f"{len(missing)} flax leaves missing in torch sd, "
                       f"e.g. {missing[:8]}")
    return traverse_util.unflatten_dict(out), missing


def _clip_prefix_key(path: Tuple[str, ...]) -> str:
    s = _flax_path_to_torch_key(path)
    if s.startswith("token_embedding"):
        return "text_model.embeddings." + s
    if s.startswith("layers."):
        return "text_model.encoder." + s
    if s.startswith("final_layer_norm") or s.startswith("position_embedding"):
        return "text_model." + s
    return s


def convert_clip(flax_params: Dict[str, Any],
                 torch_sd: Dict[str, np.ndarray],
                 strict: bool = True) -> Dict[str, Any]:
    """transformers CLIPTextModel state dict -> our CLIPTextModel params."""
    flat = traverse_util.flatten_dict(flax_params)
    out = {}
    missing = []
    for path, tmpl in flat.items():
        spath = _strip_collection(path)
        joined = "/".join(spath)
        tkey = _SPECIALS.get(joined) or _clip_prefix_key(spath)
        if tkey not in torch_sd:
            missing.append(tkey)
            out[path] = tmpl
            continue
        v = _transform(np.asarray(torch_sd[tkey]), spath)
        if tuple(v.shape) != tuple(np.shape(tmpl)):
            raise ValueError(f"shape mismatch {joined} <- {tkey}")
        out[path] = v.astype(np.asarray(tmpl).dtype)
    if strict and missing:
        raise KeyError(f"CLIP conversion missing {missing[:8]}")
    return traverse_util.unflatten_dict(out)


def convert_bbox_embedder_buffers(torch_sd: Dict[str, np.ndarray],
                                  prefix: str = "bbox_embedder.") -> Optional[np.ndarray]:
    """The reference stores CLIP-initialized class tokens as ``_class_tokens``
    (buffer or parameter, ref:bbox_embedder.py:83-90)."""
    k = prefix + "_class_tokens"
    return np.asarray(torch_sd[k]) if k in torch_sd else None


def normalize_vae_attention_keys(sd: Dict[str, np.ndarray]
                                 ) -> Dict[str, np.ndarray]:
    """Old-format VAE checkpoints (the released SD-v1.5 weights) name the
    mid-block attention query/key/value/proj_attn; diffusers renamed them
    to_q/to_k/to_v/to_out.0. Normalize to the new names."""
    ren = {".query.": ".to_q.", ".key.": ".to_k.", ".value.": ".to_v.",
           ".proj_attn.": ".to_out.0."}
    out = {}
    for k, v in sd.items():
        for old, new in ren.items():
            if ".attentions." in k and old in k:
                k = k.replace(old, new)
                break
        out[k] = v
    return out


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a .bin/.pt/.safetensors state dict to numpy."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}


def find_weights_file(model_dir: str) -> str:
    import os

    for name in ("diffusion_pytorch_model.safetensors",
                 "diffusion_pytorch_model.bin", "model.safetensors",
                 "pytorch_model.bin"):
        p = os.path.join(model_dir, name)
        if os.path.isfile(p):
            return p
    raise FileNotFoundError(f"no weights file under {model_dir}")
