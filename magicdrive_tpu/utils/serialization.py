"""Deployable weight serialization: flat-key .npz pytrees.

The counterpart of the reference's diffusers ``save_pretrained`` /
``from_pretrained`` weight dirs (ref:magicdrive/runner/multiview_runner.py:
233-242, ref:magicdrive/misc/test_utils.py:100-116): a self-describing,
framework-neutral format — one npz of flattened '/'-joined keys per module
collection — that the torch-checkpoint converter also targets.
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict

import numpy as np
from flax import traverse_util


def save_params(params: Dict[str, Any], out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    flat = traverse_util.flatten_dict(params, sep="/")
    arrays = {k: np.asarray(v) for k, v in flat.items()}
    manifest = {k: {"shape": list(v.shape), "dtype": str(v.dtype)}
                for k, v in arrays.items()}
    # npz has no bfloat16: store as float32, restore from the manifest dtype
    arrays = {k: (v.astype(np.float32) if str(v.dtype) == "bfloat16" else v)
              for k, v in arrays.items()}
    np.savez(os.path.join(out_dir, "params.npz"), **arrays)
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return out_dir


def load_params(out_dir: str) -> Dict[str, Any]:
    with open(os.path.join(out_dir, "manifest.json")) as f:
        manifest = json.load(f)
    with np.load(os.path.join(out_dir, "params.npz")) as z:
        flat = {}
        for k in z.files:
            v = z[k]
            if manifest.get(k, {}).get("dtype") == "bfloat16":
                import ml_dtypes

                v = v.astype(ml_dtypes.bfloat16)
            flat[k] = v
    return traverse_util.unflatten_dict(flat, sep="/")
