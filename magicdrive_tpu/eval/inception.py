"""FID InceptionV3 (pool3 features) in JAX/flax.

Port of the TF-FID Inception network as used by pytorch-fid
(ref:magicdrive/misc/inception.py — itself a port of the same weights;
consumed by ref:tools/fid_score.py:93-156). Structure follows torchvision
``inception_v3`` with the three FID modifications pytorch-fid applies:
FIDInceptionA/C use average pooling without count_include_pad, and the two
FIDInceptionE variants differ in their pooling branch (avg vs max).

Weights: convert a pytorch-fid/torchvision state dict with
:func:`convert_torch_inception` (the published pt_inception-2015-12-05
checkpoint); random init is only for shape/smoke tests — FID numbers
require converted weights.

Input contract: (B, 299, 299, 3) in [0, 1]; the module applies the TF
(x*2-1) normalization itself, like pytorch-fid's ``normalize_input``.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int]
    stride: int = 1
    padding: Any = 0

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(self.features, self.kernel, strides=(self.stride,) * 2,
                    padding=pad, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, epsilon=1e-3,
                         use_scale=True, use_bias=True, name="bn")(x)
        return nn.relu(x)


def _avg_pool(x, window=3, stride=1, pad=1, count_include_pad=False):
    """torch avg_pool2d semantics (count_include_pad=False per FID mods)."""
    s = (1, stride, stride, 1)
    w = (1, window, window, 1)
    padding = ((0, 0), (pad, pad), (pad, pad), (0, 0))
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, w, s, padding)
    if count_include_pad:
        return summed / (window * window)
    ones = jnp.ones_like(x[..., :1])
    counts = jax.lax.reduce_window(ones, 0.0, jax.lax.add, w, s, padding)
    return summed / counts


def _max_pool(x, window=3, stride=2, pad=0):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1),
        (1, stride, stride, 1), ((0, 0), (pad, pad), (pad, pad), (0, 0)))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(64, (1, 1), name="branch1x1")(x)
        b5 = ConvBN(48, (1, 1), name="branch5x5_1")(x)
        b5 = ConvBN(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool(x)  # FID: count_include_pad=False
        bp = ConvBN(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(384, (3, 3), stride=2, name="branch3x3")(x)
        bd = ConvBN(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = ConvBN(96, (3, 3), stride=2, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = ConvBN(192, (1, 1), name="branch1x1")(x)
        b7 = ConvBN(c7, (1, 1), name="branch7x7_1")(x)
        b7 = ConvBN(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = ConvBN(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = ConvBN(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = ConvBN(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = ConvBN(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool(x)  # FID mod
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = ConvBN(192, (1, 1), name="branch3x3_1")(x)
        b3 = ConvBN(320, (3, 3), stride=2, name="branch3x3_2")(b3)
        b7 = ConvBN(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = ConvBN(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = ConvBN(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = ConvBN(192, (3, 3), stride=2, name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool: str  # "avg" (E_1, FID count_include_pad=False) | "max" (E_2)

    @nn.compact
    def __call__(self, x):
        b1 = ConvBN(320, (1, 1), name="branch1x1")(x)
        b3 = ConvBN(384, (1, 1), name="branch3x3_1")(x)
        b3a = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = ConvBN(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = ConvBN(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = ConvBN(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = ConvBN(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool == "avg":
            bp = _avg_pool(x)
        else:  # FIDInceptionE_2 uses max pooling
            bp = _max_pool(x, window=3, stride=1, pad=1)
        bp = ConvBN(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Pool3(nn.Module):
    """Returns (B, 2048) pool3 activations."""

    normalize_input: bool = True

    @nn.compact
    def __call__(self, x):
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = ConvBN(32, (3, 3), stride=2, name="Conv2d_1a_3x3")(x)
        x = ConvBN(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = ConvBN(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = ConvBN(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = ConvBN(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (B, 2048)


def convert_torch_inception(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """pytorch-fid/torchvision inception state dict -> flax variables.

    Handles conv (OIHW->HWIO) and batchnorm (weight/bias/running stats).
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def put(tree, path, leaf):
        cur = tree
        for p in path[:-1]:
            cur = cur.setdefault(p, {})
        cur[path[-1]] = leaf

    for k, v in state_dict.items():
        v = np.asarray(v)
        parts = k.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            put(params, parts[:-1] + ["kernel"], v.transpose(2, 3, 1, 0))
        elif parts[-2] == "bn":
            name = parts[-1]
            if name == "weight":
                put(params, parts[:-1] + ["scale"], v)
            elif name == "bias":
                put(params, parts[:-1] + ["bias"], v)
            elif name == "running_mean":
                put(batch_stats, parts[:-1] + ["mean"], v)
            elif name == "running_var":
                put(batch_stats, parts[:-1] + ["var"], v)
        # fc layer (logits) unused for pool3 features
    return {"params": params, "batch_stats": batch_stats}


def load_inception(weights_path: Optional[str] = None,
                   rng: Optional[jax.Array] = None):
    """-> (module, variables). Random-init when no weights are given."""
    model = InceptionV3Pool3()
    if weights_path:
        import torch

        sd = torch.load(weights_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        return model, convert_torch_inception(
            {k: t.numpy() for k, t in sd.items()})
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 299, 299, 3)))
    return model, variables
