"""Conditioning embedders: camera pose, 3D bounding boxes, BEV map.

TPU-native reimplementations of
ref:magicdrive/networks/bbox_embedder.py (ContinuousBBoxWithTextEmbedding),
ref:magicdrive/networks/map_embedder.py (BEVControlNetConditioningEmbedding[Plus]).
Camera embedding lives in the ControlNet (ref:unet_addon_rawbox.py:288-305) but
the Fourier math is shared here.

All box-token handling is static-shape: boxes are padded to ``max_len`` and a
boolean mask selects between real features and learned null features
(ref:bbox_embedder.py:180-184) — identical semantics, jit-friendly.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from magicdrive_tpu.core.embeddings import fourier_embed, fourier_out_dim
from magicdrive_tpu.core.resnet import conv

# Hardcoded min/max for optional bbox min-max normalization
# (ref:bbox_embedder.py:10-11); released configs set minmax_normalize=false.
XYZ_MIN = (-200.0, -300.0, -20.0)
XYZ_RANGE = (350.0, 650.0, 80.0)


@dataclasses.dataclass(frozen=True)
class BBoxEmbedderConfig:
    n_classes: int = 10
    class_token_dim: int = 768
    trainable_class_token: bool = False
    embedder_num_freq: int = 4
    proj_dims: Tuple[int, ...] = (768, 512, 512, 768)
    mode: str = "all-xyz"      # all-xyz (8 corners) | cxyz (4 corners)
    minmax_normalize: bool = False

    @property
    def n_points(self) -> int:
        return {"all-xyz": 8, "cxyz": 4}[self.mode]

    @property
    def pos_dim(self) -> int:
        return fourier_out_dim(3, self.embedder_num_freq) * self.n_points


class ContinuousBBoxWithTextEmbedding(nn.Module):
    """3D box (corners + class) -> 768-d cross-attention token.

    corners xyz -> Fourier (27d/point) -> Linear(216->768) -> SiLU -> concat
    class token -> MLP(1536->512->512->768). Padded slots are blended to the
    learned null pos/class features via the mask
    (ref:bbox_embedder.py:145-189).

    ``class_tokens`` are a non-trainable variable initialized from the CLIP
    text encoder's pooled class-name embeddings at prepare time
    (ref:bbox_embedder.py:122-135); stored in the "buffers" collection unless
    ``trainable_class_token``.
    """

    cfg: BBoxEmbedderConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, bboxes, classes, masks):
        """bboxes: (..., P, 3); classes: (...,) int; masks: (...,) bool/int.

        Leading axes are arbitrary batch axes (e.g. B*N_cam, max_len).
        Returns (..., 768).
        """
        cfg = self.cfg
        null_pos = self.param("null_pos_feature", nn.initializers.zeros,
                              (cfg.pos_dim,), jnp.float32)
        null_cls = self.param("null_class_feature", nn.initializers.zeros,
                              (cfg.class_token_dim,), jnp.float32)
        if cfg.trainable_class_token:
            class_tokens = self.param(
                "class_tokens", nn.initializers.normal(1.0),
                (cfg.n_classes, cfg.class_token_dim), jnp.float32)
        else:
            class_tokens = self.variable(
                "buffers", "class_tokens",
                lambda: jnp.zeros((cfg.n_classes, cfg.class_token_dim),
                                  jnp.float32)).value

        if cfg.minmax_normalize:
            mins = jnp.asarray(XYZ_MIN, bboxes.dtype)
            rng = jnp.asarray(XYZ_RANGE, bboxes.dtype)
            bboxes = (bboxes - mins) / rng

        pos = fourier_embed(bboxes, cfg.embedder_num_freq)
        pos = pos.reshape(*pos.shape[:-2], -1).astype(self.dtype)

        m = masks.astype(self.dtype)[..., None]
        pos = pos * m + null_pos.astype(self.dtype) * (1 - m)
        # padded classes may be -1; clamp — the mask blend discards the gather.
        cls = jnp.take(class_tokens, jnp.clip(classes, 0, cfg.n_classes - 1),
                       axis=0).astype(self.dtype)
        cls = cls * m + null_cls.astype(self.dtype) * (1 - m)
        return self._forward_feature(pos, cls)

    def _forward_feature(self, pos, cls):
        cfg = self.cfg
        dense = lambda d, name: nn.Dense(d, dtype=self.dtype,
                                         param_dtype=jnp.float32, name=name)
        emb = nn.silu(dense(cfg.proj_dims[0], "bbox_proj")(pos))
        emb = jnp.concatenate([emb, cls], axis=-1)
        emb = dense(cfg.proj_dims[1], "second_linear_0")(emb)
        emb = dense(cfg.proj_dims[2], "second_linear_2")(nn.silu(emb))
        emb = dense(cfg.proj_dims[3], "second_linear_4")(nn.silu(emb))
        return emb

    def null_token(self):
        """The token produced by an all-null (masked-out) box slot."""
        null_pos = self.get_variable("params", "null_pos_feature")
        null_cls = self.get_variable("params", "null_class_feature")
        return self._forward_feature(null_pos[None].astype(self.dtype),
                                     null_cls[None].astype(self.dtype))[0]


class BEVMapEmbedder(nn.Module):
    """BEV map (H, W, C_map) -> latent-resolution conditioning features.

    Conv stack mirroring ref:map_embedder.py:10-76: conv_in + 6 convs with
    SiLU, zero-init conv_out. The asymmetric torch padding (2,1) on the later
    stages maps (200,200) -> (28,50) at 320 ch for the 224x400 model. NHWC.
    """

    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    out_channels: int = 320
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        boc = self.block_out_channels
        c = lambda ch, pad, stride, name: conv(ch, kernel=3, padding=pad,
                                               stride=stride, dtype=self.dtype,
                                               name=name)
        h = nn.silu(c(boc[0], 1, 1, "conv_in")(x))
        blocks = []
        for i in range(len(boc) - 2):
            blocks.append((boc[i], ((1, 1), (1, 1)), 1))
            blocks.append((boc[i + 1], ((2, 2), (1, 1)), 2))
        blocks.append((boc[-2], ((2, 2), (1, 1)), 1))
        blocks.append((boc[-1], ((2, 2), (1, 1)), (2, 1)))
        for i, (ch, pad, stride) in enumerate(blocks):
            strides = (stride, stride) if isinstance(stride, int) else stride
            h = nn.Conv(ch, kernel_size=(3, 3), strides=strides, padding=pad,
                        dtype=self.dtype, param_dtype=jnp.float32,
                        name=f"blocks_{i}")(h)
            h = nn.silu(h)
        h = nn.Conv(self.out_channels, kernel_size=(3, 3), padding=1,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="conv_out")(h)
        return h


class BEVMapEmbedderPlus(nn.Module):
    """Hi-res variant with adaptive average pooling to a fixed output size
    (ref:map_embedder.py:79-127; used by the 272x736 config)."""

    conditioning_embedding_size: Tuple[int, int] = (34, 92)
    block_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    out_channels: int = 320
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        boc = self.block_out_channels
        h = nn.silu(conv(boc[0], dtype=self.dtype, name="conv_in")(x))
        blocks = []
        for i in range(len(boc) - 2):
            blocks.append((boc[i], 1))
            blocks.append((boc[i + 1], 1 if i == 0 else 2))
        blocks.append((boc[-2], 1))
        blocks.append((boc[-1], (2, 1)))
        for i, (ch, stride) in enumerate(blocks):
            strides = (stride, stride) if isinstance(stride, int) else stride
            h = nn.Conv(ch, kernel_size=(3, 3), strides=strides,
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"blocks_{i}")(h)
            h = nn.silu(h)
        h = adaptive_avg_pool2d(h, self.conditioning_embedding_size)
        h = nn.Conv(self.out_channels, kernel_size=(3, 3), padding=1,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="conv_out")(h)
        return h


def adaptive_avg_pool2d(x: jnp.ndarray, out_size: Tuple[int, int]) -> jnp.ndarray:
    """torch.AdaptiveAvgPool2d semantics for NHWC inputs (static shapes)."""
    b, h, w, c = x.shape
    oh, ow = out_size

    def pool_axis(arr, in_len, out_len, axis):
        # torch: start = floor(i*in/out), end = ceil((i+1)*in/out)
        import jax
        import numpy as np
        starts = np.floor(np.arange(out_len) * in_len / out_len).astype(int)
        ends = np.ceil((np.arange(out_len) + 1) * in_len / out_len).astype(int)
        pieces = [jax.lax.slice_in_dim(arr, int(s), int(e), axis=axis)
                  .mean(axis=axis, keepdims=True)
                  for s, e in zip(starts, ends)]
        return jnp.concatenate(pieces, axis=axis)

    x = pool_axis(x, h, oh, 1)
    x = pool_axis(x, w, ow, 2)
    return x


def embed_camera(camera_param: jnp.ndarray, num_freqs: int = 4) -> jnp.ndarray:
    """Camera (..., 3, 7) -> (..., 189) Fourier features.

    Each of the 7 length-3 columns (K[:,0..2] | c2l[:,0..3]) is Fourier
    embedded (27d) then concatenated column-major, matching the reference's
    'b n d c -> (b n c) d' rearrange (ref:unet_addon_rawbox.py:288-305).
    """
    cols = jnp.swapaxes(camera_param, -1, -2)  # (..., 7, 3)
    emb = fourier_embed(cols, num_freqs)       # (..., 7, 27)
    return emb.reshape(*emb.shape[:-2], -1)    # (..., 189)
