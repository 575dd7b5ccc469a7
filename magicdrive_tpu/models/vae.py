"""AutoencoderKL (SD-v1.5 VAE), NHWC, frozen at train & inference time.

Re-design of diffusers ``AutoencoderKL`` as used by the reference
(ref:magicdrive/runner/base_runner.py:82-89 — frozen backbone;
ref:magicdrive/pipeline/pipeline_bev_controlnet.py:100-112 — 5-D decode).
VAE norms use eps 1e-6; resnets have no time embedding; the mid attention is
single-head full attention over H*W.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp
import flax.linen as nn

from magicdrive_tpu.core.resnet import GroupNorm, conv


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215


class VAEResnet(nn.Module):
    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        h = GroupNorm(self.groups, 1e-6, dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = conv(self.out_channels, dtype=self.dtype, name="conv1")(h)
        h = GroupNorm(self.groups, 1e-6, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = conv(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_channels:
            x = conv(self.out_channels, kernel=1, padding=0, dtype=self.dtype,
                     name="conv_shortcut")(x)
        return x + h


class VAEAttention(nn.Module):
    """Single-head full self-attention over spatial positions."""

    channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        residual = x
        y = GroupNorm(self.groups, 1e-6, dtype=self.dtype, name="group_norm")(x)
        y = y.reshape(b, h * w, c)
        dense = lambda name: nn.Dense(c, dtype=self.dtype,
                                      param_dtype=jnp.float32, name=name)
        q, k, v = dense("to_q")(y), dense("to_k")(y), dense("to_v")(y)
        logits = jnp.einsum("bqc,bkc->bqk", q, k).astype(jnp.float32)
        logits = logits * (c ** -0.5)
        weights = jnp.asarray(nn.softmax(logits, axis=-1), dtype=self.dtype)
        y = jnp.einsum("bqk,bkc->bqc", weights, v)
        y = dense("to_out")(y)
        return y.reshape(b, h, w, c) + residual


class Encoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = conv(cfg.block_out_channels[0], dtype=self.dtype, name="conv_in")(x)
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                x = VAEResnet(ch, cfg.norm_num_groups, dtype=self.dtype,
                              name=f"down_blocks_{i}_resnets_{j}")(x)
            if i != len(cfg.block_out_channels) - 1:
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = conv(ch, stride=2, padding=0, dtype=self.dtype,
                         name=f"down_blocks_{i}_downsamplers_0_conv")(x)
        ch = cfg.block_out_channels[-1]
        x = VAEResnet(ch, cfg.norm_num_groups, dtype=self.dtype,
                      name="mid_block_resnets_0")(x)
        x = VAEAttention(ch, cfg.norm_num_groups, dtype=self.dtype,
                         name="mid_block_attentions_0")(x)
        x = VAEResnet(ch, cfg.norm_num_groups, dtype=self.dtype,
                      name="mid_block_resnets_1")(x)
        x = GroupNorm(cfg.norm_num_groups, 1e-6, dtype=self.dtype,
                      name="conv_norm_out")(x)
        x = nn.silu(x)
        return conv(2 * cfg.latent_channels, dtype=self.dtype, name="conv_out")(x)


class Decoder(nn.Module):
    cfg: VAEConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z):
        cfg = self.cfg
        ch = cfg.block_out_channels[-1]
        x = conv(ch, dtype=self.dtype, name="conv_in")(z)
        x = VAEResnet(ch, cfg.norm_num_groups, dtype=self.dtype,
                      name="mid_block_resnets_0")(x)
        x = VAEAttention(ch, cfg.norm_num_groups, dtype=self.dtype,
                         name="mid_block_attentions_0")(x)
        x = VAEResnet(ch, cfg.norm_num_groups, dtype=self.dtype,
                      name="mid_block_resnets_1")(x)
        rev = list(reversed(cfg.block_out_channels))
        for i, out_ch in enumerate(rev):
            for j in range(cfg.layers_per_block + 1):
                x = VAEResnet(out_ch, cfg.norm_num_groups, dtype=self.dtype,
                              name=f"up_blocks_{i}_resnets_{j}")(x)
            if i != len(rev) - 1:
                from magicdrive_tpu.core.resnet import (Conv2DParams,
                                                        UPSAMPLE_IMPL,
                                                        upsample2x_conv)

                cp = Conv2DParams(out_ch, out_ch, dtype=self.dtype,
                                  name=f"up_blocks_{i}_upsamplers_0_conv")
                if UPSAMPLE_IMPL == "subpixel":
                    x = upsample2x_conv(x, cp.kernel, cp.bias, self.dtype)
                else:
                    x = cp(jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2))
        x = GroupNorm(cfg.norm_num_groups, 1e-6, dtype=self.dtype,
                      name="conv_norm_out")(x)
        x = nn.silu(x)
        return conv(cfg.out_channels, dtype=self.dtype, name="conv_out")(x)


class AutoencoderKL(nn.Module):
    cfg: VAEConfig = VAEConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.cfg, dtype=self.dtype)
        self.decoder = Decoder(self.cfg, dtype=self.dtype)
        self.quant_conv = conv(2 * self.cfg.latent_channels, kernel=1,
                               padding=0, dtype=self.dtype)
        self.post_quant_conv = conv(self.cfg.latent_channels, kernel=1,
                                    padding=0, dtype=self.dtype)

    def latent_hw(self, image_hw):
        """Latent spatial dims for a given image (H, W) — one 2x downsample
        per encoder stage except the last."""
        f = 2 ** (len(self.cfg.block_out_channels) - 1)
        return (image_hw[0] // f, image_hw[1] // f)

    def encode_moments(self, x):
        """images (B, H, W, 3) in [-1, 1] -> (mean, logvar) each (B, h, w, 4)."""
        moments = self.quant_conv(self.encoder(x.astype(self.dtype)))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x, noise=None):
        """Sample (or take the mean of) the latent posterior, scaled."""
        mean, logvar = self.encode_moments(x)
        if noise is not None:
            mean = mean + jnp.exp(0.5 * logvar) * noise
        return mean * self.cfg.scaling_factor

    def decode(self, z):
        """latents (B, h, w, 4), scaled -> images (B, H, W, 3) in [-1, 1]."""
        z = z / self.cfg.scaling_factor
        return self.decoder(self.post_quant_conv(z.astype(self.dtype)))

    def __call__(self, x, noise=None):
        return self.decode(self.encode(x, noise))
