"""Conv building blocks for the SD UNet / VAE (NHWC, TPU-native layout).

Behavioral contract follows diffusers' ResnetBlock2D / Downsample2D /
Upsample2D as used by SD-v1.5 (ref:third_party/diffusers/src/diffusers/models/resnet.py),
re-designed for NHWC and bf16 compute with fp32 norms.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np


# Trace-time GroupNorm formulation knob (same params, same math, different
# XLA graph): "channel" = per-channel sum/sumsq then (C,)->(G,) combine;
# "grouped" = reshape-to-(G, C/G) grouped reduce (flax's lowering). Both
# match flax nn.GroupNorm to ~1e-6 fp32; A/B-able on real hardware because
# the tunnel's per-op profiler reports cost-model (not measured) times.
GN_IMPL = os.environ.get("MAGICDRIVE_GN_IMPL", "channel")

# Norm-apply precision knob (GroupNorm and the transformer LayerNorms):
# "fp32" (default) computes y = x*mul+add in fp32 before casting to the
# compute dtype; "compute" folds the (tiny, fp32-derived) mul/add to the
# compute dtype and applies in bf16 — statistics stay fp32 either way.
# Kills any fp32-materialized apply intermediates at a ~1e-3 bf16 rounding
# cost; A/B-able on real hardware (env: MAGICDRIVE_NORM_APPLY=compute).
NORM_APPLY = os.environ.get("MAGICDRIVE_NORM_APPLY", "fp32")

# Debug-only: skip all norm math (params still created) so wall-time
# ablations can isolate the total norm cost. Never set in real models.
NORM_IDENTITY = False

# 2x nearest-upsample + 3x3 conv implementation knob: "repeat" materializes
# the 4x-upsampled tensor and convolves it (torch/diffusers graph shape);
# "subpixel" folds the upsample INTO the conv — each output parity (di, dj)
# sees at most 2 distinct source rows/cols, so the 3x3-over-upsampled conv
# decomposes exactly into four 2x2 convs on the UN-upsampled input whose
# kernels are parity-wise sums of the 3x3 taps (16 vs 36 MACs per output
# quad = 2.25x fewer FLOPs, and the 4x intermediate never exists). Weight
# folding is done in fp32; bf16 output differs from "repeat" only by
# rounding of w1*x + w2*x vs (w1+w2)*x. Default "subpixel": measured VAE
# decode 120.7 -> 112.6 ms and denoise step -2.8 ms (PERFORMANCE.md r3b).
UPSAMPLE_IMPL = os.environ.get("MAGICDRIVE_UPSAMPLE_IMPL", "subpixel")
# (A pallas one-pass parity-interleave kernel for the subpixel shuffle was
# built and chip-measured round 4: VAE decode 126.5 vs 112.3 ms — the XLA
# stack/transpose/reshape chain fuses with the parity convs' epilogues and
# the kernel's extra HBM round trip loses; removed per measure-or-delete,
# record in PERFORMANCE.md round 4c.)
# UNet up-block skip handling: "split" feeds the (x, skip) pair into the
# ResnetBlock WITHOUT concatenating — GroupNorm combines per-channel
# moments across the parts and conv1/conv_shortcut contract each part
# against its input-channel slice of the kernel. The skip channel counts
# (320/640) are not multiples of the 960/1280/1920 concat widths' tile
# layout, so XLA lowers each concat as a pad+pad pair that writes the
# full-width tensor TWICE (~3.1 GB/step at the B=4 flagship, round-4 HLO
# census). "concat" materializes the concat (torch/diffusers graph shape).
SKIP_CONCAT = os.environ.get("MAGICDRIVE_SKIP_CONCAT", "split")
# (A transposed implicit-GEMM pallas conv with fused GroupNorm-apply+SiLU
# was built round 5, measured WORSE than XLA's conv on every target row,
# and removed per measure-or-delete — PERFORMANCE.md round 5b is the
# record; the kernel lives at the commit preceding its removal.)


class GroupNorm(nn.Module):
    """GroupNorm computed in fp32, output cast back to compute dtype.

    Params are ``scale``/``bias`` at this module's own scope (no flax
    ``GroupNorm_0`` nesting) so checkpoints are identical for every
    ``GN_IMPL`` formulation.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        parts = tuple(x) if isinstance(x, (tuple, list)) else None
        c = (sum(p.shape[-1] for p in parts) if parts is not None
             else x.shape[-1])
        g = self.num_groups
        assert c % g == 0, (c, g)
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if parts is not None:
            # normalize the logical concat of the parts WITHOUT forming it:
            # per-part per-channel sum/sumsq reduce to (B, C_part) vectors,
            # concatenated (tiny) for the group combine; each part is then
            # normalized with its channel slice of mul/add. Exactly the
            # "channel" formulation below on the concat (groups that
            # straddle a part boundary combine correctly because the
            # moments are per-channel before the (C,)->(G,) sum).
            if NORM_IDENTITY:
                return tuple(p.astype(self.dtype) for p in parts)
            red = tuple(range(1, parts[0].ndim - 1))
            n = np.prod([parts[0].shape[i] for i in red]) * (c // g)
            p32 = [p.astype(jnp.float32) for p in parts]
            s = jnp.concatenate([jnp.sum(p, axis=red) for p in p32], -1)
            ss = jnp.concatenate(
                [jnp.sum(p * p, axis=red) for p in p32], -1)   # (B, C)
            gm = s.reshape(-1, g, c // g).sum(-1) / n          # (B, G)
            gm2 = ss.reshape(-1, g, c // g).sum(-1) / n
            rstd = jax.lax.rsqrt(gm2 - gm * gm + self.epsilon)
            mul = jnp.repeat(rstd, c // g, axis=1) * scale
            add = bias - jnp.repeat(gm * rstd, c // g, axis=1) * scale
            outs, off = [], 0
            for p, q in zip(parts, p32):
                ci = p.shape[-1]
                shape = (p.shape[0],) + (1,) * len(red) + (ci,)
                m, a = mul[:, off:off + ci], add[:, off:off + ci]
                off += ci
                if NORM_APPLY == "compute" and self.dtype != jnp.float32:
                    outs.append(p.astype(self.dtype)
                                * m.astype(self.dtype).reshape(shape)
                                + a.astype(self.dtype).reshape(shape))
                else:
                    outs.append((q * m.reshape(shape)
                                 + a.reshape(shape)).astype(self.dtype))
            return tuple(outs)
        if NORM_IDENTITY:
            return x.astype(self.dtype)

        x32 = x.astype(jnp.float32)
        if GN_IMPL == "grouped":
            shp = x.shape
            xg = x32.reshape(shp[0], -1, g, c // g)
            gm = xg.mean(axis=(1, 3), keepdims=True)
            gm2 = (xg * xg).mean(axis=(1, 3), keepdims=True)
            rstd = jax.lax.rsqrt(gm2 - gm * gm + self.epsilon)
            y = ((xg - gm) * rstd).reshape(shp) * scale + bias
            return y.astype(self.dtype)
        red = tuple(range(1, x.ndim - 1))
        n = np.prod([x.shape[i] for i in red]) * (c // g)
        s = jnp.sum(x32, axis=red)                      # (B, C)
        ss = jnp.sum(x32 * x32, axis=red)               # (B, C)
        gm = s.reshape(-1, g, c // g).sum(-1) / n       # (B, G)
        gm2 = ss.reshape(-1, g, c // g).sum(-1) / n
        rstd = jax.lax.rsqrt(gm2 - gm * gm + self.epsilon)
        mul = jnp.repeat(rstd, c // g, axis=1) * scale            # (B, C)
        add = bias - jnp.repeat(gm * rstd, c // g, axis=1) * scale
        shape = (x.shape[0],) + (1,) * len(red) + (c,)
        if NORM_APPLY == "compute" and self.dtype != jnp.float32:
            return (x.astype(self.dtype) * mul.astype(self.dtype).reshape(shape)
                    + add.astype(self.dtype).reshape(shape))
        y = x32 * mul.reshape(shape) + add.reshape(shape)
        return y.astype(self.dtype)


def conv(features, kernel=3, stride=1, padding=1, dtype=jnp.float32, name=None,
         use_bias=True):
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return nn.Conv(
        features, kernel_size=(kernel, kernel), strides=(stride, stride),
        padding=padding, dtype=dtype, param_dtype=jnp.float32, name=name,
        use_bias=use_bias,
    )


class ResnetBlock2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32
    groups: int = 32
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, temb: Optional[jnp.ndarray] = None):
        """x: (B, H, W, C), or a tuple of (B, H, W, C_i) parts standing for
        their channel concat (the UNet up-block skips). With
        ``SKIP_CONCAT=split`` the parts are never concatenated: norm1 and
        conv1/conv_shortcut consume them part-wise (same params, same
        math up to fp reorder). Param layout is identical either way."""
        parts = tuple(x) if isinstance(x, (tuple, list)) else None
        if parts is not None:
            in_channels = sum(p.shape[-1] for p in parts)
            if (SKIP_CONCAT != "split" or len(parts) == 1
                    or GN_IMPL != "channel"
                    or in_channels == self.out_channels):
                x = (parts[0] if len(parts) == 1
                     else jnp.concatenate(parts, axis=-1))
                parts = None
        if parts is not None:
            hs = GroupNorm(self.groups, self.eps, dtype=self.dtype,
                           name="norm1")(parts)
            hs = tuple(nn.silu(h) for h in hs)
            h = Conv2DParams(in_channels, self.out_channels, 3,
                             dtype=self.dtype, name="conv1").split_call(hs)
        else:
            in_channels = x.shape[-1]
            h = GroupNorm(self.groups, self.eps, dtype=self.dtype,
                          name="norm1")(x)
            h = nn.silu(h)
            h = conv(self.out_channels, dtype=self.dtype, name="conv1")(h)
        if temb is not None:
            t = nn.Dense(self.out_channels, dtype=self.dtype,
                         param_dtype=jnp.float32, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = GroupNorm(self.groups, self.eps, dtype=self.dtype, name="norm2")(h)
        h = nn.silu(h)
        h = conv(self.out_channels, dtype=self.dtype, name="conv2")(h)
        if parts is not None:
            x = Conv2DParams(in_channels, self.out_channels, 1,
                             dtype=self.dtype, name="conv_shortcut"
                             ).split_call(parts, padding=((0, 0), (0, 0)))
        elif in_channels != self.out_channels:
            x = conv(self.out_channels, kernel=1, padding=0, dtype=self.dtype,
                     name="conv_shortcut")(x)
        return x + h


class Downsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return conv(self.out_channels, stride=2, padding=1, dtype=self.dtype,
                    name="conv")(x)


class Conv2DParams(nn.Module):
    """nn.Conv's exact param layout (kernel (kh, kw, in, out) + bias at this
    scope), with the raw fp32 weights readable by the caller so the 2x
    upsample can fold them (``UPSAMPLE_IMPL=subpixel``)."""

    in_features: int
    features: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        k = self.kernel_size
        self.kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, k, self.in_features, self.features), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)

    def __call__(self, x, padding=((1, 1), (1, 1))):
        y = jax.lax.conv_general_dilated(
            x, self.kernel.astype(self.dtype), (1, 1), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + self.bias.astype(self.dtype)

    def split_call(self, parts, padding=((1, 1), (1, 1))):
        """conv(concat(parts)) == sum_i conv(part_i, kernel[:, :, slice_i])
        — the concat (and XLA's pad+pad lowering of it) never exists."""
        y, off = None, 0
        for p in parts:
            ci = p.shape[-1]
            w = jax.lax.slice_in_dim(self.kernel, off, off + ci, axis=2)
            t = jax.lax.conv_general_dilated(
                p, w.astype(self.dtype), (1, 1), padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            y = t if y is None else y + t
            off += ci
        assert off == self.in_features, (off, self.in_features)
        return y + self.bias.astype(self.dtype)


def _fold_rows(k, parity):
    # 3 taps -> 2 taps per output parity: floor((2i+di+ki-1)/2) hits source
    # row i-1 (ki=0) / i (ki=1,2) for di=0 and i (ki=0,1) / i+1 (ki=2) for
    # di=1 — summed in fp32 before the cast.
    return (jnp.stack([k[0], k[1] + k[2]]) if parity == 0
            else jnp.stack([k[0] + k[1], k[2]]))


def upsample2x_conv(x, kernel, bias, dtype):
    """2x nearest upsample followed by a 3x3 'SAME' conv, computed as four
    parity 2x2 convs on the un-upsampled input (module knob docstring).

    x: (B, H, W, Cin); kernel: (3, 3, Cin, Cout) fp32; bias: (Cout,) fp32.
    Returns (B, 2H, 2W, Cout) in ``dtype``. Exact up to the fp32-fold
    rounding: each output quad's taps are identical to the repeat path's.
    """
    b, h, w, _ = x.shape
    outs = []
    for di in (0, 1):
        ka = _fold_rows(kernel, di)                       # (2, 3, ci, co)
        pad_h = (1, 0) if di == 0 else (0, 1)
        for dj in (0, 1):
            kb = _fold_rows(jnp.moveaxis(ka, 1, 0), dj)   # (2, 2, ci, co)
            kb = jnp.moveaxis(kb, 1, 0)
            pad_w = (1, 0) if dj == 0 else (0, 1)
            y = jax.lax.conv_general_dilated(
                x, kb.astype(dtype), (1, 1), (pad_h, pad_w),
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            outs.append(y)
    y = jnp.stack(outs, axis=3)                           # (B, H, W, 4, Co)
    y = y.reshape(b, h, w, 2, 2, -1).transpose(0, 1, 3, 2, 4, 5)
    y = y.reshape(b, 2 * h, 2 * w, -1)
    return y + bias.astype(dtype)


def nearest_resize(x, out_hw):
    """torch F.interpolate(mode='nearest') semantics: idx = floor(i*in/out)."""
    b, h, w, c = x.shape
    oh, ow = out_hw
    if oh % h == 0 and ow % w == 0:
        # integer upsample factor: floor(i*in/out) == i // factor, i.e. each
        # source pixel repeats factor times — broadcast+reshape instead of
        # two gathers (the only case the UNet/VAE decoders hit: factor 2)
        x = jnp.repeat(x, oh // h, axis=1)
        return jnp.repeat(x, ow // w, axis=2)
    hi = (jnp.arange(oh) * h) // oh
    wi = (jnp.arange(ow) * w) // ow
    return x[:, hi][:, :, wi]


class Upsample2D(nn.Module):
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, out_hw=None):
        b, h, w, c = x.shape
        out_hw = out_hw or (2 * h, 2 * w)
        cp = Conv2DParams(c, self.out_channels, dtype=self.dtype, name="conv")
        if UPSAMPLE_IMPL == "subpixel" and out_hw == (2 * h, 2 * w):
            return upsample2x_conv(x, cp.kernel, cp.bias, self.dtype)
        return cp(nearest_resize(x, out_hw))


class DownEncoderBlock2D(nn.Module):
    """VAE encoder block: resnets (no temb) + optional strided-conv downsample.

    Downsample uses asymmetric padding (pad right/bottom only), matching the
    VAE's ``Downsample2D(padding=0)`` + manual pad (0,1,0,1).
    """

    out_channels: int
    num_layers: int = 2
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype,
                              name=f"resnets_{i}")(x)
        if self.add_downsample:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            x = conv(self.out_channels, stride=2, padding=0, dtype=self.dtype,
                     name="downsamplers_0_conv")(x)
        return x


class UpDecoderBlock2D(nn.Module):
    out_channels: int
    num_layers: int = 3
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers):
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype,
                              name=f"resnets_{i}")(x)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x)
        return x
