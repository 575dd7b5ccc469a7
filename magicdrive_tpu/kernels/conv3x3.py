"""Transposed implicit-GEMM 3x3 SAME conv for the UNet's N=320 rows.

Why: XLA's conv_general_dilated on the level-0 SD-UNet rows (out_channels
320 at 28x50 spatial) measures 142-151 GFLOP/s — ~90% of the 164 GFLOP/s
ceiling its own formulation allows, because N=320 output channels pad to 3
MXU lane tiles (384). Transposing the GEMM puts the output channels on the
SUBLANE axis (8-granular: 320 exact) and the spatial positions on the lane
axis, raising the ceiling to ~172-177 GFLOP/s (the residual waste is the
+2 halo frame, 1400 valid of 1560 frame positions). The kernel:

* takes NHWC input part(s) — the up-block skip concat is consumed as
  separate parts, like resnet.Conv2DParams.split_call, so the concat (and
  XLA's pad+pad double write of it) never exists; each part contracts with
  K = C_part exact (320/640 are whole MXU K tiles, unlike the 960 concat);
* transposes each image block to channel-major IN VMEM, copies it row-wise
  into a (C, (H+2)*(W+2) + margins) zero-bordered halo frame, and reads
  each of the 9 tap operands as a static lane-window slice of that frame —
  conv(x)[p] = sum_t w_t @ frame[:, p + k_t] with halo/margin zeros
  supplying the SAME padding (no rotate: Mosaic lacks bf16 lane rotates);
* accumulates the 9 (x parts) dots in an fp32 (O, N) scratch, adds
  bias/per-image temb, optionally applies a per-(image, channel) affine +
  SiLU to the input first (the GroupNorm apply + activation preceding
  every SD resnet conv — fusing it removes a full HBM round trip of the
  activation), and writes back NHWC.

Behavioral contract: jax.lax.conv_general_dilated(x, w, SAME) + bias
(+ temb[:, None, None]) on concat(parts), ref:third_party/diffusers
resnet.py ResnetBlock2D. Routing lives in core/resnet.py behind
MAGICDRIVE_CONV_IMPL.
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .flash_attention import _ceil_to, _interpret_default


def _frame_dims(H: int, W: int) -> Tuple[int, int, int]:
    Hp, Wp = H + 2, W + 2
    return Hp, Wp, Hp * Wp


def _tap_offsets(Wp: int):
    # output frame position p = (i+1)*Wp + (j+1); tap (dy, dx) in {0,1,2}^2
    # reads input frame position p + (dy-1)*Wp + (dx-1)
    return [(dy - 1) * Wp + (dx - 1) for dy in range(3) for dx in range(3)]


def _kernel(x_refs, w_refs, b_ref, t_ref, ms_refs, out_ref, frame, acc, yv,
            *, H, W, nimg, silu, interpret):
    # Mosaic supports 2D transposes and static (mis)aligned lane slices
    # but NOT lane-splitting shape casts ((C, H*W) -> (C, H, W)) and NOT
    # bf16 lane rotates — so the halo frame is built with one (C, W) lane
    # slice copy per image row into a frame with an extra Wp+1 zero margin
    # on both sides, and each tap operand is a static lane-window slice
    # frame[:, m+k : m+k+F] (no rotate, no wraparound).
    Hp, Wp, F = _frame_dims(H, W)
    m = Wp + 1  # margin covering the largest |tap offset|
    O = out_ref.shape[-1]
    taps = _tap_offsets(Wp)

    acc[...] = jnp.zeros_like(acc)
    off = 0
    for x_ref, w_ref in zip(x_refs, w_refs):
        C = x_ref.shape[-1]
        # zero once per part: the row copies overwrite the interior for
        # every image; the margin/halo zeros are shared
        frame[:C] = jnp.zeros((C, F + 2 * m), frame.dtype)
        for img in range(nimg):
            # (H*W, C) block -> channel-major, with the per-(image,
            # channel) norm apply + SiLU fused into the read when requested
            xi = x_ref[img]
            if ms_refs is not None:
                # fp32 affine + SiLU (Mosaic's bf16 logistic lowering is
                # broken — 'vector.broadcast' element-type verification)
                x32 = xi.astype(jnp.float32)
                x32 = (x32 * ms_refs[0][0, img:img + 1, off:off + C]
                       + ms_refs[1][0, img:img + 1, off:off + C])
                if silu:
                    x32 = x32 * jax.nn.sigmoid(x32)
                xi = x32.astype(xi.dtype)
            elif silu:
                x32 = xi.astype(jnp.float32)
                xi = (x32 * jax.nn.sigmoid(x32)).astype(xi.dtype)
            xt = xi.T  # (C, H*W)
            for i in range(H):
                start = m + (i + 1) * Wp + 1
                frame[:C, start:start + W] = xt[:, i * W:(i + 1) * W]
            base = img * F
            for t, k in enumerate(taps):
                win = frame[:C, m + k:m + k + F]  # == halo-padded shift
                wt = w_ref[t]  # (C, O)
                acc[:, base:base + F] += jax.lax.dot_general(
                    wt, win, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
        off += C

    bias = b_ref[0].astype(jnp.float32)  # (O,)
    for img in range(nimg):
        y = acc[:, img * F:(img + 1) * F] + bias[:, None]
        if t_ref is not None:
            t_row = t_ref[0, img:img + 1].astype(jnp.float32)
            y = y + t_row.T  # (1, O) -> (O, 1) broadcast over positions
        yc = y.astype(out_ref.dtype)
        for i in range(H):  # un-pad: drop frame borders, (O, H*W)
            yv[:, i * W:(i + 1) * W] = \
                yc[:, (i + 1) * Wp + 1:(i + 1) * Wp + 1 + W]
        out_ref[img] = yv[...].T


def conv3x3_tc(parts: Sequence[jnp.ndarray], kernel: jnp.ndarray,
               bias: jnp.ndarray, *,
               temb: Optional[jnp.ndarray] = None,
               mul: Optional[jnp.ndarray] = None,
               shift: Optional[jnp.ndarray] = None,
               silu: bool = False,
               imgs_per_block: int = 2,
               interpret: Optional[bool] = None) -> jnp.ndarray:
    """y = conv3x3_same(act(concat(parts))) + bias (+ temb), NHWC.

    parts: tensors (B, H, W, C_i); kernel: (3, 3, sum C_i, O) (fp32 or
    compute dtype); bias: (O,). act = SiLU(x * mul + shift) when
    ``mul``/``shift`` (B, sum C_i) given and silu=True; identity otherwise.
    temb: optional (B, O) per-image bias (the resnet time embedding).
    """
    if interpret is None:
        interpret = _interpret_default()
    B, H, W, _ = parts[0].shape
    O = kernel.shape[-1]
    dtype = parts[0].dtype
    Hp, Wp, F = _frame_dims(H, W)
    nimg = max(1, imgs_per_block)
    while B % nimg:
        nimg -= 1
    grid = (B // nimg,)

    csum = [0]
    for p in parts:
        csum.append(csum[-1] + p.shape[-1])

    # per-tap weight layout: (9, C_part, O), compute dtype
    w_parts = []
    for i, p in enumerate(parts):
        wp = kernel[:, :, csum[i]:csum[i + 1], :].astype(dtype)
        w_parts.append(wp.reshape(9, p.shape[-1], O))

    # flat (B, H*W, C) views — free in XLA (contiguous), and Mosaic never
    # sees a lane-splitting shape cast
    parts = [p.reshape(B, H * W, p.shape[-1]) for p in parts]
    in_specs = [pl.BlockSpec((nimg, H * W, p.shape[-1]),
                             lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM) for p in parts]
    in_specs += [pl.BlockSpec((9, p.shape[-1], O), lambda g: (0, 0, 0),
                              memory_space=pltpu.VMEM) for p in parts]
    in_specs.append(pl.BlockSpec((1, O), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM))
    args = list(parts) + w_parts + [bias.astype(dtype).reshape(1, O)]
    # per-image vectors are delivered per grid block as (1, nimg, ·)
    # blocks of a (B/nimg, nimg, ·) reshape — Mosaic rejects dynamic
    # sublane offsets (program-id row selects) and sub-8 sublane blocks,
    # but a block equal to the full trailing dims is always legal
    G = B // nimg
    if temb is not None:
        in_specs.append(pl.BlockSpec((1, nimg, O), lambda g: (g, 0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(temb.astype(dtype).reshape(G, nimg, O))
    fused = mul is not None
    if fused:
        assert shift is not None and mul.shape == (B, csum[-1])
        for v in (mul, shift):
            in_specs.append(pl.BlockSpec((1, nimg, csum[-1]),
                                         lambda g: (g, 0, 0),
                                         memory_space=pltpu.VMEM))
        args += [mul.astype(jnp.float32).reshape(G, nimg, csum[-1]),
                 shift.astype(jnp.float32).reshape(G, nimg, csum[-1])]

    cmax = max(p.shape[-1] for p in parts)
    Wp = W + 2
    scratch = [
        pltpu.VMEM((cmax, F + 2 * (Wp + 1)), dtype),       # margined frame
        pltpu.VMEM((O, nimg * F), jnp.float32),            # accumulator
        pltpu.VMEM((O, H * W), dtype),                     # un-padded out
    ]

    def body(*refs):
        n = len(parts)
        x_refs = refs[:n]
        w_refs = refs[n:2 * n]
        b_ref = refs[2 * n]
        idx = 2 * n + 1
        t_ref = None
        if temb is not None:
            t_ref = refs[idx]
            idx += 1
        ms_refs = None
        if fused:
            ms_refs = (refs[idx], refs[idx + 1])
            idx += 2
        out_ref, frame, acc, yv = (refs[idx], refs[idx + 1], refs[idx + 2],
                                   refs[idx + 3])
        _kernel(x_refs, w_refs, b_ref, t_ref, ms_refs, out_ref, frame, acc,
                yv, H=H, W=W, nimg=nimg, silu=silu, interpret=interpret)

    est = (sum(2 * nimg * H * W * p.shape[-1] * dtype.itemsize
               for p in parts)                      # double-buffered x
           + sum(9 * p.shape[-1] * O * dtype.itemsize for p in parts)
           + cmax * F * dtype.itemsize              # frame
           + O * nimg * F * 4                       # acc
           + 2 * nimg * H * W * O * dtype.itemsize  # out
           # Mosaic stack temporaries: the transposed block, the zeros
           # value, and a couple of live tap windows (all ~(cmax, F))
           + 5 * cmax * F * dtype.itemsize
           + (8 << 20))
    out = pl.pallas_call(
        body,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((nimg, H * W, O), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H * W, O), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=min(est, 110 << 20)),
        interpret=interpret,
    )(*args)
    return out.reshape(B, H, W, O)


def conv3x3_tc_fits(H: int, W: int, cs: Sequence[int], O: int,
                    itemsize: int = 2, imgs_per_block: int = 2) -> bool:
    """Whether the transposed kernel is shaped/efficient for this row:
    lane-exact K per part (C % 128), sublane-exact output (O % 8), and the
    working set within the raised VMEM budget."""
    if O % 8 or any(c % 128 for c in cs):
        return False
    _, _, F = _frame_dims(H, W)
    cmax = max(cs)
    est = (2 * imgs_per_block * H * W * sum(cs) * itemsize
           + 9 * sum(cs) * O * itemsize
           + cmax * F * itemsize
           + O * imgs_per_block * F * 4
           + 2 * imgs_per_block * H * W * O * itemsize)
    return est <= (100 << 20)


def conv3x3_ref(parts, kernel, bias, *, temb=None, mul=None, shift=None,
                silu=False):
    """Pure-XLA reference with identical semantics (for tests/A-B)."""
    x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    if mul is not None:
        x = x * mul[:, None, None, :] + shift[:, None, None, :]
    if silu:
        x = jax.nn.silu(x)
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + bias.astype(x.dtype)
    if temb is not None:
        y = y + temb.astype(x.dtype)[:, None, None, :]
    return y
