"""Pallas 2x2 parity-interleave for the subpixel upsample-conv.

The subpixel upsample (``core/resnet.py upsample2x_conv``; semantics from
ref:third_party/diffusers Upsample2D = nearest-2x + 3x3 conv, folded into
four parity 2x2 convs) ends with a shuffle that interleaves the four
parity outputs y[di][dj] (B, H, W, C) into (B, 2H, 2W, C):

    out[b, 2i+di, 2j+dj, c] = y[di][dj][b, i, j, c]

XLA lowers the stack/transpose/reshape chain through a materialized
(B, H, W, 4, C) intermediate and a 6-D transpose — the round-4 device
profile attributes ~11 ms of the 112.6 ms VAE decode to exactly this
(concat 5.2 + reshape 3.7 + transpose 2.1 ms). This kernel does the whole
interleave in ONE pass at HBM speed: read the four parities, write the
interleaved tensor, bias fused.

In-kernel the interleave is pure layout bookkeeping, chosen so every step
is a cheap Mosaic relayout:
  * W-interleave  = lane-concat:  concat([a, b], -1) viewed (bh, 2W, C) —
    the row-major (W, 2C) -> (2W, C) reshape is a free view.
  * H-interleave  = major-stack:  stack([even, odd], 1) viewed
    (2bh, 2W, C) — merging adjacent major axes is a free view.
Neither creates an intermediate whose second-minor dim is tiny (a naive
stack(axis=-2) would tile-pad a 2-wide sublane dim 4x).

Edge rows are safe without masking: the map is row-local (input row i
only ever feeds output rows 2i/2i+1), so garbage rows read by a partial
edge block land only on out-of-range output rows, which pallas drops.

Requires C % 128 == 0 (bf16/f32 lane tiles make the concat free); callers
fall back to the XLA shuffle otherwise (UNet's 320-channel level).
Backward (for the UNet decoder's differentiated upsamples) is the exact
adjoint: four parity slices of the cotangent plus a bias reduce.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .flash_attention import _interpret_default

# ~2 MiB of input rows per grid step (x2 for the output, x2 double-buffer
# ~= 8 MiB live in VMEM, comfortably under the ~64 MiB budget).
_BLOCK_BYTES = 2 * 1024 * 1024


def supports(c: int) -> bool:
    return c % 128 == 0


def _kernel(a_ref, b_ref, c_ref, d_ref, bias_ref, o_ref):
    a, b, c, d = a_ref[0], b_ref[0], c_ref[0], d_ref[0]   # (bh, W, C)
    bh, w, ch = a.shape
    bias = bias_ref[...].reshape(1, 1, ch)
    even = jnp.concatenate([a, b], axis=-1).reshape(bh, 2 * w, ch)
    odd = jnp.concatenate([c, d], axis=-1).reshape(bh, 2 * w, ch)
    out = jnp.stack([even, odd], axis=1).reshape(2 * bh, 2 * w, ch)
    o_ref[0] = out + bias


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def interleave2x2(y00, y01, y10, y11, bias, interpret=None):
    """out[b, 2i+di, 2j+dj, :] = y{di}{dj}[b, i, j, :] + bias.

    y*: (B, H, W, C) with C % 128 == 0; bias: (C,) same dtype.
    Returns (B, 2H, 2W, C).
    """
    return _fwd_impl(y00, y01, y10, y11, bias, interpret)


def _fwd_impl(y00, y01, y10, y11, bias, interpret):
    if interpret is None:
        interpret = _interpret_default()
    B, H, W, C = y00.shape
    if not supports(C):
        raise ValueError(f"interleave2x2 requires C % 128 == 0, got C={C}")
    row_bytes = 4 * W * C * y00.dtype.itemsize
    bh = max(1, min(H, _BLOCK_BYTES // row_bytes))
    grid = (B, pl.cdiv(H, bh))
    in_spec = pl.BlockSpec((1, bh, W, C), lambda bi, hi: (bi, hi, 0, 0))
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[in_spec, in_spec, in_spec, in_spec,
                  pl.BlockSpec((1, C), lambda bi, hi: (0, 0))],
        out_specs=pl.BlockSpec((1, 2 * bh, 2 * W, C),
                               lambda bi, hi: (bi, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 2 * H, 2 * W, C), y00.dtype),
        interpret=interpret,
    )(y00, y01, y10, y11, bias.reshape(1, C))
    return out


def _fwd_rule(y00, y01, y10, y11, bias, interpret):
    return _fwd_impl(y00, y01, y10, y11, bias, interpret), None


def _bwd_rule(interpret, _, g):
    da = g[:, 0::2, 0::2, :]
    db = g[:, 0::2, 1::2, :]
    dc = g[:, 1::2, 0::2, :]
    dd = g[:, 1::2, 1::2, :]
    dbias = jnp.sum(g, axis=(0, 1, 2))
    return da, db, dc, dd, dbias


interleave2x2.defvjp(_fwd_rule, _bwd_rule)
