"""Fused GEGLU projection kernel: y = (x @ Wv + bv) * gelu(x @ Wg + bg).

The UNet FeedForward's first stage (ref:third_party/diffusers GEGLU via
``net.0.proj``) projects to 2x the inner dim and gates one half with the
other. Under XLA this materializes the (M, 2*inner) intermediate in HBM
(~344 MB per level-0 FF call at the 224x400 bench shape) before the
split/gelu/multiply fusion reads it back. This kernel computes both halves
tile-by-tile in VMEM and writes only the gated (M, inner) product —
roughly half the FF stage-1 HBM traffic.

Grid: (M/bm, inner/bn); each step loads one x row-block (full K) and one
column block of each weight half, runs two MXU contractions and the gelu
gate on the VPU, and writes one output tile. The fp32 accumulation of
both dots happens in-kernel (preferred_element_type), matching the XLA
path's numerics; gelu is the exact (erf) variant diffusers uses.

Backward: custom_vjp recomputing the two projections with plain XLA
matmuls — training keeps XLA's fusion behavior (the forward win is an
inference concern; the train step remats the whole block anyway).
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from .flash_attention import _ceil_to, _interpret_default


def _gelu_exact(x):
    # diffusers GEGLU uses torch F.gelu default (exact erf formulation)
    return 0.5 * x * (1.0 + jax.lax.erf(x / np.sqrt(2.0).astype(x.dtype)))


def _erf_f32(x):
    """float32 erf as a clamped rational polynomial (the Cephes/Eigen
    approximation XLA itself lowers f32 erf to; |err| < ~1e-7).

    Mosaic's Pallas TPU lowering has no `erf` primitive (it raised
    NotImplementedError on the real chip), so the kernel evaluates the
    polynomial directly — mul/add run on the VPU at full rate.
    """
    x = jnp.clip(x, -4.0, 4.0)
    x2 = x * x
    p = jnp.float32(-2.72614225801306e-10)
    p = p * x2 + jnp.float32(+2.77068142495902e-08)
    p = p * x2 + jnp.float32(-2.10102402082508e-06)
    p = p * x2 + jnp.float32(-5.69250639462346e-05)
    p = p * x2 + jnp.float32(-7.34990630326855e-04)
    p = p * x2 + jnp.float32(-2.95459980854025e-03)
    p = p * x2 + jnp.float32(-1.60960333262415e-02)
    p = p * x
    q = jnp.float32(-1.45660718464996e-05)
    q = q * x2 + jnp.float32(-2.13374055278905e-04)
    q = q * x2 + jnp.float32(-1.68282697438203e-03)
    q = q * x2 + jnp.float32(-7.37332916720468e-03)
    q = q * x2 + jnp.float32(-1.42647390514189e-02)
    return p / q


def _gelu_exact_in_kernel(x):
    return 0.5 * x * (1.0 + _erf_f32(x * jnp.float32(1.0 / np.sqrt(2.0))))


def _kernel(x_ref, wv_ref, wg_ref, bv_ref, bg_ref, o_ref):
    x = x_ref[...]
    hv = jax.lax.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
    hg = jax.lax.dot(x, wg_ref[...], preferred_element_type=jnp.float32)
    if bv_ref is not None:
        hv = hv + bv_ref[...].astype(jnp.float32)
        hg = hg + bg_ref[...].astype(jnp.float32)
    o_ref[...] = (hv * _gelu_exact_in_kernel(hg)).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _geglu_core(x, wv, wg, bv, bg, block_m, block_n, interpret):
    return _geglu_fwd_impl(x, wv, wg, bv, bg, block_m, block_n, interpret)


def _geglu_fwd_impl(x, wv, wg, bv, bg, block_m, block_n, interpret):
    M, K = x.shape
    N = wv.shape[1]
    nm, nn = pl.cdiv(M, block_m), pl.cdiv(N, block_n)
    has_bias = bv is not None

    kernel = _kernel if has_bias else (
        lambda x_ref, wv_ref, wg_ref, o_ref:
        _kernel(x_ref, wv_ref, wg_ref, None, None, o_ref))

    in_specs = [
        pl.BlockSpec((block_m, K), lambda i, j: (i, 0)),
        pl.BlockSpec((K, block_n), lambda i, j: (0, j)),
        pl.BlockSpec((K, block_n), lambda i, j: (0, j)),
    ]
    args = [x, wv, wg]
    if has_bias:
        in_specs += [pl.BlockSpec((1, block_n), lambda i, j: (0, j))] * 2
        args += [bv.reshape(1, -1), bg.reshape(1, -1)]

    return pl.pallas_call(
        kernel,
        grid=(nm, nn),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j: (i, j)),
        out_shape=jax.ShapeDtypeStruct((M, N), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            # gelu's erf is the rational polynomial above (VPU mul/add/div,
            # ~30 flops/element), not a transcendental primitive.
            flops=4 * M * K * N + 30 * M * N,
            bytes_accessed=2 * (M * K + 2 * K * N + M * N),
            transcendentals=0,
        ),
    )(*args)


def _ref_halves(x, wv, wg, bv, bg):
    hv = (x @ wv).astype(jnp.float32)
    hg = (x @ wg).astype(jnp.float32)
    if bv is not None:
        hv = hv + bv
        hg = hg + bg
    return hv, hg


def _geglu_fwd(x, wv, wg, bv, bg, block_m, block_n, interpret):
    y = _geglu_fwd_impl(x, wv, wg, bv, bg, block_m, block_n, interpret)
    return y, (x, wv, wg, bv, bg)


def _geglu_bwd(block_m, block_n, interpret, res, dy):
    # NOTE: bwd intentionally uses exact jax.lax.erf while the forward kernel
    # evaluates the polynomial approximation; the <1e-7 fwd/bwd drift is
    # accepted (training remats the block and takes this bwd either way).
    x, wv, wg, bv, bg = res
    hv, hg = _ref_halves(x, wv, wg, bv, bg)
    dy32 = dy.astype(jnp.float32)
    g = _gelu_exact(hg)
    dhv = dy32 * g
    # d gelu(z) = Phi(z) + z phi(z)
    phi = jnp.exp(-0.5 * hg * hg) / np.sqrt(2 * np.pi)
    dhg = dy32 * hv * (0.5 * (1.0 + jax.lax.erf(hg / np.sqrt(2.0))) + hg * phi)
    dhv = dhv.astype(x.dtype)
    dhg = dhg.astype(x.dtype)
    dx = dhv @ wv.T + dhg @ wg.T
    dwv = x.T @ dhv
    dwg = x.T @ dhg
    dbv = dhv.sum(0) if bv is not None else None
    dbg = dhg.sum(0) if bg is not None else None
    return dx, dwv.astype(wv.dtype), dwg.astype(wg.dtype), dbv, dbg


_geglu_core.defvjp(_geglu_fwd, _geglu_bwd)


def fused_geglu(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    block_m: int = 512,
    block_n: int = 512,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """GEGLU stage-1: value/gate halves of ``kernel`` (in, 2*inner), value
    first (matching ``jnp.split(h, 2, -1)`` order in FeedForward).

    x: (..., K); kernel: (K, 2N); bias: (2N,) or None. Returns (..., N).
    """
    if interpret is None:
        interpret = _interpret_default()
    *lead, K = x.shape
    N = kernel.shape[1] // 2
    M = int(np.prod(lead)) if lead else 1
    wv, wg = kernel[:, :N], kernel[:, N:]
    bv = bg = None
    if bias is not None:
        bv, bg = bias[:N], bias[N:]
    bm = min(block_m, _ceil_to(M, 8))
    bn = min(block_n, _ceil_to(N, 128))
    y = _geglu_core(x.reshape(M, K), wv, wg, bv, bg, bm, bn, interpret)
    return y.reshape(*lead, N)


# ---------------------------------------------------------------------------
# Whole-FF fusion: stage-1 GEGLU + stage-2 projection in one kernel, so the
# gated (M, N) intermediate never exists in HBM either (the stage-1-only
# kernel above still writes it for the stage-2 XLA matmul to read back —
# ~2x (M*N) bf16 of traffic per FF at the flagship level-0 shape).
# ---------------------------------------------------------------------------

from .flash_attention import _VMEM_BUDGET  # noqa: E402


def _env_int(name: str, default: int) -> int:
    try:
        return int(os.environ.get(name, default))
    except ValueError:
        return default


# NOTE: a row-block override knob (MAGICDRIVE_FF_BM, round 4d's FB arm:
# bm=2048 under a raised scoped-VMEM limit) was measured a wash on chip
# (197.48 ms vs the Y default, PERFORMANCE.md round 4d) and REMOVED in
# round 5 per the measure-or-delete discipline; auto-sizing below stands.
def _ff_vmem_estimate(bm: int, K: int, N: int, C: int, esize: int) -> int:
    """Pessimistic working set of one whole-FF grid step: double-buffered
    x/out blocks, resident weights, both fp32 halves plus the gated cast."""
    return (2 * bm * K * esize            # x block, double-buffered
            + (2 * K * N + N * C) * esize  # Wv, Wg, W2 resident
            + 2 * bm * N * 4               # hv, hg fp32
            + bm * N * esize               # gated product cast
            + bm * C * 4                   # output fp32
            + 2 * bm * C * esize)          # out block, double-buffered


def _ff_kernel(x_ref, wv_ref, wg_ref, bv_ref, bg_ref, w2_ref, o_ref):
    x = x_ref[...]
    hv = jax.lax.dot(x, wv_ref[...], preferred_element_type=jnp.float32)
    hg = jax.lax.dot(x, wg_ref[...], preferred_element_type=jnp.float32)
    if bv_ref is not None:
        hv = hv + bv_ref[...].astype(jnp.float32)
        hg = hg + bg_ref[...].astype(jnp.float32)
    g = (hv * _gelu_exact_in_kernel(hg)).astype(x.dtype)
    o_ref[...] = jax.lax.dot(
        g, w2_ref[...], preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _ff_block_m(M: int, K: int, N: int, C: int, esize: int) -> Optional[int]:
    """Largest M block whose working set fits VMEM with BOTH weight stages
    resident; None if even bm=128 does not fit (deep-level FFs fall back to
    the stage-1 kernel + XLA matmul)."""
    fixed = (2 * K * N + N * C) * esize          # Wv, Wg, W2
    for bm in (_ceil_to(M, 8), 1024, 768, 512, 384, 256, 128):
        if bm > _ceil_to(M, 8):
            continue
        var = (bm * K * esize                    # x block
               + 2 * bm * N * 4                  # hv, hg fp32
               + bm * N * esize                  # gated product cast
               + bm * C * 4)                     # output accumulator fp32
        if fixed + var <= _VMEM_BUDGET:
            return bm
    return None


def ff_full_fusion_fits(K: int, N: int, C: int, esize: int = 2) -> bool:
    # probe at M=128: the large-M path's smallest block; smaller real M only
    # shrinks the working set further
    return _ff_block_m(128, K, N, C, esize) is not None


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def _ff_core(x, wv, wg, bv, bg, w2, block_m, interpret):
    return _ff_fwd_impl(x, wv, wg, bv, bg, w2, block_m, interpret)


def _ff_fwd_impl(x, wv, wg, bv, bg, w2, block_m, interpret):
    M, K = x.shape
    N = wv.shape[1]
    C = w2.shape[1]
    has_bias = bv is not None

    kernel = _ff_kernel if has_bias else (
        lambda x_ref, wv_ref, wg_ref, w2_ref, o_ref:
        _ff_kernel(x_ref, wv_ref, wg_ref, None, None, w2_ref, o_ref))

    in_specs = [
        pl.BlockSpec((block_m, K), lambda i: (i, 0)),
        pl.BlockSpec((K, N), lambda i: (0, 0)),
        pl.BlockSpec((K, N), lambda i: (0, 0)),
    ]
    args = [x, wv, wg]
    if has_bias:
        in_specs += [pl.BlockSpec((1, N), lambda i: (0, 0))] * 2
        args += [bv.reshape(1, -1), bg.reshape(1, -1)]
    in_specs.append(pl.BlockSpec((N, C), lambda i: (0, 0)))
    args.append(w2)

    extra = {}
    est = _ff_vmem_estimate(block_m, K, N, C, x.dtype.itemsize)
    if est > _VMEM_BUDGET:
        from jax.experimental.pallas import tpu as pltpu

        extra["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(est + (4 << 20), 112 << 20))

    return pl.pallas_call(
        kernel,
        grid=(pl.cdiv(M, block_m),),
        **extra,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((block_m, C), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((M, C), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * M * K * N + 2 * M * N * C + 30 * M * N,
            bytes_accessed=2 * (M * K + 2 * K * N + N * C + M * C),
            transcendentals=0,
        ),
    )(*args)


def _ff_fwd(x, wv, wg, bv, bg, w2, block_m, interpret):
    y = _ff_fwd_impl(x, wv, wg, bv, bg, w2, block_m, interpret)
    return y, (x, wv, wg, bv, bg, w2)


def _ff_bwd(block_m, interpret, res, dy):
    # Recompute with plain XLA matmuls (training remats the block anyway);
    # stage-2 grads first, then reuse the stage-1 backward.
    x, wv, wg, bv, bg, w2 = res
    hv, hg = _ref_halves(x, wv, wg, bv, bg)
    g = (hv * _gelu_exact(hg)).astype(x.dtype)
    dy2 = dy.astype(x.dtype)
    dw2 = g.T @ dy2
    dg = dy2 @ w2.T
    dx, dwv, dwg, dbv, dbg = _geglu_bwd(block_m, block_m, interpret,
                                        (x, wv, wg, bv, bg), dg)
    return dx, dwv, dwg, dbv, dbg, dw2.astype(w2.dtype)


_ff_core.defvjp(_ff_fwd, _ff_bwd)


def fused_ff(
    x: jnp.ndarray,
    kernel1: jnp.ndarray,
    bias1: Optional[jnp.ndarray],
    kernel2: jnp.ndarray,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Whole FeedForward (minus the stage-2 bias, added by the caller):
    ``geglu(x @ kernel1 + bias1) @ kernel2``.

    x: (..., K); kernel1: (K, 2N) value-half first; kernel2: (N, C).
    Caller must check :func:`ff_full_fusion_fits` for the shape.
    """
    if interpret is None:
        interpret = _interpret_default()
    *lead, K = x.shape
    N = kernel1.shape[1] // 2
    C = kernel2.shape[1]
    M = int(np.prod(lead)) if lead else 1
    wv, wg = kernel1[:, :N], kernel1[:, N:]
    bv = bg = None
    if bias1 is not None:
        bv, bg = bias1[:N], bias1[N:]
    bm = _ff_block_m(M, K, N, C, x.dtype.itemsize)
    assert bm is not None, "caller must check ff_full_fusion_fits"
    y = _ff_core(x.reshape(M, K), wv, wg, bv, bg, kernel2, bm, interpret)
    return y.reshape(*lead, C)
