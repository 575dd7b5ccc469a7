"""Attention primitives.

One attention implementation serves all three uses in the framework (self,
text-cross, cross-view), replacing the reference's xformers CUDA FMHA
(ref:third_party/xformers csrc; wired via diffusers XFormersAttnProcessor).

Three backends:
  * ``xla``    — einsum + softmax; XLA fuses this well for short sequences,
                 but materializes the (Lq, Lk) fp32 logits in HBM. Always
                 available, used as the reference implementation in tests.
  * ``pallas`` — fused flash-attention kernel (magicdrive_tpu.kernels):
                 O(L) memory, never materializes logits.
  * ``auto``   — the default on TPU: pallas when the logits tile is large
                 enough that HBM traffic dominates (Lq*Lk >= 512^2 — the
                 28x50-latent self/cross-view attentions and everything
                 bigger), xla otherwise (short text-cross and the deeper
                 low-resolution levels).

Head-dim lane padding: the SD-1.5 UNet's level-0 heads are D=40, and Mosaic
executes lane-misaligned contractions ~1.45x slower than 128-lane ones
(measured v5e, L=1400: 5.6 ms vs 3.86 ms per core) — while padding
activations in HBM or in-kernel VMEM costs as much as it saves. The fix
lives in the *projections*: when the core will take the pallas route and
dim_head < 128, the projection weights themselves are zero-padded per head
(a reshape/pad of the weight, folded by XLA; activations are never padded
as a separate op), so q/k/v emerge (…, H, 128)-aligned and ``to_out``
consumes the padded layout through zero weight rows. Exact math — padded
lanes carry zeros through QK/PV and are annihilated by the zero out-rows.
Checkpoint shapes are unchanged.
"""
from __future__ import annotations

import functools
import os as _os
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

_BACKEND = "auto"  # module-level default; set_attention_backend() overrides.

# pallas pays off once the materialized-logits traffic the xla path would
# incur outweighs the flash kernel's launch overhead. Default 90k: routing
# the level-1 (L=350, logits 122.5k) self/cross-view attentions to the
# fused kernel measured −7.6 ms on the denoise step (the XLA path's
# sub/select_n/split/reshape tail lived in exactly those blocks —
# PERFORMANCE.md round 3b); the level-2 (L=98) and text-cross shapes stay
# XLA. 512*512 was the round-1/2 value.
_AUTO_PALLAS_MIN_LOGITS = int(
    _os.environ.get("MAGICDRIVE_PALLAS_MIN_LOGITS", 90_000))

_LANE = 128

# Attention implementation on the pallas route: "fused" = the projection-
# fused megakernel (kernels/fused_attention.py — q/k/v never exist in HBM);
# "projected" = lane-padded projections + the flash kernel. Default "fused":
# measured on chip (tools/bench_matrix.py, round 3) the fused kernels take
# the full denoise step 261.5 -> 251.5 ms together with the fused GEGLU
# (PERFORMANCE.md round 3).
_ATTN_IMPL = _os.environ.get("MAGICDRIVE_ATTN_IMPL", "fused")

# Fused-kernel mode: "kvstat" (default) uses the kv-stationary kernel
# wherever it fits — measured −27.9 ms on the denoise step vs the
# out-fused kernel at the flagship nq=2 shapes (the out-fused kernel's
# per-q-block k/v recompute costs ~3.7x its FLOP model on chip;
# PERFORMANCE.md round 3b). "auto" restores fused_is_efficient routing
# (out-fusion at nq<=2, kvstat beyond).
_FUSED_MODE = _os.environ.get("MAGICDRIVE_FUSED_MODE", "kvstat")

# Cross-view neighbor-pair kernel: "pair" (default) runs both add-mode
# neighbor attentions in one launch (shared q projection / weights, one
# summed per-head output -> half the padded-output traffic): measured
# 211.1 -> 200.9 ms on the denoise step (PERFORMANCE.md round 3b).
# "split" keeps one kernel per neighbor.
_CV_PAIR = _os.environ.get("MAGICDRIVE_CV_PAIR", "pair")

# QKV projection fusion knob: "fused" (default) projects self-attention
# q/k/v in one concatenated matmul (one MXU launch); "separate" restores
# the three independent projections. Same math/params either way — the
# knob exists to A/B the launch-count trade on real hardware (the fusion
# landed unmeasured during a round-2 tunnel outage).
_QKV_PROJ = _os.environ.get("MAGICDRIVE_QKV_PROJ", "fused")

# VMEM-side head pack on the kv-stationary kernels' OUTPUT write: each
# head's (bq, 128) fp32 block is sliced to dim_head (40) lanes inside the
# kernel and written GROUP-MAJOR (B, H/gh, Lq, gh*40), so the padded o
# tensor never reaches HBM (3.2x less o traffic) and ``to_out`` runs as a
# per-group einsum at LOGICAL depth with no zero-row-padded weights (the
# 0.37-vs-0.12 ms padded out-projections, round-4 profile). This is the
# VMEM-side variant of round 4d's removed OS arm, which paid an XLA/HBM
# lane relayout for the same slice and measured worse. Default ON:
# chip-measured 184.60 ms/step vs the Y bracket 186.92/186.67
# (PERFORMANCE.md round 5d); revert arm OX in tools/bench_matrix.py.
_KV_OUTPACK = _os.environ.get("MAGICDRIVE_KV_OUTPACK", "1") == "1"


def tag_attn_out(x):
    """checkpoint_name tag consumed by the UNet's selective remat policy
    (``UNetConfig.remat_policy="attn"``): the backward pass keeps attention
    outputs resident instead of recomputing the cores — the most expensive
    recompute in the per-block remat (PERFORMANCE.md round-2 bisection:
    attention cores are 65 of the 164 ms UNet forward)."""
    from jax.ad_checkpoint import checkpoint_name

    return checkpoint_name(x, "attn_out")


def set_attention_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas", "auto"), name
    _BACKEND = name


def get_attention_backend() -> str:
    return _BACKEND


def _pallas_route(Lq: int, Lk: int, d: int, has_bias: bool) -> bool:
    """Whether auto dispatch sends this shape to the pallas kernel."""
    from magicdrive_tpu.kernels.flash_attention import on_tpu_by_default

    return (Lq * Lk >= _AUTO_PALLAS_MIN_LOGITS and d <= _LANE
            and not has_bias and on_tpu_by_default())


def fused_mode_for(Lq: int, Lk: int, C: int, dim_head: int,
                   esize: int) -> Optional[str]:
    """Which projection-fused kernel serves this shape: "out" (recomputing
    kernel with the out-projection fused, nq <= 2), "kvstat" (VMEM-resident
    k/v for larger nq), or None (projected path). ``_FUSED_MODE=kvstat``
    forces the kv-stationary kernel wherever it fits."""
    from magicdrive_tpu.kernels.fused_attention import (fused_is_efficient,
                                                        kvstat_is_efficient)

    args = (Lq, Lk, C, dim_head, esize)
    if _FUSED_MODE == "kvstat" and kvstat_is_efficient(*args):
        return "kvstat"
    if fused_is_efficient(*args):
        return "out"
    if kvstat_is_efficient(*args):
        return "kvstat"
    return None


def _fused_mode(x, context, dim_head: int) -> Optional[str]:
    return fused_mode_for(x.shape[-2], context.shape[-2],
                          max(x.shape[-1], context.shape[-1]), dim_head,
                          2 if x.dtype == jnp.bfloat16 else 4)


def head_pad_for(Lq: int, Lk: int, dim_head: int,
                 has_bias: bool = False) -> Optional[int]:
    """Padded head depth (128) when lane-padded projections pay off, else
    None. Pays off exactly when the core takes the pallas route with a
    misaligned depth."""
    if _BACKEND == "xla" or dim_head % _LANE == 0:
        return None
    return _LANE if _pallas_route(Lq, Lk, dim_head, has_bias) else None


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    backend: Optional[str] = None,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Multi-head scaled dot-product attention.

    Args:
      q: (..., Lq, H, D)
      k/v: (..., Lk, H, D)
      bias: optional additive bias broadcastable to (..., H, Lq, Lk)
      scale: softmax scale; defaults to D**-0.5. Callers feeding lane-padded
        q/k/v MUST pass the logical dim_head's scale explicitly.
    Returns: (..., Lq, H, D)
    """
    backend = backend or _BACKEND
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if backend == "auto":
        # measured (tools/bench_attention.py, v5e): L=1400 pallas 3.9-5.6 ms
        # vs xla 10.7 ms; the wide-head VAE attention (D=512) stays xla
        # (2.3 vs 3.0 ms — no lane padding, efficient matmuls).
        backend = "pallas" if _pallas_route(
            q.shape[-3], k.shape[-3], q.shape[-1], bias is not None) else "xla"
    if backend == "pallas" and bias is None:
        from magicdrive_tpu.kernels.flash_attention import flash_attention

        try:
            return flash_attention(q, k, v, scale=scale)
        except NotImplementedError:
            pass  # fall back to XLA path (e.g. CPU tests)
    # fp32 softmax for stability; inputs may be bf16.
    logits = jnp.einsum("...qhd,...khd->...hqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", weights, v)


class _QKVProj(nn.Module):
    """Dense with nn.Dense's exact param layout (kernel/bias at this scope)
    plus optional per-head zero-padding of the OUTPUT dim: kernel
    (in, H*hd) -> (in, H, d_pad) so projections emit lane-aligned heads.

    Setup-style (``in_features`` known statically) so the parent can read
    ``padded_kernel``/``padded_bias`` to fuse several projections into one
    matmul (:meth:`Attention.project_qkv`)."""

    in_features: int
    heads: int
    dim_head: int
    use_bias: bool
    dtype: jnp.dtype

    def setup(self):
        h, hd = self.heads, self.dim_head
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_features, h * hd), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros, (h * hd,),
                               jnp.float32) if self.use_bias else None

    def padded_kernel(self, d: int) -> jnp.ndarray:
        h, hd = self.heads, self.dim_head
        kernel = self.kernel.astype(self.dtype)
        if d != hd:
            kernel = jnp.pad(kernel.reshape(-1, h, hd),
                             ((0, 0), (0, 0), (0, d - hd)))
        return kernel.reshape(-1, h * d)

    def padded_bias(self, d: int) -> Optional[jnp.ndarray]:
        if self.bias is None:
            return None
        h, hd = self.heads, self.dim_head
        bias = self.bias.astype(self.dtype)
        if d != hd:
            bias = jnp.pad(bias.reshape(h, hd),
                           ((0, 0), (0, d - hd))).reshape(-1)
        return bias

    def __call__(self, x, d_pad: Optional[int] = None):
        d = d_pad or self.dim_head
        y = x @ self.padded_kernel(d)
        bias = self.padded_bias(d)
        if bias is not None:
            y = y + bias
        return y.reshape(*y.shape[:-1], self.heads, d)


class _OutProj(nn.Module):
    """Output projection accepting (…, H, d) with d == dim_head or a padded
    depth: kernel (H*hd, out) -> (H, d_pad, out) with zero rows absorbing
    the padded lanes."""

    features: int
    heads: int
    dim_head: int
    use_bias: bool
    dtype: jnp.dtype

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.heads * self.dim_head, self.features),
                                 jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,),
                               jnp.float32) if self.use_bias else None

    def padded_kernel(self, d: int) -> jnp.ndarray:
        h, hd = self.heads, self.dim_head
        kernel = self.kernel.astype(self.dtype)
        if d != hd:
            kernel = jnp.pad(kernel.reshape(h, hd, -1),
                             ((0, 0), (0, d - hd), (0, 0)))
        return kernel.reshape(h * d, -1)

    def __call__(self, o, n_summed: int = 1):
        # The padded (…, H*Dp) layout is contracted against zero-row-padded
        # weights ON PURPOSE: slicing each head back to dim_head first
        # (dropping the 3.2x padding FLOPs for a lane relayout) measured
        # 208.9 vs 197.8 ms on the denoise step — the relayout costs more
        # than the padded dot (PERFORMANCE.md round 4d, arm OS; removed
        # per measure-or-delete).
        h = self.heads
        d = o.shape[-1]
        y = o.reshape(*o.shape[:-2], h * d) @ self.padded_kernel(d)
        if self.bias is not None:
            y = y + n_summed * self.bias.astype(self.dtype)
        return y

    def grouped(self, o, n_summed: int = 1):
        """Out-projection of the kvstat head-PACKED group-major layout
        (B, H/gh, L, gh*dim_head) — per-group contraction at LOGICAL depth
        summed over groups, so neither the padded o tensor nor zero-row-
        padded weights exist (the MAGICDRIVE_KV_OUTPACK path)."""
        B, G, L, P = o.shape
        h, hd = self.heads, self.dim_head
        assert P * G == h * hd, (o.shape, h, hd)
        w = self.kernel.astype(self.dtype).reshape(G, P, -1)
        y = jnp.einsum("bglp,gpc->blc", o, w)
        if self.bias is not None:
            y = y + n_summed * self.bias.astype(self.dtype)
        return y


class Attention(nn.Module):
    """QKV-projected multi-head attention (diffusers ``Attention`` semantics).

    Query from ``x``; key/value from ``context`` (defaults to ``x`` for
    self-attention). Output projection ``to_out``. No dropout at inference.

    Besides ``__call__``, the projection stages are exposed separately
    (``project_q`` / ``project_kv`` / ``project_out``) so callers that reuse
    one projection across several attention cores — the cross-view block
    projects each view's K/V once and gathers them per neighbor — don't pay
    the matmul twice. ``project_out(o, n_summed=k)`` reproduces the sum of
    ``k`` per-neighbor output projections (ref:blocks.py:213-217):
    ``sum_i to_out(o_i) == W @ sum_i o_i + k * bias``.

    ``d_pad`` on the projections requests lane-padded heads (module
    docstring); ``project_out`` detects the padded layout from its input
    shape. ``__call__`` decides automatically via :func:`head_pad_for`.
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: Optional[int] = None
    use_bias: bool = False
    out_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kv_dim = self.cross_attention_dim or self.query_dim
        proj = functools.partial(_QKVProj, heads=self.heads,
                                 dim_head=self.dim_head,
                                 use_bias=self.use_bias, dtype=self.dtype)
        self.to_q = proj(self.query_dim, name="to_q")
        self.to_k = proj(kv_dim, name="to_k")
        self.to_v = proj(kv_dim, name="to_v")
        self.to_out = _OutProj(self.query_dim, self.heads, self.dim_head,
                               self.out_bias, self.dtype, name="to_out")

    @property
    def scale(self) -> float:
        return self.dim_head ** -0.5

    def project_q(self, x, d_pad: Optional[int] = None):
        return self.to_q(x, d_pad)

    def project_kv(self, context, d_pad: Optional[int] = None):
        return self.to_k(context, d_pad), self.to_v(context, d_pad)

    def qkv_weights(self, d_pad: Optional[int] = None):
        """The three (in, H*d) projection kernels, lane-padded to ``d_pad``
        — operands for the projection-fused attention kernel. Only valid
        for bias-free projections (SD-1.5's UNet attentions)."""
        assert not self.use_bias, "fused qkv path requires bias-free q/k/v"
        d = d_pad or self.dim_head
        return (self.to_q.padded_kernel(d), self.to_k.padded_kernel(d),
                self.to_v.padded_kernel(d))

    def fused_attend(self, x, context=None, mode: str = "out"):
        """Projection-fused attention (kernels/fused_attention.py): q/k/v
        never exist in HBM. ``mode="out"`` additionally fuses the
        out-projection (the per-head attention outputs stay in VMEM too);
        ``mode="kvstat"`` keeps k/v resident across q-blocks (the nq > 2
        shapes) and projects out on the padded-head layout."""
        from magicdrive_tpu.kernels.fused_attention import (
            fused_kvstat_attention, fused_qkv_out_attention)

        context = x if context is None else context
        d = _LANE if self.dim_head % _LANE else self.dim_head
        wq, wk, wv = self.qkv_weights(d)
        if mode == "kvstat":
            outpack = _KV_OUTPACK and d != self.dim_head
            o = fused_kvstat_attention(
                x, context, wq, wk, wv, heads=self.heads, scale=self.scale,
                d_out=self.dim_head if outpack else None)
            return tag_attn_out(self.to_out.grouped(o) if outpack
                                else self.project_out(o))
        out = fused_qkv_out_attention(x, context, wq, wk, wv,
                                      self.to_out.padded_kernel(d),
                                      heads=self.heads, scale=self.scale)
        if self.to_out.bias is not None:
            out = out + self.to_out.bias.astype(self.dtype)
        return tag_attn_out(out)

    def project_qkv(self, x, d_pad: Optional[int] = None):
        """Self-attention q/k/v in ONE matmul: the three kernels are
        concatenated along the output dim (q/k/v share the input here), so
        the MXU sees one (in, 3*H*d) contraction instead of three launches.
        Identical math and params to the separate projections."""
        h = self.heads
        d = d_pad or self.dim_head
        if _QKV_PROJ == "separate":
            q = self.project_q(x, d_pad)
            k, v = self.project_kv(x, d_pad)
            return q, k, v
        projs = (self.to_q, self.to_k, self.to_v)
        kernel = jnp.concatenate([p.padded_kernel(d) for p in projs], axis=-1)
        y = x @ kernel
        biases = [p.padded_bias(d) for p in projs]
        if any(b is not None for b in biases):
            y = y + jnp.concatenate(
                [b if b is not None else jnp.zeros((h * d,), self.dtype)
                 for b in biases])
        q, k, v = jnp.split(y, 3, axis=-1)
        split = lambda t: t.reshape(*t.shape[:-1], h, d)
        return split(q), split(k), split(v)

    def project_out(self, o, n_summed: int = 1):
        return self.to_out(o, n_summed)

    def __call__(self, x, context=None, bias=None):
        is_self = context is None
        context = x if is_self else context
        if (_ATTN_IMPL == "fused" and bias is None and not self.use_bias
                and _pallas_route(x.shape[-2], context.shape[-2],
                                  self.dim_head, False)):
            mode = _fused_mode(x, context, self.dim_head)
            if mode is not None:
                return self.fused_attend(x, context, mode=mode)
        d_pad = head_pad_for(x.shape[-2], context.shape[-2], self.dim_head,
                             bias is not None)
        if is_self:
            q, k, v = self.project_qkv(x, d_pad)
        else:
            q = self.project_q(x, d_pad)
            k, v = self.project_kv(context, d_pad)
        out = dot_product_attention(q, k, v, bias=bias, scale=self.scale)
        return tag_attn_out(self.project_out(out))
