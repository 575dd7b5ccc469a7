"""Attention primitives.

One attention implementation serves all three uses in the framework (self,
text-cross, cross-view), replacing the reference's xformers CUDA FMHA
(ref:third_party/xformers csrc; wired via diffusers XFormersAttnProcessor).

Three backends:
  * ``xla``    — einsum + softmax; XLA fuses this well for short sequences,
                 but materializes the (Lq, Lk) fp32 logits in HBM. Always
                 available, used as the reference implementation in tests.
  * ``pallas`` — fused flash-attention kernel (magicdrive_tpu.kernels):
                 O(L) memory, never materializes logits, but pads the head
                 dim to the 128-lane tile (3.2x FLOP padding at D=40).
  * ``auto``   — the default on TPU: pallas when the logits tile is large
                 enough that HBM traffic dominates (Lq*Lk >= 512^2 — the
                 28x50-latent self/cross-view attentions and everything
                 bigger), xla otherwise (short text-cross and the deeper
                 low-resolution levels).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

_BACKEND = "auto"  # module-level default; set_attention_backend() overrides.

# pallas pays off once the materialized-logits traffic the xla path would
# incur outweighs the flash kernel's lane-padding waste
_AUTO_PALLAS_MIN_LOGITS = 512 * 512


def set_attention_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas", "auto"), name
    _BACKEND = name


def get_attention_backend() -> str:
    return _BACKEND


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    backend: Optional[str] = None,
) -> jnp.ndarray:
    """Multi-head scaled dot-product attention.

    Args:
      q: (..., Lq, H, D)
      k/v: (..., Lk, H, D)
      bias: optional additive bias broadcastable to (..., H, Lq, Lk)
    Returns: (..., Lq, H, D)
    """
    backend = backend or _BACKEND
    if backend == "auto":
        # pallas when the materialized-logits traffic dominates; measured
        # (tools/bench_attention.py, v5e): L=1400 D=40 pallas 7.5 ms vs xla
        # 10.7 ms; the wide-head VAE attention (D=512) stays xla (2.3 vs
        # 3.0 ms — no lane padding, efficient matmuls).
        from magicdrive_tpu.kernels.flash_attention import on_tpu_by_default

        big = q.shape[-3] * k.shape[-3] >= _AUTO_PALLAS_MIN_LOGITS
        backend = "pallas" if (
            big and q.shape[-1] <= 128 and bias is None
            and on_tpu_by_default()) else "xla"
    if backend == "pallas" and bias is None:
        from magicdrive_tpu.kernels.flash_attention import flash_attention

        try:
            return flash_attention(q, k, v)
        except NotImplementedError:
            pass  # fall back to XLA path (e.g. CPU tests)
    scale = q.shape[-1] ** -0.5
    # fp32 softmax for stability; inputs may be bf16.
    logits = jnp.einsum("...qhd,...khd->...hqk", q, k).astype(jnp.float32) * scale
    if bias is not None:
        logits = logits + bias.astype(jnp.float32)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("...hqk,...khd->...qhd", weights, v)


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
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: Optional[int] = None
    use_bias: bool = False
    out_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        inner = self.heads * self.dim_head
        dense = functools.partial(
            nn.Dense, use_bias=self.use_bias, dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        self.to_q = dense(inner, name="to_q")
        self.to_k = dense(inner, name="to_k")
        self.to_v = dense(inner, name="to_v")
        self.to_out = nn.Dense(
            self.query_dim, use_bias=self.out_bias, dtype=self.dtype,
            param_dtype=jnp.float32, name="to_out",
        )

    def _split(self, t):
        return t.reshape(*t.shape[:-1], self.heads, self.dim_head)

    def project_q(self, x):
        return self._split(self.to_q(x))

    def project_kv(self, context):
        return self._split(self.to_k(context)), self._split(self.to_v(context))

    def project_out(self, o, n_summed: int = 1):
        inner = self.heads * self.dim_head
        out = self.to_out(o.reshape(*o.shape[:-2], inner))
        if n_summed > 1 and self.out_bias:
            # zeros matmul constant-folds to the bias vector under jit
            extra = self.to_out(jnp.zeros((1, inner), self.dtype))
            out = out + (n_summed - 1) * extra
        return out

    def __call__(self, x, context=None, bias=None):
        context = x if context is None else context
        q = self.project_q(x)
        k, v = self.project_kv(context)
        out = dot_product_attention(q, k, v, bias=bias)
        return self.project_out(out)
