"""Attention primitives.

One attention implementation serves all three uses in the framework (self,
text-cross, cross-view), replacing the reference's xformers CUDA FMHA
(ref:third_party/xformers csrc; wired via diffusers XFormersAttnProcessor).

Two backends:
  * ``xla``    — einsum + softmax; XLA fuses this well on TPU for the short
                 sequence lengths of SD latents. Always available, used as the
                 reference implementation in tests.
  * ``pallas`` — fused flash-attention kernel (magicdrive_tpu.kernels), used
                 on TPU for long sequences (video / hi-res models).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

_BACKEND = "xla"  # module-level default; set_attention_backend() overrides.


def set_attention_backend(name: str) -> None:
    global _BACKEND
    assert name in ("xla", "pallas"), name
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
    """

    query_dim: int
    heads: int = 8
    dim_head: int = 64
    cross_attention_dim: Optional[int] = None
    use_bias: bool = False
    out_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, bias=None):
        context = x if context is None else context
        inner = self.heads * self.dim_head
        dense = functools.partial(
            nn.Dense, use_bias=self.use_bias, dtype=self.dtype,
            param_dtype=jnp.float32,
        )
        q = dense(inner, name="to_q")(x)
        k = dense(inner, name="to_k")(context)
        v = dense(inner, name="to_v")(context)

        def split(t):
            return t.reshape(*t.shape[:-1], self.heads, self.dim_head)

        out = dot_product_attention(split(q), split(k), split(v), bias=bias)
        out = out.reshape(*out.shape[:-2], inner)
        out = nn.Dense(
            self.query_dim, use_bias=self.out_bias, dtype=self.dtype,
            param_dtype=jnp.float32, name="to_out",
        )(out)
        return out
