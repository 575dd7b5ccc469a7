"""Block-wise 8-bit AdamW (TPU-native bitsandbytes-equivalent).

The reference offers ``bitsandbytes.optim.AdamW8bit`` as a memory knob
(ref:magicdrive/runner/base_runner.py:181-216, ``use_8bit_adam``). Its CUDA
kernels quantize both Adam moments to int8 with per-block absmax scaling.
This is the same idea as a pure optax ``GradientTransformation``: moments
are stored as int8 with one fp32 scale per 256-element block (9x less state
memory than fp32 Adam: 2 x (1 byte + 4/256 bytes) vs 2 x 4 bytes per param),
dequantized/requantized inside the update — all vectorized ops that XLA
fuses; no host round-trips, no custom kernels needed at optimizer sizes.

Differences from bitsandbytes kept deliberately simple:
  * linear per-block absmax quantization (bitsandbytes uses a nonlinear
    "dynamic" code; linear loses ~1 bit of precision but is branch-free)
  * the second moment is quantized in the SQRT domain: linear int8 on nu
    itself snaps entries below absmax/127 to zero and mu/(sqrt(0)+eps)
    explodes; sqrt(nu) has exactly mu's |g| dynamic range, so an entry
    either survives both quantizations or zeroes both (step -> 0, never
    explodes). This replaces bitsandbytes' nonlinear code.
  * no stochastic rounding (v5e int8 conversions round-to-nearest)

Convergence on the quadratic + small-MLP tests matches fp32 AdamW to a few
percent (tests/test_train.py::test_adamw8bit_*).
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

BLOCK = 256


class _Quantized(NamedTuple):
    q: jnp.ndarray       # int8, padded-flat (nblocks, BLOCK)
    scale: jnp.ndarray   # fp32, (nblocks, 1)


def _quantize(x: jnp.ndarray) -> _Quantized:
    flat = x.astype(jnp.float32).reshape(-1)
    pad = (-flat.size) % BLOCK
    flat = jnp.pad(flat, (0, pad)).reshape(-1, BLOCK)
    absmax = jnp.max(jnp.abs(flat), axis=1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(flat / scale), -127, 127).astype(jnp.int8)
    return _Quantized(q=q, scale=scale)


def _dequantize(qv: _Quantized, shape, dtype=jnp.float32) -> jnp.ndarray:
    flat = (qv.q.astype(jnp.float32) * qv.scale).reshape(-1)
    n = 1
    for s in shape:
        n *= s
    return flat[:n].reshape(shape).astype(dtype)


class ScaleByAdam8bitState(NamedTuple):
    count: jnp.ndarray
    mu: optax.Params      # pytree of _Quantized
    nu: optax.Params      # pytree of _Quantized


def scale_by_adam_8bit(b1: float = 0.9, b2: float = 0.999,
                       eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam moment tracking with int8 block-quantized state."""

    def init_fn(params):
        mu = jax.tree.map(lambda p: _quantize(jnp.zeros_like(p)), params,
                          is_leaf=lambda x: isinstance(x, jnp.ndarray))
        nu = jax.tree.map(lambda p: _quantize(jnp.zeros_like(p)), params,
                          is_leaf=lambda x: isinstance(x, jnp.ndarray))
        return ScaleByAdam8bitState(count=jnp.zeros((), jnp.int32),
                                    mu=mu, nu=nu)

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1

        def upd(g, mu_q, nu_q):
            g32 = g.astype(jnp.float32)
            mu = b1 * _dequantize(mu_q, g.shape) + (1 - b1) * g32
            r_prev = _dequantize(nu_q, g.shape)  # sqrt-domain storage
            nu = b2 * (r_prev * r_prev) + (1 - b2) * (g32 * g32)
            mu_hat = mu / (1 - b1 ** count.astype(jnp.float32))
            nu_hat = nu / (1 - b2 ** count.astype(jnp.float32))
            step = (mu_hat / (jnp.sqrt(nu_hat) + eps)).astype(g.dtype)
            return step, _quantize(mu), _quantize(jnp.sqrt(nu))

        leaves, treedef = jax.tree.flatten(updates)
        mu_leaves = treedef.flatten_up_to(state.mu)
        nu_leaves = treedef.flatten_up_to(state.nu)
        out = [upd(g, m, n) for g, m, n in zip(leaves, mu_leaves, nu_leaves)]
        steps = treedef.unflatten([o[0] for o in out])
        mu = treedef.unflatten([o[1] for o in out])
        nu = treedef.unflatten([o[2] for o in out])
        return steps, ScaleByAdam8bitState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
               eps: float = 1e-8, weight_decay: float = 1e-2,
               mask: Optional[optax.Params] = None
               ) -> optax.GradientTransformation:
    """AdamW with 8-bit moments: drop-in for ``optax.adamw``."""
    return optax.chain(
        scale_by_adam_8bit(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay, mask=mask),
        optax.scale_by_learning_rate(learning_rate),
    )
