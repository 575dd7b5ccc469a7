"""Param-pytree utilities."""
from __future__ import annotations

import jax
import jax.numpy as jnp


def cast_floating(tree, dtype):
    """Cast every floating-point leaf to ``dtype`` (ints/bools untouched).

    Used to store frozen inference weights in bf16: modules run with
    ``dtype=bfloat16`` cast their params down per use anyway, so bf16
    storage is numerically identical while halving weight HBM traffic and
    host->device transfer (the reference's frozen-fp16 policy,
    ref:magicdrive/runner/multiview_runner.py:191-217).
    """
    return jax.tree.map(
        lambda v: v.astype(dtype)
        if jnp.issubdtype(jnp.asarray(v).dtype, jnp.floating) else v, tree)
