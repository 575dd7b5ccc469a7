"""Positional / Fourier embeddings.

TPU-native reimplementation of the NeRF-style Fourier embedder
(ref:magicdrive/networks/embedder.py:5-54) and the sinusoidal timestep
embedding used by SD-v1.5 (diffusers ``Timesteps`` /
``get_timestep_embedding``).
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def fourier_out_dim(input_dims: int, num_freqs: int, include_input: bool = True) -> int:
    """Output dim of :func:`fourier_embed`: d * (include_input + 2 * num_freqs)."""
    return input_dims * (int(include_input) + 2 * num_freqs)


def fourier_embed(
    x: jnp.ndarray,
    num_freqs: int,
    include_input: bool = True,
    log_sampling: bool = True,
) -> jnp.ndarray:
    """NeRF-style sin/cos embedding over the last axis.

    Feature order matches the reference exactly (identity, then per frequency
    [sin, cos]): ``[x, sin(x*f0), cos(x*f0), sin(x*f1), cos(x*f1), ...]``
    with ``f_i = 2**i`` for log sampling (max_freq_log2 = num_freqs - 1).
    ref:magicdrive/networks/embedder.py:15-40.
    """
    max_freq = num_freqs - 1
    if log_sampling:
        freqs = 2.0 ** jnp.linspace(0.0, max_freq, num_freqs)
    else:
        freqs = jnp.linspace(2.0**0.0, 2.0**max_freq, num_freqs)
    parts = []
    if include_input:
        parts.append(x)
    # x[..., None, :] * freqs[:, None] -> (..., num_freqs, d)
    xf = x[..., None, :] * freqs[:, None].astype(x.dtype)
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    # interleave per frequency: sin_f, cos_f  -> (..., num_freqs, 2, d)
    sc = jnp.stack([sin, cos], axis=-2)
    sc = sc.reshape(*x.shape[:-1], num_freqs * 2 * x.shape[-1])
    parts.append(sc)
    return jnp.concatenate(parts, axis=-1)


def get_timestep_embedding(
    timesteps: jnp.ndarray,
    embedding_dim: int,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    scale: float = 1.0,
    max_period: int = 10000,
) -> jnp.ndarray:
    """Sinusoidal timestep embedding, matching diffusers' ``get_timestep_embedding``.

    With SD-v1.5 settings (flip_sin_to_cos=True, freq_shift=0) the layout is
    ``[cos | sin]``. Computed in float32 for stability.
    """
    assert timesteps.ndim == 1, "timesteps must be 1-D"
    half_dim = embedding_dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - downscale_freq_shift)
    emb = jnp.exp(exponent)
    emb = timesteps.astype(jnp.float32)[:, None] * emb[None, :]
    emb = scale * emb
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0), (0, 1)])
    return emb
