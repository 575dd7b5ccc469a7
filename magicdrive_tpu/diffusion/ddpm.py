"""DDPM training-side ops (noise injection + prediction targets).

ref:magicdrive/runner/base_runner.py:400-423 (_add_noise with noise_offset),
:517-526 (epsilon / v-prediction targets).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .schedules import NoiseSchedule


def add_noise(schedule: NoiseSchedule, x0: jnp.ndarray, noise: jnp.ndarray,
              timesteps: jnp.ndarray) -> jnp.ndarray:
    """x_t = alpha_t * x0 + sigma_t * noise. timesteps broadcast over leading axes."""
    alpha = jnp.asarray(schedule.alpha_t, x0.dtype)[timesteps]
    sigma = jnp.asarray(schedule.sigma_t, x0.dtype)[timesteps]
    shape = timesteps.shape + (1,) * (x0.ndim - timesteps.ndim)
    return alpha.reshape(shape) * x0 + sigma.reshape(shape) * noise


def prediction_target(schedule: NoiseSchedule, x0: jnp.ndarray,
                      noise: jnp.ndarray, timesteps: jnp.ndarray,
                      prediction_type: str = "epsilon") -> jnp.ndarray:
    if prediction_type == "epsilon":
        return noise
    if prediction_type == "v_prediction":
        alpha = jnp.asarray(schedule.alpha_t, x0.dtype)[timesteps]
        sigma = jnp.asarray(schedule.sigma_t, x0.dtype)[timesteps]
        shape = timesteps.shape + (1,) * (x0.ndim - timesteps.ndim)
        return alpha.reshape(shape) * noise - sigma.reshape(shape) * x0
    raise ValueError(prediction_type)


def sample_timesteps(key: jax.Array, batch: int,
                     num_train_timesteps: int = 1000) -> jnp.ndarray:
    return jax.random.randint(key, (batch,), 0, num_train_timesteps)


def noise_with_offset(key: jax.Array, shape, noise_offset: float = 0.0,
                      offset_axes: int = 2, dtype=jnp.float32) -> jnp.ndarray:
    """Gaussian noise with optional per-(batch,channel) DC offset
    (ref:base_runner.py:404-416)."""
    k1, k2 = jax.random.split(key)
    noise = jax.random.normal(k1, shape, dtype)
    if noise_offset > 0:
        # offset shared over spatial dims: shape (..., H, W, C) -> (..., 1, 1, C)
        off_shape = shape[:-3] + (1, 1, shape[-1])
        noise = noise + noise_offset * jax.random.normal(k2, off_shape, dtype)
    return noise
