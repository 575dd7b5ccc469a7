"""Guess-mode scaling + unconditional-map substitution."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from magicdrive_tpu.config.presets import init_params, tiny_debug


import pytest

pytestmark = pytest.mark.slow  # repeated tiny-controlnet compiles


def _setup(**cn_overrides):
    preset = tiny_debug()
    if cn_overrides:
        preset = dataclasses.replace(
            preset, controlnet=dataclasses.replace(preset.controlnet,
                                                   **cn_overrides))
    modules = preset.modules(dtype=jnp.float32)
    params = init_params(preset, modules, jax.random.PRNGKey(0))
    B, N = 1, preset.pipeline.n_cam
    h, w = preset.pipeline.latent_height, preset.pipeline.latent_width
    L = preset.bbox_max_len
    rs = np.random.RandomState(0)
    args = (
        jnp.asarray(rs.randn(B, N, h, w, 4), jnp.float32),
        jnp.zeros((B,), jnp.int32),
        jnp.asarray(rs.randn(B, N, 3, 7), jnp.float32),
        jnp.asarray(rs.randn(B, 77, 16), jnp.float32),
        jnp.asarray(rs.rand(B, *preset.map_hw, preset.map_channels),
                    jnp.float32),
        jnp.asarray(rs.randn(B, N, L, 8, 3), jnp.float32),
        jnp.zeros((B, N, L), jnp.int32),
        jnp.ones((B, N, L), jnp.float32),
    )
    return preset, modules, params, args


def test_guess_mode_logspace_scaling():
    preset, modules, params, args = _setup()
    down, mid, _ = modules.controlnet.apply(params["controlnet"], *args)
    down_g, mid_g, _ = modules.controlnet.apply(params["controlnet"], *args,
                                                guess_mode=True)
    scales = np.logspace(-1, 0, len(down) + 1)
    for d, dg, s in zip(down, down_g, scales[:-1]):
        np.testing.assert_allclose(np.asarray(dg), np.asarray(d) * s,
                                   rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mid_g), np.asarray(mid),
                               rtol=1e-5, atol=1e-6)  # last scale is 1.0


def test_uncond_map_substitution():
    preset, modules, params, args = _setup(use_uncond_map="negative1")
    params = init_params(preset, modules, jax.random.PRNGKey(0))
    # with mask=1 the map input is replaced by the -1 uncond map: output must
    # equal running explicitly on a -1 map
    mask = jnp.ones((1,), jnp.float32)
    down_a, mid_a, _ = modules.controlnet.apply(
        params["controlnet"], *args, map_drop_mask=mask)
    neg_map_args = list(args)
    neg_map_args[4] = -jnp.ones_like(args[4])
    down_b, mid_b, _ = modules.controlnet.apply(
        params["controlnet"], *tuple(neg_map_args))
    np.testing.assert_allclose(np.asarray(mid_a), np.asarray(mid_b),
                               atol=1e-5)
    # with mask=0 nothing changes
    down_c, mid_c, _ = modules.controlnet.apply(
        params["controlnet"], *args, map_drop_mask=jnp.zeros((1,)))
    down_d, mid_d, _ = modules.controlnet.apply(params["controlnet"], *args)
    np.testing.assert_allclose(np.asarray(mid_c), np.asarray(mid_d),
                               atol=1e-6)
