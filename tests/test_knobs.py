"""Pipeline-level knob tests: guess_mode, use_uncond_map, seed policy.

Covers the knobs the reference exposes via config
(ref:unet_addon_rawbox.py:188-202,897-910; ref:misc/test_utils.py:191-255)
wired through PipelineConfig / preset_from_config.
"""
import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdrive_tpu.config.loader import compose
from magicdrive_tpu.config.presets import (
    init_params, micro_debug, preset_from_config,
)
from magicdrive_tpu.data.collate import CollateConfig, collate_fn
from magicdrive_tpu.data.fixtures import make_dataset
from magicdrive_tpu.pipeline.pipeline import MagicDrivePipeline

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _pipeline(preset, params=None, **pipe_overrides):
    if pipe_overrides:
        preset = dataclasses.replace(
            preset, pipeline=dataclasses.replace(preset.pipeline,
                                                 **pipe_overrides))
    modules = preset.modules(dtype=jnp.float32)
    if params is None:
        params = init_params(preset, modules, jax.random.PRNGKey(0))
    return MagicDrivePipeline(modules, params, preset.pipeline), params


def _batch(preset, B=1):
    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size, is_train=False)
    host = collate_fn(make_dataset(B, image_hw=preset.image_size,
                                   map_hw=preset.map_hw), ccfg)
    host.pop("pixel_values", None)
    return {k: jnp.asarray(v) for k, v in host.items()}


def _unzero_residual_convs(params, scale=0.05):
    """Give the zero-init ControlNet output convs small nonzero weights so
    the residual branch (and hence the map/uncond handling) affects the
    generated images."""
    cn = params["controlnet"]["params"]
    rs = np.random.RandomState(1)
    for name, tree in cn.items():
        if name.startswith("controlnet_down_blocks") or \
                name == "controlnet_mid_block":
            tree["kernel"] = jnp.asarray(
                rs.randn(*tree["kernel"].shape) * scale, jnp.float32)
    # the map embedder's conv_out is also zero-init — un-zero it so the map
    # actually reaches the trunk
    co = cn["controlnet_cond_embedding"]["conv_out"]
    co["kernel"] = jnp.asarray(rs.randn(*co["kernel"].shape) * scale,
                               jnp.float32)
    return params


@pytest.mark.slow  # two micro-pipeline compiles
def test_guess_mode_identity_at_init():
    """At init the zero-init output convs make all residuals zero, and the
    guess-mode uncond token assembly equals the standard uncond branch —
    so guess and non-guess pipelines must produce identical images."""
    preset = micro_debug()
    batch = _batch(preset)
    pipe, params = _pipeline(preset, num_inference_steps=2)
    pipe_g, _ = _pipeline(preset, params=params, num_inference_steps=2,
                          guess_mode=True)
    key = jax.random.PRNGKey(3)
    a = np.asarray(pipe(batch, key=key))
    b = np.asarray(pipe_g(batch, key=key))
    np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
def test_guess_mode_diverges_with_live_residuals():
    """With nonzero residual convs, guess mode (cond-only ControlNet with
    logspace scaling, zero uncond residuals) must differ from standard CFG."""
    preset = micro_debug()
    batch = _batch(preset)
    modules = preset.modules(dtype=jnp.float32)
    params = _unzero_residual_convs(
        init_params(preset, modules, jax.random.PRNGKey(0)))
    pipe, _ = _pipeline(preset, params=params, num_inference_steps=2)
    pipe_g, _ = _pipeline(preset, params=params, num_inference_steps=2,
                          guess_mode=True)
    key = jax.random.PRNGKey(3)
    a = np.asarray(pipe(batch, key=key))
    b = np.asarray(pipe_g(batch, key=key))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-4


@pytest.mark.slow
def test_use_uncond_map_changes_uncond_branch():
    """use_uncond_map=negative1: the CFG uncond branch sees a -1 map instead
    of the scene map (ref:unet_addon_rawbox.py:188-202, 625-682), changing
    the output once the residual convs are live."""
    preset = micro_debug()
    batch = _batch(preset)

    preset_u = dataclasses.replace(
        preset, controlnet=dataclasses.replace(preset.controlnet,
                                               use_uncond_map="negative1"))
    modules = preset.modules(dtype=jnp.float32)
    modules_u = preset_u.modules(dtype=jnp.float32)
    params = init_params(preset, modules, jax.random.PRNGKey(0))
    params_u = init_params(preset_u, modules_u, jax.random.PRNGKey(0))
    # identical shared weights (the uncond_map buffer is rng-free)
    np.testing.assert_array_equal(
        np.asarray(params["controlnet"]["params"]["cam2token"]["kernel"]),
        np.asarray(params_u["controlnet"]["params"]["cam2token"]["kernel"]))
    assert np.all(np.asarray(
        params_u["controlnet"]["buffers"]["uncond_map"]) == -1.0)

    params = _unzero_residual_convs(params)
    params_u = _unzero_residual_convs(params_u)
    pipe, _ = _pipeline(preset, params=params, num_inference_steps=2)
    pipe_u, _ = _pipeline(preset_u, params=params_u, num_inference_steps=2)
    key = jax.random.PRNGKey(3)
    a = np.asarray(pipe(batch, key=key))
    b = np.asarray(pipe_u(batch, key=key))
    assert np.isfinite(b).all()
    assert np.abs(a - b).max() > 1e-5


def test_fix_seed_within_batch_latent_policy():
    """fix_seed_within_batch: all samples share the same initial latent
    (ref:misc/test_utils.py:224-238); default: per-sample noise."""
    preset = micro_debug()
    pipe, _ = _pipeline(preset, num_inference_steps=2)
    key = jax.random.PRNGKey(0)
    lat_fix = np.asarray(pipe.prepare_latents(key, 3,
                                              fix_seed_within_batch=True))
    lat = np.asarray(pipe.prepare_latents(key, 3))
    assert lat_fix.shape == lat.shape
    np.testing.assert_array_equal(lat_fix[0], lat_fix[1])
    np.testing.assert_array_equal(lat_fix[0], lat_fix[2])
    assert np.abs(lat[0] - lat[1]).max() > 0
    # views always share the sample's noise (ref:pipeline_bev_controlnet.py:326)
    np.testing.assert_array_equal(lat[:, 0], lat[:, 1])


def test_knob_config_plumbing():
    """YAML -> preset: use_uncond_map and guess_mode reach the dataclasses."""
    cfg = compose(CONFIG_DIR, overrides=[
        "model.controlnet.use_uncond_map=negative1",
        "runner.pipeline_param.guess_mode=true"])
    preset = preset_from_config(cfg)
    assert preset.controlnet.use_uncond_map == "negative1"
    assert preset.pipeline.guess_mode is True
    # defaults stay off
    base = preset_from_config(compose(CONFIG_DIR))
    assert base.controlnet.use_uncond_map is None
    assert base.pipeline.guess_mode is False
