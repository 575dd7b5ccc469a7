"""End-to-end generation on the CPU-runnable tiny model
(BASELINE.json config 1/2: full conditioning stack + cross-view attention +
CFG + UniPC + VAE decode, minus pretrained weights)."""
import jax
import jax.numpy as jnp
import numpy as np

from magicdrive_tpu.config.presets import tiny_debug, init_params
from magicdrive_tpu.pipeline.pipeline import MagicDrivePipeline


import pytest

pytestmark = pytest.mark.slow  # e2e tiny pipeline compile


def make_batch(preset, B=1):
    p = preset.pipeline
    N, L = p.n_cam, preset.bbox_max_len
    k = jax.random.PRNGKey(7)
    ks = jax.random.split(k, 6)
    return {
        "input_ids": jnp.full((B, 77), 10, jnp.int32),
        "uncond_ids": jnp.full((1, 77), 3, jnp.int32),
        "camera_param": jax.random.normal(ks[0], (B, N, 3, 7)),
        "bev_map": (jax.random.uniform(ks[1], (B, 200, 200, 8)) > 0.5
                    ).astype(jnp.float32),
        "bboxes": jax.random.normal(ks[2], (B, N, L, 8, 3)),
        "classes": jax.random.randint(ks[3], (B, N, L), 0, 10),
        "masks": (jax.random.uniform(ks[4], (B, N, L)) > 0.5
                  ).astype(jnp.float32),
    }


def test_pipeline_end_to_end_tiny():
    preset = tiny_debug()
    modules = preset.modules(dtype=jnp.float32)
    params = init_params(preset, modules, jax.random.PRNGKey(0))
    pipe = MagicDrivePipeline(modules, params, preset.pipeline)
    batch = make_batch(preset)
    imgs = pipe(batch, key=jax.random.PRNGKey(1))
    assert imgs.shape == (1, 6, 224, 400, 3)
    arr = np.asarray(imgs)
    assert np.isfinite(arr).all()
    assert arr.min() >= 0.0 and arr.max() <= 1.0
    # different seeds -> different images
    imgs2 = pipe(batch, key=jax.random.PRNGKey(2))
    assert np.abs(np.asarray(imgs2) - arr).max() > 1e-5
    # same seed -> deterministic
    imgs3 = pipe(batch, key=jax.random.PRNGKey(1))
    np.testing.assert_allclose(np.asarray(imgs3), arr, atol=1e-5)
