"""Given-view pipeline: provided views survive, others are generated."""
import jax
import jax.numpy as jnp
import numpy as np

from magicdrive_tpu.config.presets import init_params, tiny_debug
from magicdrive_tpu.data.collate import CollateConfig, collate_fn
from magicdrive_tpu.data.fixtures import make_dataset
from magicdrive_tpu.pipeline.given_view import GivenViewPipeline


import pytest

pytestmark = pytest.mark.slow  # e2e given-view pipeline


def test_given_view_keeps_given_and_generates_rest():
    preset = tiny_debug()
    modules = preset.modules(dtype=jnp.float32)
    params = init_params(preset, modules, jax.random.PRNGKey(0))
    pipe = GivenViewPipeline(modules, params, preset.pipeline)

    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size, is_train=False)
    raw = collate_fn(make_dataset(1), ccfg)
    batch = {k: jnp.asarray(v) for k, v in raw.items()
             if k != "pixel_values"}
    px = jnp.asarray(raw["pixel_values"])

    given = pipe.encode_views(px)
    view_mask = np.zeros(preset.pipeline.n_cam, np.float32)
    view_mask[1] = 1.0

    out = pipe(batch, given_latents=given, view_mask=view_mask,
               key=jax.random.PRNGKey(3))
    assert out.shape == (1, preset.pipeline.n_cam, *preset.image_size, 3)
    assert np.isfinite(np.asarray(out)).all()

    # the provided view decodes from its own clean latent: identical to a
    # direct VAE round-trip of the GT image
    from magicdrive_tpu.models.vae import AutoencoderKL
    from einops import rearrange

    dec = modules.vae.apply(
        params["vae"], rearrange(given, "b n h w c -> (b n) h w c"),
        method=AutoencoderKL.decode)
    dec = np.clip(np.asarray(dec) / 2 + 0.5, 0, 1)
    np.testing.assert_allclose(np.asarray(out[0, 1]), dec[1], atol=1e-5)

    # generated views differ from the naive round-trip (actual generation)
    assert np.abs(np.asarray(out[0, 0]) - dec[0]).max() > 1e-3
