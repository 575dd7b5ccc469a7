"""Mesh-sharded inference: the sampling loop runs dp-sharded over 8 virtual
devices (the distributed val-set-generation path, SURVEY.md §2.4 row
'Multi-process inference sharding')."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdrive_tpu.config.presets import init_params, tiny_debug
from magicdrive_tpu.data.collate import CollateConfig, collate_fn
from magicdrive_tpu.data.fixtures import make_dataset
from magicdrive_tpu.parallel.mesh import make_mesh, replicated, shard_batch
from magicdrive_tpu.pipeline.pipeline import MagicDrivePipeline


pytestmark = pytest.mark.slow  # 8-device pipeline compile


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sampling_dp_sharded():
    preset = tiny_debug()
    preset = dataclasses.replace(
        preset, pipeline=dataclasses.replace(preset.pipeline,
                                             num_inference_steps=2))
    modules = preset.modules(dtype=jnp.float32)
    params = init_params(preset, modules, jax.random.PRNGKey(0))
    mesh = make_mesh((8, 1))
    params = jax.device_put(params, replicated(mesh))
    pipe = MagicDrivePipeline(modules, params, preset.pipeline)

    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size, is_train=False)
    B = 8
    host = collate_fn(make_dataset(B), ccfg)
    host.pop("pixel_values")
    batch = shard_batch(host, mesh)

    latents = pipe.prepare_latents(jax.random.PRNGKey(1), B)
    latents = jax.device_put(
        latents, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("dp")))
    imgs = pipe(batch, latents=latents)
    assert imgs.shape == (B, 6, 224, 400, 3)
    # output stays dp-sharded — no unexpected gather
    assert "dp" in str(imgs.sharding)
    assert np.isfinite(np.asarray(imgs)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sampling_view_sharded_matches_unsharded():
    """Image sampling on a (dp=4, view=2) mesh — the camera axis itself is
    sharded, so the cross-view attention's neighbor gathers cross device
    boundaries (the ring-permute inference path, docs/sharding.md) — must
    reproduce the unsharded pipeline's images (VERDICT r4 weak #6)."""
    preset = tiny_debug()
    preset = dataclasses.replace(
        preset, pipeline=dataclasses.replace(preset.pipeline,
                                             num_inference_steps=2))
    modules = preset.modules(dtype=jnp.float32)
    params = init_params(preset, modules, jax.random.PRNGKey(0))
    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size, is_train=False)
    B = 4
    host = collate_fn(make_dataset(B), ccfg)
    host.pop("pixel_values")

    # reference: unsharded single-device run
    pipe = MagicDrivePipeline(modules, params, preset.pipeline)
    latents_h = pipe.prepare_latents(jax.random.PRNGKey(1), B)
    ref = np.asarray(pipe({k: jnp.asarray(v) for k, v in host.items()},
                          latents=latents_h))

    mesh = make_mesh((4, 2))
    sharded_params = jax.device_put(params, replicated(mesh))
    spipe = MagicDrivePipeline(modules, sharded_params, preset.pipeline)
    batch = shard_batch(host, mesh, n_cam=preset.pipeline.n_cam)
    latents = jax.device_put(
        latents_h, jax.sharding.NamedSharding(
            mesh, jax.sharding.PartitionSpec("dp", "view")))
    imgs = spipe(batch, latents=latents)
    assert "view" in str(imgs.sharding) or "dp" in str(imgs.sharding)
    np.testing.assert_allclose(np.asarray(imgs), ref, atol=2e-4, rtol=2e-3)
