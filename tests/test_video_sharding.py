"""Frame-axis (temporal) sharding for the video model (SURVEY.md §5.7).

The video batch's leading axis is (clip, frame) flattened, so sharding it
over a ``t`` mesh axis IS frame sharding: each device holds a contiguous
slice of frames and the temporal attention's frame-axis regrouping
(core/transformer.py:_temporal) lowers to XLA SPMD all-to-alls over the
mesh. This is the designed path for the 60-frame released model, which
cannot fit one chip (VERDICT r1 item 9; ref:README.MD:33-36).

Correctness is asserted against the unsharded computation, not just
compile: same inputs + rng must give the same loss / images.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from magicdrive_tpu.config.presets import init_params, micro_video_debug
from magicdrive_tpu.data.collate import CollateConfig, collate_fn
from magicdrive_tpu.data.fixtures import make_dataset
from magicdrive_tpu.parallel.mesh import make_mesh, replicated
from magicdrive_tpu.pipeline.video import VideoPipeline
from magicdrive_tpu.train.state import TrainConfig, create_train_state
from magicdrive_tpu.train.train_step import make_train_step

from jax.sharding import NamedSharding, PartitionSpec as P

pytestmark = [
    pytest.mark.slow,  # 8-device mesh compiles
    pytest.mark.skipif(len(jax.devices()) < 8,
                       reason="needs 8 virtual devices"),
]

F = 4  # frames per clip
CLIPS = 2


def _setup():
    preset = micro_video_debug(n_frames=F)
    modules = preset.modules(dtype=jnp.float32)
    params = init_params(preset, modules, jax.random.PRNGKey(0))
    B = CLIPS * F  # leading axis = (clip, frame) flattened
    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size)
    host = collate_fn(
        make_dataset(B, image_hw=preset.image_size, map_hw=preset.map_hw),
        ccfg, rng=np.random.default_rng(0))
    batch = {k: jnp.asarray(v) for k, v in host.items()}
    return preset, modules, params, batch


def _shard_over_frames(batch, mesh):
    """Leading (clip*frame) axis over (dp, t): frame-major within clip."""
    out = {}
    for k, v in batch.items():
        if k == "uncond_ids":
            out[k] = jax.device_put(v, replicated(mesh))
        else:
            out[k] = jax.device_put(v, NamedSharding(mesh, P(("dp", "t"))))
    return out


def test_frame_sharded_train_step_matches_unsharded():
    preset, modules, params, batch = _setup()
    tcfg = TrainConfig(lr_warmup_steps=1, frames_per_clip=F,
                       drop_cond_ratio=0.0)
    rng = jax.random.PRNGKey(1)

    # unsharded reference
    state = create_train_state(params, tcfg)
    step = jax.jit(make_train_step(modules, tcfg))
    _, ref = step(state, batch, rng)

    # dp x t mesh: clips over dp, frames over t (1 frame per device)
    mesh = make_mesh((CLIPS, F), axis_names=("dp", "t"))
    state_s = jax.device_put(create_train_state(params, tcfg),
                             replicated(mesh))
    batch_s = _shard_over_frames(batch, mesh)
    step_s = jax.jit(make_train_step(modules, tcfg))
    new_state, out = step_s(state_s, batch_s, rng)
    np.testing.assert_allclose(float(out["loss"]), float(ref["loss"]),
                               rtol=1e-5)
    assert int(new_state.step) == 1


def test_frame_sharded_video_sampling_matches_unsharded():
    preset, modules, params, batch = _setup()
    pcfg = dataclasses.replace(preset.pipeline, num_inference_steps=2)
    batch = {k: v for k, v in batch.items() if k != "pixel_values"}
    pipe = VideoPipeline(modules, params, pcfg, n_frames=F)
    latents = pipe.prepare_latents(jax.random.PRNGKey(2), CLIPS)
    ref = np.asarray(pipe(batch, latents=latents))

    mesh = make_mesh((CLIPS, F), axis_names=("dp", "t"))
    params_s = jax.device_put(params, replicated(mesh))
    pipe_s = VideoPipeline(modules, params_s, pcfg, n_frames=F)
    batch_s = _shard_over_frames(batch, mesh)
    lat_s = jax.device_put(latents, NamedSharding(mesh, P(("dp", "t"))))
    out = pipe_s(batch_s, latents=lat_s)
    assert "dp" in str(out.sharding) or "t" in str(out.sharding)
    out = np.asarray(out)
    assert out.shape == ref.shape == (CLIPS * F, 6, *preset.image_size, 3)
    # collectives reorder fp32 reductions; observed max dev ~8e-5 over the
    # 2-step denoise + VAE decode
    np.testing.assert_allclose(out, ref, atol=5e-4)


def test_frame_and_view_sharded_train_step_matches_unsharded():
    """3-axis mesh (dp, t, view): frames over t AND cameras over view.

    This is the HBM-fit path for 60-frame training: the t=6 shard alone
    still holds 10 frames x 6 views = 60 images per device (~3.3x the
    single-chip bs=3 activation budget — tools/budget_video60.py
    --device-proxy); t x view = 6 x 6 drops it to 10 images per device.
    Here: dp=2 clips, t=2 (2 frames each), view=2 (3 cameras each) on the
    8-device virtual mesh, loss equal to the unsharded step."""
    preset, modules, params, batch = _setup()
    tcfg = TrainConfig(lr_warmup_steps=1, frames_per_clip=F,
                       drop_cond_ratio=0.0)
    rng = jax.random.PRNGKey(1)

    state = create_train_state(params, tcfg)
    step = jax.jit(make_train_step(modules, tcfg))
    _, ref = step(state, batch, rng)

    mesh = make_mesh((2, 2, 2), axis_names=("dp", "t", "view"))
    state_s = jax.device_put(create_train_state(params, tcfg),
                             replicated(mesh))
    batch_s = {}
    for k, v in batch.items():
        if k == "uncond_ids":
            batch_s[k] = jax.device_put(v, replicated(mesh))
        elif v.ndim >= 2 and v.shape[1] == 6:  # (B, N_cam, ...) tensors
            batch_s[k] = jax.device_put(
                v, NamedSharding(mesh, P(("dp", "t"), "view")))
        else:
            batch_s[k] = jax.device_put(
                v, NamedSharding(mesh, P(("dp", "t"))))
    step_s = jax.jit(make_train_step(modules, tcfg))
    new_state, out = step_s(state_s, batch_s, rng)
    np.testing.assert_allclose(float(out["loss"]), float(ref["loss"]),
                               rtol=1e-5)
    assert int(new_state.step) == 1


def test_60_frame_graph_shapes_validate():
    """The released 60-frame model's graph (ref:README.MD:33-36) shape-
    validates end-to-end at tiny spatial dims via eval_shape — no compile,
    so this runs in the fast tier's budget despite the 60-frame batch."""
    F60 = 60
    preset = micro_video_debug(n_frames=F60)
    modules = preset.modules(dtype=jnp.float32)
    B = 1 * F60
    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size)
    host = collate_fn(
        make_dataset(B, image_hw=preset.image_size, map_hw=preset.map_hw),
        ccfg, rng=np.random.default_rng(0))
    batch = {k: jnp.asarray(v) for k, v in host.items()}

    shapes = jax.eval_shape(
        lambda: init_params(preset, modules, jax.random.PRNGKey(0)))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)
    tcfg = TrainConfig(lr_warmup_steps=1, frames_per_clip=F60,
                       drop_cond_ratio=0.0)
    step = make_train_step(modules, tcfg)
    state = create_train_state(params, tcfg)
    out_state, metrics = jax.eval_shape(
        step, state, batch, jax.random.PRNGKey(1))
    assert metrics["loss"].shape == ()
