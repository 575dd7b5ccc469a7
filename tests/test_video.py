"""Temporal-attention (video) extension: identity at init + e2e pipeline."""
import jax
import jax.numpy as jnp
import numpy as np

from magicdrive_tpu.core.transformer import BasicTransformerBlock


import pytest

pytestmark = pytest.mark.slow  # e2e video pipeline/training


def test_temporal_block_identity_at_init():
    """zero-init connector_temp => temporal block leaves outputs unchanged."""
    neighbors = tuple(((i - 1) % 6, (i + 1) % 6) for i in range(6))
    common = dict(dim=16, n_heads=2, d_head=8, cross_attention_dim=16,
                  neighboring_view_pair=neighbors)
    blk_img = BasicTransformerBlock(**common)
    blk_vid = BasicTransformerBlock(**common, temporal_frames=2)

    x = jax.random.normal(jax.random.PRNGKey(0), (12, 10, 16))  # B=1,F=2,N=6
    ctx = jax.random.normal(jax.random.PRNGKey(1), (12, 7, 16))
    v_img = blk_img.init(jax.random.PRNGKey(2), x, ctx)
    v_vid = blk_vid.init(jax.random.PRNGKey(2), x, ctx)
    # graft image weights into the video block (shared submodules)
    p = dict(v_vid["params"])
    for k, val in v_img["params"].items():
        p[k] = val
    y_img = blk_img.apply(v_img, x, ctx)
    y_vid = blk_vid.apply({"params": p}, x, ctx)
    np.testing.assert_allclose(np.asarray(y_vid), np.asarray(y_img),
                               atol=1e-6)


def test_temporal_mixes_frames():
    """With a non-zero connector the temporal path mixes frame content."""
    blk = BasicTransformerBlock(dim=8, n_heads=2, d_head=4,
                                temporal_frames=2,
                                zero_module_type="none")
    # layout (b f n) with F=2, N=1: rows 0,1 = frames of sample 0
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 6, 8))
    v = blk.init(jax.random.PRNGKey(1), x)
    y = blk.apply(v, x)
    # perturb sample 0's frame 1 only (single channel — a uniform shift
    # would be cancelled by the LayerNorms); its frame 0 output must change
    x2 = x.at[1, :, 0].add(1.0)
    y2 = blk.apply(v, x2)
    assert np.abs(np.asarray(y2[0] - y[0])).max() > 1e-4
    # sample 1 (rows 2,3) is untouched — no cross-sample leakage
    np.testing.assert_allclose(np.asarray(y2[2:]), np.asarray(y[2:]),
                               atol=1e-6)


def test_video_pipeline_end_to_end():
    from magicdrive_tpu.config.presets import init_params, tiny_video_debug
    from magicdrive_tpu.data.collate import CollateConfig, collate_fn
    from magicdrive_tpu.data.fixtures import make_dataset
    from magicdrive_tpu.pipeline.video import VideoPipeline

    F = 2
    preset = tiny_video_debug(n_frames=F)
    modules = preset.modules(dtype=jnp.float32)
    params = init_params(preset, modules, jax.random.PRNGKey(0))
    pipe = VideoPipeline(modules, params, preset.pipeline, n_frames=F)

    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size, is_train=False)
    # per-frame batches: F fixture samples = F frames of one clip
    batch = collate_fn(make_dataset(F), ccfg)
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k != "pixel_values"}
    # uncond_ids stays (1, 77); frame axis is already folded (B*F = F)
    imgs = pipe(batch, key=jax.random.PRNGKey(7))
    assert imgs.shape == (F, 6, 224, 400, 3)
    assert np.isfinite(np.asarray(imgs)).all()


def test_video_train_step():
    """Training the video model: per-frame folded batch, one t per clip."""
    from magicdrive_tpu.config.presets import init_params, tiny_video_debug
    from magicdrive_tpu.data.collate import CollateConfig, collate_fn
    from magicdrive_tpu.data.fixtures import make_dataset
    from magicdrive_tpu.train.state import TrainConfig, create_train_state
    from magicdrive_tpu.train.train_step import make_train_step

    F = 2
    preset = tiny_video_debug(n_frames=F)
    modules = preset.modules(dtype=jnp.float32)
    params = init_params(preset, modules, jax.random.PRNGKey(0))
    tcfg = TrainConfig(lr_warmup_steps=1, frames_per_clip=F)
    state = create_train_state(params, tcfg)

    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size)
    batch = collate_fn(make_dataset(F), ccfg)  # F frames = one clip
    batch = {k: jnp.asarray(v) for k, v in batch.items()}

    step = jax.jit(make_train_step(modules, tcfg), donate_argnums=(0,))
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    # temporal modules received gradients (connector_temp kernels move on
    # the next step only after optimizer update; check they exist and train)
    flat = [k for k in state.trainable if "attn_temp" in k]
    assert flat, "temporal attention params must be trainable"
