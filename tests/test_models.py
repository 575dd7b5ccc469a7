import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from magicdrive_tpu.models.unet import (
    UNetConfig, UNet2DConditionModel, NUSCENES_NEIGHBORS,
)
from magicdrive_tpu.models.controlnet import BEVControlNetConfig, BEVControlNet
from magicdrive_tpu.models.embedders import (
    BBoxEmbedderConfig, ContinuousBBoxWithTextEmbedding, BEVMapEmbedder,
    embed_camera,
)
from magicdrive_tpu.models.vae import AutoencoderKL, VAEConfig
from magicdrive_tpu.models.clip_text import CLIPTextModel, CLIPTextConfig

TINY_UNET = UNetConfig(
    block_out_channels=(8, 16, 16, 16), num_attention_heads=2,
    cross_attention_dim=12, norm_num_groups=4,
    neighboring_view_pair=NUSCENES_NEIGHBORS)
N_CAM = 6


import pytest

pytestmark = pytest.mark.slow  # full tiny-model jits


def test_unet_forward_and_residual_shapes():
    model = UNet2DConditionModel(TINY_UNET)
    x = jnp.zeros((N_CAM, 16, 16, 4))
    t = jnp.zeros((N_CAM,), jnp.int32)
    ctx = jnp.zeros((N_CAM, 9, 12))
    params = model.init(jax.random.PRNGKey(0), x, t, ctx)["params"]
    out = model.apply({"params": params}, x, t, ctx)
    assert out.shape == (N_CAM, 16, 16, 4)


def test_controlnet_zero_init_residuals_are_zero():
    """Fresh ControlNet must emit exactly-zero residuals (zero convs,
    ref:unet_addon_rawbox.py:219-272) so adding it to a pretrained UNet is a
    no-op at step 0."""
    cfg = BEVControlNetConfig(
        unet=dataclasses.replace(TINY_UNET, neighboring_view_pair=None),
        camera_out_dim=12, map_size=(8, 200, 200),
        map_embedder_out_channels=(4, 4, 8, 8),
        bbox=BBoxEmbedderConfig(class_token_dim=12,
                                proj_dims=(12, 8, 8, 12)))
    model = BEVControlNet(cfg)
    B, max_len = 1, 5
    args = dict(
        sample=jnp.zeros((B, N_CAM, 28, 50, 4)),
        timesteps=jnp.zeros((B,), jnp.int32),
        camera_param=jax.random.normal(jax.random.PRNGKey(1), (B, N_CAM, 3, 7)),
        encoder_hidden_states=jax.random.normal(jax.random.PRNGKey(2), (B, 7, 12)),
        controlnet_cond=jax.random.normal(jax.random.PRNGKey(3), (B, 200, 200, 8)),
        bboxes=jax.random.normal(jax.random.PRNGKey(4), (B, N_CAM, max_len, 8, 3)),
        classes=jnp.zeros((B, N_CAM, max_len), jnp.int32),
        masks=jnp.ones((B, N_CAM, max_len)),
    )
    variables = model.init(jax.random.PRNGKey(0), **args)
    down_res, mid_res, tokens = model.apply(variables, **args)
    assert len(down_res) == 12
    assert tokens.shape == (B, N_CAM, 1 + 7 + max_len, 12)
    for r in down_res:
        assert float(jnp.abs(r).max()) == 0.0
    assert float(jnp.abs(mid_res).max()) == 0.0


def test_bbox_embedder_mask_blend():
    """Masked-out slots must produce exactly the null token regardless of the
    box/class contents (ref:bbox_embedder.py:180-184)."""
    cfg = BBoxEmbedderConfig(n_classes=4, class_token_dim=16,
                             proj_dims=(16, 8, 8, 16))
    emb = ContinuousBBoxWithTextEmbedding(cfg)
    boxes = jax.random.normal(jax.random.PRNGKey(0), (3, 8, 3))
    classes = jnp.asarray([1, 2, -1])
    masks = jnp.asarray([1.0, 0.0, 0.0])
    variables = emb.init(jax.random.PRNGKey(1), boxes, classes, masks)
    out = emb.apply(variables, boxes, classes, masks)
    out2 = emb.apply(variables, jnp.zeros_like(boxes) + 99.0, classes, masks)
    # masked slots identical under different box coords
    np.testing.assert_allclose(np.asarray(out[1:]), np.asarray(out2[1:]),
                               atol=1e-6)
    # unmasked slot differs
    assert np.abs(np.asarray(out[0]) - np.asarray(out2[0])).max() > 1e-3


def test_map_embedder_output_shape():
    """(200, 200, 8) BEV map -> (28, 50, C) latent features for the 224x400
    model (ref:map_embedder.py:26-28)."""
    emb = BEVMapEmbedder(block_out_channels=(4, 4, 8, 8), out_channels=16)
    x = jnp.zeros((1, 200, 200, 8))
    variables = emb.init(jax.random.PRNGKey(0), x)
    out = emb.apply(variables, x)
    assert out.shape == (1, 28, 50, 16)
    # conv_out is zero-init
    assert float(jnp.abs(out).max()) == 0.0


def test_embed_camera_shape():
    cam = jnp.zeros((2, 6, 3, 7))
    out = embed_camera(cam)
    assert out.shape == (2, 6, 189)


def test_vae_roundtrip_shapes():
    cfg = VAEConfig(block_out_channels=(4, 4, 8, 8), layers_per_block=1,
                    norm_num_groups=2)
    vae = AutoencoderKL(cfg)
    x = jnp.zeros((2, 32, 32, 3))
    variables = vae.init(jax.random.PRNGKey(0), x)
    z = vae.apply(variables, x, method=AutoencoderKL.encode)
    assert z.shape == (2, 4, 4, 4)
    y = vae.apply(variables, z, method=AutoencoderKL.decode)
    assert y.shape == (2, 32, 32, 3)


def test_clip_text_shapes():
    cfg = CLIPTextConfig(vocab_size=100, hidden_size=16, num_layers=2,
                         num_heads=2, intermediate_size=32, eos_token_id=99)
    model = CLIPTextModel(cfg)
    ids = jnp.asarray([[1, 5, 99, 0, 0]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(0), ids)
    hidden, pooled = model.apply(variables, ids)
    assert hidden.shape == (1, 5, 16)
    assert pooled.shape == (1, 16)
    # pooled picks the first EOS position (transformers CLIP pooler)
    np.testing.assert_allclose(np.asarray(pooled), np.asarray(hidden[0, 2])[None],
                               atol=1e-6)
