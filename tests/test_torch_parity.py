"""Numerical parity vs the reference's own (vendored) torch implementations.

These tests instantiate the vendored diffusers / reference MagicDrive
modules with RANDOM weights, convert them with
magicdrive_tpu.convert.torch_weights, and require matching outputs — they
validate the weight converter AND our architecture simultaneously
(SURVEY.md §7.4 #2). Skipped when /root/reference is not mounted.
"""
import os
import sys

import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")
import jax  # noqa: E402

REFERENCE = "/root/reference"
DIFFUSERS = os.path.join(REFERENCE, "third_party", "diffusers", "src")

pytestmark = [
    pytest.mark.slow,  # torch-oracle parity (vendored diffusers + reference)
    pytest.mark.skipif(not os.path.isdir(DIFFUSERS),
                       reason="reference not mounted"),
]


@pytest.fixture(scope="module")
def torch_env():
    """Vendored diffusers importable with current-library shims."""
    sys.path.insert(0, DIFFUSERS)
    import huggingface_hub as hh

    for name in ["cached_download", "HfFolder", "model_info", "hf_hub_url"]:
        if not hasattr(hh, name):
            setattr(hh, name, getattr(hh, "hf_hub_download", object))
    if not hasattr(jax.random, "KeyArray"):
        jax.random.KeyArray = jax.Array
    import torch

    torch.manual_seed(0)
    return torch


def _sd(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


def test_unet_parity(torch_env):
    torch = torch_env
    from diffusers.models.unet_2d_condition import UNet2DConditionModel

    from magicdrive_tpu.convert.torch_weights import convert_module
    from magicdrive_tpu.models.unet import UNet2DConditionModel as JaxUNet
    from magicdrive_tpu.models.unet import UNetConfig

    tm = UNet2DConditionModel(
        block_out_channels=(32, 32, 64, 64), layers_per_block=2,
        cross_attention_dim=32, attention_head_dim=4, norm_num_groups=8,
        sample_size=16).eval()

    cfg = UNetConfig(block_out_channels=(32, 32, 64, 64),
                     num_attention_heads=4, cross_attention_dim=32,
                     norm_num_groups=8, neighboring_view_pair=None)
    jm = JaxUNet(cfg)
    x = np.random.RandomState(0).randn(2, 16, 16, 4).astype(np.float32)
    t = np.array([7, 385], np.int32)
    ctx = np.random.RandomState(1).randn(2, 11, 32).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(t), jnp.asarray(ctx))
    converted, _ = convert_module(variables, _sd(tm))

    with torch.no_grad():
        ty = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(t.astype(np.int64)),
                torch.from_numpy(ctx)).sample.numpy()
    jy = np.asarray(jm.apply(converted, jnp.asarray(x), jnp.asarray(t),
                             jnp.asarray(ctx)))
    np.testing.assert_allclose(jy.transpose(0, 3, 1, 2), ty,
                               atol=2e-4, rtol=2e-3)


def test_unet_controlnet_residual_parity(torch_env):
    """Additive residual plumbing matches diffusers' down/mid injection."""
    torch = torch_env
    from diffusers.models.unet_2d_condition import UNet2DConditionModel

    from magicdrive_tpu.convert.torch_weights import convert_module
    from magicdrive_tpu.models.unet import UNet2DConditionModel as JaxUNet
    from magicdrive_tpu.models.unet import UNetConfig

    tm = UNet2DConditionModel(
        block_out_channels=(32, 64), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=4, norm_num_groups=8,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        sample_size=8).eval()
    cfg = UNetConfig(block_out_channels=(32, 64), layers_per_block=1,
                     num_attention_heads=4, cross_attention_dim=16,
                     norm_num_groups=8, down_block_has_attn=(True, False),
                     neighboring_view_pair=None)
    jm = JaxUNet(cfg)
    rs = np.random.RandomState(2)
    x = rs.randn(1, 8, 8, 4).astype(np.float32)
    t = np.array([55], np.int32)
    ctx = rs.randn(1, 5, 16).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(t), jnp.asarray(ctx))
    converted, _ = convert_module(variables, _sd(tm))

    res_shapes = [(1, 8, 8, 32), (1, 8, 8, 32), (1, 4, 4, 32),
                  (1, 4, 4, 64)]
    down_res = [rs.randn(*s).astype(np.float32) * 0.1 for s in res_shapes]
    mid_res = rs.randn(1, 4, 4, 64).astype(np.float32) * 0.1

    with torch.no_grad():
        ty = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(t.astype(np.int64)), torch.from_numpy(ctx),
                down_block_additional_residuals=[
                    torch.from_numpy(r.transpose(0, 3, 1, 2))
                    for r in down_res],
                mid_block_additional_residual=torch.from_numpy(
                    mid_res.transpose(0, 3, 1, 2))).sample.numpy()
    jy = np.asarray(jm.apply(
        converted, jnp.asarray(x), jnp.asarray(t), jnp.asarray(ctx),
        down_block_additional_residuals=[jnp.asarray(r) for r in down_res],
        mid_block_additional_residual=jnp.asarray(mid_res)))
    np.testing.assert_allclose(jy.transpose(0, 3, 1, 2), ty,
                               atol=2e-4, rtol=2e-3)


def test_vae_parity(torch_env):
    torch = torch_env
    from diffusers.models.autoencoder_kl import AutoencoderKL as TorchVAE

    from magicdrive_tpu.convert.torch_weights import convert_module
    from magicdrive_tpu.models.vae import AutoencoderKL, VAEConfig

    tm = TorchVAE(block_out_channels=(16, 32),
                  down_block_types=("DownEncoderBlock2D",) * 2,
                  up_block_types=("UpDecoderBlock2D",) * 2,
                  layers_per_block=1, norm_num_groups=8,
                  latent_channels=4).eval()
    cfg = VAEConfig(block_out_channels=(16, 32), layers_per_block=1,
                    norm_num_groups=8)
    jm = AutoencoderKL(cfg)
    x = np.random.RandomState(3).randn(1, 32, 32, 3).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    converted, _ = convert_module(variables, _sd(tm))

    with torch.no_grad():
        post = tm.encode(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        t_mean = post.latent_dist.mean.numpy()
        t_dec = tm.decode(post.latent_dist.mean).sample.numpy()
    j_mean, _ = jm.apply(converted, jnp.asarray(x),
                         method=AutoencoderKL.encode_moments)
    np.testing.assert_allclose(
        np.asarray(j_mean).transpose(0, 3, 1, 2), t_mean, atol=2e-4,
        rtol=2e-3)
    j_dec = jm.apply(converted,
                     jnp.asarray(np.asarray(j_mean)) * cfg.scaling_factor,
                     method=AutoencoderKL.decode)
    np.testing.assert_allclose(
        np.asarray(j_dec).transpose(0, 3, 1, 2), t_dec, atol=5e-4, rtol=2e-3)


def test_clip_parity(torch_env):
    torch = torch_env
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    from magicdrive_tpu.convert.torch_weights import convert_clip
    from magicdrive_tpu.models.clip_text import CLIPTextConfig, CLIPTextModel

    hf_cfg = HFConfig(vocab_size=1000, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=77, hidden_act="quick_gelu",
                      eos_token_id=999, bos_token_id=998)
    tm = HFModel(hf_cfg).eval()
    jm = CLIPTextModel(CLIPTextConfig(vocab_size=1000, hidden_size=32,
                                      num_layers=2, num_heads=4,
                                      intermediate_size=64,
                                      eos_token_id=999))
    ids = np.array([[998, 7, 11, 999] + [0] * 73], np.int32)
    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(ids))
    converted = convert_clip(variables, _sd(tm))

    with torch.no_grad():
        t_out = tm(torch.from_numpy(ids.astype(np.int64)))
    j_hidden, j_pooled = jm.apply(converted, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(j_hidden),
                               t_out.last_hidden_state.numpy(),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(j_pooled),
                               t_out.pooler_output.numpy(),
                               atol=2e-4, rtol=2e-3)


def test_unipc_parity(torch_env):
    """Our precomputed UniPC coefficient tables reproduce the diffusers
    UniPCMultistepScheduler trajectory on a synthetic eps model."""
    torch = torch_env
    from diffusers.schedulers.scheduling_unipc_multistep import (
        UniPCMultistepScheduler,
    )

    from magicdrive_tpu.diffusion.samplers import make_unipc_coeffs
    from magicdrive_tpu.diffusion.schedules import sd15_schedule

    num_steps = 20
    sched = UniPCMultistepScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        solver_order=2, prediction_type="epsilon")
    sched.set_timesteps(num_steps)

    rs = np.random.RandomState(0)
    w = rs.randn(4, 4).astype(np.float32) * 0.05

    def eps_fn(x, t):  # deterministic synthetic model, (B, C, H, W) samples
        return np.tanh(np.einsum("bchw,cd->bdhw", x, w)) \
            + 0.01 * float(t) / 1000.0

    x_t = rs.randn(2, 4, 8, 8).astype(np.float32)
    x_j = x_t.copy()

    ours = make_unipc_coeffs(sd15_schedule(), num_steps)
    np.testing.assert_array_equal(np.asarray(sched.timesteps), ours.timesteps)

    state = ours.init_state(x_j.shape)
    tx = torch.from_numpy(x_t)
    for i, t in enumerate(sched.timesteps):
        e = eps_fn(np.asarray(tx), int(t))
        tx = sched.step(torch.from_numpy(e), t, tx).prev_sample
        e_j = eps_fn(x_j, int(ours.timesteps[i]))
        x_next, state = ours.step(i, jnp.asarray(x_j), jnp.asarray(e_j),
                                  state)
        x_j = np.asarray(x_next)
    np.testing.assert_allclose(x_j, tx.numpy(), atol=1e-4, rtol=1e-3)


def test_magicdrive_controlnet_parity(torch_env):
    """Full BEVControlNetModel (reference torch impl) vs our BEVControlNet."""
    torch = torch_env
    sys.path.insert(0, REFERENCE)
    try:
        from magicdrive.networks.unet_addon_rawbox import BEVControlNetModel
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference magicdrive import failed: {e}")

    from magicdrive_tpu.convert.torch_weights import convert_module
    from magicdrive_tpu.models.controlnet import (
        BEVControlNet, BEVControlNetConfig,
    )
    from magicdrive_tpu.models.embedders import BBoxEmbedderConfig
    from magicdrive_tpu.models.unet import UNetConfig

    C = 32
    tm = BEVControlNetModel(
        in_channels=4, block_out_channels=(C, C, 2 * C, 2 * C),
        layers_per_block=2, cross_attention_dim=C, attention_head_dim=4,
        norm_num_groups=8,
        conditioning_embedding_out_channels=(4, 8, 16, 16),
        camera_in_dim=189, camera_out_dim=C,
        map_size=(8, 200, 200), uncond_cam_in_dim=(3, 7),
        use_uncond_map=None, drop_cond_ratio=0.0, drop_cam_num=1,
        cam_embedder_param={"input_dims": 3, "num_freqs": 4,
                            "include_input": True, "log_sampling": True},
        bbox_embedder_cls="magicdrive.networks.bbox_embedder."
                          "ContinuousBBoxWithTextEmbedding",
        bbox_embedder_param={
            "n_classes": 10, "class_token_dim": C,
            "trainable_class_token": False, "use_text_encoder_init": False,
            "embedder_num_freq": 4, "proj_dims": [C, 16, 16, C],
            "mode": "all-xyz", "minmax_normalize": False},
    ).eval()

    ucfg = UNetConfig(block_out_channels=(C, C, 2 * C, 2 * C),
                      num_attention_heads=4, cross_attention_dim=C,
                      norm_num_groups=8, neighboring_view_pair=None)
    jcfg = BEVControlNetConfig(
        unet=ucfg, camera_out_dim=C, map_size=(8, 200, 200),
        map_embedder_out_channels=(4, 8, 16, 16),
        bbox=BBoxEmbedderConfig(n_classes=10, class_token_dim=C,
                                proj_dims=(C, 16, 16, C)),
        drop_cond_ratio=0.0)
    jm = BEVControlNet(jcfg)

    rs = np.random.RandomState(0)
    B, N, L = 1, 6, 5
    h, w = 28, 50
    latents = rs.randn(B, N, h, w, 4).astype(np.float32)
    t = np.array([99], np.int32)
    cam = rs.randn(B, N, 3, 7).astype(np.float32)
    text = rs.randn(B, 77, C).astype(np.float32)
    bev = (rs.rand(B, 200, 200, 8) > 0.5).astype(np.float32)
    bboxes = rs.randn(B, N, L, 8, 3).astype(np.float32)
    classes = rs.randint(0, 10, (B, N, L)).astype(np.int32)
    masks = (rs.rand(B, N, L) > 0.3).astype(np.float32)

    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(latents),
                        jnp.asarray(t), jnp.asarray(cam), jnp.asarray(text),
                        jnp.asarray(bev), jnp.asarray(bboxes),
                        jnp.asarray(classes), jnp.asarray(masks))
    converted, _ = convert_module(variables, _sd(tm))

    with torch.no_grad():
        t_out = tm(
            sample=torch.from_numpy(
                latents.transpose(0, 1, 4, 2, 3)),
            timestep=torch.from_numpy(t.astype(np.int64))[0],
            camera_param=torch.from_numpy(cam),
            encoder_hidden_states=torch.from_numpy(text),
            encoder_hidden_states_uncond=torch.from_numpy(text[:1]),
            controlnet_cond=torch.from_numpy(
                bev.transpose(0, 3, 1, 2)),
            bboxes_3d_data={
                "bboxes": torch.from_numpy(bboxes),
                "classes": torch.from_numpy(classes.astype(np.int64)),
                "masks": torch.from_numpy(masks)},
            return_dict=True)
    j_down, j_mid, j_tokens = jm.apply(
        converted, jnp.asarray(latents), jnp.asarray(t), jnp.asarray(cam),
        jnp.asarray(text), jnp.asarray(bev), jnp.asarray(bboxes),
        jnp.asarray(classes), jnp.asarray(masks))

    t_tokens = t_out.encoder_hidden_states_with_cam.numpy()
    np.testing.assert_allclose(
        np.asarray(j_tokens).reshape(t_tokens.shape), t_tokens,
        atol=2e-4, rtol=2e-3)
    t_mid = t_out.mid_block_res_sample.numpy()
    np.testing.assert_allclose(
        np.asarray(j_mid).transpose(0, 3, 1, 2), t_mid, atol=2e-4, rtol=2e-3)
    for jr, tr in zip(j_down, t_out.down_block_res_samples):
        np.testing.assert_allclose(np.asarray(jr).transpose(0, 3, 1, 2),
                                   tr.numpy(), atol=2e-4, rtol=2e-3)


def test_multiview_unet_parity(torch_env):
    """Cross-view block (norm4/attn4/connector) vs the reference's
    BasicMultiviewTransformerBlock swap."""
    torch = torch_env
    sys.path.insert(0, REFERENCE)
    try:
        from magicdrive.networks.unet_2d_condition_multiview import (
            UNet2DConditionModelMultiview,
        )
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference magicdrive import failed: {e}")

    from magicdrive_tpu.convert.torch_weights import convert_module
    from magicdrive_tpu.models.unet import (
        NUSCENES_NEIGHBORS, UNet2DConditionModel as JaxUNet, UNetConfig,
    )

    tm = UNet2DConditionModelMultiview(
        block_out_channels=(16, 32), layers_per_block=1,
        cross_attention_dim=16, attention_head_dim=4, norm_num_groups=8,
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        neighboring_view_pair={0: [5, 1], 1: [0, 2], 2: [1, 3],
                               3: [2, 4], 4: [3, 5], 5: [4, 0]},
        neighboring_attn_type="add", zero_module_type="zero_linear",
        crossview_attn_type="basic", sample_size=8).eval()
    # zero-init connectors make cross-view a no-op; randomize to test the path
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "connector" in name or "attn4" in name:
                p.copy_(torch.randn_like(p) * 0.05)

    cfg = UNetConfig(block_out_channels=(16, 32), layers_per_block=1,
                     num_attention_heads=4, cross_attention_dim=16,
                     norm_num_groups=8, down_block_has_attn=(True, False),
                     neighboring_view_pair=NUSCENES_NEIGHBORS)
    jm = JaxUNet(cfg)
    rs = np.random.RandomState(1)
    x = rs.randn(6, 8, 8, 4).astype(np.float32)  # B=1, N=6 flattened
    t = np.array([12] * 6, np.int32)
    ctx = rs.randn(6, 5, 16).astype(np.float32)
    variables = jm.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(t), jnp.asarray(ctx))
    converted, _ = convert_module(variables, _sd(tm))

    with torch.no_grad():
        ty = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)),
                torch.from_numpy(t[:1].astype(np.int64))[0],
                torch.from_numpy(ctx)).sample.numpy()
    jy = np.asarray(jm.apply(converted, jnp.asarray(x), jnp.asarray(t),
                             jnp.asarray(ctx)))
    np.testing.assert_allclose(jy.transpose(0, 3, 1, 2), ty,
                               atol=3e-4, rtol=3e-3)


def test_ddim_parity(torch_env):
    """DDIM coefficient tables vs the diffusers DDIMScheduler (eta=0)."""
    torch = torch_env
    from diffusers.schedulers.scheduling_ddim import DDIMScheduler

    from magicdrive_tpu.diffusion.samplers import make_ddim_coeffs
    from magicdrive_tpu.diffusion.schedules import sd15_schedule

    num_steps = 20
    sched = DDIMScheduler(beta_start=0.00085, beta_end=0.012,
                          beta_schedule="scaled_linear",
                          prediction_type="epsilon", set_alpha_to_one=True,
                          steps_offset=0, clip_sample=False)
    sched.set_timesteps(num_steps)

    # diffusers 0.17 DDIM uses "leading" timestep spacing; build our tables
    # on the same grid for the comparison
    ours = make_ddim_coeffs(sd15_schedule(), num_steps,
                            timesteps=np.asarray(sched.timesteps))
    rs = np.random.RandomState(1)
    w = rs.randn(4, 4).astype(np.float32) * 0.05

    def eps_fn(x, t):
        return np.tanh(np.einsum("bchw,cd->bdhw", x, w)) \
            + 0.01 * float(t) / 1000.0

    x_t = rs.randn(2, 4, 8, 8).astype(np.float32)
    x_j = x_t.copy()
    tx = torch.from_numpy(x_t)
    state = ours.init_state(x_j.shape)
    for i, t in enumerate(sched.timesteps):
        e = eps_fn(np.asarray(tx), int(t))
        tx = sched.step(torch.from_numpy(e), t, tx).prev_sample
        e_j = eps_fn(x_j, int(ours.timesteps[i]))
        x_next, state = ours.step(i, jnp.asarray(x_j), jnp.asarray(e_j),
                                  state)
        x_j = np.asarray(x_next)
    np.testing.assert_allclose(x_j, tx.numpy(), atol=1e-4, rtol=1e-3)


def test_full_pipeline_parity(torch_env):
    """The COMPOSED reference pipeline (StableDiffusionBEVControlNetPipeline:
    CFG prompt assembly, map duplication, uncond kwargs, 20 UniPC steps of
    ControlNet+multiview-UNet, VAE decode — ref:pipeline_bev_controlnet.py:
    114-498) vs our one-jit MagicDrivePipeline, with converted weights, from
    identical initial latents. This is the offline FID-parity proxy
    (VERDICT r1 item 3)."""
    torch = torch_env
    sys.path.insert(0, REFERENCE)
    try:
        from magicdrive.networks.unet_addon_rawbox import BEVControlNetModel
        from magicdrive.networks.unet_2d_condition_multiview import (
            UNet2DConditionModelMultiview,
        )
        from magicdrive.pipeline.pipeline_bev_controlnet import (
            StableDiffusionBEVControlNetPipeline,
        )
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference magicdrive import failed: {e}")

    from diffusers.models.autoencoder_kl import AutoencoderKL as TorchVAE
    from diffusers.schedulers.scheduling_unipc_multistep import (
        UniPCMultistepScheduler,
    )
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel

    from magicdrive_tpu.convert.torch_weights import convert_module
    from magicdrive_tpu.models.controlnet import (
        BEVControlNet, BEVControlNetConfig,
    )
    from magicdrive_tpu.models.embedders import BBoxEmbedderConfig
    from magicdrive_tpu.models.unet import (
        NUSCENES_NEIGHBORS, UNet2DConditionModel as JaxUNet, UNetConfig,
    )
    from magicdrive_tpu.models.vae import AutoencoderKL, VAEConfig
    from magicdrive_tpu.pipeline.pipeline import (
        MagicDriveModules, MagicDrivePipeline, PipelineConfig,
    )
    from magicdrive_tpu.diffusion.schedules import NoiseSchedule

    C = 32
    B, N, L = 1, 6, 5
    h, w = 28, 50
    steps = 8  # enough to exercise UniPC multistep + lower-order-final;
    # 20 steps of unoptimized-XLA CPU exec blow the test budget

    # ---- torch modules at real 224x400 latent shapes, C=32 channels ----
    tcn = BEVControlNetModel(
        in_channels=4, block_out_channels=(C, C, 2 * C, 2 * C),
        layers_per_block=1, cross_attention_dim=C, attention_head_dim=4,
        norm_num_groups=8,
        conditioning_embedding_out_channels=(4, 8, 16, 16),
        camera_in_dim=189, camera_out_dim=C,
        map_size=(8, 200, 200), uncond_cam_in_dim=(3, 7),
        use_uncond_map=None, drop_cond_ratio=0.0, drop_cam_num=1,
        cam_embedder_param={"input_dims": 3, "num_freqs": 4,
                            "include_input": True, "log_sampling": True},
        bbox_embedder_cls="magicdrive.networks.bbox_embedder."
                          "ContinuousBBoxWithTextEmbedding",
        bbox_embedder_param={
            "n_classes": 10, "class_token_dim": C,
            "trainable_class_token": False, "use_text_encoder_init": False,
            "embedder_num_freq": 4, "proj_dims": [C, 16, 16, C],
            "mode": "all-xyz", "minmax_normalize": False},
    ).eval()
    tunet = UNet2DConditionModelMultiview(
        block_out_channels=(C, C, 2 * C, 2 * C), layers_per_block=1,
        cross_attention_dim=C, attention_head_dim=4, norm_num_groups=8,
        down_block_types=("CrossAttnDownBlock2D",) * 3 + ("DownBlock2D",),
        up_block_types=("UpBlock2D",) + ("CrossAttnUpBlock2D",) * 3,
        neighboring_view_pair={0: [5, 1], 1: [0, 2], 2: [1, 3],
                               3: [2, 4], 4: [3, 5], 5: [4, 0]},
        neighboring_attn_type="add", zero_module_type="zero_linear",
        crossview_attn_type="basic", sample_size=h).eval()
    tvae = TorchVAE(block_out_channels=(8, 8, 16, 16),
                    down_block_types=("DownEncoderBlock2D",) * 4,
                    up_block_types=("UpDecoderBlock2D",) * 4,
                    layers_per_block=1, norm_num_groups=4,
                    latent_channels=4).eval()
    # un-zero the zero-init paths so ControlNet residuals and cross-view
    # attention are live (otherwise the test degenerates to stock SD)
    with torch.no_grad():
        for name, p in tcn.named_parameters():
            if "controlnet_down_blocks" in name or \
                    "controlnet_mid_block" in name or \
                    "conv_out" in name.split(".")[-2:][0]:
                p.copy_(torch.randn_like(p) * 0.02)
        for name, p in tunet.named_parameters():
            if "connector" in name or "attn4" in name:
                p.copy_(torch.randn_like(p) * 0.05)

    sched = UniPCMultistepScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        solver_order=2, prediction_type="epsilon")
    dummy_text = HFModel(HFConfig(
        vocab_size=64, hidden_size=C, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=77)).eval()  # only .dtype is consulted
    tpipe = StableDiffusionBEVControlNetPipeline(
        vae=tvae, text_encoder=dummy_text, tokenizer=None, unet=tunet,
        controlnet=tcn, scheduler=sched, safety_checker=None,
        feature_extractor=None, requires_safety_checker=False)

    # ---- our modules with the SAME (converted) weights ----
    ucfg = UNetConfig(block_out_channels=(C, C, 2 * C, 2 * C),
                      layers_per_block=1, num_attention_heads=4,
                      cross_attention_dim=C, norm_num_groups=8,
                      neighboring_view_pair=NUSCENES_NEIGHBORS)
    cncfg = BEVControlNetConfig(
        unet=UNetConfig(block_out_channels=(C, C, 2 * C, 2 * C),
                        layers_per_block=1, num_attention_heads=4,
                        cross_attention_dim=C, norm_num_groups=8,
                        neighboring_view_pair=None),
        camera_out_dim=C, map_size=(8, 200, 200),
        map_embedder_out_channels=(4, 8, 16, 16),
        bbox=BBoxEmbedderConfig(n_classes=10, class_token_dim=C,
                                proj_dims=(C, 16, 16, C)),
        drop_cond_ratio=0.0)
    vcfg = VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                     norm_num_groups=4)
    jcn, junet, jvae = BEVControlNet(cncfg), JaxUNet(ucfg), AutoencoderKL(vcfg)

    rs = np.random.RandomState(0)
    cam = rs.randn(B, N, 3, 7).astype(np.float32)
    text = rs.randn(B, 77, C).astype(np.float32) * 0.1
    neg = rs.randn(B, 77, C).astype(np.float32) * 0.1
    bev = (rs.rand(B, 200, 200, 8) > 0.5).astype(np.float32)
    bboxes = rs.randn(B, N, L, 8, 3).astype(np.float32)
    classes = rs.randint(0, 10, (B, N, L)).astype(np.int32)
    masks = (rs.rand(B, N, L) > 0.3).astype(np.float32)
    lat0 = rs.randn(B, 4, h, w).astype(np.float32)

    cn_vars = jcn.init(
        jax.random.PRNGKey(0), jnp.zeros((B, N, h, w, 4)),
        jnp.zeros((B,), jnp.int32), jnp.asarray(cam), jnp.asarray(text),
        jnp.asarray(bev), jnp.asarray(bboxes), jnp.asarray(classes),
        jnp.asarray(masks))
    unet_vars = junet.init(
        jax.random.PRNGKey(1), jnp.zeros((B * N, h, w, 4)),
        jnp.zeros((B * N,), jnp.int32), jnp.zeros((B * N, 1 + 77 + L, C)))
    vae_vars = jvae.init(jax.random.PRNGKey(2),
                         jnp.zeros((1, 8 * h, 8 * w, 3)))
    cn_conv, _ = convert_module(cn_vars, _sd(tcn))
    unet_conv, _ = convert_module(unet_vars, _sd(tunet))
    vae_conv, _ = convert_module(vae_vars, _sd(tvae))

    # ---- reference composed pipeline ----
    with torch.no_grad():
        t_imgs = tpipe(
            prompt=None, image=torch.from_numpy(bev.transpose(0, 3, 1, 2)),
            camera_param=torch.from_numpy(cam), height=8 * h, width=8 * w,
            num_inference_steps=steps, guidance_scale=2.0,
            latents=torch.from_numpy(lat0),
            prompt_embeds=torch.from_numpy(text),
            negative_prompt_embeds=torch.from_numpy(neg),
            output_type="numpy", controlnet_conditioning_scale=1.0,
            bev_controlnet_kwargs={"bboxes_3d_data": {
                "bboxes": torch.from_numpy(bboxes),
                "classes": torch.from_numpy(classes.astype(np.int64)),
                "masks": torch.from_numpy(masks)}},
        ).images

    # ---- ours, one jitted call ----
    modules = MagicDriveModules(
        unet=junet, controlnet=jcn, vae=jvae, clip=None,
        schedule=NoiseSchedule.create())
    pcfg = PipelineConfig(num_inference_steps=steps, guidance_scale=2.0,
                          conditioning_scale=1.0, sampler="unipc",
                          latent_height=h, latent_width=w, n_cam=N,
                          dtype=jnp.float32)
    params = {"unet": unet_conv, "controlnet": cn_conv, "vae": vae_conv}
    pipe = MagicDrivePipeline(modules, params, pcfg)
    batch = {
        "camera_param": jnp.asarray(cam),
        "bev_map": jnp.asarray(bev),
        "bboxes": jnp.asarray(bboxes),
        "classes": jnp.asarray(classes),
        "masks": jnp.asarray(masks),
        "prompt_embeds": jnp.asarray(text),
        "uncond_embeds": jnp.asarray(neg),
    }
    latents = jnp.broadcast_to(
        jnp.asarray(lat0.transpose(0, 2, 3, 1))[:, None],
        (B, N, h, w, 4))
    j_imgs = np.asarray(pipe(batch, latents=latents))

    assert t_imgs.shape == j_imgs.shape == (B, N, 8 * h, 8 * w, 3)
    np.testing.assert_allclose(j_imgs, t_imgs, atol=1e-2)
