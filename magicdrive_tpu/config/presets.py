"""Model presets mirroring the reference's released configs.

ref:configs/model/SDv1.5mv_rawbox.yaml (the model config),
ref:configs/exp/{224x400,272x736}.yaml (training recipes).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from magicdrive_tpu.models.unet import UNetConfig, NUSCENES_NEIGHBORS
from magicdrive_tpu.models.controlnet import BEVControlNetConfig
from magicdrive_tpu.models.embedders import BBoxEmbedderConfig
from magicdrive_tpu.models.vae import VAEConfig
from magicdrive_tpu.models.clip_text import CLIPTextConfig
from magicdrive_tpu.pipeline.pipeline import PipelineConfig, MagicDriveModules


@dataclasses.dataclass(frozen=True)
class ModelPreset:
    name: str
    unet: UNetConfig
    controlnet: BEVControlNetConfig
    vae: VAEConfig
    clip: CLIPTextConfig
    pipeline: PipelineConfig
    image_size: Tuple[int, int]  # (H, W)
    map_hw: Tuple[int, int] = (200, 200)
    map_channels: int = 8
    bbox_max_len: int = 160  # static pad (ref train max 159)

    def modules(self, dtype=jnp.bfloat16) -> MagicDriveModules:
        return MagicDriveModules.create(self.unet, self.controlnet, self.vae,
                                        self.clip, dtype=dtype)


def sd15mv_rawbox_224x400() -> ModelPreset:
    """The flagship 224x400 model (ref:configs/exp/224x400.yaml)."""
    unet = UNetConfig(neighboring_view_pair=NUSCENES_NEIGHBORS)
    cn = BEVControlNetConfig(
        unet=dataclasses.replace(unet, neighboring_view_pair=None),
        map_size=(8, 200, 200),
        map_embedder_out_channels=(16, 32, 96, 256),
        bbox=BBoxEmbedderConfig(mode="all-xyz"),
    )
    return ModelPreset(
        name="SDv1.5mv-rawbox-224x400", unet=unet, controlnet=cn,
        vae=VAEConfig(), clip=CLIPTextConfig(),
        pipeline=PipelineConfig(latent_height=28, latent_width=50),
        image_size=(224, 400),
    )


def sd15mv_rawbox_272x736() -> ModelPreset:
    """Hi-res variant with the Plus map embedder (ref:configs/exp/272x736.yaml)."""
    unet = UNetConfig(neighboring_view_pair=NUSCENES_NEIGHBORS)
    cn = BEVControlNetConfig(
        unet=dataclasses.replace(unet, neighboring_view_pair=None),
        map_size=(8, 200, 200),
        use_map_embedder_plus=True,
        map_embedder_plus_size=(34, 92),
        bbox=BBoxEmbedderConfig(mode="all-xyz"),
    )
    return ModelPreset(
        name="SDv1.5mv-rawbox-272x736", unet=unet, controlnet=cn,
        vae=VAEConfig(), clip=CLIPTextConfig(),
        pipeline=PipelineConfig(latent_height=34, latent_width=92),
        image_size=(272, 736),
    )


def sd15mv_rawbox_424x800() -> ModelPreset:
    """The released visualization-quality model: 424x800 with a 0.25 m/px
    400x400 BEV map (ref:configs/exp/424x800abox0.1_nockpt.yaml,
    ref:README.MD:33-34). Latent 53x100 -> level-0 L=5300, the shape the
    kv-stationary fused kernel was sized for (kernels/fused_attention.py)."""
    unet = UNetConfig(neighboring_view_pair=NUSCENES_NEIGHBORS)
    cn = BEVControlNetConfig(
        unet=dataclasses.replace(unet, neighboring_view_pair=None),
        map_size=(8, 400, 400),
        map_embedder_out_channels=(16, 32, 96, 256),
        bbox=BBoxEmbedderConfig(mode="all-xyz"),
    )
    return ModelPreset(
        name="SDv1.5mv-rawbox-424x800", unet=unet, controlnet=cn,
        vae=VAEConfig(), clip=CLIPTextConfig(),
        pipeline=PipelineConfig(latent_height=53, latent_width=100),
        image_size=(424, 800), map_hw=(400, 400),
    )


def tiny_debug(n_cam: int = 6) -> ModelPreset:
    """CPU-runnable tiny model for tests/demos (BASELINE.json config 1)."""
    neighbors = NUSCENES_NEIGHBORS[:n_cam] if n_cam == 6 else tuple(
        ((i - 1) % n_cam, (i + 1) % n_cam) for i in range(n_cam))
    unet = UNetConfig(
        block_out_channels=(8, 16, 16, 16), num_attention_heads=2,
        cross_attention_dim=16, norm_num_groups=4,
        neighboring_view_pair=neighbors)
    cn = BEVControlNetConfig(
        unet=dataclasses.replace(unet, neighboring_view_pair=None),
        camera_out_dim=16, map_size=(8, 200, 200),
        map_embedder_out_channels=(4, 4, 8, 8),
        bbox=BBoxEmbedderConfig(class_token_dim=16, proj_dims=(16, 8, 8, 16)),
    )
    return ModelPreset(
        name="tiny-debug", unet=unet, controlnet=cn,
        vae=VAEConfig(block_out_channels=(4, 4, 8, 8), layers_per_block=1,
                      norm_num_groups=2),
        clip=CLIPTextConfig(vocab_size=49408, hidden_size=16, num_layers=2,
                            num_heads=2, intermediate_size=32),
        pipeline=PipelineConfig(latent_height=28, latent_width=50,
                                num_inference_steps=4, n_cam=n_cam,
                                dtype=jnp.float32),
        image_size=(224, 400), bbox_max_len=8,
    )


def micro_debug(n_cam: int = 6) -> ModelPreset:
    """Minimal-shape preset for multi-chip dry-runs and sharding smokes.

    Full train-step semantics (VAE encode, CLIP, ControlNet with CFG
    dropout, multiview UNet, optimizer partition) but every spatial dim is
    minimal, so an unoptimized virtual-CPU-mesh compile plus one step
    finishes in seconds rather than minutes (tiny_debug keeps real 224x400
    shapes and takes ~3 min of CPU compile+exec per jit).
    """
    neighbors = NUSCENES_NEIGHBORS[:n_cam] if n_cam == 6 else tuple(
        ((i - 1) % n_cam, (i + 1) % n_cam) for i in range(n_cam))
    unet = UNetConfig(
        block_out_channels=(8, 16), layers_per_block=1,
        num_attention_heads=2, cross_attention_dim=16, norm_num_groups=4,
        down_block_has_attn=(True, True), neighboring_view_pair=neighbors)
    cn = BEVControlNetConfig(
        unet=dataclasses.replace(unet, neighboring_view_pair=None),
        camera_out_dim=16, map_size=(8, 32, 32),
        map_embedder_out_channels=(4, 4, 8, 8),
        use_map_embedder_plus=True, map_embedder_plus_size=(4, 8),
        bbox=BBoxEmbedderConfig(class_token_dim=16, proj_dims=(16, 8, 8, 16)),
    )
    return ModelPreset(
        name="micro-debug", unet=unet, controlnet=cn,
        vae=VAEConfig(block_out_channels=(4, 4, 8, 8), layers_per_block=1,
                      norm_num_groups=2),
        clip=CLIPTextConfig(vocab_size=49408, hidden_size=16, num_layers=2,
                            num_heads=2, intermediate_size=32),
        pipeline=PipelineConfig(latent_height=4, latent_width=8,
                                num_inference_steps=2, n_cam=n_cam,
                                dtype=jnp.float32),
        image_size=(32, 64), map_hw=(32, 32), bbox_max_len=8,
    )


def micro_video_debug(n_frames: int = 4, n_cam: int = 6) -> ModelPreset:
    """Minimal-shape VIDEO preset for frame-axis sharding dry-runs."""
    base = micro_debug(n_cam=n_cam)
    unet = dataclasses.replace(base.unet, temporal_frames=n_frames)
    return dataclasses.replace(base, name="micro-video-debug", unet=unet)


def small_parity(n_cam: int = 6) -> ModelPreset:
    """Structurally FULL-DEPTH architecture (4 UNet blocks, 4 VAE blocks,
    real CLIP layout) at narrow widths — every checkpoint key PATTERN of the
    released models at ~1/100 the size. Used by the converter CLI self-test
    (``tools/convert_weights.py --arch small-test`` +
    tests/test_convert_cli.py) so the synthetic released-checkpoint trees
    convert in seconds. Key names don't depend on widths, so strict
    conversion success here validates day-1 handling of the real layouts
    (ref:magicdrive/runner/multiview_runner.py:233-242 save_pretrained dirs,
    HF SD-1.5 unet/vae/text_encoder dirs)."""
    unet = UNetConfig(
        block_out_channels=(32, 32, 64, 64), layers_per_block=2,
        num_attention_heads=4, cross_attention_dim=32, norm_num_groups=8,
        neighboring_view_pair=NUSCENES_NEIGHBORS)
    cn = BEVControlNetConfig(
        unet=dataclasses.replace(unet, neighboring_view_pair=None),
        camera_out_dim=32, map_size=(8, 200, 200),
        map_embedder_out_channels=(4, 8, 16, 16),
        bbox=BBoxEmbedderConfig(n_classes=10, class_token_dim=32,
                                proj_dims=(32, 16, 16, 32)),
    )
    return ModelPreset(
        name="small-parity", unet=unet, controlnet=cn,
        vae=VAEConfig(block_out_channels=(8, 8, 16, 16), layers_per_block=1,
                      norm_num_groups=8),
        clip=CLIPTextConfig(vocab_size=49408, hidden_size=32, num_layers=2,
                            num_heads=4, intermediate_size=64),
        # 224x400 -> 28x50 latent: the standard map embedder's conv-stack
        # geometry maps the 200x200 BEV to exactly this latent size
        pipeline=PipelineConfig(latent_height=28, latent_width=50,
                                num_inference_steps=2, n_cam=n_cam,
                                dtype=jnp.float32),
        image_size=(224, 400), bbox_max_len=8,
    )


def preset_from_config(cfg) -> ModelPreset:
    """Build a ModelPreset from a composed YAML config tree
    (magicdrive_tpu.config.loader.compose over repo ``configs/``)."""
    mc, dc, rc = cfg["model"], cfg["dataset"], cfg["runner"]
    H, W = dc["image_size"]
    neighbors = tuple(tuple(p) for p in dc["neighboring_view_pair"])
    u = mc["unet"]
    unet = UNetConfig(
        block_out_channels=tuple(u["block_out_channels"]),
        layers_per_block=u["layers_per_block"],
        num_attention_heads=u["num_attention_heads"],
        cross_attention_dim=u["cross_attention_dim"],
        norm_num_groups=u["norm_num_groups"],
        neighboring_view_pair=neighbors,
        neighboring_attn_type=u["neighboring_attn_type"],
        neighbor_batched=bool(u.get("neighbor_batched", False)),
        zero_module_type=u["zero_module_type"],
        gradient_checkpointing=bool(u.get("gradient_checkpointing", False)),
        # "dots" (keep matmul outputs within rematted blocks) measured
        # fastest on chip: 1.86 vs 1.64 steps/s full-remat at bs=3
        # (PERFORMANCE.md round 3b training)
        remat_policy=u.get("remat_policy", "dots") or None)
    cn_c = mc["controlnet"]
    be = mc["bbox_embedder_param"]
    cn = BEVControlNetConfig(
        unet=dataclasses.replace(unet, neighboring_view_pair=None),
        camera_in_dim=cn_c["camera_in_dim"],
        camera_out_dim=cn_c["camera_out_dim"],
        cam_num_freqs=cn_c["cam_num_freqs"],
        map_size=tuple(cn_c["map_size"]),
        map_embedder_out_channels=tuple(cn_c["map_embedder_out_channels"]),
        use_map_embedder_plus=bool(cn_c["use_map_embedder_plus"]),
        map_embedder_plus_size=tuple(cn_c["map_embedder_plus_size"])
        if cn_c.get("map_embedder_plus_size") else (34, 92),
        bbox=BBoxEmbedderConfig(
            n_classes=be["n_classes"],
            class_token_dim=be["class_token_dim"],
            trainable_class_token=be["trainable_class_token"],
            embedder_num_freq=be["embedder_num_freq"],
            proj_dims=tuple(be["proj_dims"]),
            mode=mc["bbox_mode"],
            minmax_normalize=be["minmax_normalize"]),
        drop_cond_ratio=cn_c["drop_cond_ratio"],
        drop_cam_num=cn_c["drop_cam_num"],
        drop_cam_with_box=cn_c["drop_cam_with_box"],
        use_uncond_map=cn_c.get("use_uncond_map"))
    pp = rc["pipeline_param"]
    pipeline = PipelineConfig(
        num_inference_steps=pp["num_inference_steps"],
        guidance_scale=pp["guidance_scale"],
        conditioning_scale=pp["controlnet_conditioning_scale"],
        sampler=pp["sampler"],
        use_zero_map_as_unconditional=pp["use_zero_map_as_unconditional"],
        guess_mode=bool(pp.get("guess_mode", False)),
        latent_height=H // 8, latent_width=W // 8,
        n_cam=len(neighbors))
    map_c, map_h, map_w = cn_c["map_size"]
    vae_cfg = VAEConfig(**{k: tuple(v) if isinstance(v, list) else v
                           for k, v in mc["vae"].items()}) \
        if mc.get("vae") else VAEConfig()
    clip_cfg = CLIPTextConfig(**mc["clip"]) if mc.get("clip") \
        else CLIPTextConfig()
    return ModelPreset(
        name=f"{mc['name']}-{H}x{W}", unet=unet, controlnet=cn,
        vae=vae_cfg, clip=clip_cfg, pipeline=pipeline,
        image_size=(H, W), map_hw=(map_h, map_w), map_channels=map_c,
        bbox_max_len=rc["bbox_max_length"])


def sd15mv_rawbox_video_16f() -> ModelPreset:
    """16-frame multi-view video model: the 224x400 image model with
    temporal attention in every transformer block (BASELINE.json config 5;
    SURVEY.md §2.5 — the MagicDrive-t capability target)."""
    base = sd15mv_rawbox_224x400()
    unet = dataclasses.replace(base.unet, temporal_frames=16)
    return dataclasses.replace(base, name="SDv1.5mv-rawbox-video16",
                               unet=unet)


def tiny_video_debug(n_frames: int = 4, n_cam: int = 6) -> ModelPreset:
    """CPU-runnable tiny video model."""
    base = tiny_debug(n_cam=n_cam)
    unet = dataclasses.replace(base.unet, temporal_frames=n_frames)
    return dataclasses.replace(base, name="tiny-video-debug", unet=unet)


def init_params(preset: ModelPreset, modules: MagicDriveModules,
                key: jax.Array, batch_size: int = 1) -> Dict[str, Any]:
    """Random-initialize all variable collections with consistent shapes."""
    p = preset.pipeline
    B, N, L = batch_size, p.n_cam, preset.bbox_max_len
    h, w = p.latent_height, p.latent_width
    mh, mw = preset.map_hw
    keys = jax.random.split(key, 4)
    F = preset.unet.temporal_frames or 1
    unet_vars = modules.unet.init(
        keys[0], jnp.zeros((B * F * N, h, w, 4)),
        jnp.zeros((B * F * N,), jnp.int32),
        jnp.zeros((B * F * N, 1 + 77 + L, preset.unet.cross_attention_dim)))
    cn_vars = modules.controlnet.init(
        keys[1], jnp.zeros((B, N, h, w, 4)), jnp.zeros((B,), jnp.int32),
        jnp.zeros((B, N, 3, 7)),
        jnp.zeros((B, 77, preset.unet.cross_attention_dim)),
        jnp.zeros((B, mh, mw, preset.map_channels)),
        jnp.zeros((B, N, L, preset.controlnet.bbox.n_points, 3)),
        jnp.zeros((B, N, L), jnp.int32), jnp.zeros((B, N, L)))
    vae_vars = modules.vae.init(keys[2],
                                jnp.zeros((1, *preset.image_size, 3)))
    clip_vars = modules.clip.init(keys[3], jnp.zeros((1, 77), jnp.int32))
    return {"unet": unet_vars, "controlnet": cn_vars, "vae": vae_vars,
            "clip": clip_vars}
