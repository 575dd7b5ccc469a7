"""Generation pipeline: one jitted CFG denoise loop + VAE decode.

TPU-native re-design of
ref:magicdrive/pipeline/pipeline_bev_controlnet.py (StableDiffusionBEVControlNetPipeline):
the whole 20-step loop (ControlNet -> multiview UNet -> CFG combine -> UniPC
step) runs as a single ``lax.scan`` inside one jit, followed by the fused VAE
decode — no host round-trips between steps (BASELINE.json north star).

Reference semantics preserved:
  * CFG batch layout: uncond first, cond second (ref:pipeline_bev_controlnet.py:297-343).
  * One shared initial latent replicated across the 6 views (ref::326).
  * Uncond branch: learned uncond camera token, uncond ("") text, all-null
    boxes, same (or zeroed) map (ref:unet_addon_rawbox.py:625-702).
  * Loop-invariant conditioning (tokens, map features) computed ONCE outside
    the scan — the reference recomputes them every step on GPU.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from einops import rearrange, repeat

from magicdrive_tpu.models.unet import UNet2DConditionModel, UNetConfig
from magicdrive_tpu.models.controlnet import BEVControlNet, BEVControlNetConfig
from magicdrive_tpu.models.vae import AutoencoderKL, VAEConfig
from magicdrive_tpu.models.clip_text import CLIPTextModel, CLIPTextConfig
from magicdrive_tpu.diffusion.schedules import NoiseSchedule
from magicdrive_tpu.diffusion.samplers import make_sampler_coeffs


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    num_inference_steps: int = 20
    guidance_scale: float = 2.0
    conditioning_scale: float = 1.0
    sampler: str = "unipc"  # unipc | ddim
    use_zero_map_as_unconditional: bool = False
    # ControlNet guess mode (ref:pipeline_bev_controlnet.py:361-405): the
    # ControlNet runs only on the conditional CFG branch with logspace
    # residual scaling; the unconditional branch gets zero residuals and
    # the uncond token sequence.
    guess_mode: bool = False
    latent_height: int = 28
    latent_width: int = 50
    n_cam: int = 6
    dtype: Any = jnp.bfloat16


@dataclasses.dataclass
class MagicDriveModules:
    """Module definitions + noise schedule for one model family."""

    unet: UNet2DConditionModel
    controlnet: BEVControlNet
    vae: AutoencoderKL
    clip: CLIPTextModel
    schedule: NoiseSchedule

    @classmethod
    def create(cls, unet_cfg: UNetConfig, cn_cfg: BEVControlNetConfig,
               vae_cfg: VAEConfig = VAEConfig(),
               clip_cfg: CLIPTextConfig = CLIPTextConfig(),
               dtype=jnp.bfloat16) -> "MagicDriveModules":
        return cls(
            unet=UNet2DConditionModel(unet_cfg, dtype=dtype),
            controlnet=BEVControlNet(cn_cfg, dtype=dtype),
            vae=AutoencoderKL(vae_cfg, dtype=dtype),
            clip=CLIPTextModel(clip_cfg, dtype=dtype),
            schedule=NoiseSchedule.create(),
        )


class MagicDrivePipeline:
    """Callable generation pipeline.

    ``params`` is a dict with keys {"unet", "controlnet", "vae", "clip"}
    holding each module's variable collections.
    """

    def __init__(self, modules: MagicDriveModules, params: Dict[str, Any],
                 cfg: PipelineConfig = PipelineConfig()):
        self.m = modules
        self.params = params
        self.cfg = cfg
        self.coeffs = make_sampler_coeffs(
            modules.schedule, cfg.num_inference_steps, cfg.sampler)
        self._generate = jax.jit(functools.partial(_generate_fn, self))

    def prepare_latents(self, key: jax.Array, batch_size: int,
                        fix_seed_within_batch: bool = False) -> jnp.ndarray:
        """One shared initial latent per sample, replicated over views
        (ref:pipeline_bev_controlnet.py:326).

        ``fix_seed_within_batch``: every sample in the batch starts from the
        SAME noise (the reference's per-sample re-seeded generator list,
        ref:misc/test_utils.py:224-238 + configs/config.yaml
        fix_seed_within_batch).
        """
        cfg = self.cfg
        lat = jax.random.normal(
            key, (1 if fix_seed_within_batch else batch_size, 1,
                  cfg.latent_height, cfg.latent_width, 4), jnp.float32)
        return jnp.broadcast_to(
            lat, (batch_size, cfg.n_cam, cfg.latent_height, cfg.latent_width, 4))

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 key: Optional[jax.Array] = None,
                 latents: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Generate images.

        batch keys: input_ids (B, 77), uncond_ids (1, 77),
        camera_param (B, N, 3, 7), bev_map (B, H, W, C),
        bboxes (B, N, L, P, 3), classes (B, N, L), masks (B, N, L).
        Returns images (B, N, H, W, 3) in [0, 1] float32.

        When ``latents`` is not given, the initial noise is drawn from
        ``key`` INSIDE the jitted program — eager `prepare_latents` costs
        per-call device dispatches (expensive through a device tunnel).
        """
        if latents is None:
            assert key is not None, "pass either latents or a PRNG key"
        return self._generate(self.params, latents, batch, key)


def _generate_fn(pipe: MagicDrivePipeline, params, latents, batch, key=None):
    m, cfg, coeffs = pipe.m, pipe.cfg, pipe.coeffs
    if latents is None:
        B = batch["camera_param"].shape[0]
        c = pipe.cfg
        lat = jax.random.normal(
            key, (B, 1, c.latent_height, c.latent_width, 4), jnp.float32)
        latents = jnp.broadcast_to(
            lat, (B, c.n_cam, c.latent_height, c.latent_width, 4))
    B, N = latents.shape[:2]

    # ---- frozen text encoder (cond + uncond) ----
    # pre-encoded text may be passed instead of token ids (the reference's
    # prompt_embeds / negative_prompt_embeds path,
    # ref:pipeline_bev_controlnet.py:129-131)
    if "prompt_embeds" in batch:
        text = batch["prompt_embeds"]
        uncond_text = batch["uncond_embeds"]
    else:
        text, _ = m.clip.apply(params["clip"], batch["input_ids"])
        uncond_text, _ = m.clip.apply(params["clip"], batch["uncond_ids"])

    # ---- CFG-duplicated conditioning, uncond first ----
    cn_vars = params["controlnet"]
    bev = batch["bev_map"]
    # Uncond-branch map: the learned/stored uncond_map takes precedence over
    # the zero-map option (ref:pipeline_bev_controlnet.py:296-300 + 330-343:
    # add_uncond_to_kwargs overwrites the possibly-zeroed uncond half).
    if m.controlnet.cfg.use_uncond_map:
        uncond_map = m.controlnet.apply(
            cn_vars, bev, method=BEVControlNet.substitute_with_uncond_map)
    elif cfg.use_zero_map_as_unconditional:
        uncond_map = jnp.zeros_like(bev)
    else:
        uncond_map = bev

    # ---- loop-invariant conditioning, computed once ----
    tokens_c = m.controlnet.apply(
        cn_vars, batch["camera_param"], text, batch["bboxes"],
        batch["classes"], batch["masks"],
        method=BEVControlNet.assemble_tokens)
    if cfg.guess_mode:
        # ControlNet sees only the conditional branch; the uncond branch
        # gets the uncond token sequence and zero residuals
        # (ref:pipeline_bev_controlnet.py:361-405, add_uncond_to_emb).
        uncond_tok = m.controlnet.apply(
            cn_vars, uncond_text, batch["bboxes"].shape[2],
            method=BEVControlNet.uncond_tokens)
        tokens2 = jnp.concatenate([
            jnp.broadcast_to(uncond_tok[None, None], tokens_c.shape),
            tokens_c])
        cond_feat = m.controlnet.apply(cn_vars, bev,
                                       method=BEVControlNet.embed_map)
    else:
        uncond_cam = cn_vars["params"]["uncond_cam"].reshape(
            pipe.m.controlnet.cfg.uncond_cam_in_dim)
        camera2 = jnp.concatenate([
            jnp.broadcast_to(uncond_cam[None, None],
                             batch["camera_param"].shape),
            batch["camera_param"],
        ])
        text2 = jnp.concatenate([
            jnp.broadcast_to(uncond_text, (B, *uncond_text.shape[1:])), text])
        bboxes2 = jnp.concatenate([jnp.zeros_like(batch["bboxes"]),
                                   batch["bboxes"]])
        classes2 = jnp.concatenate([jnp.zeros_like(batch["classes"]),
                                    batch["classes"]])
        masks2 = jnp.concatenate([jnp.zeros_like(batch["masks"]),
                                  batch["masks"]])
        map2 = jnp.concatenate([uncond_map, bev])
        tokens_u = m.controlnet.apply(
            cn_vars, camera2[:B], text2[:B], bboxes2[:B], classes2[:B],
            masks2[:B], method=BEVControlNet.assemble_tokens)
        tokens2 = jnp.concatenate([tokens_u, tokens_c])
        cond_feat2 = m.controlnet.apply(cn_vars, map2,
                                        method=BEVControlNet.embed_map)

    timesteps = jnp.asarray(coeffs.timesteps)
    state0 = coeffs.init_state(latents.shape, jnp.float32)

    def body(carry, i):
        x, state = carry
        t = timesteps[i]
        lat2 = jnp.concatenate([x, x]).astype(cfg.dtype)
        t2 = jnp.broadcast_to(t[None], (2 * B,))
        if cfg.guess_mode:
            down_res, mid_res, _ = m.controlnet.apply(
                cn_vars, x.astype(cfg.dtype),
                jnp.broadcast_to(t[None], (B,)), batch["camera_param"],
                text, bev, batch["bboxes"], batch["classes"], batch["masks"],
                conditioning_scale=cfg.conditioning_scale, guess_mode=True,
                tokens=tokens_c, cond_feat=cond_feat)
            down_res = tuple(jnp.concatenate([jnp.zeros_like(d), d])
                             for d in down_res)
            mid_res = jnp.concatenate([jnp.zeros_like(mid_res), mid_res])
        else:
            down_res, mid_res, _ = m.controlnet.apply(
                cn_vars, lat2, t2, camera2, text2, map2, bboxes2, classes2,
                masks2, conditioning_scale=cfg.conditioning_scale,
                tokens=tokens2, cond_feat=cond_feat2)
        eps = m.unet.apply(
            params["unet"], rearrange(lat2, "b n h w c -> (b n) h w c"),
            repeat(t2, "b -> (b n)", n=N),
            rearrange(tokens2, "b n l c -> (b n) l c"),
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res)
        eps = rearrange(eps, "(b n) h w c -> b n h w c", n=N)
        eps_u, eps_c = jnp.split(eps, 2)
        eps = eps_u + cfg.guidance_scale * (eps_c - eps_u)
        x, state = coeffs.step(i, x, eps, state)
        return (x, state), None

    (x, _), _ = jax.lax.scan(body, (latents, state0),
                             jnp.arange(coeffs.num_steps))

    # ---- fused VAE decode, 5-D in/out (ref:pipeline_bev_controlnet.py:100-112)
    imgs = m.vae.apply(params["vae"],
                       rearrange(x, "b n h w c -> (b n) h w c"),
                       method=AutoencoderKL.decode)
    imgs = rearrange(imgs, "(b n) h w c -> b n h w c", n=N)
    return jnp.clip(imgs.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
