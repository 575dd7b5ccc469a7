"""Given-view generation: condition on provided camera views via latent
substitution inside the jitted denoising loop.

Re-design of ref:magicdrive/pipeline/pipeline_bev_controlnet_given_view.py
(StableDiffusionBEVControlNetGivenViewPipeline): the provided views' clean
VAE latents are re-noised to the current timestep and substituted into the
sample every step (ref::263-295); optionally the model's noise prediction on
provided views is overridden with the true noise so the sampler keeps them
fixed (ref::380-389). Both run inside the single lax.scan — masks are static
shapes, selection is jnp.where.

Drives the "generate the other 5 views given 1" demo
(ref:demo/run_cond_on_view.py).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
from einops import rearrange, repeat

from magicdrive_tpu.models.vae import AutoencoderKL
from magicdrive_tpu.pipeline.pipeline import MagicDrivePipeline, PipelineConfig


class GivenViewPipeline(MagicDrivePipeline):
    """MagicDrivePipeline + per-step latent substitution for given views."""

    def __init__(self, modules, params, cfg: PipelineConfig = PipelineConfig(),
                 sub_noise_pred: bool = False):
        super().__init__(modules, params, cfg)
        self.sub_noise_pred = sub_noise_pred
        self._generate_given = jax.jit(
            functools.partial(_generate_given_fn, self))

    def encode_views(self, images: jnp.ndarray,
                     key: Optional[jax.Array] = None) -> jnp.ndarray:
        """(B, N, H, W, 3) images in [-1, 1] -> clean latents (B, N, h, w, 4).

        Uses the posterior mode (deterministic) unless a key is given.
        """
        B, N = images.shape[:2]
        px = rearrange(images, "b n h w c -> (b n) h w c")
        if key is None:
            noise = jnp.zeros(
                (px.shape[0], *self.m.vae.latent_hw(px.shape[1:3]), 4))
        else:
            noise = jax.random.normal(
                key, (px.shape[0], *self.m.vae.latent_hw(px.shape[1:3]), 4))
        lat = self.m.vae.apply(self.params["vae"], px, noise,
                               method=AutoencoderKL.encode)
        return rearrange(lat, "(b n) h w c -> b n h w c", n=N)

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 given_latents: Optional[jnp.ndarray] = None,
                 view_mask: Optional[jnp.ndarray] = None,
                 key: Optional[jax.Array] = None,
                 latents: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """view_mask: (N,) 1 -> view is provided (kept), 0 -> generated."""
        if given_latents is None or view_mask is None:
            return super().__call__(batch, key=key, latents=latents)
        if latents is None:
            assert key is not None
            k1, k2 = jax.random.split(key)
            latents = self.prepare_latents(k1, batch["input_ids"].shape[0])
        else:
            k2 = key if key is not None else jax.random.PRNGKey(0)
        return self._generate_given(self.params, latents, batch,
                                    given_latents,
                                    jnp.asarray(view_mask, jnp.float32), k2)


def _generate_given_fn(pipe: GivenViewPipeline, params, latents, batch,
                       given_latents, view_mask, key):
    """One jitted loop with per-step re-noise + substitution."""
    m, cfg, coeffs = pipe.m, pipe.cfg, pipe.coeffs
    schedule = m.schedule
    alpha = jnp.asarray(schedule.alpha_t, jnp.float32)
    sigma = jnp.asarray(schedule.sigma_t, jnp.float32)
    mask = view_mask.reshape(1, -1, 1, 1, 1)

    # fixed per-view noise used for re-noising the given views each step
    sub_noise = jax.random.normal(key, given_latents.shape)
    timesteps = jnp.asarray(coeffs.timesteps)

    def substitute(x, t):
        noised = alpha[t] * given_latents + sigma[t] * sub_noise
        return mask * noised + (1 - mask) * x

    # build the same conditioning as the base loop by reusing _generate_fn's
    # machinery via closure: replicate its body but substitute before each
    # model call.
    B, N = latents.shape[:2]
    text, _ = m.clip.apply(params["clip"], batch["input_ids"])
    uncond_text, _ = m.clip.apply(params["clip"], batch["uncond_ids"])
    cn_vars = params["controlnet"]
    uncond_cam = cn_vars["params"]["uncond_cam"].reshape(
        pipe.m.controlnet.cfg.uncond_cam_in_dim)
    camera2 = jnp.concatenate([
        jnp.broadcast_to(uncond_cam[None, None], batch["camera_param"].shape),
        batch["camera_param"]])
    text2 = jnp.concatenate([
        jnp.broadcast_to(uncond_text, (B, *uncond_text.shape[1:])), text])
    bboxes2 = jnp.concatenate([jnp.zeros_like(batch["bboxes"]),
                               batch["bboxes"]])
    classes2 = jnp.concatenate([jnp.zeros_like(batch["classes"]),
                                batch["classes"]])
    masks2 = jnp.concatenate([jnp.zeros_like(batch["masks"]),
                              batch["masks"]])
    bev = batch["bev_map"]
    uncond_map = jnp.zeros_like(bev) if cfg.use_zero_map_as_unconditional \
        else bev
    map2 = jnp.concatenate([uncond_map, bev])

    from magicdrive_tpu.models.controlnet import BEVControlNet

    tokens2 = m.controlnet.apply(
        cn_vars, camera2, text2, bboxes2, classes2, masks2,
        method=BEVControlNet.assemble_tokens)
    cond_feat2 = m.controlnet.apply(cn_vars, map2,
                                    method=BEVControlNet.embed_map)
    state0 = coeffs.init_state(latents.shape, jnp.float32)

    def body(carry, i):
        x, state = carry
        t = timesteps[i]
        x = substitute(x, t)
        lat2 = jnp.concatenate([x, x]).astype(cfg.dtype)
        t2 = jnp.broadcast_to(t[None], (2 * B,))
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
        if pipe.sub_noise_pred:
            # keep given views exactly on their re-noising trajectory
            eps = mask * sub_noise + (1 - mask) * eps
        x, state = coeffs.step(i, x, eps, state)
        return (x, state), None

    (x, _), _ = jax.lax.scan(body, (latents, state0),
                             jnp.arange(coeffs.num_steps))
    # final substitution at t=0: the provided views decode exactly
    x = mask * given_latents + (1 - mask) * x

    imgs = m.vae.apply(params["vae"],
                       rearrange(x, "b n h w c -> (b n) h w c"),
                       method=AutoencoderKL.decode)
    imgs = rearrange(imgs, "(b n) h w c -> b n h w c", n=N)
    return jnp.clip(imgs.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)
