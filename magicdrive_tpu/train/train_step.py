"""The jitted diffusion train step.

Re-design of ref:magicdrive/runner/multiview_runner.py:244-332
(_train_one_stop) as one pure function: VAE encode -> noise/timestep sampling
-> CLIP encode -> ControlNet (with PRNG-explicit condition dropout) ->
multiview UNet -> MSE on the prediction target -> grads on the trainable
partition only. The reference's autocast/fp16-casting gymnastics
(ref:multiview_runner.py:191-217) reduce to: fp32 params, bf16 module compute,
fp32 loss.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
from einops import rearrange, repeat

from magicdrive_tpu.diffusion import ddpm
from magicdrive_tpu.diffusion.schedules import NoiseSchedule
from magicdrive_tpu.models.vae import AutoencoderKL
from .state import TrainState, TrainConfig, merge_params


def make_drop_mask(key: jax.Array, batch: int, n_cam: int,
                   drop_cond_ratio: float, drop_cam_num: int) -> jnp.ndarray:
    """(B, N) mask, 1 -> substitute with uncond cam+text.

    Per sample: with prob drop_cond_ratio, drop `drop_cam_num` randomly-chosen
    cameras (ref:unet_addon_rawbox.py:354-376). PRNG-explicit and vectorized.
    """
    k1, k2 = jax.random.split(key)
    hit = jax.random.bernoulli(k1, drop_cond_ratio, (batch, 1))
    # random subset of size drop_cam_num per sample via top-k of random scores
    scores = jax.random.uniform(k2, (batch, n_cam))
    thresh = jnp.sort(scores, axis=1)[:, drop_cam_num - 1:drop_cam_num]
    chosen = scores <= thresh
    return (hit & chosen).astype(jnp.float32)


def make_train_step(modules, cfg: TrainConfig, schedule: NoiseSchedule = None):
    schedule = schedule or modules.schedule

    def loss_fn(trainable, frozen, batch: Dict[str, Any], rng: jax.Array):
        params = merge_params(trainable, frozen)
        B, N = batch["pixel_values"].shape[:2]
        k_noise, k_t, k_drop, k_vae = jax.random.split(rng, 4)

        # frozen text encoder
        text, _ = modules.clip.apply(params["clip"], batch["input_ids"])
        uncond_text, _ = modules.clip.apply(params["clip"],
                                            batch["uncond_ids"])

        # frozen VAE encode (sampled posterior, ref:base_runner.py:433-436)
        px = rearrange(batch["pixel_values"], "b n h w c -> (b n) h w c")
        moments_noise = jax.random.normal(
            k_vae, (*px.shape[:-3], *modules.vae.latent_hw(px.shape[-3:-1]), 4))
        latents = modules.vae.apply(params["vae"], px, moments_noise,
                                    method=AutoencoderKL.encode)
        latents = rearrange(latents, "(b n) h w c -> b n h w c", n=N)
        latents = jax.lax.stop_gradient(latents)

        # timesteps: one per sample, shared across views (train_with_same_t);
        # for video, one per clip shared across its frames
        if cfg.frames_per_clip:
            F = cfg.frames_per_clip
            t = ddpm.sample_timesteps(k_t, B // F,
                                      schedule.num_train_timesteps)
            t = repeat(t, "b -> (b f)", f=F)
            t_full = repeat(t, "b -> b n", n=N)
        elif cfg.train_with_same_t:
            t = ddpm.sample_timesteps(k_t, B, schedule.num_train_timesteps)
            t_full = repeat(t, "b -> b n", n=N)
        else:
            t_full = ddpm.sample_timesteps(
                k_t, B * N, schedule.num_train_timesteps).reshape(B, N)
            t = t_full

        noise_shape = latents.shape if not cfg.train_with_same_noise else (
            B, 1, *latents.shape[2:])
        noise = ddpm.noise_with_offset(k_noise, noise_shape, cfg.noise_offset)
        noise = jnp.broadcast_to(noise, latents.shape)
        noisy = ddpm.add_noise(schedule, latents, noise, t_full)

        drop_mask = None
        map_drop_mask = None
        if cfg.drop_cond_ratio > 0:
            k_drop, k_map = jax.random.split(k_drop)
            drop_mask = make_drop_mask(k_drop, B, N, cfg.drop_cond_ratio,
                                       cfg.drop_cam_num)
            if modules.controlnet.cfg.use_uncond_map:
                # per-sample map substitution (ref:unet_addon_rawbox.py:397-412)
                map_drop_mask = jax.random.bernoulli(
                    k_map, cfg.drop_cond_ratio, (B,)).astype(jnp.float32)

        down_res, mid_res, tokens = modules.controlnet.apply(
            params["controlnet"], noisy, t, batch["camera_param"], text,
            batch["bev_map"], batch["bboxes"], batch["classes"],
            batch["masks"], encoder_hidden_states_uncond=uncond_text,
            drop_mask=drop_mask, map_drop_mask=map_drop_mask)

        eps_pred = modules.unet.apply(
            params["unet"], rearrange(noisy, "b n h w c -> (b n) h w c"),
            rearrange(t_full, "b n -> (b n)"),
            rearrange(tokens, "b n l c -> (b n) l c"),
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res)
        eps_pred = rearrange(eps_pred, "(b n) h w c -> b n h w c", n=N)

        target = ddpm.prediction_target(schedule, latents, noise, t_full,
                                        cfg.prediction_type)
        loss = jnp.mean((eps_pred.astype(jnp.float32)
                         - target.astype(jnp.float32)) ** 2)
        return loss

    def train_step(state: TrainState, batch: Dict[str, Any], rng: jax.Array):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.trainable, state.frozen, batch, rng)
        state = state.apply_gradients(grads)
        return state, {"loss": loss}

    return train_step
