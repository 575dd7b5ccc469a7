"""Multi-view VIDEO generation (the MagicDrive-t capability target).

The reference's video model lives in a separate branch not present in the
snapshot (SURVEY.md §2.5); per the survey, it extends every transformer
block with temporal attention over the frame axis using the same zero-init
gated-connector injection as the cross-view block. Here that is
``UNetConfig.temporal_frames`` (core/transformer.py:_temporal), and the video
pipeline reuses the whole image pipeline by folding the frame axis into the
batch: conditioning (camera/boxes/map/text) is per-frame, the UNet batch is
(B*F*N) with views innermost, and temporal attention regroups frames inside
each block. The full F-frame, 6-view, CFG denoise + VAE decode remains ONE
jitted lax.scan (BASELINE.json config 5).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from einops import rearrange

from .pipeline import MagicDrivePipeline, PipelineConfig


class VideoPipeline:
    """F-frame wrapper over MagicDrivePipeline.

    Batch contract: every per-frame tensor gains a leading frame axis
    folded as (B*F): input_ids (B*F, 77), camera_param (B*F, N, 3, 7),
    bev_map (B*F, H, W, C), bboxes (B*F, N, L, P, 3), etc. The UNet must be
    built with ``temporal_frames=F``.
    """

    def __init__(self, modules, params, cfg: PipelineConfig,
                 n_frames: int):
        assert modules.unet.cfg.temporal_frames == n_frames, (
            modules.unet.cfg.temporal_frames, n_frames)
        self.n_frames = n_frames
        self._pipe = MagicDrivePipeline(modules, params, cfg)

    def prepare_latents(self, key: jax.Array, batch_size: int) -> jnp.ndarray:
        """Per-frame independent noise, shared across the 6 views of each
        frame (the image model's view-sharing rule applied per frame)."""
        cfg = self._pipe.cfg
        lat = jax.random.normal(
            key, (batch_size * self.n_frames, 1, cfg.latent_height,
                  cfg.latent_width, 4), jnp.float32)
        return jnp.broadcast_to(
            lat, (batch_size * self.n_frames, cfg.n_cam, cfg.latent_height,
                  cfg.latent_width, 4))

    def __call__(self, batch: Dict[str, jnp.ndarray],
                 key: Optional[jax.Array] = None,
                 latents: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Returns (B*F, N, H, W, 3) in [0, 1]; reshape with
        ``rearrange(out, '(b f) n ... -> b f n ...', f=n_frames)``."""
        if latents is None:
            # per-frame noise shared across views == the image pipeline's
            # in-jit draw at batch (B*F); avoids eager per-call dispatches
            return self._pipe(batch, key=key)
        return self._pipe(batch, latents=latents)

    @staticmethod
    def fold_frames(batch: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
        """(B, F, ...) per-frame batch -> (B*F, ...), leaving uncond_ids."""
        out = {}
        for k, v in batch.items():
            if k == "uncond_ids":
                out[k] = v
            else:
                out[k] = rearrange(v, "b f ... -> (b f) ...")
        return out
