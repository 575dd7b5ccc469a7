"""BEV ControlNet: conditioning branch producing additive UNet residuals.

TPU-native re-design of ref:magicdrive/networks/unet_addon_rawbox.py
(BEVControlNetModel). Differences from the reference by design:

* Pure function of inputs — training-time condition dropout takes an explicit
  ``drop_mask`` computed outside with a PRNG key (the reference uses global
  ``random.random()``, ref:unet_addon_rawbox.py:354-376).
* Static shapes: bbox tensors are always (B, N_cam, max_len, P, 3) with a
  boolean mask; the CFG "uncond" branch is all-zeros boxes with mask=0,
  matching ref:unet_addon_rawbox.py:654-660.
* NHWC layout; the (B, N) -> (B*N) flattening happens once at the top
  (ref:unet_addon_rawbox.py:836-843).

Token sequence per view: [cam(1) | text(77) | bbox(max_len)] at dim 768
(ref:unet_addon_rawbox.py:317-336, 791-793).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange, repeat

from magicdrive_tpu.core.embeddings import get_timestep_embedding
from magicdrive_tpu.core.resnet import conv
from magicdrive_tpu.models.unet import (
    UNetConfig, CrossAttnDownBlock, UNetMidBlock, TimestepEmbedding,
)
from magicdrive_tpu.models.embedders import (
    BBoxEmbedderConfig, ContinuousBBoxWithTextEmbedding, BEVMapEmbedder,
    BEVMapEmbedderPlus, embed_camera,
)


@dataclasses.dataclass(frozen=True)
class BEVControlNetConfig:
    unet: UNetConfig = dataclasses.field(
        default_factory=lambda: UNetConfig(neighboring_view_pair=None))
    camera_in_dim: int = 189
    camera_out_dim: int = 768
    cam_num_freqs: int = 4
    uncond_cam_in_dim: Tuple[int, int] = (3, 7)
    map_size: Tuple[int, int, int] = (8, 200, 200)  # (C, H, W) as in reference
    map_embedder_out_channels: Tuple[int, ...] = (16, 32, 96, 256)
    use_map_embedder_plus: bool = False
    map_embedder_plus_size: Tuple[int, int] = (34, 92)
    bbox: BBoxEmbedderConfig = dataclasses.field(default_factory=BBoxEmbedderConfig)
    drop_cond_ratio: float = 0.25
    drop_cam_num: int = 6
    drop_cam_with_box: bool = False
    # training-time unconditional-map substitution
    # (ref:unet_addon_rawbox.py:188-202): None | negative1 | random | learnable
    use_uncond_map: Optional[str] = None


class BEVControlNet(nn.Module):
    cfg: BEVControlNetConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.cfg
        ucfg = dataclasses.replace(cfg.unet, neighboring_view_pair=None)
        self._ucfg = ucfg
        self.cam2token = nn.Dense(cfg.camera_out_dim, dtype=self.dtype,
                                  param_dtype=jnp.float32)
        # one learned "unconditional camera" parameter row
        # (ref:unet_addon_rawbox.py:108-112) — an Embedding(1, 21).
        self.uncond_cam = self.param(
            "uncond_cam", nn.initializers.normal(1.0),
            (cfg.uncond_cam_in_dim[0] * cfg.uncond_cam_in_dim[1],), jnp.float32)
        self.bbox_embedder = ContinuousBBoxWithTextEmbedding(
            cfg.bbox, dtype=self.dtype)
        if cfg.use_map_embedder_plus:
            self.controlnet_cond_embedding = BEVMapEmbedderPlus(
                conditioning_embedding_size=cfg.map_embedder_plus_size,
                block_out_channels=cfg.map_embedder_out_channels,
                out_channels=ucfg.block_out_channels[0], dtype=self.dtype)
        else:
            self.controlnet_cond_embedding = BEVMapEmbedder(
                block_out_channels=cfg.map_embedder_out_channels,
                out_channels=ucfg.block_out_channels[0], dtype=self.dtype)
        self.time_embedding = TimestepEmbedding(
            ucfg.block_out_channels[0] * 4, dtype=self.dtype)
        self.conv_in = conv(ucfg.block_out_channels[0], dtype=self.dtype)
        down_cls, mid_cls = CrossAttnDownBlock, UNetMidBlock
        if ucfg.gradient_checkpointing:
            down_cls, mid_cls = nn.remat(CrossAttnDownBlock), \
                nn.remat(UNetMidBlock)
        self.down_blocks = [
            down_cls(
                ucfg, out_ch, has_attn=ucfg.down_block_has_attn[i],
                add_downsample=i != len(ucfg.block_out_channels) - 1,
                dtype=self.dtype, name=f"down_blocks_{i}")
            for i, out_ch in enumerate(ucfg.block_out_channels)
        ]
        self.mid_block = mid_cls(ucfg, dtype=self.dtype)
        # zero-init 1x1 output convs, one per residual + one for mid
        # (ref:unet_addon_rawbox.py:219-272)
        n_res = 1 + len(ucfg.block_out_channels) * ucfg.layers_per_block + (
            len(ucfg.block_out_channels) - 1)
        res_channels = [ucfg.block_out_channels[0]]
        for i, ch in enumerate(ucfg.block_out_channels):
            res_channels += [ch] * ucfg.layers_per_block
            if i != len(ucfg.block_out_channels) - 1:
                res_channels += [ch]
        assert len(res_channels) == n_res
        self.controlnet_down_blocks = [
            nn.Conv(ch, kernel_size=(1, 1), dtype=self.dtype,
                    param_dtype=jnp.float32,
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    name=f"controlnet_down_blocks_{i}")
            for i, ch in enumerate(res_channels)
        ]
        self.controlnet_mid_block = nn.Conv(
            ucfg.block_out_channels[-1], kernel_size=(1, 1), dtype=self.dtype,
            param_dtype=jnp.float32, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros)
        # unconditional map (ref:unet_addon_rawbox.py:188-202); NHWC
        map_shape = (cfg.map_size[1], cfg.map_size[2], cfg.map_size[0])
        if cfg.use_uncond_map == "negative1":
            self.uncond_map = self.variable(
                "buffers", "uncond_map",
                lambda: -jnp.ones(map_shape, jnp.float32))
        elif cfg.use_uncond_map == "random":
            self.uncond_map = self.variable(
                "buffers", "uncond_map",
                lambda: jax.random.normal(jax.random.PRNGKey(20230325),
                                          map_shape))
        elif cfg.use_uncond_map == "learnable":
            self.uncond_map = self.param(
                "uncond_map", nn.initializers.normal(1.0), map_shape,
                jnp.float32)
        elif cfg.use_uncond_map is not None:
            raise ValueError(cfg.use_uncond_map)

    # ---------- token assembly ----------

    def uncond_cam_token(self) -> jnp.ndarray:
        """Token for the learned unconditional camera. (768,)"""
        cfg = self.cfg
        param = self.uncond_cam.reshape(cfg.uncond_cam_in_dim)
        return self.cam2token(embed_camera(param[None], cfg.cam_num_freqs)[0]
                              .astype(self.dtype))

    def assemble_tokens(
        self,
        camera_param: jnp.ndarray,            # (B, N, 3, 7)
        encoder_hidden_states: jnp.ndarray,   # (B, 77, 768)
        bboxes: jnp.ndarray,                  # (B, N or 1, max_len, P, 3)
        classes: jnp.ndarray,                 # (B, N or 1, max_len)
        masks: jnp.ndarray,                   # (B, N or 1, max_len)
        encoder_hidden_states_uncond: Optional[jnp.ndarray] = None,  # (1, 77, 768)
        drop_mask: Optional[jnp.ndarray] = None,  # (B, N) 1 -> use uncond
    ) -> jnp.ndarray:
        """Build the per-view token sequence (B, N, 1+77+max_len, 768)."""
        cfg = self.cfg
        B, N = camera_param.shape[:2]
        cam_tok = self.cam2token(
            embed_camera(camera_param, cfg.cam_num_freqs).astype(self.dtype))
        text = repeat(encoder_hidden_states.astype(self.dtype),
                      "b l c -> b n l c", n=N)
        tokens = jnp.concatenate([cam_tok[:, :, None], text], axis=2)

        if drop_mask is not None:
            assert encoder_hidden_states_uncond is not None
            uncond = jnp.concatenate([
                self.uncond_cam_token()[None],
                encoder_hidden_states_uncond[0].astype(self.dtype),
            ], axis=0)  # (78, 768)
            m = drop_mask.astype(self.dtype)[:, :, None, None]
            tokens = tokens * (1 - m) + uncond[None, None] * m

        n_box_sets = bboxes.shape[1]
        if cfg.drop_cam_with_box and drop_mask is not None:
            if n_box_sets != N:
                bboxes = repeat(bboxes, "b 1 ... -> b n ...", n=N)
                classes = repeat(classes, "b 1 ... -> b n ...", n=N)
                masks = repeat(masks, "b 1 ... -> b n ...", n=N)
                n_box_sets = N
            masks = masks * (1 - drop_mask[:, :, None].astype(masks.dtype))

        bbox_tok = self.bbox_embedder(bboxes, classes, masks)
        if n_box_sets != N:
            bbox_tok = repeat(bbox_tok, "b 1 l c -> b n l c", n=N)
        return jnp.concatenate([tokens, bbox_tok], axis=2)

    def uncond_tokens(self, encoder_hidden_states_uncond: jnp.ndarray,
                      n_box_tokens: int) -> jnp.ndarray:
        """CFG negative-branch tokens: [uncond_cam | uncond_text | null boxes].

        (ref:unet_addon_rawbox.py:684-702 + bbox_embedder.add_n_uncond_tokens)
        Returns (1+77+n_box_tokens, 768).
        """
        head = jnp.concatenate([
            self.uncond_cam_token()[None],
            encoder_hidden_states_uncond[0].astype(self.dtype),
        ], axis=0)
        null = self.bbox_embedder(
            jnp.zeros((n_box_tokens, self.cfg.bbox.n_points, 3)),
            jnp.zeros((n_box_tokens,), jnp.int32),
            jnp.zeros((n_box_tokens,)))
        return jnp.concatenate([head, null], axis=0)

    def substitute_with_uncond_map(self, controlnet_cond: jnp.ndarray,
                                   mask: Optional[jnp.ndarray] = None
                                   ) -> jnp.ndarray:
        """Replace samples' maps with the unconditional map
        (ref:unet_addon_rawbox.py:378-412). mask: (B,), 1 -> substitute;
        None -> substitute all."""
        u = self.uncond_map
        u = u.value if hasattr(u, "value") else u
        if mask is None:
            return jnp.broadcast_to(u[None], controlnet_cond.shape)
        m = mask.reshape(-1, 1, 1, 1).astype(controlnet_cond.dtype)
        return controlnet_cond * (1 - m) + u[None].astype(
            controlnet_cond.dtype) * m

    def embed_map(self, controlnet_cond: jnp.ndarray) -> jnp.ndarray:
        """BEV map (B, H, W, C) -> latent-resolution features (B, h, w, 320)."""
        return self.controlnet_cond_embedding(controlnet_cond.astype(self.dtype))

    # ---------- main forward ----------

    def __call__(
        self,
        sample: jnp.ndarray,                 # (B, N, h, w, 4) noisy latents
        timesteps: jnp.ndarray,              # (B,) or (B*N,) or scalar
        camera_param: jnp.ndarray,           # (B, N, 3, 7)
        encoder_hidden_states: jnp.ndarray,  # (B, 77, 768)
        controlnet_cond: jnp.ndarray,        # (B, H_map, W_map, C_map) NHWC
        bboxes: jnp.ndarray,
        classes: jnp.ndarray,
        masks: jnp.ndarray,
        encoder_hidden_states_uncond: Optional[jnp.ndarray] = None,
        drop_mask: Optional[jnp.ndarray] = None,
        map_drop_mask: Optional[jnp.ndarray] = None,  # (B,) 1 -> uncond map
        conditioning_scale: float = 1.0,
        guess_mode: bool = False,
        tokens: Optional[jnp.ndarray] = None,
        cond_feat: Optional[jnp.ndarray] = None,
    ):
        """``tokens`` / ``cond_feat`` may be precomputed (they are invariant
        across sampler steps) via :meth:`assemble_tokens` / :meth:`embed_map`
        so the denoising loop only re-runs the conv trunk."""
        B, N = sample.shape[:2]
        if tokens is None:
            tokens = self.assemble_tokens(
                camera_param, encoder_hidden_states, bboxes, classes, masks,
                encoder_hidden_states_uncond, drop_mask)

        x = rearrange(sample, "b n h w c -> (b n) h w c").astype(self.dtype)
        ctx = rearrange(tokens, "b n l c -> (b n) l c")

        timesteps = jnp.atleast_1d(jnp.asarray(timesteps))
        if timesteps.shape[0] == 1:
            timesteps = jnp.broadcast_to(timesteps, (B * N,))
        elif timesteps.shape[0] == B:
            timesteps = repeat(timesteps, "b -> (b n)", n=N)
        t_emb = get_timestep_embedding(
            timesteps, self._ucfg.block_out_channels[0])
        temb = self.time_embedding(t_emb.astype(self.dtype))

        if cond_feat is None:
            if map_drop_mask is not None and self.cfg.use_uncond_map:
                controlnet_cond = self.substitute_with_uncond_map(
                    controlnet_cond, map_drop_mask)
            cond_feat = self.embed_map(controlnet_cond)
        cond_feat = repeat(cond_feat, "b h w c -> (b n) h w c", n=N)

        x = self.conv_in(x) + cond_feat

        res_samples = [x]
        for block in self.down_blocks:
            x, res = block(x, temb, ctx)
            res_samples.extend(res)
        x = self.mid_block(x, temb, ctx)

        if guess_mode:
            # logspace 0.1 -> 1.0 residual scaling
            # (ref:unet_addon_rawbox.py:897-904)
            import numpy as np

            scales = np.logspace(-1, 0, len(res_samples) + 1) \
                * conditioning_scale
        else:
            scales = [conditioning_scale] * (len(res_samples) + 1)
        down_res = tuple(
            zconv(r) * s
            for zconv, r, s in zip(self.controlnet_down_blocks, res_samples,
                                   scales[:-1]))
        mid_res = self.controlnet_mid_block(x) * scales[-1]
        return down_res, mid_res, tokens
