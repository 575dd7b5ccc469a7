"""SD-v1.5 UNet with first-class multi-view (cross-view) attention.

TPU-native re-design of diffusers ``UNet2DConditionModel`` +
``UNet2DConditionModelMultiview`` (ref:magicdrive/networks/unet_2d_condition_multiview.py).
The reference swaps transformer blocks at runtime via a vendored-diffusers
patch; here ``neighboring_view_pair`` simply configures the blocks.

Layout: NHWC. The batch axis is (B * n_cam); cross-view blocks regroup views
internally using static ``n_cam``. ControlNet residuals enter additively at
the skip connections and mid block
(ref:unet_2d_condition_multiview.py:464-473,487-488).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from magicdrive_tpu.core.embeddings import get_timestep_embedding
from magicdrive_tpu.core.resnet import (
    GroupNorm, ResnetBlock2D, Downsample2D, Upsample2D, conv,
)
from magicdrive_tpu.core.transformer import Transformer2DModel


# ring neighbors for the 6 nuScenes cameras in view_order
# (ref:configs/dataset/Nuscenes.yaml:27-33)
NUSCENES_NEIGHBORS: Tuple[Tuple[int, int], ...] = (
    (5, 1), (0, 2), (1, 3), (2, 4), (3, 5), (4, 0),
)


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    in_channels: int = 4
    out_channels: int = 4
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    num_attention_heads: int = 8
    cross_attention_dim: int = 768
    norm_num_groups: int = 32
    # which down blocks have cross-attention (SD1.5: last one does not)
    down_block_has_attn: Tuple[bool, ...] = (True, True, True, False)
    # multiview options (None -> stock SD UNet)
    neighboring_view_pair: Optional[Tuple[Tuple[int, int], ...]] = None
    neighboring_attn_type: str = "add"
    neighbor_batched: bool = False
    zero_module_type: str = "zero_linear"
    # video extension: attention over this many frames per transformer block
    temporal_frames: Optional[int] = None
    # rematerialize down/mid/up blocks in the backward pass (the reference's
    # per-block gradient checkpointing,
    # ref:unet_2d_condition_multiview.py:273-292) — trades FLOPs for HBM
    gradient_checkpointing: bool = False
    # selective remat policy (only with gradient_checkpointing):
    #   None   — full per-block remat (recompute everything)
    #   "attn" — keep attention outputs resident (tag_attn_out), recompute
    #            only convs/norms/FF: skips the most expensive recompute at
    #            ~(B*N, L, C)-per-attention extra HBM
    #   "dots" — jax dots_saveable (keep every matmul output; most memory)
    remat_policy: Optional[str] = None

    @property
    def up_block_has_attn(self) -> Tuple[bool, ...]:
        return tuple(reversed(self.down_block_has_attn))


class CrossAttnDownBlock(nn.Module):
    cfg: UNetConfig
    out_channels: int
    has_attn: bool
    add_downsample: bool
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        res = []
        for i in range(self.cfg.layers_per_block):
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype,
                              groups=self.cfg.norm_num_groups,
                              name=f"resnets_{i}")(x, temb)
            if self.has_attn:
                x = Transformer2DModel(
                    self.cfg.num_attention_heads,
                    self.out_channels // self.cfg.num_attention_heads,
                    cross_attention_dim=self.cfg.cross_attention_dim,
                    norm_num_groups=self.cfg.norm_num_groups,
                    dtype=self.dtype,
                    neighboring_view_pair=self.cfg.neighboring_view_pair,
                    neighboring_attn_type=self.cfg.neighboring_attn_type,
                    neighbor_batched=self.cfg.neighbor_batched,
                    zero_module_type=self.cfg.zero_module_type,
                    temporal_frames=self.cfg.temporal_frames,
                    name=f"attentions_{i}",
                )(x, context)
            res.append(x)
        if self.add_downsample:
            x = Downsample2D(self.out_channels, dtype=self.dtype,
                             name="downsamplers_0")(x)
            res.append(x)
        return x, res


class CrossAttnUpBlock(nn.Module):
    """Up block consuming its skip connections as an explicit tuple (in
    consumption order) — pure in its array arguments so it can be wrapped in
    nn.remat for gradient checkpointing."""

    cfg: UNetConfig
    out_channels: int
    num_layers: int
    has_attn: bool
    add_upsample: bool
    # upsample target spatial size (handles odd latent dims, e.g. 7x13 at
    # 224x400 — diffusers forward_upsample_size); None -> 2x
    out_hw: Optional[Tuple[int, int]] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, skips, temb, context):
        assert len(skips) == self.num_layers
        for i in range(self.num_layers):
            # handed as a PARTS tuple: with MAGICDRIVE_SKIP_CONCAT=split the
            # resnet consumes (x, skip) without materializing the concat —
            # XLA lowers these tile-misaligned concats as pad+pad pairs
            # writing the full width twice (~3.1 GB/step, round-4 HLO census)
            x = ResnetBlock2D(self.out_channels, dtype=self.dtype,
                              groups=self.cfg.norm_num_groups,
                              name=f"resnets_{i}")((x, skips[i]), temb)
            if self.has_attn:
                x = Transformer2DModel(
                    self.cfg.num_attention_heads,
                    self.out_channels // self.cfg.num_attention_heads,
                    cross_attention_dim=self.cfg.cross_attention_dim,
                    norm_num_groups=self.cfg.norm_num_groups,
                    dtype=self.dtype,
                    neighboring_view_pair=self.cfg.neighboring_view_pair,
                    neighboring_attn_type=self.cfg.neighboring_attn_type,
                    neighbor_batched=self.cfg.neighbor_batched,
                    zero_module_type=self.cfg.zero_module_type,
                    temporal_frames=self.cfg.temporal_frames,
                    name=f"attentions_{i}",
                )(x, context)
        if self.add_upsample:
            x = Upsample2D(self.out_channels, dtype=self.dtype,
                           name="upsamplers_0")(x, self.out_hw)
        return x


class UNetMidBlock(nn.Module):
    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context):
        ch = self.cfg.block_out_channels[-1]
        x = ResnetBlock2D(ch, dtype=self.dtype, groups=self.cfg.norm_num_groups,
                          name="resnets_0")(x, temb)
        x = Transformer2DModel(
            self.cfg.num_attention_heads, ch // self.cfg.num_attention_heads,
            cross_attention_dim=self.cfg.cross_attention_dim,
            norm_num_groups=self.cfg.norm_num_groups, dtype=self.dtype,
            neighboring_view_pair=self.cfg.neighboring_view_pair,
            neighboring_attn_type=self.cfg.neighboring_attn_type,
            zero_module_type=self.cfg.zero_module_type,
            temporal_frames=self.cfg.temporal_frames,
            name="attentions_0",
        )(x, context)
        x = ResnetBlock2D(ch, dtype=self.dtype, groups=self.cfg.norm_num_groups,
                          name="resnets_1")(x, temb)
        return x


class TimestepEmbedding(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, t_emb):
        h = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="linear_1")(t_emb)
        h = nn.silu(h)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="linear_2")(h)


class UNet2DConditionModel(nn.Module):
    cfg: UNetConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,              # (B*N, H, W, in_channels)
        timesteps: jnp.ndarray,           # (B*N,) or scalar
        encoder_hidden_states: jnp.ndarray,  # (B*N, L, 768)
        down_block_additional_residuals: Optional[Sequence[jnp.ndarray]] = None,
        mid_block_additional_residual: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps[None], (sample.shape[0],))

        t_emb = get_timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = TimestepEmbedding(cfg.block_out_channels[0] * 4,
                                 dtype=self.dtype, name="time_embedding")(
            t_emb.astype(self.dtype))

        sample = sample.astype(self.dtype)
        context = encoder_hidden_states.astype(self.dtype)

        x = conv(cfg.block_out_channels[0], dtype=self.dtype, name="conv_in")(sample)

        down_cls, up_cls, mid_cls = CrossAttnDownBlock, CrossAttnUpBlock, \
            UNetMidBlock
        if cfg.gradient_checkpointing:
            kw = {}
            if cfg.remat_policy == "attn":
                kw["policy"] = jax.checkpoint_policies.save_only_these_names(
                    "attn_out")
            elif cfg.remat_policy == "dots":
                kw["policy"] = jax.checkpoint_policies.dots_saveable
            elif cfg.remat_policy is not None:
                raise ValueError(cfg.remat_policy)
            down_cls = nn.remat(CrossAttnDownBlock, **kw)
            up_cls = nn.remat(CrossAttnUpBlock, **kw)
            mid_cls = nn.remat(UNetMidBlock, **kw)

        skips = [x]
        for i, out_ch in enumerate(cfg.block_out_channels):
            is_final = i == len(cfg.block_out_channels) - 1
            x, res = down_cls(
                cfg, out_ch, has_attn=cfg.down_block_has_attn[i],
                add_downsample=not is_final, dtype=self.dtype,
                name=f"down_blocks_{i}",
            )(x, temb, context)
            skips.extend(res)

        if down_block_additional_residuals is not None:
            assert len(skips) == len(down_block_additional_residuals), (
                len(skips), len(down_block_additional_residuals))
            skips = [s + r.astype(self.dtype)
                     for s, r in zip(skips, down_block_additional_residuals)]

        x = mid_cls(cfg, dtype=self.dtype, name="mid_block")(x, temb, context)
        if mid_block_additional_residual is not None:
            x = x + mid_block_additional_residual.astype(self.dtype)

        rev_channels = list(reversed(cfg.block_out_channels))
        n_up = cfg.layers_per_block + 1
        for i, out_ch in enumerate(rev_channels):
            is_final = i == len(rev_channels) - 1
            block_skips = tuple(reversed(skips[-n_up:]))  # consumption order
            skips = skips[:-n_up]
            out_hw = skips[-1].shape[1:3] if skips else None
            x = up_cls(
                cfg, out_ch, num_layers=n_up,
                has_attn=cfg.up_block_has_attn[i], add_upsample=not is_final,
                out_hw=out_hw, dtype=self.dtype, name=f"up_blocks_{i}",
            )(x, block_skips, temb, context)
        assert not skips

        x = GroupNorm(cfg.norm_num_groups, 1e-5, dtype=self.dtype,
                      name="conv_norm_out")(x)
        x = nn.silu(x)
        x = conv(cfg.out_channels, dtype=self.dtype, name="conv_out")(x)
        return x.astype(jnp.float32)
