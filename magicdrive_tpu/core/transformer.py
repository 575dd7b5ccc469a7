"""Transformer blocks, including the first-class multi-view (cross-view) block.

The reference injects cross-view attention by swapping diffusers'
``BasicTransformerBlock`` for ``BasicMultiviewTransformerBlock`` at runtime via
a vendored-diffusers patch (ref:magicdrive/networks/unet_2d_condition_multiview.py:222-234,
ref:magicdrive/networks/blocks.py:35-238). Here the cross-view path is a
constructor-time option of the block itself, and the reference's per-camera
Python scatter loop (ref:blocks.py:213-217) becomes one batched gather +
attention + sum — no dynamic control flow under jit.

View-axis convention: sequences arrive flattened as (B*N_cam, L, C); the
cross-view step reshapes to (B, N_cam, L, C) with static ``n_cam``.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn
from einops import rearrange

from .attention import (Attention, dot_product_attention, head_pad_for,
                        tag_attn_out)


def zeros_dense(features, dtype, name):
    return nn.Dense(
        features, dtype=dtype, param_dtype=jnp.float32, name=name,
        kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
    )


class GatedConnector(nn.Module):
    """tanh(alpha) * x with zero-init alpha (ref:blocks.py:24-32)."""

    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.zeros, (self.dim,), jnp.float32)
        return jnp.tanh(alpha).astype(self.dtype) * x


# Default FF implementation. "fused" = stage-1 pallas GEGLU kernel
# (geglu.py) + XLA stage-2 matmul; "fused2" = whole-FF kernel (stage-2
# projection fused too, the gated (M, inner) intermediate never exists in
# HBM) where VMEM fits (the level-0 C=320 shape), stage-1 kernel
# elsewhere; "xla" = plain matmul+split+gelu. Default "fused2": in the
# round-3b composition it takes the denoise step 216.7 -> 215.8 ms on top
# of the kvstat + level-1-pallas + subpixel set (PERFORMANCE.md).
_FF_DEFAULT = "fused2"

# How the cross-view pair kernels fetch each neighbor's hidden states:
# "kernel" = the kv BlockSpec index map applies the ring permutation
# (v + s) % n in-grid, so the rolled HBM copies never exist (the round-4
# HLO census attributed ~1.9 GB/step of pad traffic to the jnp.roll
# gathers); "roll" = materialize jnp.roll copies (pre-round-4 behavior).
_CV_GATHER = os.environ.get("MAGICDRIVE_CV_GATHER", "kernel")


class _DenseParams(nn.Module):
    """nn.Dense's exact param layout (kernel/bias at this scope), with the
    raw weights readable by the parent for kernel fusion."""

    in_features: int
    features: int
    dtype: jnp.dtype

    def setup(self):
        self.kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                 (self.in_features, self.features),
                                 jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)

    def __call__(self, x):
        return (x @ self.kernel.astype(self.dtype)
                + self.bias.astype(self.dtype))


class FeedForward(nn.Module):
    """GEGLU feed-forward: Dense(d, 8d) -> x * gelu(gate) -> Dense(4d, d).

    Param layout matches diffusers' ``FeedForward`` (``net_0_proj`` stage-1,
    ``net_2`` stage-2). Impl dispatch (module comment on ``_FF_DEFAULT``).
    """

    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        import os

        from magicdrive_tpu.kernels.flash_attention import on_tpu_by_default
        from magicdrive_tpu.kernels.geglu import (ff_full_fusion_fits,
                                                  fused_ff, fused_geglu)

        inner = self.dim * self.mult
        proj = _DenseParams(self.dim, 2 * inner, self.dtype,
                            name="net_0_proj")
        net_2 = _DenseParams(inner, self.dim, self.dtype, name="net_2")
        impl = os.environ.get("MAGICDRIVE_FF_IMPL", _FF_DEFAULT)
        if impl in ("fused", "fused2") and on_tpu_by_default():
            k1 = proj.kernel.astype(self.dtype)
            b1 = proj.bias.astype(self.dtype)
            if impl == "fused2" and ff_full_fusion_fits(
                    self.dim, inner, self.dim, x.dtype.itemsize):
                k2 = net_2.kernel.astype(self.dtype)
                return fused_ff(x, k1, b1, k2) + net_2.bias.astype(self.dtype)
            return net_2(fused_geglu(x, k1, b1))
        h = proj(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return net_2(h * nn.gelu(gate, approximate=False))


class _LNCore(nn.Module):
    """LayerNorm with fp32 statistics and a selectable apply precision.

    Named ``LayerNorm_0`` by its wrapper so the param tree matches the
    previous flax ``nn.LayerNorm`` child scope (checkpoint compatibility).
    """

    dtype: jnp.dtype = jnp.float32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        from . import resnet as _rn

        NORM_APPLY = _rn.NORM_APPLY
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if _rn.NORM_IDENTITY:
            return x.astype(self.dtype)
        x32 = x.astype(jnp.float32)
        m = jnp.mean(x32, axis=-1, keepdims=True)
        m2 = jnp.mean(x32 * x32, axis=-1, keepdims=True)
        rstd = jax.lax.rsqrt(jnp.maximum(m2 - m * m, 0.0) + self.epsilon)
        mul = rstd * scale
        add = bias - m * rstd * scale
        if NORM_APPLY == "compute" and self.dtype != jnp.float32:
            return (x.astype(self.dtype) * mul.astype(self.dtype)
                    + add.astype(self.dtype))
        return (x32 * mul + add).astype(self.dtype)


class LayerNorm32(nn.Module):
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return _LNCore(self.dtype, name="LayerNorm_0")(x)


class BasicTransformerBlock(nn.Module):
    """Self-attn + text-cross-attn + FF; optional cross-view attention.

    With ``neighboring_view_pair`` set, a fourth attention (``attn4``) over
    neighboring camera views runs between attn2 and the FF, its output passed
    through a zero-init connector so a freshly-initialized block is an exact
    identity extension of the stock SD block (ref:blocks.py:67-90,190-222).
    """

    dim: int
    n_heads: int
    d_head: int
    cross_attention_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32
    # cross-view options
    neighboring_view_pair: Optional[Tuple[Tuple[int, int], ...]] = None
    neighboring_attn_type: str = "add"   # add | concat | self
    # "add" mode layout: batch the k neighbor attentions as one call (fastest
    # for the image models) or run them sequentially (halves peak activation
    # memory — required for the 16-frame video model). Numerics identical.
    neighbor_batched: bool = False
    zero_module_type: str = "zero_linear"  # zero_linear | gated | none
    # temporal (video) option: attention over the frame axis, injected with
    # the same zero-init connector pattern as the cross-view block
    # (SURVEY.md §2.5 — the MagicDrive-t extension; batch layout (B*F*N)).
    temporal_frames: Optional[int] = None

    @nn.compact
    def __call__(self, x, context=None):
        attn1 = Attention(self.dim, self.n_heads, self.d_head, dtype=self.dtype,
                          name="attn1")
        x = attn1(LayerNorm32(self.dtype, name="norm1")(x)) + x

        if self.cross_attention_dim is not None:
            attn2 = Attention(self.dim, self.n_heads, self.d_head,
                              cross_attention_dim=self.cross_attention_dim,
                              dtype=self.dtype, name="attn2")
            x = attn2(LayerNorm32(self.dtype, name="norm2")(x), context) + x

        if self.neighboring_view_pair is not None:
            x = self._cross_view(x) + x

        if self.temporal_frames is not None and self.temporal_frames > 1:
            x = self._temporal(x) + x

        x = FeedForward(self.dim, dtype=self.dtype, name="ff")(
            LayerNorm32(self.dtype, name="norm3")(x)) + x
        return x

    def _temporal(self, x):
        """Self-attention over frames at each (view, spatial) position.

        x: (B*F*N, L, C), batch layout (batch, frame, view) with views
        innermost (the cross-view step requires that); returns pre-residual
        output gated by a zero-init connector so a freshly-added temporal
        block leaves the image model unchanged.
        """
        f = self.temporal_frames
        n = len(self.neighboring_view_pair) if self.neighboring_view_pair \
            else 1
        h = LayerNorm32(self.dtype, name="norm_temp")(x)
        h = rearrange(h, "(b f n) l c -> (b n l) f c", f=f, n=n)
        attn = Attention(self.dim, self.n_heads, self.d_head,
                         dtype=self.dtype, name="attn_temp")
        out = attn(h)
        out = rearrange(out, "(b n l) f c -> (b f n) l c", n=n,
                        l=x.shape[1])
        if self.zero_module_type == "zero_linear":
            out = zeros_dense(self.dim, self.dtype, "connector_temp")(out)
        elif self.zero_module_type == "gated":
            out = GatedConnector(self.dim, self.dtype,
                                 name="connector_temp")(out)
        return out

    @staticmethod
    def _ring_shift(static_idx, n):
        """s such that idx[i] == (i+s) % n for all i, else None."""
        idx = list(static_idx)
        if len(idx) != n:
            return None
        s = idx[0] % n
        return s if all(j == (i + s) % n for i, j in enumerate(idx)) else None

    @staticmethod
    def _take_views(t, static_idx):
        """Gather camera views along axis 1 by a STATIC index list; when the
        indices are a constant ring shift (the nuScenes neighbor layout,
        idx[i] == (i+s) % N), lower to jnp.roll (two slices + concat)
        instead of a gather — measurably cheaper on TPU (the per-op profile
        attributed ~4 ms/step to these gathers)."""
        n = t.shape[1]
        s = BasicTransformerBlock._ring_shift(static_idx, n)
        if s is not None:
            return jnp.roll(t, -s, axis=1)
        return jnp.take(t, jnp.asarray(static_idx), axis=1)

    def _cross_view(self, x):
        """Cross-view attention over neighboring cameras.

        x: (B*N, L, C) -> output of the same shape (pre-residual).
        """
        neighbors = jnp.asarray(self.neighboring_view_pair)  # (N, k)
        np_pairs = self.neighboring_view_pair
        n_cam, n_nb = neighbors.shape
        h = LayerNorm32(self.dtype, name="norm4")(x)
        hv = rearrange(h, "(b n) l c -> b n l c", n=n_cam)
        attn4 = Attention(self.dim, self.n_heads, self.d_head,
                          cross_attention_dim=self.dim, dtype=self.dtype,
                          name="attn4")

        # Every view serves as both query and (some neighbor's) key/value, so
        # q/k/v are projected ONCE per view here and gathered per neighbor —
        # the reference's per-neighbor attn4 calls re-project k/v (and the
        # summed to_out) per neighbor, doubling those matmuls
        # (ref:blocks.py:112-133,213-217; same math, fewer matmuls).
        flat = rearrange(hv, "b n l c -> (b n) l c")
        L = flat.shape[-2]
        scale = self.d_head ** -0.5
        from . import attention as _attn_mod

        lk = L * (n_nb if self.neighboring_attn_type == "concat" else 1)
        fused_mode = (_attn_mod.fused_mode_for(
            L, lk, flat.shape[-1], self.d_head,
            2 if flat.dtype == jnp.bfloat16 else 4)
            if (_attn_mod._ATTN_IMPL == "fused"
                and _attn_mod._pallas_route(L, lk, self.d_head, False))
            else None)
        if fused_mode and self.neighboring_attn_type in ("add", "concat"):
            # Fully-fused path: per neighbor, hand the kernel the raw
            # hidden states — q/k/v and the per-head outputs never exist
            # in HBM; the kernel emits each neighbor's out-projected
            # (…, L, C) contribution, summed here (linear), bias added
            # once per neighbor branch (ref:blocks.py:213-217 semantics).
            from magicdrive_tpu.kernels.fused_attention import (
                fused_kvstat_attention, fused_kvstat_attention_pair,
                fused_qkv_out_attention, fused_qkv_out_attention_pair,
                kvstat_pair_fits, pair_is_efficient)

            esz = 2 if flat.dtype == jnp.bfloat16 else 4
            pair_ok = (self.neighboring_attn_type == "add" and n_nb == 2
                       and _attn_mod._CV_PAIR == "pair")
            d = 128 if self.d_head % 128 else self.d_head
            wq, wk, wv = attn4.qkv_weights(d)
            wo = attn4.to_out.padded_kernel(d)
            use_pair = (pair_ok and fused_mode == "out"
                        and pair_is_efficient(L, L, flat.shape[-1],
                                              self.d_head, esz))
            use_kv_pair = (pair_ok and fused_mode == "kvstat"
                           and kvstat_pair_fits(L, L, flat.shape[-1],
                                                self.d_head, esz))
            if use_pair or use_kv_pair:
                # both neighbors in ONE kernel launch: q projected once,
                # weights resident once, one accumulator/output
                s1, s2 = (self._ring_shift([p[nb] for p in np_pairs], n_cam)
                          for nb in range(2))
                if (_CV_GATHER == "kernel" and s1 is not None
                        and s2 is not None):
                    # ring neighbors: the kernels' kv BlockSpec index map
                    # applies (v + s) % n in-grid — the rolled HBM copies
                    # (1.9 GB/step of pad traffic, round-4 HLO census)
                    # never exist in the forward
                    xkv1 = xkv2 = flat
                    shifts = (s1, s2, n_cam)
                else:
                    xkv1, xkv2 = (rearrange(
                        self._take_views(hv, [p[nb] for p in np_pairs]),
                        "b n l c -> (b n) l c") for nb in range(2))
                    shifts = None
                if use_kv_pair:
                    outpack = (_attn_mod._KV_OUTPACK and d != self.d_head)
                    o = fused_kvstat_attention_pair(
                        flat, xkv1, xkv2, wq, wk, wv,
                        heads=self.n_heads, scale=scale, shifts=shifts,
                        d_out=self.d_head if outpack else None)
                    acc = (attn4.to_out.grouped(o, n_summed=n_nb) if outpack
                           else attn4.project_out(o, n_summed=n_nb))
                else:
                    acc = fused_qkv_out_attention_pair(
                        flat, xkv1, xkv2, wq, wk, wv, wo,
                        heads=self.n_heads, scale=scale, shifts=shifts)
                    if attn4.to_out.bias is not None:
                        acc = acc + n_nb * attn4.to_out.bias.astype(
                            self.dtype)
            else:
                nbs = (range(n_nb) if self.neighboring_attn_type == "add"
                       else [None])
                acc = None
                outpack = (fused_mode == "kvstat" and _attn_mod._KV_OUTPACK
                           and d != self.d_head)
                for nb in nbs:
                    idx = ([p[nb] for p in np_pairs] if nb is not None
                           else [j for p in np_pairs for j in p])
                    xkv = self._take_views(hv, idx)
                    xkv = (rearrange(xkv, "b n l c -> (b n) l c")
                           if nb is not None
                           else rearrange(xkv, "b (n k) l c -> (b n) (k l) c",
                                          k=n_nb))
                    if fused_mode == "kvstat":
                        # per-head outputs (padded, or head-packed group-
                        # major under outpack); summed across neighbors
                        # BEFORE the single out-projection
                        o = fused_kvstat_attention(
                            flat, xkv, wq, wk, wv, heads=self.n_heads,
                            scale=scale,
                            d_out=self.d_head if outpack else None)
                    else:
                        o = fused_qkv_out_attention(flat, xkv, wq, wk, wv,
                                                    wo, heads=self.n_heads,
                                                    scale=scale)
                    acc = o if acc is None else acc + o
                if fused_mode == "kvstat":
                    acc = (attn4.to_out.grouped(acc,
                                                n_summed=len(list(nbs)))
                           if outpack else
                           attn4.project_out(acc, n_summed=len(list(nbs))))
                elif attn4.to_out.bias is not None:
                    k_br = n_nb if self.neighboring_attn_type == "add" else 1
                    acc = acc + k_br * attn4.to_out.bias.astype(self.dtype)
            out = rearrange(acc, "(b n) l c -> b n l c", n=n_cam)
        elif self.neighboring_attn_type == "add":
            d_pad = head_pad_for(L, L, self.d_head)
            q, k, v = attn4.project_qkv(flat, d_pad)
            kv_view = [rearrange(t, "(b n) l h d -> b n l h d", n=n_cam)
                       for t in (k, v)]
            if self.neighbor_batched:
                # Fold the k neighbors into a leading batch axis: ONE
                # attention call (fewer, larger MXU launches; q is
                # broadcast, k/v gathered per neighbor), then sum.
                kn, vn = (rearrange(
                    jnp.take(t, neighbors.T.reshape(-1), axis=1),
                    "b (k n) l h d -> k (b n) l h d", k=n_nb)
                    for t in kv_view)
                o = dot_product_attention(
                    jnp.broadcast_to(q[None], (n_nb,) + q.shape), kn, vn,
                    scale=scale)
                acc = o.sum(axis=0)
            else:
                # Sequential over the (tiny) neighbor axis: halves peak
                # activation memory (decisive for the 16-frame video model).
                acc = None
                for nb in range(n_nb):
                    kn, vn = (rearrange(
                        self._take_views(t, [p[nb] for p in np_pairs]),
                        "b n l h d -> (b n) l h d") for t in kv_view)
                    o = dot_product_attention(q, kn, vn, scale=scale)
                    acc = o if acc is None else acc + o
            out = attn4.project_out(acc, n_summed=n_nb)
            out = rearrange(out, "(b n) l c -> b n l c", n=n_cam)
        elif self.neighboring_attn_type == "concat":
            # concat of projections == projection of the concat, so K/V are
            # likewise projected once per view and gathered.
            d_pad = head_pad_for(L, n_nb * L, self.d_head)
            q, k, v = attn4.project_qkv(flat, d_pad)
            kn, vn = (rearrange(
                jnp.take(rearrange(t, "(b n) l h d -> b n l h d", n=n_cam),
                         neighbors.reshape(-1), axis=1),
                "b (n k) l h d -> (b n) (k l) h d", k=n_nb) for t in (k, v))
            out = attn4.project_out(
                dot_product_attention(q, kn, vn, scale=scale))
            out = rearrange(out, "(b n) l c -> b n l c", n=n_cam)
        elif self.neighboring_attn_type == "self":
            out = attn4(rearrange(hv, "b n l c -> b (n l) c"), None)
            out = rearrange(out, "b (n l) c -> b n l c", n=n_cam)
        else:
            raise ValueError(self.neighboring_attn_type)

        out = tag_attn_out(rearrange(out, "b n l c -> (b n) l c"))
        return self._connector(out)

    def _connector(self, out):
        """Zero-init connector applied to the cross-view output
        (ref:blocks.py:139-151)."""
        if self.zero_module_type == "zero_linear":
            return zeros_dense(self.dim, self.dtype, "connector")(out)
        if self.zero_module_type == "gated":
            return GatedConnector(self.dim, self.dtype, name="connector")(out)
        if self.zero_module_type != "none":
            raise ValueError(self.zero_module_type)
        return out


class Transformer2DModel(nn.Module):
    """GroupNorm -> 1x1 proj_in -> transformer block(s) -> 1x1 proj_out + residual.

    Matches SD-v1.5's Transformer2DModel (use_linear_projection=False,
    norm eps 1e-6, one block).
    """

    n_heads: int
    d_head: int
    cross_attention_dim: int = 768
    depth: int = 1
    norm_num_groups: int = 32
    dtype: jnp.dtype = jnp.float32
    neighboring_view_pair: Optional[Tuple[Tuple[int, int], ...]] = None
    neighboring_attn_type: str = "add"
    neighbor_batched: bool = False
    zero_module_type: str = "zero_linear"
    temporal_frames: Optional[int] = None

    @nn.compact
    def __call__(self, x, context):
        from .resnet import GroupNorm, conv

        b, hgt, wdt, c = x.shape
        residual = x
        h = GroupNorm(self.norm_num_groups, 1e-6, dtype=self.dtype, name="norm")(x)
        h = conv(self.n_heads * self.d_head, kernel=1, padding=0,
                 dtype=self.dtype, name="proj_in")(h)
        h = h.reshape(b, hgt * wdt, -1)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                self.n_heads * self.d_head, self.n_heads, self.d_head,
                cross_attention_dim=self.cross_attention_dim, dtype=self.dtype,
                neighboring_view_pair=self.neighboring_view_pair,
                neighboring_attn_type=self.neighboring_attn_type,
                neighbor_batched=self.neighbor_batched,
                zero_module_type=self.zero_module_type,
                temporal_frames=self.temporal_frames,
                name=f"transformer_blocks_{i}",
            )(h, context)
        h = h.reshape(b, hgt, wdt, -1)
        h = conv(c, kernel=1, padding=0, dtype=self.dtype, name="proj_out")(h)
        return h + residual
