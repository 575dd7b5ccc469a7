"""Wall-time bisection of the multiview UNet forward on the attached TPU.

The tunnel's per-op profiler reports XLA cost-model times, not measured ones
(PERFORMANCE.md round-2 lesson), so per-component attribution must come from
real wall-time deltas: each variant surgically disables one piece of the
forward (attention cores, norms, the cross-view path) and re-times the whole
thing at exact pipeline shapes. Params are zeros — TPU timing is
value-independent — so structurally different variants stay comparable.

Also dumps XLA's compiled cost analysis (flops / bytes accessed) for the full
variant: bytes come from operand shapes of the optimized HLO, so they are
structurally meaningful even where the cost model's times are not.

Usage: python tools/bench_unet_ablation.py [variant ...]
  variants: full norm-compute norm-id attn-id no-crossview nb-batched (default: all)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
if os.path.isdir("/root/.axon_site"):
    sys.path.append("/root/.axon_site")

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/magicdrive_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

from einops import rearrange, repeat

import magicdrive_tpu.core.attention as attention
import magicdrive_tpu.core.resnet as resnet
import magicdrive_tpu.core.transformer as transformer
from magicdrive_tpu.config.presets import sd15mv_rawbox_224x400, init_params

B = 4
N = 6


def fetch(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:4])


def timeit(fn, *args, iters=10, name=""):
    t0 = time.perf_counter()
    fetch(fn(*args))
    tc = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"  {name:34s} {dt*1e3:9.2f} ms/call   (compile {tc:.0f}s)",
          flush=True)
    return dt


_REAL_DPA = attention.dot_product_attention


def _identity_attention(q, k, v, bias=None, backend=None, scale=None):
    # keep q/k/v alive so projections aren't DCE'd; no softmax/matmul core
    return q + 0.0 * (k.sum(-3, keepdims=True) + v.sum(-3, keepdims=True))


_REAL_FF_CALL = transformer.FeedForward.__call__
_REAL_CONV = resnet.conv


def _ff_identity(self, x):
    return x


def _conv_1x1(features, kernel=3, stride=1, padding=1, dtype=jnp.float32,
              name=None, use_bias=True):
    # isolate the 3x3 spatial window cost: same channel contraction and
    # strides, kernel 1x1 (9x fewer conv FLOPs, no halo)
    return _REAL_CONV(features, 1, stride, 0, dtype=dtype, name=name,
                      use_bias=use_bias)


_REAL_T2D_CALL = transformer.Transformer2DModel.__call__
_REAL_RESNET_CALL = resnet.ResnetBlock2D.__call__


def _t2d_no_proj(self, x, context):
    # skip norm + proj_in/proj_out 1x1 convs + outer residual (c == inner
    # for every SD-1.5 level, so shapes hold)
    b, hgt, wdt, c = x.shape
    h = x.reshape(b, hgt * wdt, -1)
    for i in range(self.depth):
        h = transformer.BasicTransformerBlock(
            self.n_heads * self.d_head, self.n_heads, self.d_head,
            cross_attention_dim=self.cross_attention_dim, dtype=self.dtype,
            neighboring_view_pair=self.neighboring_view_pair,
            neighboring_attn_type=self.neighboring_attn_type,
            neighbor_batched=self.neighbor_batched,
            zero_module_type=self.zero_module_type,
            temporal_frames=self.temporal_frames,
            name=f"transformer_blocks_{i}",
        )(h, context)
    return h.reshape(b, hgt, wdt, -1)


def _resnet_no_temb(self, x, temb=None):
    # ResnetBlock2D body minus the time-embedding Dense+add (params for the
    # skipped Dense are absent — fine, both init and apply use this body)
    import flax.linen as nn

    in_channels = x.shape[-1]
    h = resnet.GroupNorm(self.groups, self.eps, dtype=self.dtype,
                         name="norm1")(x)
    h = nn.silu(h)
    h = resnet.conv(self.out_channels, dtype=self.dtype, name="conv1")(h)
    h = resnet.GroupNorm(self.groups, self.eps, dtype=self.dtype,
                         name="norm2")(h)
    h = nn.silu(h)
    h = resnet.conv(self.out_channels, dtype=self.dtype, name="conv2")(h)
    if in_channels != self.out_channels:
        x = resnet.conv(self.out_channels, kernel=1, padding=0,
                        dtype=self.dtype, name="conv_shortcut")(x)
    return x + h


def make_unet_step(no_crossview=False, neighbor_batched=False):
    import dataclasses
    preset = sd15mv_rawbox_224x400()
    if no_crossview:
        preset = dataclasses.replace(
            preset, unet=dataclasses.replace(
                preset.unet, neighboring_view_pair=None))
    if neighbor_batched:
        preset = dataclasses.replace(
            preset, unet=dataclasses.replace(
                preset.unet, neighbor_batched=True))
    dtype = jnp.bfloat16
    modules = preset.modules(dtype=dtype)
    shapes = jax.eval_shape(
        lambda: init_params(preset, modules, jax.random.PRNGKey(0)))
    params = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(
            s.shape, jnp.bfloat16
            if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype),
        shapes))()
    H, W = preset.pipeline.latent_height, preset.pipeline.latent_width
    lat2 = jnp.zeros((2 * B * N, H, W, 4), dtype)
    t2 = jnp.full((2 * B * N,), 500, jnp.int32)
    tokens2 = jnp.zeros((2 * B * N, 1 + 77 + preset.bbox_max_len, 768), dtype)
    m = modules

    # Residual shapes straight from the ControlNet forward via eval_shape —
    # no device execution, no hand-rolled mirror of the down path.
    from magicdrive_tpu.data.collate import CollateConfig, collate_fn
    from magicdrive_tpu.data.fixtures import make_dataset

    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size, is_train=False)
    nb = {k: np.concatenate([np.asarray(v)] * 2)
          for k, v in collate_fn(make_dataset(B), ccfg).items()}
    lat2v = jax.ShapeDtypeStruct((2 * B, N, H, W, 4), dtype)
    text2 = jax.ShapeDtypeStruct((2 * B, 77, 768), dtype)
    t2b = jax.ShapeDtypeStruct((2 * B,), jnp.int32)
    cn_shapes = jax.eval_shape(
        lambda lat, t, cam, txt, mp, bx, cl, mk: m.controlnet.apply(
            params["controlnet"], lat, t, cam, txt, mp, bx, cl, mk),
        lat2v, t2b, nb["camera_param"], text2, nb["bev_map"], nb["bboxes"],
        nb["classes"], nb["masks"])
    down_res = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                            cn_shapes[0])
    mid_res = jnp.zeros(cn_shapes[1].shape, cn_shapes[1].dtype)

    @jax.jit
    def unet_step(lat2):
        return m.unet.apply(
            params["unet"], lat2, t2, tokens2,
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res)

    return unet_step, lat2


def run(variant):
    import flax.linen as nn

    attention.dot_product_attention = _REAL_DPA
    transformer.dot_product_attention = _REAL_DPA
    transformer.FeedForward.__call__ = _REAL_FF_CALL
    transformer.Transformer2DModel.__call__ = _REAL_T2D_CALL
    resnet.ResnetBlock2D.__call__ = _REAL_RESNET_CALL
    resnet.conv = _REAL_CONV
    resnet.NORM_APPLY = "fp32"
    resnet.NORM_IDENTITY = False
    no_cv = False
    if variant == "norm-compute":
        resnet.NORM_APPLY = "compute"
    elif variant == "norm-id":
        resnet.NORM_IDENTITY = True
    elif variant == "attn-id":
        attention.dot_product_attention = _identity_attention
        transformer.dot_product_attention = _identity_attention
    elif variant == "ff-id":
        transformer.FeedForward.__call__ = nn.compact(_ff_identity)
    elif variant == "conv1x1":
        resnet.conv = _conv_1x1
    elif variant == "proj-id":
        transformer.Transformer2DModel.__call__ = nn.compact(_t2d_no_proj)
    elif variant == "temb-id":
        resnet.ResnetBlock2D.__call__ = nn.compact(_resnet_no_temb)
    elif variant == "no-crossview":
        no_cv = True
    print(f"[{variant}]", flush=True)
    step, lat2 = make_unet_step(no_crossview=no_cv,
                                neighbor_batched=(variant == "nb-batched"))
    dt = timeit(step, lat2, name="unet fwd (2B*6)")
    if variant == "full":
        try:
            lowered = step.lower(lat2)
            cost = lowered.compile().cost_analysis()
            if isinstance(cost, (list, tuple)):
                cost = cost[0]
            flops = cost.get("flops", float("nan"))
            byts = cost.get("bytes accessed", float("nan"))
            print(f"  cost_analysis: {flops/1e12:.2f} TF, "
                  f"{byts/1e9:.2f} GB accessed -> "
                  f"{flops/197e12*1e3:.0f} ms MXU floor, "
                  f"{byts/819e9*1e3:.0f} ms HBM floor", flush=True)
        except Exception as e:
            print(f"  cost_analysis failed: {e!r}", flush=True)
    return dt


def main():
    variants = sys.argv[1:] or ["full", "norm-compute", "norm-id", "attn-id",
                                "no-crossview"]
    out = {}
    for v in variants:
        try:
            out[v] = run(v)
        except Exception as e:
            print(f"[{v}] FAILED: {e!r}", flush=True)
    if "full" in out:
        for v, dt in out.items():
            if v != "full":
                print(f"delta full - {v}: {1e3*(out['full']-dt):+.1f} ms")


if __name__ == "__main__":
    main()
