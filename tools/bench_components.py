"""Component-level timing of the flagship pipeline on the attached TPU.

Times each hot component as its own jitted call at the exact shapes the
224x400 pipeline uses (CFG batch 2B, 6 views), so the frames/sec headline can
be attributed: 20 x (controlnet + unet) + vae decode + sampler math. Each
component compiles in ~1-3 min (vs ~25 min for the whole pipeline), making
this the cheap profiling loop on the 1-core host.

Usage: python tools/bench_components.py [B] [--batched-neighbors]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/magicdrive_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)


def fetch(x):
    return np.asarray(jax.tree.leaves(x)[0].ravel()[:4])


def timeit(fn, *args, iters=10, name=""):
    out = fn(*args)
    fetch(out)  # compile + force completion through the tunnel
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    fetch(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:32s} {dt * 1e3:9.2f} ms/call", flush=True)
    return dt


def main():
    import dataclasses

    from magicdrive_tpu.config.presets import sd15mv_rawbox_224x400, init_params
    from magicdrive_tpu.data.collate import CollateConfig, collate_fn
    from magicdrive_tpu.data.fixtures import make_dataset
    from magicdrive_tpu.models.unet import UNet2DConditionModel
    from magicdrive_tpu.models.controlnet import BEVControlNet
    from magicdrive_tpu.models.vae import AutoencoderKL
    from einops import rearrange, repeat

    B = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 4
    batched_nb = "--batched-neighbors" in sys.argv

    preset = sd15mv_rawbox_224x400()
    if batched_nb:
        preset = dataclasses.replace(
            preset, unet=dataclasses.replace(preset.unet, neighbor_batched=True))
    dtype = jnp.bfloat16
    modules = preset.modules(dtype=dtype)
    # Zero params, materialized directly on device: TPU matmul timing is
    # data-independent, so component timings match real weights while
    # skipping minutes of host init + a 2.8 GB tunnel transfer.
    shapes = jax.eval_shape(
        lambda: init_params(preset, modules, jax.random.PRNGKey(0)))
    params = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(
            s.shape, jnp.bfloat16
            if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype),
        shapes))()
    print("params materialized", flush=True)

    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size, is_train=False)
    batch = {k: jnp.asarray(v) for k, v in
             collate_fn(make_dataset(B), ccfg).items()}

    N = 6
    H, W = preset.pipeline.latent_height, preset.pipeline.latent_width
    lat2 = jnp.zeros((2 * B, N, H, W, 4), dtype)
    t2 = jnp.full((2 * B,), 500, jnp.int32)

    cn_vars = params["controlnet"]
    m = modules

    # conditioning tensors at CFG-doubled batch
    text, _ = jax.jit(lambda: m.clip.apply(params["clip"],
                                           batch["input_ids"]))()
    text2 = jnp.concatenate([text, text])
    camera2 = jnp.concatenate([batch["camera_param"]] * 2)
    map2 = jnp.concatenate([batch["bev_map"]] * 2)
    bboxes2 = jnp.concatenate([batch["bboxes"]] * 2)
    classes2 = jnp.concatenate([batch["classes"]] * 2)
    masks2 = jnp.concatenate([batch["masks"]] * 2)

    # jit the one-off conditioning computations too: eager op-by-op execution
    # through the device tunnel costs a round-trip per op and never finishes.
    tokens2 = jax.jit(lambda: m.controlnet.apply(
        cn_vars, camera2, text2, bboxes2, classes2, masks2,
        method=BEVControlNet.assemble_tokens))()
    print("tokens ready", flush=True)
    cond_feat2 = jax.jit(lambda: m.controlnet.apply(
        cn_vars, map2, method=BEVControlNet.embed_map))()
    print("cond_feat ready", flush=True)

    @jax.jit
    def cn_step(lat2):
        return m.controlnet.apply(
            cn_vars, lat2, t2, camera2, text2, map2, bboxes2, classes2,
            masks2, tokens=tokens2, cond_feat=cond_feat2)

    down_res, mid_res, _ = cn_step(lat2)

    @jax.jit
    def unet_step(lat2, down_res, mid_res):
        eps = m.unet.apply(
            params["unet"], rearrange(lat2, "b n h w c -> (b n) h w c"),
            repeat(t2, "b -> (b n)", n=N),
            rearrange(tokens2, "b n l c -> (b n) l c"),
            down_block_additional_residuals=down_res,
            mid_block_additional_residual=mid_res)
        return rearrange(eps, "(b n) h w c -> b n h w c", n=N)

    @jax.jit
    def vae_decode(x):
        img = m.vae.apply(params["vae"],
                          rearrange(x, "b n h w c -> (b n) h w c"),
                          method=AutoencoderKL.decode)
        return rearrange(img, "(b n) h w c -> b n h w c", n=N)

    x1 = jnp.zeros((B, N, H, W, 4), dtype)

    print(f"B={B} CFG-batch={2*B} views={N} latent={H}x{W} "
          f"batched_neighbors={batched_nb}", flush=True)
    t_cn = timeit(cn_step, lat2, name="controlnet fwd (2B)")
    t_unet = timeit(unet_step, lat2, down_res, mid_res, name="unet fwd (2B*6)")
    t_vae = timeit(vae_decode, x1, iters=3, name="vae decode (B*6)")

    steps = preset.pipeline.num_inference_steps
    total = steps * (t_cn + t_unet) + t_vae
    print(f"\nimplied: {steps}*(cn+unet) + vae = {total:.2f} s "
          f"-> {B / total:.3f} frames/s (sampler/CFG overhead excluded)")
    print(f"shares: cn {steps*t_cn/total:.1%}  unet {steps*t_unet/total:.1%}  "
          f"vae {t_vae/total:.1%}")


if __name__ == "__main__":
    main()
