"""16-frame multi-view video clip throughput on the attached TPU
(BASELINE.json config 5).

One jitted call: 20-step CFG denoise over (2*16*6 = 192)-image batches with
temporal + cross-view attention, then VAE decode of 96 images. Zero
device-side params (timing is data-independent).

Usage: python tools/bench_video.py [frames]
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


def main():
    from magicdrive_tpu.config.presets import (
        sd15mv_rawbox_video_16f, init_params)
    from magicdrive_tpu.pipeline.video import VideoPipeline
    from magicdrive_tpu.data.collate import CollateConfig, collate_fn
    from magicdrive_tpu.data.fixtures import make_dataset

    F = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    preset = sd15mv_rawbox_video_16f()
    if F != 16:
        import dataclasses

        preset = dataclasses.replace(
            preset, unet=dataclasses.replace(preset.unet, temporal_frames=F))
    modules = preset.modules(dtype=jnp.bfloat16)

    shapes = jax.eval_shape(lambda: init_params(
        preset, modules, jax.random.PRNGKey(0)))
    params = jax.jit(lambda: jax.tree.map(
        lambda s: jnp.zeros(
            s.shape, jnp.bfloat16
            if jnp.issubdtype(s.dtype, jnp.floating) else s.dtype),
        shapes))()

    pipe = VideoPipeline(modules, params, preset.pipeline, n_frames=F)
    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size, is_train=False)
    batch = {k: jnp.asarray(v) for k, v in
             collate_fn(make_dataset(F), ccfg).items()}
    batch.pop("pixel_values", None)

    t0 = time.time()
    out = pipe(batch, key=jax.random.PRNGKey(42))
    np.asarray(out[0, 0, :2, :2, 0])
    print(f"compile+first clip: {time.time() - t0:.1f}s", flush=True)

    iters = 3
    t0 = time.perf_counter()
    for i in range(iters):
        out = pipe(batch, key=jax.random.fold_in(jax.random.PRNGKey(1), i))
    np.asarray(out[0, 0, :2, :2, 0])
    dt = (time.perf_counter() - t0) / iters
    print(f"F={F} 6-view 224x400 video: {dt:.1f} s/clip "
          f"= {F * 6 / dt:.2f} images/s", flush=True)


if __name__ == "__main__":
    main()
