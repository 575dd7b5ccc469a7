#!/usr/bin/env python
"""Demo generation without nuScenes (ref:demo/run.py + run_cond_on_view.py).

Runs the flagship (or tiny) model on bundled synthetic fixtures:

    python tools/demo.py                      # 6-view generation
    python tools/demo.py --given_view 1       # keep view 1, generate rest
    python tools/demo.py --tiny --steps 4     # CPU-runnable smoke

Outputs contact sheets + BEV map renders under --out.
"""
from __future__ import annotations

import argparse
import dataclasses
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="demo_out")
    p.add_argument("--weights", default=None,
                   help="exported weights dir (random init if omitted)")
    p.add_argument("--tiny", action="store_true")
    p.add_argument("--steps", type=int, default=None)
    p.add_argument("--n_samples", type=int, default=2)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--given_view", type=int, default=None,
                   help="condition on this view's GT image")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from magicdrive_tpu.config.presets import (
        init_params, sd15mv_rawbox_224x400, tiny_debug,
    )
    from magicdrive_tpu.data.collate import CollateConfig, collate_fn
    from magicdrive_tpu.data.fixtures import (
        MAP_CLASSES, OBJECT_CLASSES, make_dataset,
    )
    from magicdrive_tpu.pipeline.given_view import GivenViewPipeline
    from magicdrive_tpu.utils.serialization import load_params
    from magicdrive_tpu.viz import concat_6_views, visualize_map

    preset = tiny_debug() if args.tiny else sd15mv_rawbox_224x400()
    if args.steps:
        preset = dataclasses.replace(
            preset, pipeline=dataclasses.replace(
                preset.pipeline, num_inference_steps=args.steps))
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    modules = preset.modules(dtype=dtype)
    params = load_params(args.weights) if args.weights else init_params(
        preset, modules, jax.random.PRNGKey(0))
    pipe = GivenViewPipeline(modules, params, preset.pipeline)

    os.makedirs(args.out, exist_ok=True)
    ccfg = CollateConfig(bbox_max_len=preset.bbox_max_len,
                         canvas_hw=preset.image_size, is_train=False)
    samples = make_dataset(args.n_samples, image_hw=preset.image_size,
                           map_hw=preset.map_hw,
                           map_channels=preset.map_channels)
    for i, sample in enumerate(samples):
        batch_np = collate_fn([sample], ccfg)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()
                 if k != "pixel_values"}
        kwargs = {}
        if args.given_view is not None:
            px = jnp.asarray(batch_np["pixel_values"])
            kwargs["given_latents"] = pipe.encode_views(px)
            vm = np.zeros(preset.pipeline.n_cam, np.float32)
            vm[args.given_view] = 1.0
            kwargs["view_mask"] = vm
        imgs = np.asarray(pipe(batch, key=jax.random.PRNGKey(args.seed + i),
                               **kwargs))
        sheet = concat_6_views(imgs[0])
        Image.fromarray((np.clip(sheet, 0, 1) * 255).astype(np.uint8)).save(
            os.path.join(args.out, f"sample{i}_gen.png"))
        Image.fromarray(visualize_map(
            sample["bev_map"], MAP_CLASSES, OBJECT_CLASSES)).save(
            os.path.join(args.out, f"sample{i}_map.png"))
        print(f"sample {i} -> {args.out}")
    return args.out


if __name__ == "__main__":
    main()
