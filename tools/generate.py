#!/usr/bin/env python
"""Batch generation from a trained run (ref:tools/test.py).

    python tools/generate.py --run_dir RUNS/xxx [--out OUT] [overrides...]

Recomposes the run's saved config + overrides (config replay,
ref:tools/test.py:46-56), loads the exported weights, generates the
validation samples with map/box overlays.
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True)
    p.add_argument("--out", default=None)
    p.add_argument("--indices", type=int, nargs="*", default=None)
    p.add_argument("--seed", type=int, default=None,
                   help="override cfg seed")
    p.add_argument("--times", type=int, default=None,
                   help="variants per sample (default: runner.validation_times)")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from magicdrive_tpu.config.loader import (
        compose, load_run_overrides, save_run_config,
    )
    from magicdrive_tpu.config.presets import preset_from_config
    from magicdrive_tpu.data.collate import CollateConfig, collate_fn
    from magicdrive_tpu.pipeline.pipeline import MagicDrivePipeline
    from magicdrive_tpu.utils.serialization import load_params
    from magicdrive_tpu.viz import concat_6_views, visualize_map
    from magicdrive_tpu.viz.box_viz import draw_boxes_on_views
    from tools.train import build_datasets

    replay = load_run_overrides(args.run_dir)
    cfg = compose(os.path.join(REPO, "configs"),
                  overrides=replay + list(args.overrides))
    out_dir = args.out or os.path.join(args.run_dir, "generated")
    os.makedirs(out_dir, exist_ok=True)
    save_run_config(cfg, out_dir, replay + list(args.overrides))

    preset = preset_from_config(cfg)
    modules = preset.modules(dtype=jnp.bfloat16)
    params = load_params(os.path.join(args.run_dir, "weights"))
    pipe = MagicDrivePipeline(modules, params, preset.pipeline)

    _, val_ds = build_datasets(cfg)
    indices = args.indices if args.indices is not None else \
        cfg["runner"]["validation_index"]
    ccfg = CollateConfig(
        template=cfg["dataset"]["template"],
        bbox_mode=cfg["model"]["bbox_mode"],
        bbox_max_len=cfg["runner"]["bbox_max_length"],
        canvas_hw=tuple(cfg["dataset"]["image_size"]), is_train=False)

    # Seed policy (ref:misc/test_utils.py:191-255 + configs/config.yaml
    # fix_seed_within_batch): one global key seeds every batch; with
    # fix_seed_within_batch all samples in the batch share the SAME initial
    # noise, otherwise each sample draws its own.
    seed = args.seed if args.seed is not None else cfg.get("seed")
    fix_within = bool(cfg.get("fix_seed_within_batch", False))
    times = args.times if args.times is not None else \
        int(cfg["runner"].get("validation_times", 1))

    samples = [val_ds[i] for i in indices]
    batch = collate_fn(samples, ccfg)
    batch = {k: jnp.asarray(v) for k, v in batch.items()
             if k != "pixel_values"}
    B = len(indices)
    global_key = jax.random.PRNGKey(0 if seed is None else seed)

    for ti in range(times):
        key_t = jax.random.fold_in(global_key, ti)
        latents = pipe.prepare_latents(key_t, B,
                                       fix_seed_within_batch=fix_within)
        imgs = np.asarray(pipe(batch, latents=latents))
        suffix = f"_t{ti}" if times > 1 else ""
        for bi, i in enumerate(indices):
            sample = samples[bi]
            gen = concat_6_views(imgs[bi], oneline=True)
            rows = [gen]
            if cfg["runner"].get("validation_show_box"):
                boxed = draw_boxes_on_views(
                    imgs[bi], np.asarray(sample["boxes"]),
                    np.asarray(sample["labels"]),
                    np.asarray(sample["lidar2image"]),
                    np.asarray(sample["img_aug_matrix"]),
                    classes=cfg["dataset"]["object_classes"]) / 255.0
                rows.append(concat_6_views(boxed, oneline=True))
            grid = np.concatenate(rows, axis=0)
            Image.fromarray(
                (np.clip(grid, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(out_dir, f"{i}_gen{suffix}.png"))
            if ti == 0:
                mp = visualize_map(sample["bev_map"],
                                   cfg["dataset"]["map_classes"],
                                   cfg["dataset"]["object_classes"])
                Image.fromarray(mp).save(
                    os.path.join(out_dir, f"{i}_map.png"))
            print(f"generated {i}{suffix} -> {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
