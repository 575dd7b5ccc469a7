#!/usr/bin/env python
"""Distributed val-set synthesis for FID / perception eval
(ref:perception/data_prepare/val_set_gen.py).

Shards the val split across hosts (jax process index), generates every
sample's 6 views, and saves per-view PNGs named after the nuScenes filename
stem + ``_gen{i}`` so the FID pairing tool can match them
(ref:val_set_gen.py:29-43). Single-host: just run it; multi-host: launch one
process per host after ``jax.distributed.initialize()``
(--multihost).
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
    p.add_argument("--out", required=True)
    p.add_argument("--times", type=int, default=1,
                   help="generations per sample (suffix _gen{i})")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--multihost", action="store_true")
    p.add_argument("overrides", nargs="*")
    args = p.parse_args(argv)

    import jax

    if args.multihost:
        jax.distributed.initialize()

    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from magicdrive_tpu.config.loader import compose, load_run_overrides
    from magicdrive_tpu.config.presets import preset_from_config
    from magicdrive_tpu.data.collate import CollateConfig
    from magicdrive_tpu.data.loader import DataLoader, shard_for_process
    from magicdrive_tpu.data.nuscenes import ListSetWrapper
    from magicdrive_tpu.pipeline.pipeline import MagicDrivePipeline
    from magicdrive_tpu.utils.serialization import load_params
    from tools.train import build_datasets

    replay = load_run_overrides(args.run_dir)
    cfg = compose(os.path.join(REPO, "configs"),
                  overrides=replay + list(args.overrides))
    preset = preset_from_config(cfg)
    modules = preset.modules(dtype=jnp.bfloat16)
    params = load_params(os.path.join(args.run_dir, "weights"))
    pipe = MagicDrivePipeline(modules, params, preset.pipeline)

    _, val_ds = build_datasets(cfg)
    # shard samples across hosts (the accelerate-dataloader analogue)
    my_ids = shard_for_process(range(len(val_ds)), jax.process_index(),
                               jax.process_count())
    ds = ListSetWrapper(val_ds, my_ids)
    ccfg = CollateConfig(
        template=cfg["dataset"]["template"],
        bbox_mode=cfg["model"]["bbox_mode"],
        bbox_max_len=cfg["runner"]["bbox_max_length"],
        canvas_hw=tuple(cfg["dataset"]["image_size"]), is_train=False)
    loader = DataLoader(ds, batch_size=args.batch_size, cfg=ccfg,
                        shuffle=False, drop_last=False,
                        num_workers=cfg["runner"]["num_workers"])

    os.makedirs(args.out, exist_ok=True)
    done = 0
    for bi, batch_np in enumerate(loader):
        metas = [ds[done + j]["metas"] for j in
                 range(len(batch_np["bev_map"]))]
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()
                 if k != "pixel_values"}
        for rep in range(args.times):
            key = jax.random.fold_in(
                jax.random.PRNGKey(args.seed + rep),
                bi * 100000 + jax.process_index())
            imgs = np.asarray(pipe(batch, key=key))
            for b, meta in enumerate(metas):
                for v, fname in enumerate(meta["filename"]):
                    stem = os.path.splitext(os.path.basename(fname))[0]
                    arr = (np.clip(imgs[b, v], 0, 1) * 255).astype(np.uint8)
                    Image.fromarray(arr).save(
                        os.path.join(args.out, f"{stem}_gen{rep}.png"))
        done += len(metas)
        print(f"[host {jax.process_index()}] {done}/{len(ds)}")
    return args.out


if __name__ == "__main__":
    main()
