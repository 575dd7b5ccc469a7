#!/usr/bin/env python
"""Training entry point (ref:tools/train.py).

    python tools/train.py [exp=224x400] [runner=debug] [key=value ...]

Overrides use the config-loader syntax (Hydra-style). The composed config +
overrides are persisted to the run dir for exact inference-time replay
(ref:tools/test.py:46-56).
"""
from __future__ import annotations

import datetime
import logging
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def build_datasets(cfg, tokenizer=None):
    """nuScenes when configured and present; synthetic fixtures otherwise
    (the reference's debug-with-demo-data path, SURVEY.md §4)."""
    dc = cfg["dataset"]
    root = dc["dataset_root"]
    if os.path.isdir(os.path.join(root, dc.get("version", ""))):
        from magicdrive_tpu.data.cache import BEVCache
        from magicdrive_tpu.data.map_raster import BEVRasterizer
        from magicdrive_tpu.data.nuscenes import (
            ImageAugConfig, NuScenesDataset, NuScenesIndex,
        )

        index = NuScenesIndex(root, dc["version"],
                              classes=tuple(dc["object_classes"]))
        ras, cache = None, None
        if dc["cache_file"]["train"]:
            cache = BEVCache(dc["cache_file"]["train"],
                             n_map_classes=len(dc["map_classes"]),
                             n_object_classes=len(dc["object_classes"]))
        else:
            ras = BEVRasterizer(
                root, xbound=tuple(dc["map_bound"]["x"]),
                ybound=tuple(dc["map_bound"]["y"]),
                classes=tuple(dc["map_classes"]),
                object_classes=tuple(dc["object_classes"]),
                aux_data=tuple(dc["aux_data"]), backend="auto")
        aug = ImageAugConfig(final_hw=tuple(dc["image_size"]),
                             resize_lim=tuple(dc["augment2d"]["resize"]))
        train = NuScenesDataset(index, rasterizer=ras, cache=cache, aug=aug,
                                force_all_boxes=dc["force_all_boxes"])
        return train, train  # val uses validation_index into the same split
    logging.warning("nuScenes root %s not found — synthetic fixtures", root)
    from magicdrive_tpu.data.fixtures import make_dataset

    H, W = cfg["dataset"]["image_size"]
    n_map = cfg["model"]["controlnet"]["map_size"][0]
    mh, mw = cfg["model"]["controlnet"]["map_size"][1:]
    ds = make_dataset(32, image_hw=(H, W), map_hw=(mh, mw),
                      map_channels=n_map)
    return ds, ds


def main(argv=None):
    import jax.numpy as jnp

    from magicdrive_tpu.config.loader import compose, save_run_config
    from magicdrive_tpu.config.presets import preset_from_config
    from magicdrive_tpu.train.runner import Runner

    overrides = list(argv if argv is not None else sys.argv[1:])
    cfg = compose(os.path.join(REPO, "configs"), overrides=overrides)

    stamp = datetime.datetime.now().strftime("%Y-%m-%d_%H-%M")
    run_dir = os.path.join(cfg["log_root_prefix"],
                           f"{cfg['task_id']}_{stamp}")
    os.makedirs(run_dir, exist_ok=True)
    logging.basicConfig(
        level=logging.DEBUG if cfg.get("debug") else logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
        handlers=[logging.StreamHandler(),
                  logging.FileHandler(os.path.join(run_dir, "train.log"))])

    preset = preset_from_config(cfg)
    dtype = jnp.bfloat16 if cfg["runner"]["mixed_precision"] == "bf16" \
        else jnp.float32
    modules = preset.modules(dtype=dtype)
    train_ds, val_ds = build_datasets(cfg)
    runner = Runner(cfg, preset, modules, train_ds, val_dataset=val_ds,
                    run_dir=run_dir)
    # AFTER Runner.__init__: it applies config-driven trace-time env (e.g.
    # pair_bwd), and the persisted perf-knob snapshot must record what the
    # run actually compiles with (round-5 review finding: saving before
    # Runner recorded pair_bwd='free' while the run trained 'serial').
    save_run_config(cfg, run_dir, overrides)
    if cfg.get("validation_only"):
        # run the validator against current (resumed or fresh) weights and
        # exit (ref:base_runner.py:319-326 validation_only / try_run flags)
        state = runner.init_state()
        if runner.ckpt.latest_step() is not None:
            state = runner.ckpt.restore(state)
        runner.validator.validate(state.params, runner.logger,
                                  int(state.step), run_dir)
        logging.info("validation_only done; run dir: %s", run_dir)
        return run_dir
    state = runner.run(resume=cfg.get("resume_from_checkpoint") is not None)
    logging.info("done at step %d; run dir: %s", int(state.step), run_dir)
    return run_dir


if __name__ == "__main__":
    main()
