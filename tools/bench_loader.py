"""Host input-pipeline throughput: can the loader feed the chip?

Measures sustained samples/s of the full host path — h5 BEV-cache read +
6x JPEG decode (900x1600) + ImageAug resize/crop to 224x400 + box
canvas-filtering + collate — through ``data.loader.DataLoader``, swept over
num_workers, and compares against the train step's consumption rate
(PERFORMANCE.md round 5g: up to 8.93 samples/s/chip device-sustained
at bs=4, 224x400).
The reference's analogue is torch DataLoader worker processes
(ref:magicdrive/runner/base_runner.py:116-146). VERDICT r4 weak #3.

Uses the synthetic mini-nuScenes (data/synth.py) with a DISTINCT JPEG per
(sample, camera) so decode work is not amortized by the page cache the way
a single shared file would be.

Usage: python tools/bench_loader.py [--samples N] [--batch 3] [--epochs 2]
                                    [--workers 1,2,4,8] [--demand 8.93]
Prints one JSON line per worker count + a final verdict line.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from magicdrive_tpu.data.cache import BEVCache, build_cache
from magicdrive_tpu.data.collate import CollateConfig
from magicdrive_tpu.data.loader import DataLoader
from magicdrive_tpu.data.map_raster import BEVRasterizer
from magicdrive_tpu.data.nuscenes import (
    ImageAugConfig, NuScenesDataset, NuScenesIndex,
)
from magicdrive_tpu.data.synth import make_mini_nuscenes

OBJECT_CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone")
AUX = ("visibility", "center_offset", "center_ohw", "height")


def build_tree(root: str, n_samples: int):
    make_mini_nuscenes(root, n_samples=n_samples, n_boxes=12,
                       images_per_sample=True)
    idx = NuScenesIndex(root, "v1.0-mini")
    ras = BEVRasterizer(root, object_classes=OBJECT_CLASSES, aux_data=AUX)
    cache_path = build_cache(idx, ras, os.path.join(root, "cache.h5"),
                             progress=False)
    return idx, cache_path


def measure(idx, cache_path, batch_size: int, num_workers: int,
            epochs: int) -> dict:
    cache = BEVCache(cache_path, n_map_classes=8,
                     n_object_classes=len(OBJECT_CLASSES))
    ds = NuScenesDataset(idx, cache=cache,
                         aug=ImageAugConfig(final_hw=(224, 400)))
    ccfg = CollateConfig(bbox_max_len=80, canvas_hw=(224, 400),
                         is_train=True)
    loader = DataLoader(ds, batch_size=batch_size, cfg=ccfg, shuffle=True,
                        num_workers=num_workers, prefetch=4)
    # warmup epoch (thread pool spin-up, h5 first-touch, page cache)
    for _ in loader:
        pass
    n = 0
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in loader:
            n += batch["pixel_values"].shape[0]
    dt = time.perf_counter() - t0
    cache.close()
    return {"num_workers": num_workers, "samples_per_s": round(n / dt, 2),
            "batches": n // batch_size, "wall_s": round(dt, 2)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=48)
    ap.add_argument("--batch", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--workers", default="1,2,4,8")
    ap.add_argument("--demand", type=float, default=8.93,
                    help="chip consumption, samples/s (train step bs=3)")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        idx, cache_path = build_tree(root, args.samples)
        print(f"# built {args.samples}-sample tree + cache in "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
        best = None
        for w in [int(x) for x in args.workers.split(",")]:
            row = measure(idx, cache_path, args.batch, w, args.epochs)
            print(json.dumps(row))
            if best is None or row["samples_per_s"] > best["samples_per_s"]:
                best = row
    verdict = {
        "metric": "loader_samples_per_s", "value": best["samples_per_s"],
        "unit": "samples/s", "num_workers": best["num_workers"],
        "chip_demand": args.demand,
        "feeds_chip": best["samples_per_s"] >= args.demand,
        "headroom_x": round(best["samples_per_s"] / args.demand, 2),
    }
    print(json.dumps(verdict))


if __name__ == "__main__":
    main()
