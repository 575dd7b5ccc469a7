#!/usr/bin/env python
"""Offline BEV-mask cache builder (ref:tools/prepare_map_aux.py).

    python tools/prepare_cache.py --dataroot data/nuscenes --out cache.h5 \
        [--version v1.0-trainval]
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--workers", type=int, default=max(os.cpu_count() - 1, 0),
                   help="parallel rasterization workers (0 = sequential)")
    args = p.parse_args(argv)

    from magicdrive_tpu.config.loader import compose
    from magicdrive_tpu.data.cache import build_cache
    from magicdrive_tpu.data.map_raster import BEVRasterizer
    from magicdrive_tpu.data.nuscenes import NuScenesIndex

    dc = compose(os.path.join(REPO, "configs"))["dataset"]
    index = NuScenesIndex(args.dataroot, args.version,
                          classes=tuple(dc["object_classes"]))
    ras = BEVRasterizer(
        args.dataroot, xbound=tuple(dc["map_bound"]["x"]),
        ybound=tuple(dc["map_bound"]["y"]),
        classes=tuple(dc["map_classes"]),
        object_classes=tuple(dc["object_classes"]),
        aux_data=tuple(dc["aux_data"]), backend="auto")
    build_cache(index, ras, args.out, workers=args.workers)
    print(f"cache written: {args.out}")


if __name__ == "__main__":
    main()
