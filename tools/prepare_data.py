#!/usr/bin/env python
"""nuScenes index builder (ref:tools/create_data.py + nuscenes_converter.py).

The TPU framework reads the v1.0 JSON tables directly; this tool just
prebuilds and pickles the per-frame index for fast startup:

    python tools/prepare_data.py --dataroot data/nuscenes \
        --version v1.0-trainval --out data/nuscenes_index.pkl
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
    p.add_argument("--version", default="v1.0-trainval")
    p.add_argument("--out", required=True)
    args = p.parse_args(argv)

    from magicdrive_tpu.data.nuscenes import NuScenesIndex

    index = NuScenesIndex(args.dataroot, args.version)
    index.save(args.out)
    print(f"indexed {len(index.infos)} samples -> {args.out}")


if __name__ == "__main__":
    main()
