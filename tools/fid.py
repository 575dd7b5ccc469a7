#!/usr/bin/env python
"""FID evaluation CLI (ref:tools/fid_score.py).

Two modes, like the reference (ref:fid_score.py:489-498):

    # classic two-directory FID
    python tools/fid.py paths REAL_DIR GEN_DIR [--weights pt_inception.pth]

    # nuScenes-paired FID: real/generated matched per token x camera
    python tools/fid.py tokens --dataroot data/nuscenes --gen_root OUT \
        [--version v1.0-trainval] [--subsample 1.0]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main(argv=None):
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="mode", required=True)
    pp = sub.add_parser("paths")
    pp.add_argument("real")
    pp.add_argument("gen")
    pt = sub.add_parser("tokens")
    pt.add_argument("--dataroot", required=True)
    pt.add_argument("--gen_root", required=True)
    pt.add_argument("--version", default="v1.0-trainval")
    pt.add_argument("--subsample", type=float, default=1.0)
    for q in (pp, pt):
        q.add_argument("--weights", default=None,
                       help="pt_inception-2015-12-05 state dict")
        q.add_argument("--batch_size", type=int, default=32)
        q.add_argument("--no_crop", action="store_true",
                       help="skip train-preproc crop on real images")
    args = p.parse_args(argv)

    from magicdrive_tpu.eval.fid import (
        ActivationExtractor, activation_statistics,
        calculate_frechet_distance, fid_between_paths, list_images,
        pair_real_generated, top_center_crop,
    )

    real_tf = None if args.no_crop else functools.partial(top_center_crop)

    if args.mode == "paths":
        fid = fid_between_paths(args.real, args.gen, args.weights,
                                args.batch_size, real_transform=real_tf)
    else:
        from magicdrive_tpu.data.nuscenes import NuScenesIndex

        index = NuScenesIndex(args.dataroot, args.version)
        real_files, gen_files = pair_real_generated(
            index, args.gen_root, subsample_ratio=args.subsample)
        print(f"paired {len(real_files)} real/generated images")
        ext = ActivationExtractor(args.weights, args.batch_size)
        mu1, s1 = activation_statistics(
            ext.from_files(real_files, transform=real_tf))
        mu2, s2 = activation_statistics(ext.from_files(gen_files))
        fid = calculate_frechet_distance(mu1, s1, mu2, s2)
    print(f"FID: {fid}")
    return fid


if __name__ == "__main__":
    main()
