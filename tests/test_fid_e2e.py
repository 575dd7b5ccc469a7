"""End-to-end FID harness over synthetic trees (VERDICT r1 item 4).

Exercises the full token-paired FID flow the reference runs in
``tools/fid_score.py cfg`` mode (ref:fid_score.py:297-338,475-482): a
synthetic on-disk mini-nuScenes (the test_nuscenes fixture), a generated
tree named after the nuScenes filename stems + ``_gen0``, a random-weight
Inception (the released pt_inception weights are not in this image), the
train-preproc top-center-crop on real images, and the Fréchet math.
"""
import os

import numpy as np
import pytest
from PIL import Image

from magicdrive_tpu.data.nuscenes import NuScenesIndex
from magicdrive_tpu.eval.fid import pair_real_generated, top_center_crop

from test_nuscenes import mini_nuscenes  # noqa: F401  (fixture reuse)


@pytest.fixture(scope="module")
def gen_tree(mini_nuscenes, tmp_path_factory):  # noqa: F811
    root, version = mini_nuscenes
    index = NuScenesIndex(root, version)
    gen_root = tmp_path_factory.mktemp("generated")
    rng = np.random.default_rng(7)
    n = 0
    for info in index.infos:
        for path in info.image_paths:
            stem = os.path.splitext(os.path.basename(path))[0]
            img = rng.integers(0, 255, (224, 400, 3), np.uint8)
            Image.fromarray(img).save(gen_root / f"{stem}_gen0.png")
            n += 1
    return str(gen_root), n


def test_pairing(mini_nuscenes, gen_tree):  # noqa: F811
    root, version = mini_nuscenes
    gen_root, n_gen = gen_tree
    index = NuScenesIndex(root, version)
    real, gen = pair_real_generated(index, gen_root)
    # the mini fixture reuses one file per camera across samples, so pairs
    # collapse to the 6 distinct stems repeated per sample
    assert len(real) == len(gen) == n_gen
    for r, g in zip(real, gen):
        r_stem = os.path.splitext(os.path.basename(r))[0]
        g_stem = os.path.splitext(os.path.basename(g))[0]
        assert g_stem == r_stem + "_gen0"
        assert os.path.exists(r) and os.path.exists(g)
    # subsample halves the sample list (step 2 over 3 samples -> 2 samples)
    real_s, _ = pair_real_generated(index, gen_root, subsample_ratio=0.5)
    assert len(real_s) == 2 * len(index.infos[0].image_paths)


def test_top_center_crop_geometry():
    img = Image.fromarray(np.zeros((900, 1600, 3), np.uint8))
    out = top_center_crop(img)
    # resize to (896, 1600) then crop 4 rows off the top
    # (ref:fid_score.py:361-368 with back_resize/back_pad from
    # configs/dataset/Nuscenes.yaml:35-36)
    assert out.size == (1600, 892)


@pytest.mark.slow  # InceptionV3 forwards on CPU
def test_token_paired_fid_end_to_end(mini_nuscenes, gen_tree):  # noqa: F811
    root, version = mini_nuscenes
    gen_root, _ = gen_tree
    import tools.fid as fid_tool

    args = ["tokens", "--dataroot", root, "--version", version,
            "--gen_root", gen_root, "--batch_size", "6"]
    fid = fid_tool.main(args)
    assert np.isfinite(fid) and fid > 0
    # deterministic: random-weight Inception is seeded, files are fixed
    assert fid_tool.main(args) == fid
    # the top-center-crop preprocessing on real images matters
    fid_nocrop = fid_tool.main(args + ["--no_crop"])
    assert np.isfinite(fid_nocrop)
    assert fid_nocrop != fid


@pytest.mark.slow
def test_paths_mode_identical_dirs_near_zero(gen_tree):
    gen_root, _ = gen_tree
    import tools.fid as fid_tool

    fid = fid_tool.main(["paths", gen_root, gen_root, "--batch_size", "6",
                         "--no_crop"])
    assert abs(fid) < 0.5
