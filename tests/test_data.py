import numpy as np

from magicdrive_tpu.data.bbox import (
    corners_from_boxes, transform_points, project_to_image, visible_mask_3d,
)
from magicdrive_tpu.data.collate import CollateConfig, collate_fn
from magicdrive_tpu.data.fixtures import make_dataset, make_sample
from magicdrive_tpu.data.caption import (
    HashTokenizer, tokenize_captions, DEFAULT_TEMPLATE,
)


def test_corners_axis_aligned_box():
    # unit cube centered at origin-bottom: x,y centered, z from 0
    boxes = np.array([[0, 0, 0, 2, 4, 3, 0]], np.float64)
    c = corners_from_boxes(boxes)
    assert c.shape == (1, 8, 3)
    assert np.allclose(sorted(np.unique(c[0, :, 0])), [-1, 1])
    assert np.allclose(sorted(np.unique(c[0, :, 1])), [-2, 2])
    assert np.allclose(sorted(np.unique(c[0, :, 2])), [0, 3])
    # mmdet3d corner order: first corner is (x0, y0, z0)
    assert np.allclose(c[0, 0], [-1, -2, 0])
    assert np.allclose(c[0, 6], [1, -2, 3])  # (x1, y0, z1)


def test_corners_yaw_rotation():
    boxes = np.array([[5, 0, 0, 2, 4, 3, np.pi / 2]], np.float64)
    c = corners_from_boxes(boxes)
    # after +90° CCW: x-extent becomes y-extent
    assert np.allclose(sorted(np.unique(np.round(c[0, :, 0], 6))), [3, 7])
    assert np.allclose(sorted(np.unique(np.round(c[0, :, 1], 6))), [-1, 1])


def test_visibility_front_camera():
    s = make_sample(0)
    # box straight ahead (+x) must be visible in CAM_FRONT (view 1),
    # invisible in CAM_BACK (view 4)
    boxes = np.array([[10, 0, 0, 2, 4, 2, 0]], np.float64)
    c = corners_from_boxes(boxes)
    assert visible_mask_3d(c, s["lidar2camera"][1])[0]
    assert not visible_mask_3d(c, s["lidar2camera"][4])[0]


def test_projection_center():
    s = make_sample(0)
    # point straight ahead projects near the image center of CAM_FRONT
    pt = np.array([[[20.0, 0.0, 1.6]]])
    uv = project_to_image(pt, s["lidar2image"][1])
    assert uv[0, 0, 2] == 1.0  # positive depth
    assert abs(uv[0, 0, 0] - 200) < 30 and abs(uv[0, 0, 1] - 112) < 30


def test_collate_shapes_static():
    cfg = CollateConfig(bbox_max_len=16, is_train=True)
    batch = collate_fn(make_dataset(2), cfg, rng=np.random.default_rng(0))
    assert batch["pixel_values"].shape == (2, 6, 224, 400, 3)
    assert batch["bev_map"].shape == (2, 200, 200, 8)
    assert batch["camera_param"].shape == (2, 6, 3, 7)
    assert batch["input_ids"].shape == (2, 77)
    assert batch["uncond_ids"].shape == (1, 77)
    assert batch["bboxes"].shape == (2, 6, 16, 8, 3)
    assert batch["classes"].shape == (2, 6, 16)
    assert batch["masks"].shape == (2, 6, 16)
    # every view sees some but not all boxes
    per_view = batch["masks"].sum(-1)
    assert (per_view > 0).all()
    # padded slots carry class -1
    assert (batch["classes"][batch["masks"] == 0] == -1).all()


def test_collate_view_shared():
    cfg = CollateConfig(bbox_max_len=32, bbox_view_shared=True, is_train=False)
    batch = collate_fn(make_dataset(1), cfg)
    assert batch["bboxes"].shape[1] == 1
    assert batch["masks"][0, 0].sum() == 24  # all boxes, unfiltered


def test_camera_param_layout():
    s = make_sample(3)
    batch = collate_fn([s], CollateConfig())
    K = s["camera_intrinsics"][0, :3, :3]
    c2l = s["camera2lidar"][0, :3, :4]
    np.testing.assert_allclose(batch["camera_param"][0, 0, :, :3], K, rtol=1e-6)
    np.testing.assert_allclose(batch["camera_param"][0, 0, :, 3:], c2l,
                               rtol=1e-6)


def test_tokenize_captions():
    tok = HashTokenizer()
    ids, uncond = tokenize_captions(
        [{"location": "boston", "description": "rain"}], tok)
    assert ids.shape == (1, 77) and uncond.shape == (1, 77)
    assert ids[0, 0] == 49406  # BOS
    # deterministic
    ids2, _ = tokenize_captions(
        [{"location": "boston", "description": "rain"}], tok)
    assert (ids == ids2).all()


def test_object_range_filter():
    import numpy as np

    from magicdrive_tpu.data.bbox import limit_yaw, object_range_filter

    sample = {
        "boxes": np.array([[0.0, 0.0, 0, 1, 1, 1, 7.0],
                           [60.0, 0.0, 0, 1, 1, 1, 0.1],
                           [-10.0, -60.0, 0, 1, 1, 1, -4.0]]),
        "labels": np.array([0, 1, 2]),
        "visibility": np.array([4, 3, 2]),
    }
    out = object_range_filter(sample, [-51.2, -51.2, -5, 51.2, 51.2, 3])
    assert len(out["boxes"]) == 1 and out["labels"].tolist() == [0]
    assert out["visibility"].tolist() == [4]
    # yaw wrapped into [-pi, pi)
    assert -np.pi <= out["boxes"][0, 6] < np.pi
    wrapped = limit_yaw(np.array([[0, 0, 0, 1, 1, 1, 3 * np.pi]]))
    assert abs(wrapped[0, 6] - np.pi) < 1e-9 or abs(
        wrapped[0, 6] + np.pi) < 1e-9


def _make_clip_vocab(tmp_path):
    """Synthetic vocab.json + merges.txt in the CLIP file layout."""
    import json

    from magicdrive_tpu.data.bpe import bytes_to_unicode

    base = list(bytes_to_unicode().values())
    vocab = []
    vocab.extend(base)                       # bare symbols
    vocab.extend(t + "</w>" for t in base)   # end-of-word symbols
    merges = [
        "d r", "dr i", "dri v", "driv i", "drivi n", "drivin g</w>",
        "s c", "sc e", "sce n", "scen e</w>",
        "a</w> t</w>",  # never applicable (pairs are intra-word) — rank noise
        "i n</w>", "r a", "ra in</w>",
    ]
    vocab.extend(m.replace(" ", "") for m in merges)
    vocab.extend(["<|startoftext|>", "<|endoftext|>"])
    enc = {t: i for i, t in enumerate(vocab)}
    (tmp_path / "vocab.json").write_text(json.dumps(enc))
    (tmp_path / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(merges) + "\n")
    return tmp_path


def test_clip_bpe_matches_transformers(tmp_path):
    """Native BPE == transformers CLIPTokenizer on the same vocab files."""
    import transformers

    from magicdrive_tpu.data.caption import load_clip_tokenizer

    d = _make_clip_vocab(tmp_path)
    ours = load_clip_tokenizer(str(d))
    theirs = transformers.CLIPTokenizer(
        str(d / "vocab.json"), str(d / "merges.txt"))

    texts = [
        "A driving scene image at boston-seaport. Rain, driving in rain.",
        "",
        "Scene with  MIXED   Case & punctuation!!! 12 3",
        "driving " * 60,  # > 77 tokens: truncation framing
    ]
    got = ours(texts)
    want = theirs(texts, max_length=77, padding="max_length",
                  truncation=True, return_tensors="np").input_ids
    np.testing.assert_array_equal(got, want.astype(np.int32))
    # merges actually fired (multi-char tokens present)
    assert "driving</w>" in ours.tokenize("driving")
    assert ours.tokenize("rain") == ["rain</w>"]  # ra + in</w> then merged
    assert ours.tokenize("ruin") == ["r", "u", "in</w>"]
