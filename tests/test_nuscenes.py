"""Host data layer on a synthetic on-disk mini-nuScenes.

Builds v1.0 JSON tables + a map-expansion JSON + camera JPEGs in tmp_path,
then exercises NuScenesIndex -> NuScenesDataset -> BEVRasterizer -> cache ->
DataLoader -> collate, checking the shape/semantics contract of
SURVEY.md Appendix A.
"""
import json
import os

import numpy as np
import pytest
from PIL import Image

from magicdrive_tpu.data.cache import (
    BEVCache, build_cache, one_hot_decode, one_hot_encode,
)
from magicdrive_tpu.data.collate import CollateConfig, collate_fn
from magicdrive_tpu.data.loader import DataLoader
from magicdrive_tpu.data.map_raster import BEVRasterizer, NuScenesMapRaster
from magicdrive_tpu.data.nuscenes import (
    ImageAugConfig, NuScenesDataset, NuScenesIndex, VIEW_ORDER,
    ORI_CAMERA_ORDER, quat_to_rot,
)

LOCATION = "singapore-onenorth"
N_SAMPLES = 3


@pytest.fixture(scope="module")
def mini_nuscenes(tmp_path_factory):
    from magicdrive_tpu.data.synth import make_mini_nuscenes

    root = tmp_path_factory.mktemp("nusc")
    return make_mini_nuscenes(root)


def test_codec_roundtrip():
    rng = np.random.default_rng(0)
    masks = (rng.random((18, 50, 40)) > 0.5).astype(np.uint8)
    packed = one_hot_encode(masks)
    assert packed.dtype == np.int32
    assert (one_hot_decode(packed, 18) == masks).all()


def test_aux_masks_matches_full_canvas():
    """The bbox-cropped aux rasterization must equal the straightforward
    full-canvas-per-box implementation (the original semantics,
    ref:pipeline.py:88-174) pixel for pixel — including boxes partially or
    fully outside the canvas and overlapping boxes (later box wins)."""
    from PIL import ImageDraw

    aux_data = ("visibility", "center_offset", "center_ohw", "height")
    r = BEVRasterizer("/nonexistent", object_classes=("car",),
                      aux_data=aux_data)
    rng = np.random.default_rng(0)
    n = 12
    ctr = rng.uniform(-70, 70, (n, 3))  # some outside the +-50 m patch
    ctr[:, 2] = 0.0
    base = np.array([[0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0],
                     [1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0]],
                    np.float32) - [0.5, 0.5, 0]
    corners = np.stack([
        base * rng.uniform([3, 1.5, 1.4], [10, 2.5, 3], 3) @ np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
             [0, 0, 1]]).T + ctr[i]
        for i, a in enumerate(rng.uniform(0, 2 * np.pi, n))])
    heights = corners[:, :, 2].max(1)
    vis = rng.uniform(0, 1, n)

    got = r.aux_masks(corners, heights, vis)

    # brute-force original
    aux_ch = 8
    H, W = r.canvas_size
    aux = np.zeros((H, W, aux_ch), np.float32)
    coords = np.stack(np.meshgrid(np.arange(W), np.arange(H)),
                      -1).astype(np.float32)
    for i in range(n):
        bc = r._bottom_corners_canvas(corners[i:i + 1])[0]
        center = bc.mean(axis=0, keepdims=True)
        front = bc[2:4].mean(axis=0, keepdims=True)
        left = bc[[0, 3]].mean(axis=0, keepdims=True)
        render = Image.new("L", (W, H), 0)
        ImageDraw.Draw(render).polygon(
            bc.round().astype(np.int32).flatten().tolist(), fill=1)
        m = np.asarray(render) > 0
        aux[m, 0:1] = vis[i]
        aux[m, 1:3] = coords[m] - center
        hgt = np.linalg.norm(front - center)
        wdt = np.linalg.norm(left - center)
        v = ((front - center) / (np.linalg.norm(front - center) + 1e-6))[0]
        aux[m, 3:7] = np.array([hgt, wdt, v[0], v[1]])[None]
        aux[m, 7:8] = heights[i]
    want = aux.transpose(2, 1, 0)

    assert got.shape == want.shape == (8, W, H)
    np.testing.assert_array_equal(got, want)


def test_map_raster(mini_nuscenes):
    root, _ = mini_nuscenes
    m = NuScenesMapRaster(root, LOCATION)
    masks = m.get_map_mask((1000.0, 1000.0, 100.0, 100.0), 0.0,
                           ["drivable_area", "road_divider"], (200, 200))
    assert masks.shape == (2, 200, 200)
    assert masks[0].sum() > 100  # polygon covers the patch center area
    assert masks[1].sum() > 10   # line drawn
    # rotating the patch must rotate the content
    masks_rot = m.get_map_mask((1000.0, 1000.0, 100.0, 100.0), 90.0,
                               ["road_divider"], (200, 200))
    ys, xs = np.where(masks[1])
    ys2, xs2 = np.where(masks_rot[0])
    # horizontal line becomes vertical under 90 deg patch rotation
    assert (ys.max() - ys.min()) < (xs.max() - xs.min())
    assert (ys2.max() - ys2.min()) > (xs2.max() - xs2.min())


def test_index_and_dataset(mini_nuscenes):
    root, version = mini_nuscenes
    idx = NuScenesIndex(root, version)
    assert len(idx.infos) == N_SAMPLES
    info = idx.infos[0]
    # transforms are consistent: lidar2image == K @ lidar2camera
    assert np.allclose(info.lidar2image[0],
                       info.camera_intrinsics[0] @ info.lidar2camera[0])
    assert np.allclose(info.camera2lidar[0] @ info.lidar2camera[0],
                       np.eye(4), atol=1e-9)
    assert (info.gt_labels >= 0).all()  # car + pedestrian both mapped

    ras = BEVRasterizer(
        root, object_classes=("car", "truck", "construction_vehicle", "bus",
                              "trailer", "barrier", "motorcycle", "bicycle",
                              "pedestrian", "traffic_cone"),
        aux_data=("visibility", "center_offset", "center_ohw", "height"))
    ds = NuScenesDataset(idx, rasterizer=ras,
                         aug=ImageAugConfig(final_hw=(224, 400)))
    s = ds[0]
    assert s["img"].shape == (6, 224, 400, 3)
    assert s["img"].min() >= -1.0 and s["img"].max() <= 1.0
    assert s["bev_map"].shape == (200, 200, 8 + 10 + 8)
    assert s["bev_map"][..., :8].max() == 1.0  # drivable area present
    assert s["camera2lidar"].shape == (6, 4, 4)
    # a box in front of the ego projects into the dynamic "car" channel
    assert s["bev_map"][..., 8].sum() > 0
    # view reorder: FRONT_LEFT first (VIEW_ORDER), converter order differs
    assert VIEW_ORDER[0] == "CAM_FRONT_LEFT"
    assert s["metas"]["location"] == LOCATION

    # collate end-to-end
    ccfg = CollateConfig(bbox_max_len=16, canvas_hw=(224, 400))
    batch = collate_fn([ds[0], ds[1]], ccfg)
    assert batch["pixel_values"].shape == (2, 6, 224, 400, 3)
    assert batch["camera_param"].shape == (2, 6, 3, 7)
    assert batch["bboxes"].shape == (2, 6, 16, 8, 3)
    assert batch["masks"].sum() > 0  # boxes visible in some view


def test_cache_and_loader(mini_nuscenes, tmp_path):
    root, version = mini_nuscenes
    idx = NuScenesIndex(root, version)
    ras = BEVRasterizer(
        root, object_classes=("car", "truck", "construction_vehicle", "bus",
                              "trailer", "barrier", "motorcycle", "bicycle",
                              "pedestrian", "traffic_cone"),
        aux_data=("visibility", "center_offset", "center_ohw", "height"))
    path = build_cache(idx, ras, str(tmp_path / "cache.h5"), progress=False)
    cache = BEVCache(path, n_map_classes=8, n_object_classes=10)

    # the forked parallel build must produce identical records
    import h5py

    path_par = build_cache(idx, ras, str(tmp_path / "cache_par.h5"),
                           progress=False, workers=2)
    with h5py.File(path) as a, h5py.File(path_par) as b:
        for grp in ("gt_masks_bev_static", "gt_masks_bev", "gt_aux_bev"):
            assert sorted(a[grp]) == sorted(b[grp])
            for tok in a[grp]:
                np.testing.assert_array_equal(a[grp][tok][()],
                                              b[grp][tok][()])
    m = cache.get(idx.infos[0].token)
    assert m is not None and m.shape == (8 + 10 + 8, 200, 200)

    # dataset reading from cache must match direct rasterization
    ds_direct = NuScenesDataset(idx, rasterizer=ras)
    ds_cached = NuScenesDataset(idx, cache=cache)
    np.testing.assert_allclose(ds_direct[1]["bev_map"],
                               ds_cached[1]["bev_map"], atol=1e-6)

    loader = DataLoader(ds_cached, batch_size=2,
                        cfg=CollateConfig(bbox_max_len=16,
                                          canvas_hw=(224, 400)),
                        shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 1  # 3 samples, drop_last
    assert batches[0]["bev_map"].shape == (2, 200, 200, 26)
    cache.close()


def test_torch_fixture_roundtrip(tmp_path):
    """FolderSetWrapper loads the reference demo .pth format into the
    collate contract (ref:demo/readme.md)."""
    torch = pytest.importorskip("torch")
    rs = np.random.RandomState(0)
    K = np.eye(4); K[0, 0] = K[1, 1] = 316.0; K[0, 2] = 200; K[1, 2] = 112
    l2c = np.stack([np.eye(4)] * 6)
    l2c[:, :3, 3] = rs.randn(6, 3)
    raw = {
        "img": torch.from_numpy(rs.rand(6, 3, 224, 400).astype(np.float32)),
        "gt_bboxes_3d": torch.from_numpy(rs.randn(5, 9)),
        "gt_labels_3d": torch.from_numpy(rs.randint(0, 10, 5)),
        "gt_masks_bev": torch.from_numpy(
            (rs.rand(8, 200, 200) > 0.5).astype(np.uint8)),
        "camera_intrinsics": torch.from_numpy(np.stack([K] * 6)),
        "lidar2camera": torch.from_numpy(l2c),
        "img_aug_matrix": torch.from_numpy(np.stack([np.eye(4)] * 6)),
        "metas": {"location": "boston-seaport", "description": "demo",
                  "token": "tok0", "timeofday": ""},
    }
    torch.save(raw, tmp_path / "tok0.pth")

    from magicdrive_tpu.data.torch_fixtures import FolderSetWrapper

    ds = FolderSetWrapper(str(tmp_path))
    s = ds[0]
    assert s["img"].shape == (6, 224, 400, 3)
    assert s["bev_map"].shape == (200, 200, 8)
    assert s["boxes"].shape == (5, 7)
    np.testing.assert_allclose(
        s["camera2lidar"] @ s["lidar2camera"], np.stack([np.eye(4)] * 6),
        atol=1e-9)
    batch = collate_fn([s], CollateConfig(bbox_max_len=8,
                                          canvas_hw=(224, 400)))
    assert batch["camera_param"].shape == (1, 6, 3, 7)


def test_rot_scale_trans_math():
    from magicdrive_tpu.data.rot_scale_trans import (
        GlobalRotScaleTrans, apply_rot_scale_trans, rot_scale_trans_matrix,
        transform_boxes,
    )

    angle, scale, trans = np.pi / 2, 2.0, np.array([1.0, -2.0, 0.5])
    boxes = np.array([[3.0, 0.0, 1.0, 2.0, 4.0, 1.5, 0.1, 1.0, 0.0]])
    out = transform_boxes(boxes, angle, scale, trans)
    # center: Rz(90deg) @ (3,0,1) * 2 + t = (0,6,2) + t
    np.testing.assert_allclose(out[0, :3], [1.0, 4.0, 2.5], atol=1e-9)
    np.testing.assert_allclose(out[0, 3:6], [4.0, 8.0, 3.0])
    assert np.isclose(out[0, 6], 0.1 + angle)
    # velocity rotates & scales but does not translate
    np.testing.assert_allclose(out[0, 7:9], [0.0, 2.0], atol=1e-9)
    # matrix agrees with the box-center transform
    m = rot_scale_trans_matrix(angle, scale, trans)
    np.testing.assert_allclose((m @ np.array([3.0, 0.0, 1.0, 1.0]))[:3],
                               out[0, :3], atol=1e-9)

    # sample-dict application keeps camera consistency
    c2l = np.stack([np.eye(4)] * 2)
    c2l[:, :3, 3] = [[1, 0, 1.5], [0, -1, 1.5]]
    K = np.stack([np.eye(4)] * 2)
    K[:, 0, 0] = K[:, 1, 1] = 500.0
    s = apply_rot_scale_trans(
        {"boxes": boxes, "camera2lidar": c2l, "camera_intrinsics": K},
        angle, scale, trans)
    np.testing.assert_allclose(s["lidar_aug_matrix"], m)
    np.testing.assert_allclose(s["camera2lidar"], m[None] @ c2l)
    np.testing.assert_allclose(s["lidar2image"],
                               K @ np.linalg.inv(s["camera2lidar"]))
    # box center in camera frame is invariant under the augmentation
    before = np.linalg.inv(c2l[0]) @ np.array([3.0, 0.0, 1.0, 1.0])
    after = np.linalg.inv(s["camera2lidar"][0]) @ np.append(s["boxes"][0, :3], 1.0)
    np.testing.assert_allclose(after[:3], before[:3], atol=1e-9)

    # identity knobs (the released configs) are a no-op passthrough
    op = GlobalRotScaleTrans()
    assert op.is_identity
    same = {"boxes": boxes}
    assert op(same) is same


def test_rot_scale_trans_dataset(mini_nuscenes):
    from magicdrive_tpu.data.rot_scale_trans import GlobalRotScaleTrans

    root, version = mini_nuscenes
    idx = NuScenesIndex(root, version)
    ras = BEVRasterizer(
        root, object_classes=("car", "truck", "construction_vehicle", "bus",
                              "trailer", "barrier", "motorcycle", "bicycle",
                              "pedestrian", "traffic_cone"),
        aux_data=("visibility", "center_offset", "center_ohw", "height"))
    op = GlobalRotScaleTrans(rot_lim=(np.pi / 2, np.pi / 2),
                             rng=np.random.default_rng(0))
    ds0 = NuScenesDataset(idx, rasterizer=ras, with_images=False)
    ds1 = NuScenesDataset(idx, rasterizer=ras, with_images=False,
                          transforms_3d=[op])
    s0, s1 = ds0[0], ds1[0]
    assert "lidar_aug_matrix" not in s0
    # boxes rotated by 90 deg; yaw shifted
    np.testing.assert_allclose(s1["boxes"][:, 6], s0["boxes"][:, 6] + np.pi / 2)
    np.testing.assert_allclose(
        s1["boxes"][:, 0], -s0["boxes"][:, 1], atol=1e-9)
    # camera consistency preserved
    np.testing.assert_allclose(
        s1["lidar2image"],
        s1["camera_intrinsics"] @ s1["lidar2camera"], atol=1e-6)
    # BEV map re-rasterized in the augmented frame: same drivable-area mass
    # (the patch only rotated), but different content placement
    a0, a1 = s0["bev_map"][..., 0], s1["bev_map"][..., 0]
    assert abs(a0.sum() - a1.sum()) / max(a0.sum(), 1) < 0.2
    # the full map (divider lines, dynamic boxes) moves under the rotation
    assert np.abs(s0["bev_map"] - s1["bev_map"]).sum() > 0
    # dynamic car channel still rendered (box moved with the frame)
    assert s1["bev_map"][..., 8].sum() > 0


@pytest.mark.slow
def test_loader_throughput_guard(tmp_path):
    """The host input pipeline must not regress an order of magnitude: with
    the h5 cache + JPEG draft decode, even this 1-core CI host sustains
    >2 samples/s against the 5.7 samples/s chip demand (the idle-host
    measurement is ~3x the demand — PERFORMANCE.md round 5a; the floor here
    is deliberately loose to survive shared-host noise)."""
    from magicdrive_tpu.data.cache import BEVCache, build_cache
    from magicdrive_tpu.data.synth import make_mini_nuscenes
    import time

    root, version = make_mini_nuscenes(tmp_path / "nusc", n_samples=9,
                                       n_boxes=12, images_per_sample=True)
    idx = NuScenesIndex(root, version)
    ras = BEVRasterizer(
        root, object_classes=("car", "truck", "construction_vehicle", "bus",
                              "trailer", "barrier", "motorcycle", "bicycle",
                              "pedestrian", "traffic_cone"),
        aux_data=("visibility", "center_offset", "center_ohw", "height"))
    cache = BEVCache(build_cache(idx, ras, str(tmp_path / "c.h5"),
                                 progress=False),
                     n_map_classes=8, n_object_classes=10)
    ds = NuScenesDataset(idx, cache=cache,
                         aug=ImageAugConfig(final_hw=(224, 400)))
    loader = DataLoader(ds, batch_size=3,
                        cfg=CollateConfig(bbox_max_len=80,
                                          canvas_hw=(224, 400),
                                          is_train=True),
                        shuffle=True, num_workers=1)
    for _ in loader:  # warmup epoch
        pass
    n = 0
    t0 = time.perf_counter()
    for batch in loader:
        n += batch["pixel_values"].shape[0]
    rate = n / (time.perf_counter() - t0)
    cache.close()
    assert rate > 2.0, f"loader throughput collapsed: {rate:.2f} samples/s"


def test_map_hole_and_multipart_polygons(tmp_path):
    """Map-expansion quirks the real nuScenes JSON contains but the base
    synthetic tree does not (VERDICT r4 missing #2's named quirks): a
    polygon with interior HOLES must rasterize as a ring (hole pixels 0),
    and a layer record with MULTIPLE polygon_tokens (multi-part areas /
    lanes) must fill every part. Checked on both raster backends
    (ref:dataset/pipeline.py:244-306 get_map_mask semantics)."""
    loc = "synth-quirks"
    os.makedirs(tmp_path / "maps" / "expansion", exist_ok=True)
    nodes = []

    def add_square(prefix, x0, y0, x1, y1):
        for i, (x, y) in enumerate([(x0, y0), (x1, y0), (x1, y1), (x0, y1)]):
            nodes.append({"token": f"{prefix}{i}", "x": float(x),
                          "y": float(y)})
        return [f"{prefix}{i}" for i in range(4)]

    outer = add_square("o", 900, 900, 1100, 1100)
    hole = add_square("h", 960, 960, 1040, 1040)
    part2 = add_square("q", 1150, 900, 1250, 1000)  # disjoint second part
    map_json = {
        "node": nodes,
        "polygon": [
            {"token": "p0", "exterior_node_tokens": outer,
             "holes": [{"node_tokens": hole}]},
            {"token": "p1", "exterior_node_tokens": part2, "holes": []},
        ],
        "line": [],
        # one record, TWO polygon parts (the multi-part shape real lane /
        # drivable_area records have)
        "drivable_area": [{"token": "da0", "polygon_tokens": ["p0", "p1"]}],
        "ped_crossing": [], "walkway": [], "stop_line": [],
        "carpark_area": [], "road_block": [], "road_segment": [], "lane": [],
        "road_divider": [], "lane_divider": [],
    }
    with open(tmp_path / "maps" / "expansion" / f"{loc}.json", "w") as f:
        json.dump(map_json, f)

    masks = {}
    for backend in ("pil", "native"):
        raster = NuScenesMapRaster(str(tmp_path), loc, backend=backend)
        # 400x400 canvas over a 400x400 m patch centered at (1050, 1000):
        # 1 px / m, canvas x = map x - 850, canvas y = map y - 800
        m = raster.get_map_mask((1050, 1000, 400, 400), 0.0,
                                ["drivable_area"], (400, 400))[0]
        masks[backend] = m

        assert m[100, 50] == 1 and m[250, 150] == 1   # ring: inside outer
        assert m[200, 150] == 0, "hole interior must stay unfilled"
        assert m[np.ix_(range(170, 230), range(120, 180))].max() == 0
        assert m[150, 350] == 1, "second polygon part must be filled"
        assert m[250, 350] == 0                        # outside both parts
        # the ring is a frame: substantial filled area minus the hole
        ring_px = int(m[100:300, 50:250].sum())
        assert 200 * 200 - 80 * 80 - 1000 < ring_px < 200 * 200 - 80 * 80 \
            + 1000

    # backends agree up to the documented 1-2 px edge-band tolerance
    diff = int(np.abs(masks["pil"].astype(int)
                      - masks["native"].astype(int)).sum())
    assert diff <= 20, f"backend mismatch on quirk shapes: {diff} px"
