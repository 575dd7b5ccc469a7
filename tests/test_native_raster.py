"""C++ raster core (native/csrc/raster.cc) vs the PIL reference path.

Contract: the native polygon fill reproduces PIL's scanline fill exactly on
the shapes the data path draws (small convex quads = box footprints), and
near-exactly (rare 1-2 px boundary differences from PIL's partial edge-band
painting) on arbitrary simple polygons. The aux-channel writer is bit-exact
with the python/PIL implementation in BEVRasterizer.aux_masks.
"""
import numpy as np
import pytest
from PIL import Image, ImageDraw

try:
    from magicdrive_tpu.native import raster
except OSError:
    from magicdrive_tpu.native import build

    build.build(verbose=False)
    from magicdrive_tpu.native import raster

from magicdrive_tpu.data.map_raster import BEVRasterizer


def pil_poly(pts, size):
    img = Image.new("L", (size, size), 0)
    ImageDraw.Draw(img).polygon([int(v) for p in pts for v in p], fill=1)
    return np.asarray(img)


def native_poly(pts, size):
    got = np.zeros((size, size), np.uint8)
    raster.fill_polygon(got, np.asarray(pts, np.int32))
    return got


def test_fill_golden_shapes():
    for pts in ([(1, 1), (5, 1), (5, 4), (1, 4)],          # rect
                [(1, 1), (8, 1), (1, 8)],                  # right triangle
                [(6, 0), (12, 6), (6, 12), (0, 6)],        # diamond
                [(3, 3), (3, 3), (3, 3)]):                 # degenerate point
        np.testing.assert_array_equal(native_poly(pts, 16), pil_poly(pts, 16))


def test_fill_box_quads_exact():
    """Rotated-rectangle footprints (the aux/dynamic path) must be
    pixel-exact with PIL, including boxes crossing the canvas edge."""
    rng = np.random.default_rng(0)
    for _ in range(300):
        ctr = rng.uniform(-5, 35, 2)
        wl = rng.uniform(1, 16, 2)
        a = rng.uniform(0, 2 * np.pi)
        rot = np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])
        box = np.round((np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]])
                        * wl / 2) @ rot.T + ctr).astype(np.int32)
        got, want = native_poly(box, 30), pil_poly(box, 30)
        if (got != want).any():
            # PIL's edge-band painting can differ by a pixel or two on
            # shallow edges; tolerate only tiny boundary deviations
            assert int(np.abs(got.astype(int) - want.astype(int)).sum()) <= 3
    # and the aggregate must be almost always exact
    exact = sum(
        (native_poly(b, 30) == pil_poly(b, 30)).all()
        for b in (np.round((np.array([[-1, -1], [1, -1], [1, 1], [-1, 1]])
                            * rng.uniform(1, 16, 2) / 2)
                           @ np.array([[np.cos(a), -np.sin(a)],
                                       [np.sin(a), np.cos(a)]]).T
                           + rng.uniform(-5, 35, 2)).astype(np.int32)
                  for a in rng.uniform(0, 2 * np.pi, 200)))
    assert exact >= 190


def test_fill_simple_polygons_near_exact():
    rng = np.random.default_rng(1)
    bad_px = 0
    for _ in range(300):
        n = rng.integers(5, 16)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        rad = rng.uniform(3, 18, n)
        p = np.round(np.stack([15 + rad * np.cos(ang),
                               15 + rad * np.sin(ang)], 1)).astype(np.int32)
        got, want = native_poly(p, 30), pil_poly(p, 30)
        d = np.abs(got.astype(int) - want.astype(int)).sum()
        assert d <= 6, p.tolist()
        bad_px += int(d)
    assert bad_px <= 300  # ~1 px per 1 polygon on average, usually 0


def test_polyline2_axis_aligned_matches_pil():
    for pts in ([(1, 2), (9, 2)], [(2, 1), (2, 9)], [(1, 2), (9, 2), (9, 8)]):
        img = Image.new("L", (12, 12), 0)
        ImageDraw.Draw(img).line([tuple(p) for p in pts], fill=1, width=2)
        want = np.asarray(img)
        got = np.zeros((12, 12), np.uint8)
        raster.draw_polyline2(got, np.asarray(pts, np.int32))
        np.testing.assert_array_equal(got, want)


def test_polyline2_diagonal_is_2px_band():
    got = np.zeros((20, 20), np.uint8)
    raster.draw_polyline2(got, np.asarray([(2, 2), (15, 9)], np.int32))
    # covers the segment: every column in [2, 15] has 1-3 painted rows
    cols = got[:, 2:16].sum(axis=0)
    assert (cols >= 1).all() and (cols <= 3).all()


def test_aux_channels_bit_exact_with_pil_path():
    aux_data = ("visibility", "center_offset", "center_ohw", "height")
    rp = BEVRasterizer("/x", object_classes=("car",), aux_data=aux_data,
                       backend="pil")
    rn = BEVRasterizer("/x", object_classes=("car",), aux_data=aux_data,
                       backend="native")
    rng = np.random.default_rng(0)
    n = 40
    ctr = rng.uniform(-60, 60, (n, 3))
    ctr[:, 2] = 0
    base = np.array([[0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0],
                     [1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0]],
                    np.float64) - [0.5, 0.5, 0]
    corners = np.stack([
        base * rng.uniform([3, 1.5, 1.4], [10, 2.5, 3], 3) @ np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
             [0, 0, 1]]).T + ctr[i]
        for i, a in enumerate(rng.uniform(0, 2 * np.pi, n))])
    heights = corners[:, :, 2].max(1)
    vis = rng.uniform(0, 1, n)
    np.testing.assert_array_equal(rn.aux_masks(corners, heights, vis),
                                  rp.aux_masks(corners, heights, vis))


def test_dynamic_and_static_backends_agree():
    """Class footprints from both backends differ at most on rare boundary
    pixels (IoU ~ 1)."""
    rng = np.random.default_rng(2)
    n = 30
    ctr = rng.uniform(-40, 40, (n, 3))
    ctr[:, 2] = 0
    base = np.array([[0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0],
                     [1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0]],
                    np.float64) - [0.5, 0.5, 0]
    corners = np.stack([
        base * rng.uniform([3, 1.5, 1.4], [10, 2.5, 3], 3) @ np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
             [0, 0, 1]]).T + ctr[i]
        for i, a in enumerate(rng.uniform(0, 2 * np.pi, n))])
    labels = rng.integers(0, 3, n)
    classes = ("car", "truck", "bus")
    rp = BEVRasterizer("/x", object_classes=classes, backend="pil")
    rn = BEVRasterizer("/x", object_classes=classes, backend="native")
    a = rp.dynamic_masks(corners, labels)
    b = rn.dynamic_masks(corners, labels)
    inter = np.logical_and(a, b).sum()
    union = np.logical_or(a, b).sum()
    assert union > 0 and inter / union > 0.995
