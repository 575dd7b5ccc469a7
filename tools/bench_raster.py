"""Host BEV-rasterization throughput on a synthetic city-scale map.

Builds a map with the density quoted in PERFORMANCE.md (≈3k polygons + 2k
divider lines across a 2x2 km city) plus ~40 boxes/frame, then times
``BEVRasterizer.__call__`` per frame (static 8ch + 10 dynamic + 8 aux) and
prints a per-stage breakdown. This is the cheap profiling loop for the host
data path (the full-cache build = 28,130 frames x this number / n_cores).

Usage: python tools/bench_raster.py [n_frames] [--native]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

OBJECT_CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone")
AUX = ("visibility", "center_offset", "center_ohw", "height")


def build_city(root: str, seed: int = 0) -> str:
    """Write a synthetic map-expansion JSON: grid of road polygons with
    lane subdivisions + divider polylines over a 2000x2000 m extent."""
    rng = np.random.default_rng(seed)
    nodes, polygons, lines = [], [], []
    road_segment, lane, ped_crossing, drivable = [], [], [], []
    road_divider, lane_divider = [], []

    def add_node(x, y):
        tok = f"n{len(nodes)}"
        nodes.append({"token": tok, "x": float(x), "y": float(y)})
        return tok

    def add_poly(pts):
        tok = f"p{len(polygons)}"
        polygons.append({
            "token": tok,
            "exterior_node_tokens": [add_node(x, y) for x, y in pts],
            "holes": []})
        return tok

    def add_line(pts):
        tok = f"l{len(lines)}"
        lines.append({"token": tok,
                      "node_tokens": [add_node(x, y) for x, y in pts]})
        return tok

    # 30x30 blocks of ~66 m: road ring polygons + lanes + crossings ≈ 3k polys
    for bx in range(30):
        for by in range(30):
            x0, y0 = bx * 66.0, by * 66.0
            w = 66.0
            # road segment around the block edge
            road_segment.append({"polygon_token": add_poly(
                [(x0, y0), (x0 + w, y0), (x0 + w, y0 + 8), (x0, y0 + 8)])})
            # two lanes
            for k in range(2):
                lane.append({"polygon_token": add_poly(
                    [(x0, y0 + 4 * k), (x0 + w, y0 + 4 * k),
                     (x0 + w, y0 + 4 * k + 4), (x0, y0 + 4 * k + 4)])})
            if (bx + by) % 3 == 0:
                ped_crossing.append({"polygon_token": add_poly(
                    [(x0 + 20, y0), (x0 + 26, y0), (x0 + 26, y0 + 8),
                     (x0 + 20, y0 + 8)])})
            # dividers: jittered polylines along the road ≈ 2/block
            for k in range(2):
                xs = np.linspace(x0, x0 + w, 8)
                ys = y0 + 4 * k + rng.normal(0, 0.2, 8)
                (road_divider if k == 0 else lane_divider).append(
                    {"line_token": add_line(list(zip(xs, ys)))})
    drivable.append({"polygon_token": add_poly(
        [(0, 0), (1980, 0), (1980, 1980), (0, 1980)])})

    data = {
        "node": nodes, "polygon": polygons, "line": lines,
        "road_segment": road_segment, "lane": lane,
        "ped_crossing": ped_crossing, "walkway": [], "stop_line": [],
        "carpark_area": [], "road_block": [], "drivable_area": drivable,
        "road_divider": road_divider, "lane_divider": lane_divider,
    }
    os.makedirs(os.path.join(root, "maps", "expansion"), exist_ok=True)
    path = os.path.join(root, "maps", "expansion", "boston-seaport.json")
    with open(path, "w") as f:
        json.dump(data, f)
    n_poly = sum(len(v) for v in
                 (road_segment, lane, ped_crossing, drivable))
    print(f"city: {n_poly} polygons, "
          f"{len(road_divider) + len(lane_divider)} divider lines")
    return root


def random_boxes(rng, n):
    """(n, 8, 3) lidar-frame corners for ~4x2x1.7 m boxes near the ego."""
    ctr = rng.uniform(-45, 45, (n, 3))
    ctr[:, 2] = 0.0
    dims = rng.uniform([3.5, 1.6, 1.4], [12.0, 2.6, 3.5], (n, 3))
    yaw = rng.uniform(0, 2 * np.pi, n)
    corners = []
    base = np.array([[0, 0, 0], [0, 0, 1], [0, 1, 1], [0, 1, 0],
                     [1, 0, 0], [1, 0, 1], [1, 1, 1], [1, 1, 0]],
                    np.float32) - [0.5, 0.5, 0]
    for i in range(n):
        c, s = np.cos(yaw[i]), np.sin(yaw[i])
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])
        corners.append((base * dims[i]) @ rot.T + ctr[i])
    return np.stack(corners)


def main():
    from magicdrive_tpu.data.map_raster import BEVRasterizer

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_frames = int(args[0]) if args else 30
    backend = "native" if "--native" in sys.argv else "pil"
    root = "/tmp/bench_city"
    if not os.path.exists(os.path.join(
            root, "maps", "expansion", "boston-seaport.json")):
        build_city(root)

    r = BEVRasterizer(root, object_classes=OBJECT_CLASSES, aux_data=AUX,
                      backend=backend)
    print("backend:", backend)
    rng = np.random.default_rng(1)

    t_static = t_dyn = t_aux = 0.0
    t0_all = time.perf_counter()
    for f in range(n_frames):
        xy = rng.uniform(300, 1700, 2)
        yaw = rng.uniform(0, 2 * np.pi)
        l2g = np.eye(4)
        l2g[:2, :2] = [[np.cos(yaw), -np.sin(yaw)],
                       [np.sin(yaw), np.cos(yaw)]]
        l2g[:2, 3] = xy
        n_box = int(rng.integers(20, 60))
        corners = random_boxes(rng, n_box)
        labels = rng.integers(0, len(OBJECT_CLASSES), n_box)
        heights = corners[:, :, 2].max(1)
        vis = rng.uniform(0.2, 1.0, n_box)

        t0 = time.perf_counter()
        static = r.static_masks("boston-seaport", l2g)
        t1 = time.perf_counter()
        r.dynamic_masks(corners, labels)
        t2 = time.perf_counter()
        r.aux_masks(corners, heights, vis)
        t3 = time.perf_counter()
        t_static += t1 - t0
        t_dyn += t2 - t1
        t_aux += t3 - t2
    total = time.perf_counter() - t0_all

    ms = 1e3 / n_frames
    print(f"frames: {n_frames}   total {total * ms:7.1f} ms/frame")
    print(f"  static (8ch map)   {t_static * ms:7.1f} ms")
    print(f"  dynamic (10ch box) {t_dyn * ms:7.1f} ms")
    print(f"  aux (8ch)          {t_aux * ms:7.1f} ms")
    full = total / n_frames * 28130 / 60
    print(f"full trainval cache, 1 core: {full:.1f} min")


if __name__ == "__main__":
    main()
