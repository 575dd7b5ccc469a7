"""Synthetic scene fixtures — the framework's fake backend.

Plays the role of the reference's bundled demo ``.pth`` samples
(ref:demo/readme.md, loaded by FolderSetWrapper,
ref:magicdrive/dataset/dataset_wrapper.py:21-56): full end-to-end generation
and training smoke tests without nuScenes, the devkit, or the map cache.

Geometry is plausible: 6 cameras on a ring (yaw = view azimuths of the
nuScenes rig order FL, F, FR, BR, B, BL), pinhole intrinsics, boxes scattered
around the ego with labels, a random-polygon BEV map.
"""
from __future__ import annotations

from typing import List

import numpy as np

# approximate azimuths (deg) of the nuScenes camera order
# FRONT_LEFT, FRONT, FRONT_RIGHT, BACK_RIGHT, BACK, BACK_LEFT
VIEW_AZIMUTH_DEG = (55.0, 0.0, -55.0, -110.0, 180.0, 110.0)
OBJECT_CLASSES = (
    "car", "truck", "construction_vehicle", "bus", "trailer", "barrier",
    "motorcycle", "bicycle", "pedestrian", "traffic_cone",
)
MAP_CLASSES = (
    "drivable_area", "ped_crossing", "walkway", "stop_line", "carpark_area",
    "road_divider", "lane_divider", "road_block",
)


def _camera_matrices(image_hw=(224, 400)):
    h, w = image_hw
    fx = fy = 0.25 * 1266.0  # nuScenes intrinsics scaled by resize ratio 0.25
    cx, cy = w / 2, h / 2
    K = np.array([[fx, 0, cx, 0], [0, fy, cy, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
                 np.float64)
    cams = []
    for az in VIEW_AZIMUTH_DEG:
        a = np.deg2rad(az)
        # camera2lidar rotation: camera x->right, y->down, z->forward;
        # lidar x->front, y->left, z->up. Forward of camera points along
        # azimuth a in the lidar xy-plane.
        fwd = np.array([np.cos(a), np.sin(a), 0.0])
        right = np.array([np.sin(a), -np.cos(a), 0.0])
        down = np.array([0.0, 0.0, -1.0])
        R = np.stack([right, down, fwd], axis=1)  # columns: cam axes in lidar
        t = fwd * 1.5 + np.array([0, 0, 1.6])
        c2l = np.eye(4)
        c2l[:3, :3] = R
        c2l[:3, 3] = t
        l2c = np.linalg.inv(c2l)
        l2i = K @ l2c
        cams.append((K, c2l, l2c, l2i))
    return cams


def make_sample(seed: int = 0, image_hw=(224, 400), map_hw=(200, 200),
                map_channels: int = 8, n_boxes: int = 24,
                with_images: bool = True) -> dict:
    rng = np.random.default_rng(seed)
    n_cam = len(VIEW_AZIMUTH_DEG)
    cams = _camera_matrices(image_hw)

    sample = {
        "camera_intrinsics": np.stack([c[0] for c in cams]),
        "camera2lidar": np.stack([c[1] for c in cams]),
        "lidar2camera": np.stack([c[2] for c in cams]),
        "lidar2image": np.stack([c[3] for c in cams]),
        "img_aug_matrix": np.stack([np.eye(4)] * n_cam),
        "metas": {
            "location": "singapore-onenorth",
            "description": "synthetic fixture scene with parked cars",
        },
    }
    if with_images:
        sample["img"] = rng.uniform(-1, 1, (n_cam, *image_hw, 3)).astype(
            np.float32)

    # boxes scattered on the ground plane around the ego
    xy = rng.uniform(-40, 40, (n_boxes, 2))
    z = np.zeros((n_boxes, 1)) - 1.5
    dims = rng.uniform([1.5, 3.5, 1.4], [2.2, 5.5, 2.2], (n_boxes, 3))[
        :, [0, 1, 2]]
    yaw = rng.uniform(-np.pi, np.pi, (n_boxes, 1))
    sample["boxes"] = np.concatenate(
        [xy, z, dims[:, [0, 1, 2]], yaw], axis=1).astype(np.float64)
    sample["labels"] = rng.integers(0, len(OBJECT_CLASSES), n_boxes)

    # blocky random BEV map (binary channels like rasterized polygons)
    m = np.zeros((*map_hw, map_channels), np.float32)
    for c in range(map_channels):
        for _ in range(4):
            y0, x0 = rng.integers(0, map_hw[0] - 20), rng.integers(0, map_hw[1] - 20)
            hgt, wdt = rng.integers(10, 60), rng.integers(10, 60)
            m[y0:y0 + hgt, x0:x0 + wdt, c] = 1.0
    sample["bev_map"] = m
    return sample


def make_dataset(n: int = 6, **kwargs) -> List[dict]:
    return [make_sample(seed=i, **kwargs) for i in range(n)]
