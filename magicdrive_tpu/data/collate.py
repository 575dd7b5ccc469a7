"""Batch assembly with static shapes (jit-friendly).

Re-design of ref:magicdrive/dataset/utils.py:253-352 (collate_fn +
_preprocess_bbox). Key deliberate difference: the reference pads box tokens to
the *batch-dynamic* max_len; under jit we pad/clip to a static
``bbox_max_len`` (ref config knob ``runner.bbox_max_length = 160``,
ref:configs/runner/default.yaml:61) — mask semantics are identical because
padded slots blend to the learned null token (ref:bbox_embedder.py:180-184).

Layouts are TPU-native: images NHWC (B, N, H, W, 3), BEV map (B, H, W, C).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence

import numpy as np

from .bbox import (
    corners_from_boxes, shift_origin, visible_mask_3d, visible_mask_canvas,
)
from .caption import DEFAULT_TEMPLATE, HashTokenizer, tokenize_captions


@dataclasses.dataclass
class CollateConfig:
    template: str = DEFAULT_TEMPLATE
    bbox_mode: str = "all-xyz"       # all-xyz (8 pts) | cxyz (4 pts)
    bbox_max_len: int = 160
    bbox_view_shared: bool = False
    use_3d_filter: bool = True
    canvas_hw: tuple = (224, 400)
    is_train: bool = True
    # train-time augmentation (ref:configs/runner/default.yaml:2-4)
    bbox_drop_ratio: float = 0.0
    bbox_add_ratio: float = 0.0
    bbox_add_num: int = 0


# cxyz mode picks corners [x1y1z1, x1y0z1, x1y1z0, x0y1z1] of the mmdet3d
# order (ref:dataset/utils.py:210-212)
_CXYZ_IDX = (6, 5, 7, 2)


def _select_points(corners: np.ndarray, mode: str) -> np.ndarray:
    if mode == "all-xyz":
        return corners
    if mode == "cxyz":
        return corners[:, list(_CXYZ_IDX)]
    raise ValueError(mode)


def preprocess_bbox(
    samples: Sequence[dict], cfg: CollateConfig,
    rng: Optional[np.random.Generator] = None,
) -> Dict[str, np.ndarray]:
    """Per-view visibility filtering + static padding.

    Returns bboxes (B, N_out, L, P, 3), classes (B, N_out, L) int32 (-1 pad),
    masks (B, N_out, L) float32.
    """
    rng = rng or np.random.default_rng()
    B = len(samples)
    N_cam = len(samples[0]["lidar2image"])
    N_out = 1 if cfg.bbox_view_shared else N_cam
    L = cfg.bbox_max_len
    n_pts = 8 if cfg.bbox_mode == "all-xyz" else 4

    bboxes = np.zeros((B, N_out, L, n_pts, 3), np.float32)
    classes = -np.ones((B, N_out, L), np.int32)
    masks = np.zeros((B, N_out, L), np.float32)

    for b, s in enumerate(samples):
        arr = np.asarray(s["boxes"], np.float64)
        boxes7 = (arr.reshape(len(arr), -1)[:, :7] if arr.size
                  else np.zeros((0, 7)))  # drop velocity dims if present
        labels = np.asarray(s["labels"], np.int64).reshape(-1)
        if len(boxes7) == 0 or (cfg.is_train and cfg.bbox_drop_ratio > 0
                                and rng.random() < cfg.bbox_drop_ratio):
            continue
        corners = corners_from_boxes(boxes7)  # origin (0.5,0.5,0) convention
        pts = _select_points(corners, cfg.bbox_mode)
        if cfg.bbox_view_shared:
            view_masks = [np.ones(len(boxes7), bool)]
        else:
            # filters run on gravity-center-shifted boxes (ref box_center_shift)
            corners_c = corners_from_boxes(
                shift_origin(boxes7, (0.5, 0.5, 0.0), (0.5, 0.5, 0.0)),
                origin=(0.5, 0.5, 0.0))
            view_masks = []
            for v in range(N_cam):
                if cfg.use_3d_filter:
                    m = visible_mask_3d(corners_c, s["lidar2camera"][v])
                else:
                    m = visible_mask_canvas(
                        corners_c, s["lidar2image"][v],
                        s["img_aug_matrix"][v], cfg.canvas_hw)
                if cfg.is_train and cfg.bbox_add_ratio > 0 and \
                        rng.random() < cfg.bbox_add_ratio:
                    hidden = np.where(~m)[0]
                    rng.shuffle(hidden)
                    m = m.copy()
                    m[hidden[: cfg.bbox_add_num]] = True
                view_masks.append(m)
        for v, m in enumerate(view_masks):
            idx = np.where(m)[0][:L]
            n = len(idx)
            bboxes[b, v, :n] = pts[idx]
            classes[b, v, :n] = labels[idx]
            masks[b, v, :n] = 1.0
    return {"bboxes": bboxes, "classes": classes, "masks": masks}


def collate_fn(samples: Sequence[dict], cfg: CollateConfig,
               tokenizer=None,
               rng: Optional[np.random.Generator] = None) -> Dict[str, np.ndarray]:
    """Assemble a static-shape batch from per-frame sample dicts.

    Sample contract (Appendix A of SURVEY.md, NHWC variant):
      img (N, H, W, 3) in [-1,1]; boxes (Nb, 7); labels (Nb,);
      bev_map (H_m, W_m, C); camera_intrinsics/camera2lidar/lidar2camera/
      lidar2image/img_aug_matrix (N, 4, 4); metas {location, description}.
    """
    tokenizer = tokenizer or HashTokenizer()
    out: Dict[str, np.ndarray] = {}
    if "img" in samples[0]:
        out["pixel_values"] = np.stack(
            [np.asarray(s["img"], np.float32) for s in samples])
    out["bev_map"] = np.stack(
        [np.asarray(s["bev_map"], np.float32) for s in samples])
    # camera_param = K[:3,:3] ⊕ camera2lidar[:3,:4] (ref:dataset/utils.py:294-297)
    cam = []
    for s in samples:
        K = np.asarray(s["camera_intrinsics"], np.float32)[:, :3, :3]
        c2l = np.asarray(s["camera2lidar"], np.float32)[:, :3, :4]
        cam.append(np.concatenate([K, c2l], axis=-1))
    out["camera_param"] = np.stack(cam)  # (B, N, 3, 7)

    input_ids, uncond_ids = tokenize_captions(
        [s["metas"] for s in samples], tokenizer, cfg.template)
    out["input_ids"] = np.asarray(input_ids, np.int32)
    out["uncond_ids"] = np.asarray(uncond_ids, np.int32)

    out.update(preprocess_bbox(samples, cfg, rng))
    return out
