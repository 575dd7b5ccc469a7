"""BEV-mask cache: vectorized bit-pack codec + h5 store.

Replaces the reference's numba-JIT codec (ref:magicdrive/dataset/
pipeline_utils.py:10-49 one_hot_encode/decode) and the offline cache builder
(ref:tools/prepare_map_aux.py). NumPy vectorized shifts saturate host memory
bandwidth here — no JIT needed; an optional C++ codec (magicdrive_tpu/native)
is used when built, for parity with the reference's native data path.

Cache layout per nuScenes sample token (ref:prepare_map_aux.py:25-29):
  gt_masks_bev_static : packed int32 (H, W)        — map channels
  gt_masks_bev        : packed int32 (H, W)        — map + object channels
  gt_aux_bev          : float32 (8, H, W)          — aux channels (optional)
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np

try:
    from magicdrive_tpu.native import bitpack as _native_bitpack
except Exception:  # pragma: no cover - optional C++ extension
    _native_bitpack = None


def one_hot_encode(masks: np.ndarray) -> np.ndarray:
    """(C<=30, H, W) binary -> (H, W) int32 with bit c = channel c."""
    C = masks.shape[0]
    assert C <= 30, C
    if _native_bitpack is not None:
        return _native_bitpack.encode(np.ascontiguousarray(
            masks.astype(np.uint8)))
    bits = (masks > 0).astype(np.int32)
    shifts = (1 << np.arange(C, dtype=np.int32))[:, None, None]
    return (bits * shifts).sum(axis=0, dtype=np.int32)


def one_hot_decode(packed: np.ndarray, n_channels: int) -> np.ndarray:
    """(H, W) int32 -> (C, H, W) uint8."""
    if _native_bitpack is not None:
        return _native_bitpack.decode(
            np.ascontiguousarray(packed.astype(np.int32)), n_channels)
    shifts = np.arange(n_channels, dtype=np.int32)[:, None, None]
    return ((packed[None] >> shifts) & 1).astype(np.uint8)


class BEVCache:
    """Read-side h5 cache with the reference's key layout."""

    def __init__(self, path: str, n_map_classes: int,
                 n_object_classes: int = 0, with_aux: bool = True):
        import h5py

        self.f = h5py.File(path, "r")
        self.n_map = n_map_classes
        self.n_obj = n_object_classes
        self.with_aux = with_aux and "gt_aux_bev" in self.f

    def get(self, token: str) -> Optional[np.ndarray]:
        """-> (C_total, H, W) float32 (masks [+ aux]) or None on miss."""
        key = "gt_masks_bev" if self.n_obj else "gt_masks_bev_static"
        if token not in self.f.get(key, {}):
            return None
        masks = one_hot_decode(self.f[key][token][:],
                               self.n_map + self.n_obj).astype(np.float32)
        if self.with_aux and self.n_obj:
            aux = self.f["gt_aux_bev"][token][:].astype(np.float32)
            masks = np.concatenate([masks, aux], axis=0)
        return masks

    def close(self):
        self.f.close()


_BUILD_RAS = None  # set before forking worker processes (build_cache)


def _raster_encode_one(info):
    """Rasterize + encode one frame (runs in a forked worker)."""
    from .bbox import corners_from_boxes

    keep = info.gt_labels >= 0
    boxes = info.gt_boxes[keep]
    labels = info.gt_labels[keep]
    vis = info.visibility[keep].astype(np.float32)
    corners = corners_from_boxes(boxes) if len(boxes) else np.zeros((0, 8, 3))
    out = _BUILD_RAS(info.location, info.lidar2global, corners=corners,
                     labels=labels,
                     box_heights=boxes[:, 5] if len(boxes) else
                     np.zeros((0,)), visibility=vis)
    enc = one_hot_encode(out["gt_masks_bev_static"])
    assert (one_hot_decode(enc, out["gt_masks_bev_static"].shape[0])
            == (out["gt_masks_bev_static"] > 0)).all()
    enc_full = one_hot_encode(out["gt_masks_bev"]) \
        if "gt_masks_bev" in out and _BUILD_RAS.object_classes else None
    return info.token, enc, enc_full, out.get("gt_aux_bev")


def build_cache(index, rasterizer, path: str,
                tokens: Optional[Sequence[str]] = None,
                progress: bool = True, workers: int = 0) -> str:
    """Offline cache builder (ref:tools/prepare_map_aux.py:60-127).

    Rasterizes every frame's static+dynamic+aux BEV layers and writes the
    bit-packed h5. Round-trips each record as a write-time assert
    (ref:prepare_map_aux.py:69-70). ``workers > 0`` fans the rasterization
    out over forked processes (the parsed map geometry is preloaded in the
    parent so children share it copy-on-write); the h5 is written by the
    parent only. Results are identical to the sequential build.
    """
    import h5py

    global _BUILD_RAS

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    infos = [info for info in index.infos
             if tokens is None or info.token in tokens]
    _BUILD_RAS = rasterizer

    def results_seq():
        for info in infos:
            yield _raster_encode_one(info)

    if workers > 0:
        import multiprocessing as mp

        for loc in sorted({info.location for info in infos}):
            rasterizer.map_for(loc)  # parent preload -> COW-shared pages
        ctx = mp.get_context("fork")
        pool = ctx.Pool(workers)
        results = pool.imap(_raster_encode_one, infos, chunksize=8)
    else:
        pool = None
        results = results_seq()

    try:
        with h5py.File(path, "w") as f:
            g_static = f.create_group("gt_masks_bev_static")
            g_full = f.create_group("gt_masks_bev")
            g_aux = f.create_group("gt_aux_bev")
            for i, (token, enc, enc_full, aux) in enumerate(results):
                g_static.create_dataset(token, data=enc, compression="gzip")
                if enc_full is not None:
                    g_full.create_dataset(token, data=enc_full,
                                          compression="gzip")
                if aux is not None:
                    g_aux.create_dataset(token, data=aux, compression="gzip")
                if progress and i % 500 == 0:
                    print(f"cache: {i}/{len(infos)}")
    finally:
        if pool is not None:
            pool.close()
            pool.join()
        _BUILD_RAS = None
    return path
