"""ctypes binding for the C++ raster core (csrc/raster.cc).

``fill_polygon`` is pixel-exact with PIL ``ImageDraw.polygon(fill=...)`` for
integer vertices (tests/test_native_raster.py); ``draw_polyline2`` is the
2-px divider-line band of the BEV map path.
"""
from __future__ import annotations

import ctypes

import numpy as np

from . import load_library

_lib = load_library()
_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_lib.fill_polygon_u8.argtypes = [
    _u8p, ctypes.c_int32, ctypes.c_int32, _i32p, ctypes.c_int32,
    ctypes.c_uint8]
_lib.draw_polyline2_u8.argtypes = [
    _u8p, ctypes.c_int32, ctypes.c_int32, _i32p, ctypes.c_int32,
    ctypes.c_uint8]
_f32p = ctypes.POINTER(ctypes.c_float)
_f64p = ctypes.POINTER(ctypes.c_double)
_lib.aux_channels_f32.argtypes = [
    _f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, _f64p, _f64p,
    _f64p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ctypes.c_int32]


def _pts(xy: np.ndarray) -> np.ndarray:
    xy = np.ascontiguousarray(np.asarray(xy), np.int32)
    assert xy.ndim == 2 and xy.shape[1] == 2, xy.shape
    return xy


def fill_polygon(canvas: np.ndarray, xy: np.ndarray, value: int = 1) -> None:
    """Fill polygon with integer vertices ``xy`` (n, 2) into (h, w) uint8
    ``canvas`` in place."""
    assert canvas.dtype == np.uint8 and canvas.flags.c_contiguous
    xy = _pts(xy)
    _lib.fill_polygon_u8(
        canvas.ctypes.data_as(_u8p), canvas.shape[0], canvas.shape[1],
        xy.ctypes.data_as(_i32p), len(xy), value)


def draw_polyline2(canvas: np.ndarray, xy: np.ndarray,
                   value: int = 1) -> None:
    """Draw a 2-px-wide polyline through integer points ``xy`` (n, 2)."""
    assert canvas.dtype == np.uint8 and canvas.flags.c_contiguous
    xy = _pts(xy)
    _lib.draw_polyline2_u8(
        canvas.ctypes.data_as(_u8p), canvas.shape[0], canvas.shape[1],
        xy.ctypes.data_as(_i32p), len(xy), value)


def aux_channels(aux: np.ndarray, bottom_corners: np.ndarray,
                 visibility: np.ndarray, heights: np.ndarray,
                 flags) -> None:
    """Write box aux channels into ``aux`` (h, w, c) float32 in place.

    bottom_corners: (n, 4, 2) float64 canvas coords; flags: 4 bools
    (visibility, center_offset, center_ohw, height).
    """
    assert aux.dtype == np.float32 and aux.flags.c_contiguous
    bc = np.ascontiguousarray(bottom_corners, np.float64)
    vis = np.ascontiguousarray(visibility, np.float64)
    hgt = np.ascontiguousarray(heights, np.float64)
    n = len(bc)
    assert bc.shape == (n, 4, 2) and vis.shape == (n,) and hgt.shape == (n,)
    h, w, c = aux.shape
    _lib.aux_channels_f32(
        aux.ctypes.data_as(_f32p), h, w, c, bc.ctypes.data_as(_f64p),
        vis.ctypes.data_as(_f64p), hgt.ctypes.data_as(_f64p), n,
        *[int(bool(f)) for f in flags])
