"""ctypes binding for the C++ bitpack codec (csrc/bitpack.cc)."""
from __future__ import annotations

import ctypes

import numpy as np

from . import load_library

_lib = load_library()
_lib.bitpack_encode.argtypes = [
    ctypes.POINTER(ctypes.c_uint8), ctypes.c_int32, ctypes.c_int64,
    ctypes.POINTER(ctypes.c_int32)]
_lib.bitpack_decode.argtypes = [
    ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int64,
    ctypes.POINTER(ctypes.c_uint8)]


def encode(masks: np.ndarray) -> np.ndarray:
    """(C, H, W) uint8 -> (H, W) int32."""
    assert masks.dtype == np.uint8 and masks.flags.c_contiguous
    c, h, w = masks.shape
    out = np.empty((h, w), np.int32)
    _lib.bitpack_encode(
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), c, h * w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def decode(packed: np.ndarray, channels: int) -> np.ndarray:
    """(H, W) int32 -> (C, H, W) uint8."""
    assert packed.dtype == np.int32 and packed.flags.c_contiguous
    h, w = packed.shape
    out = np.empty((channels, h, w), np.uint8)
    _lib.bitpack_decode(
        packed.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), channels,
        h * w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out
