"""Native (C++) host-side helpers, bound via ctypes.

The reference's native data-path pieces (numba codec, mmcv/mmdet3d compiled
ops — SURVEY.md §2.3) map here. Build once with::

    python -m magicdrive_tpu.native.build

Everything degrades gracefully to the numpy implementations when the shared
library is absent.
"""
from __future__ import annotations

import ctypes
import os

_SO = os.path.join(os.path.dirname(__file__), "libmagicdrive_native.so")


def load_library():
    if not os.path.isfile(_SO):
        raise OSError(f"native library not built: {_SO}")
    return ctypes.CDLL(_SO)
