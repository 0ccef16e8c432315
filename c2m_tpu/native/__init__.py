"""ctypes bindings for the native region-overlap library, with a pure-numpy
fallback when the shared object hasn't been built (``make -C c2m_tpu/native``).

Replaces the reference's vendored Cython/C region library (SURVEY.md §2.7,
pysot/toolkit/utils/region.pyx) used by the tracker evaluation toolkit.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(os.path.dirname(__file__), "libc2m_native.so")
_lib: Optional[ctypes.CDLL] = None


def _load(build_if_missing: bool = True) -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib or None
    if not os.path.exists(_LIB_PATH) and build_if_missing:
        try:
            subprocess.run(["make", "-C", os.path.dirname(__file__)],
                           check=True, capture_output=True)
        except Exception:
            pass
    if os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.c2m_rect_iou.restype = ctypes.c_double
        lib.c2m_rect_iou.argtypes = [ctypes.c_double] * 8
        lib.c2m_polygon_iou.restype = ctypes.c_double
        lib.c2m_polygon_iou.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int]
        lib.c2m_rect_iou_matrix.restype = None
        lib.c2m_rect_iou_matrix.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double)]
        _lib = lib
        return lib
    _lib = False
    return None


def rect_iou(a, b) -> float:
    """IoU of two (x, y, w, h) rects."""
    lib = _load()
    if lib is not None:
        return lib.c2m_rect_iou(*map(float, a), *map(float, b))
    ix = max(0.0, min(a[0] + a[2], b[0] + b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[1] + a[3], b[1] + b[3]) - max(a[1], b[1]))
    inter = ix * iy
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union > 0 else 0.0


def rect_iou_matrix(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """[n1, 4] x [n2, 4] (x, y, w, h) -> [n1, n2] IoU matrix."""
    boxes1 = np.ascontiguousarray(boxes1, np.float64)
    boxes2 = np.ascontiguousarray(boxes2, np.float64)
    lib = _load()
    if lib is not None:
        out = np.zeros((len(boxes1), len(boxes2)), np.float64)
        lib.c2m_rect_iou_matrix(
            boxes1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(boxes1),
            boxes2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(boxes2),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        return out
    x1a, y1a = boxes1[:, 0:1], boxes1[:, 1:2]
    x2a, y2a = x1a + boxes1[:, 2:3], y1a + boxes1[:, 3:4]
    x1b, y1b = boxes2[None, :, 0], boxes2[None, :, 1]
    x2b, y2b = x1b + boxes2[None, :, 2], y1b + boxes2[None, :, 3]
    ix = np.maximum(0.0, np.minimum(x2a, x2b) - np.maximum(x1a, x1b))
    iy = np.maximum(0.0, np.minimum(y2a, y2b) - np.maximum(y1a, y1b))
    inter = ix * iy
    union = (boxes1[:, 2:3] * boxes1[:, 3:4]
             + (boxes2[None, :, 2] * boxes2[None, :, 3]) - inter)
    return np.where(union > 0, inter / union, 0.0)


def polygon_iou(poly1: np.ndarray, poly2: np.ndarray) -> float:
    """IoU of two convex polygons, [n, 2] vertex arrays."""
    poly1 = np.ascontiguousarray(poly1, np.float64)
    poly2 = np.ascontiguousarray(poly2, np.float64)
    lib = _load()
    if lib is None:
        raise RuntimeError("native region library unavailable; run "
                           "`make -C c2m_tpu/native`")
    return lib.c2m_polygon_iou(
        poly1.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(poly1),
        poly2.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(poly2))
