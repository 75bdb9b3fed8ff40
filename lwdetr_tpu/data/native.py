"""ctypes binding for the native preprocessing library (native/preproc.cpp).

Builds the .so on first use (g++ + libjpeg, both in the image); every entry
point has a PIL fallback so the Python pipeline works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

from lwdetr_tpu.data.transforms import IMAGENET_MEAN, IMAGENET_STD

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpreproc.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load():
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(["make", "-s", "-C", _NATIVE_DIR],
                               check=True, capture_output=True)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.decode_jpeg.restype = ctypes.c_int
            lib.jpeg_dims.restype = ctypes.c_int
            lib.decode_resize_normalize.restype = ctypes.c_int
            _lib = lib
        except Exception:
            _build_failed = True
        return _lib


def available() -> bool:
    return _load() is not None


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """JPEG bytes -> (H, W, 3) uint8 RGB, or None if unsupported."""
    lib = _load()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    if lib.jpeg_dims(data, ctypes.c_long(len(data)),
                     ctypes.byref(w), ctypes.byref(h)):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.decode_jpeg(
        data, ctypes.c_long(len(data)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.c_long(out.size), ctypes.byref(w), ctypes.byref(h))
    if rc:
        return None
    return out


def decode_resize_normalize(
    data: bytes, size: int,
    mean: np.ndarray = IMAGENET_MEAN, std: np.ndarray = IMAGENET_STD,
) -> Optional[Tuple[np.ndarray, int, int]]:
    """JPEG bytes -> (size, size, 3) float32 normalized + original (h, w).

    One native call fusing decode + antialiased square resize + normalize —
    the val/'val_speed' preprocessing path (reference datasets/coco.py:151-160)
    without Python in the loop.
    """
    lib = _load()
    if lib is None:
        return None
    out = np.empty((size, size, 3), np.float32)
    w = ctypes.c_int()
    h = ctypes.c_int()
    m = np.ascontiguousarray(mean, np.float32)
    s = np.ascontiguousarray(std, np.float32)
    rc = lib.decode_resize_normalize(
        data, ctypes.c_long(len(data)), ctypes.c_int(size),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.byref(w), ctypes.byref(h),
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc:
        return None
    return out, h.value, w.value


def load_image_fast(path: str, size: int):
    """Fused native path for square-resize eval preprocessing; returns
    (normalized float32 (size,size,3), orig_h, orig_w) or None."""
    if not path.lower().endswith((".jpg", ".jpeg")):
        return None
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    return decode_resize_normalize(data, size)
