"""ctypes bindings for the native (C++) data-loader image core.

Builds ``native/libivid_image.so`` on first use (``make -C native``) and
exposes PIL-compatible resample+crop kernels; callers fall back to PIL when the
toolchain or build is unavailable. See native/image_ops.cpp for semantics.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libivid_image.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _failed
    if _lib is not None or _failed:
        return _lib
    with _lock:
        if _lib is not None or _failed:
            return _lib
        try:
            if not os.path.exists(_LIB_PATH):
                subprocess.run(
                    ["make", "-C", _NATIVE_DIR],
                    check=True, capture_output=True, timeout=120,
                )
            lib = ctypes.CDLL(_LIB_PATH)
            lib.ivid_lanczos_resize_center_crop.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ]
            lib.ivid_nearest_resize_center_crop.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_float),
            ]
            _lib = lib
        except Exception as e:  # noqa: BLE001 — toolchain may be absent
            print(f"[ivid_tpu.data.native] native build unavailable: {e}")
            _failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def lanczos_resize_center_crop(img: np.ndarray, size: int) -> Optional[np.ndarray]:
    """uint8 [H,W,C] → float32 [size,size,C] in [0,1]; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[..., None]
    h, w, c = img.shape
    out = np.empty((size, size, c), np.float32)
    lib.ivid_lanczos_resize_center_crop(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, c, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out


def nearest_resize_center_crop(depth: np.ndarray, size: int) -> Optional[np.ndarray]:
    """float32 [H,W] → float32 [size,size]; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    depth = np.ascontiguousarray(depth, dtype=np.float32)
    h, w = depth.shape
    out = np.empty((size, size), np.float32)
    lib.ivid_nearest_resize_center_crop(
        depth.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out
