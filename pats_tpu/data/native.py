"""ctypes bindings for the native host preprocessing library.

Builds native/libpreprocess.so on demand (g++ is available in the image)
and falls back to OpenCV when the toolchain is missing.  The native path
uses half-pixel bilinear sampling in float arithmetic; cv2 uses fixed
point, so outputs may differ by 1 LSB.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libpreprocess.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.resize_bilinear_u8.argtypes = [u8p] + [ctypes.c_int] * 3 + \
            [u8p] + [ctypes.c_int] * 3
        lib.crop_resize_pad_u8.argtypes = [u8p] + [ctypes.c_int] * 7 + \
            [u8p] + [ctypes.c_int] * 5
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bilinear(img: np.ndarray, out_h: int, out_w: int,
                    num_threads: int = 4) -> np.ndarray:
    """Half-pixel bilinear resize of a uint8 HWC image."""
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if lib is None:
        import cv2

        return cv2.resize(img, (out_w, out_h), interpolation=cv2.INTER_LINEAR)
    out = np.empty((out_h, out_w, c), np.uint8)
    lib.resize_bilinear_u8(_ptr(img), h, w, c, _ptr(out), out_h, out_w,
                           num_threads)
    return out


def crop_resize_pad(img: np.ndarray, crop_top: int, crop_left: int,
                    crop_h: int, crop_w: int, resize_h: int, resize_w: int,
                    out_h: int, out_w: int, num_threads: int = 4
                    ) -> np.ndarray:
    """Crop -> bilinear resize -> zero-pad bottom/right, in one native call
    (the full per-image preprocessing of the data layer)."""
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if lib is None:
        crop = img[crop_top:crop_top + crop_h, crop_left:crop_left + crop_w]
        res = resize_bilinear(crop, resize_h, resize_w, num_threads)
        out = np.zeros((out_h, out_w, c), np.uint8)
        out[:resize_h, :resize_w] = res
        return out
    out = np.empty((out_h, out_w, c), np.uint8)
    lib.crop_resize_pad_u8(_ptr(img), h, w, c, crop_top, crop_left, crop_h,
                           crop_w, _ptr(out), resize_h, resize_w, out_h,
                           out_w, num_threads)
    return out
