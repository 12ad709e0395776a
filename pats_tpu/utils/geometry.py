"""Host-side image/intrinsics geometry helpers for the data layer.

Semantics follow the reference's preprocessing (utils/utils.py:943-957,
1102-1131): aspect-preserving center-crop + resize, the matching intrinsics
rescale, and the /32-aligned zero-padding used by every dataset.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def resize_ratio(shape_origin, shape) -> Tuple[float, np.ndarray]:
    """Scale + principal-point shift for crop-resize (utils.py:943-957).

    shapes are (w, h).  Returns (ratio, add_num) with add_num the (x, y)
    crop offset in original pixels.
    """
    w, h = float(shape_origin[0]), float(shape_origin[1])
    w_new, h_new = float(shape[0]), float(shape[1])
    h_w = h_new / w_new
    add = [0.0, 0.0]
    if w / w_new < h / h_new:
        ratio = w_new / w
        add[1] = (h - w * h_w) / 2
    else:
        ratio = h_new / h
        add[0] = (w - h / h_w) / 2
    return ratio, np.array(add)


def crop_resize_image(img: np.ndarray, shape) -> np.ndarray:
    """Center-crop to the target aspect ratio, then resize (utils.py:1118)."""
    import cv2

    h, w = img.shape[:2]
    w_new, h_new = int(shape[0]), int(shape[1])
    if w / w_new < h / h_new:
        gap = int((h - w / w_new * h_new) / 2)
        img = img[gap:h - gap, :]
    else:
        gap = int((w - h / h_new * w_new) / 2)
        img = img[:, gap:w - gap]
    return cv2.resize(img, (w_new, h_new))


def rescale_intrinsics(K: np.ndarray, shape_origin, shape) -> np.ndarray:
    """Apply the crop-resize transform to a 3x3 intrinsics matrix."""
    r, add = resize_ratio(shape_origin, shape)
    K = np.array(K, dtype=np.float64)
    K[0:3, 0:3] = r * K[0:3, 0:3]
    K[2, 2] = 1
    K[0:2, 2] -= add * r
    return K


def pad_to(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Zero-pad bottom/right to (height, width)."""
    h, w = img.shape[:2]
    pad = [(0, height - h), (0, width - w)] + [(0, 0)] * (img.ndim - 2)
    return np.pad(img, pad)


def align32_up(x: int) -> int:
    """Next multiple of 32 (strictly rounding up non-multiples)."""
    return x // 32 * 32 + (0 if x % 32 == 0 else 32)
