"""GT label generation by depth reprojection (host-side numpy).

Re-implements the semantics of reference ``Compute_depth_label``
(datasets/megadepth.py:12-80) and ``create_megadepth_label``
(megadepth.py:98-125): for every patch center of the source image, look up
a 2x2 depth average (zero-depth-aware), project through
P = K1 T1 (K0 T0)^-1, reject projections that leave the target image,
check cycle consistency by re-projecting with the target depth, and emit
per-patch labels:

  label[..., 0:2] = projected (x, y) target position in pixels, or -1 when
                    depth is missing / reprojection error > threshold, or
                    -1e7 in [0] when the projection leaves the image
                    (definite negative)
  label[..., 2]   = depth ratio d0/d1

Three levels with patch sizes 32/8/2 and thresholds 8/4/1 px
(megadepth.py:83-96).  The fundamental matrix for the epipolar losses is
also returned.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

LAYER_CONFIG = ((32, 8.0), (8, 4.0), (2, 1.0))
_UPPER = 1e7
_LOWER = 1e-11


def depth_reprojection_label(depth0: np.ndarray, depth1: np.ndarray,
                             P: np.ndarray, patch_size: int,
                             threshold: float) -> np.ndarray:
    """Labels for one direction at one level.

    Args:
      depth0/depth1: (H, W) depth maps.
      P: (4, 4) pixel-space transfer K1 T1 (K0 T0)^-1.
      patch_size: half the patch stride (the reference passes
        patch_size/2 and doubles internally; here pass the half directly).
      threshold: max cycle reprojection error in px.

    Returns (num_patches, 3) labels as documented above.
    """
    half = patch_size
    rows_n = depth0.shape[0] // half // 2
    cols_n = depth0.shape[1] // half // 2
    # patch-center sample positions (x = col, y = row), top-left of the 2x2
    xs = np.arange(cols_n) * 2 * half + half - 1
    ys = np.arange(rows_n) * 2 * half + half - 1
    gx = np.broadcast_to(xs[None, :], (rows_n, cols_n)).reshape(-1)
    gy = np.broadcast_to(ys[:, None], (rows_n, cols_n)).reshape(-1)

    # zero-aware 2x2 depth average at the source point
    d4 = np.stack([depth0[gy, gx], depth0[gy, gx + 1],
                   depth0[gy + 1, gx], depth0[gy + 1, gx + 1]], axis=-1)
    w4 = (d4 > _LOWER).astype(float)
    w4[d4.max(-1) < _LOWER] = 1.0
    d0 = np.average(d4, weights=w4, axis=-1)
    missing0 = d0 < _LOWER
    d0 = np.where(missing0, _UPPER, d0)

    ones = np.ones_like(d0)
    pin = np.stack([(gx + 1) * d0, (gy + 1) * d0, d0, ones], axis=-1)
    pout = pin @ P.T
    px = pout[:, 0] / pout[:, 2]
    py = pout[:, 1] / pout[:, 2]

    H1, W1 = depth1.shape
    off_image = (((px < 1) | (px >= W1 - 1) | (py < 1) | (py >= H1 - 1))
                 & ~missing0)

    # target depth: zero-aware 3x3 average around the rounded projection
    cx = np.round(px).astype(int)
    cy = np.round(py).astype(int)
    cx = np.where((px < 2) | (px >= W1 - 2), W1 // 2, cx)
    cy = np.where((py < 2) | (py >= H1 - 2), H1 // 2, cy)
    d9 = np.stack([depth1[cy + dy, cx + dx]
                   for dy in (-1, 0, 1) for dx in (-1, 0, 1)], axis=-1)
    w9 = (d9 > _LOWER).astype(float)
    w9[d9.max(-1) < _LOWER] = 1.0
    d1 = np.average(d9, weights=w9, axis=-1)
    d1 = np.where(d1 < _LOWER, _UPPER, d1)

    # cycle consistency: reproject the rounded target point back
    pin2 = np.stack([cx * d1, cy * d1, d1, np.ones_like(d1)], axis=-1)
    pback = pin2 @ np.linalg.inv(P).T
    bx = pback[:, 0] / pback[:, 2]
    by = pback[:, 1] / pback[:, 2]
    err = np.sqrt((gx + 1 - bx) ** 2 + (gy + 1 - by) ** 2)

    label = np.stack([px, py, d0 / d1], axis=-1)
    label[missing0] = -1.0
    label[err > threshold] = -1.0
    label[off_image, 0] = -_UPPER
    return label


def make_pair_labels(K0: np.ndarray, K1: np.ndarray,
                     depth0: np.ndarray, depth1: np.ndarray,
                     T0: np.ndarray, T1: np.ndarray) -> Dict[str, object]:
    """Three-level forward+reverse labels + fundamental matrix
    (create_megadepth_label, megadepth.py:98-125)."""
    K0h = np.identity(4)
    K0h[:3, :3] = K0[:3, :3]
    K1h = np.identity(4)
    K1h[:3, :3] = K1[:3, :3]
    P = K1h @ T1 @ np.linalg.inv(K0h @ T0)

    labels: List[np.ndarray] = []
    labels_rev: List[np.ndarray] = []
    for patch, thr in LAYER_CONFIG:
        labels.append(depth_reprojection_label(
            depth0, depth1, P, patch // 2, thr))
        labels_rev.append(depth_reprojection_label(
            depth1, depth0, np.linalg.inv(P), patch // 2, thr))

    pose = T1 @ np.linalg.inv(T0)
    t = pose[:3, 3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ pose[:3, :3]
    F = np.linalg.inv(K1[:3, :3]).T @ E @ np.linalg.inv(K0[:3, :3])
    return {"labels": labels, "labels_reverse": labels_rev, "F": F}


def homography_labels(H: np.ndarray, shape, patch_size: int) -> np.ndarray:
    """Patch-center labels from a known homography (the reference's
    homography-supervision path, utils/utils.py:807-927, in this
    framework's label idiom).

    Args:
      H: (3, 3) homography mapping source pixels to target pixels.
      shape: (height, width) of the source image.
      patch_size: label granularity (32 / 8 / 2).

    Returns (num_patches, 3): projected (x, y) target position and the
    local scale (sqrt of the Jacobian determinant); -1e7 in [0] marks
    projections that leave the image (definite negatives).
    """
    h, w = shape
    rows_n, cols_n = h // patch_size, w // patch_size
    ys = (np.arange(rows_n) + 0.5) * patch_size
    xs = (np.arange(cols_n) + 0.5) * patch_size
    gx, gy = np.meshgrid(xs, ys)
    pts = np.stack([gx.ravel(), gy.ravel(), np.ones(gx.size)], axis=-1)
    proj = pts @ H.T
    px = proj[:, 0] / proj[:, 2]
    py = proj[:, 1] / proj[:, 2]

    # local scale via the projective Jacobian determinant
    h11, h12, h13 = H[0]
    h21, h22, h23 = H[1]
    h31, h32, h33 = H[2]
    wden = pts @ H[2]
    ju = ((h11 * wden - h31 * proj[:, 0]) * (h22 * wden - h32 * proj[:, 1])
          - (h12 * wden - h32 * proj[:, 0])
          * (h21 * wden - h31 * proj[:, 1])) / wden ** 4
    scale = np.sqrt(np.abs(ju))

    label = np.stack([px, py, scale], axis=-1)
    off = (px < 1) | (px >= w - 1) | (py < 1) | (py >= h - 1)
    label[off, 0] = -_UPPER
    return label


def to_level_labels(raw: np.ndarray, patch_size: int):
    """(M, 3) raw labels -> (gt_pos (M, 2) in target-grid units (row, col),
    gt_class (M,) in {-1, 0, +1}) for pats_tpu.train.losses.LevelLabels."""
    gt_class = np.zeros(raw.shape[0], np.int32)
    gt_class[raw[:, 0] > -0.5] = 1
    gt_class[raw[:, 0] < -100] = -1
    pos = np.stack([raw[:, 1], raw[:, 0]], axis=-1) / patch_size
    pos[gt_class != 1] = -1.0
    return pos.astype(np.float32), gt_class
