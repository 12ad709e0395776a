"""Relative-pose evaluation: RANSAC essential matrix + pose AUC.

Implements the reference measurement protocol (utils/metrics.py:21-96):
(row, col) keypoints are flipped to (x, y), normalized by the intrinsics,
an essential matrix is estimated with OpenCV RANSAC at threshold
``threshold / f_mean`` and confidence 1-1e-5, the pose is recovered from
the best candidate, and errors are angular distances (with the 180deg
translation ambiguity fold).  AUC integrates the recall curve at
5/10/20 degrees.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def scale_intrinsics(K: np.ndarray, scales) -> np.ndarray:
    s = np.diag([1.0 / scales[0], 1.0 / scales[1], 1.0])
    return s @ K


def angle_error_mat(R1: np.ndarray, R2: np.ndarray) -> float:
    cos = (np.trace(R1.T @ R2) - 1) / 2
    return float(np.rad2deg(np.abs(np.arccos(np.clip(cos, -1.0, 1.0)))))


def angle_error_vec(v1: np.ndarray, v2: np.ndarray) -> float:
    n = np.linalg.norm(v1) * np.linalg.norm(v2)
    return float(np.rad2deg(np.arccos(np.clip(np.dot(v1, v2) / n, -1.0, 1.0))))


def _adjusted_cameras(K1, K2, T1, T2, scale_factor: float):
    """Reference evaluation-scale intrinsics adjustment + relative pose
    (utils/utils.py:536-541): the right image was resized by
    ``scale_factor`` and both principal points shifted by the 640x480
    half-size offset."""
    K1 = np.array(K1, dtype=np.float64)
    K2 = np.array(K2, dtype=np.float64)
    K2 = scale_intrinsics(K2, [1.0 / scale_factor, 1.0 / scale_factor])
    if scale_factor > 1.0:
        K1[:2, 2] += np.asarray([int((scale_factor - 1) * 320),
                                 int((scale_factor - 1) * 240)])
    else:
        K2[:2, 2] += np.asarray([int((1 - scale_factor) * 320),
                                 int((1 - scale_factor) * 240)])
    relative = np.asarray(T2, np.float64) @ np.linalg.inv(
        np.asarray(T1, np.float64))
    return K1, K2, relative


def epipolar_errors(kp1: np.ndarray, kp2: np.ndarray,
                    K1: np.ndarray, K2: np.ndarray,
                    T1: np.ndarray, T2: np.ndarray,
                    scale_factor: float = 1.0) -> np.ndarray:
    """Per-match signed distance (px) of the right point to the left
    point's ground-truth epipolar line (reference get_pose_error,
    utils/utils.py:365-373: F_gt from the GT relative pose, distance
    normalized by the line's image-plane norm).  kp1/kp2 (N, 2) are in
    (row, col) order."""
    if kp1.shape[0] == 0:
        return np.zeros((0,), np.float64)
    K1, K2, relative = _adjusted_cameras(K1, K2, T1, T2, scale_factor)
    t = relative[:3, 3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E_gt = tx @ relative[:3, :3]
    F_gt = np.linalg.inv(K2).T @ E_gt @ np.linalg.inv(K1)
    p1 = np.concatenate([kp1[:, [1, 0]].astype(np.float64),
                         np.ones((len(kp1), 1))], axis=1)
    p2 = np.concatenate([kp2[:, [1, 0]].astype(np.float64),
                         np.ones((len(kp2), 1))], axis=1)
    line = p1 @ F_gt.T
    num = np.einsum("ij,ij->i", p2, line)
    # a degenerate epipolar line (keypoint at the epipole) has zero
    # image-plane norm; report inf distance instead of a 0/0 warning
    norm = np.sqrt(line[:, 0] ** 2 + line[:, 1] ** 2)
    return np.where(norm > 0, num / np.where(norm > 0, norm, 1.0), np.inf)


def compute_pose_error(kp1: np.ndarray, kp2: np.ndarray,
                       K1: np.ndarray, K2: np.ndarray,
                       T1: np.ndarray, T2: np.ndarray,
                       scale_factor: float = 1.0,
                       threshold: float = 0.25) -> Tuple[float, float]:
    """(rotation error deg, translation error deg); (inf, inf) with <15
    matches.  kp1/kp2 are (N, 2) in (row, col) order."""
    import cv2

    if kp1.shape[0] < 15:
        return np.inf, np.inf

    kp1 = kp1[:, [1, 0]].astype(np.float64)
    kp2 = kp2[:, [1, 0]].astype(np.float64)
    K1, K2, relative = _adjusted_cameras(K1, K2, T1, T2, scale_factor)

    f_mean = np.mean([K1[0, 0], K2[1, 1], K1[0, 0], K2[1, 1]])
    norm_thresh = threshold / f_mean

    kp1 = (kp1 - K1[[0, 1], [2, 2]][None]) / K1[[0, 1], [0, 1]][None]
    kp2 = (kp2 - K2[[0, 1], [2, 2]][None]) / K2[[0, 1], [0, 1]][None]

    E, mask = cv2.findEssentialMat(kp1, kp2, np.eye(3),
                                   threshold=norm_thresh, prob=1 - 1e-5,
                                   method=cv2.RANSAC)
    if E is None:
        return np.inf, np.inf

    best = None
    best_inliers = 0
    for sub in np.split(E, len(E) / 3):
        n, R, t, _ = cv2.recoverPose(sub, kp1, kp2, np.eye(3), 1e9, mask=mask)
        if n > best_inliers:
            best_inliers = n
            best = (R, t[:, 0])
    if best is None:
        return np.inf, np.inf
    R, t = best

    R_gt = relative[:3, :3]
    t_gt = relative[:3, 3]
    err_t = angle_error_vec(t, t_gt)
    err_t = min(err_t, 180 - err_t)   # E-matrix sign ambiguity
    err_R = angle_error_mat(R, R_gt)
    return err_R, err_t


def error_auc(errors, thresholds=(5, 10, 20)) -> Dict[str, float]:
    errors = [0] + sorted(float(e) for e in errors)
    recall = list(np.linspace(0, 1, len(errors)))
    aucs = {}
    for thr in thresholds:
        last = np.searchsorted(errors, thr)
        y = recall[:last] + [recall[last - 1]]
        x = errors[:last] + [thr]
        aucs[f"auc@{thr}"] = float(np.trapezoid(y, x) / thr)
    return aucs


def aggregate_metrics(error_R: List[float], error_t: List[float]
                      ) -> Dict[str, float]:
    pose_errors = np.max(np.stack([np.asarray(error_R),
                                   np.asarray(error_t)]), axis=0)
    return error_auc(pose_errors)


def accuracy_breakdown(error_R: List[float], error_t: List[float],
                       point_errs: List[float] = None) -> Dict[str, float]:
    """The reference's full printed accuracy report (Compute_accuracy,
    utils/utils.py:551-584): threshold accuracies and medians over the
    per-pair max/min angular errors, plus the median of the per-pair mean
    |epipolar distance|.  Matches the reference's variable-name quirk:
    its "R_errors" is max(err_R, err_t) per pair and "T_errors" the min,
    so R_* keys here are max-error stats and T_* keys min-error stats.
    ``point_errs``: per-pair mean |epipolar px error| (epipolar_errors).
    """
    hi = np.max(np.stack([np.asarray(error_R, np.float64),
                          np.asarray(error_t, np.float64)]), axis=0)
    lo = np.min(np.stack([np.asarray(error_R, np.float64),
                          np.asarray(error_t, np.float64)]), axis=0)
    out = {
        "R_0.5_accuracy": float(np.mean(hi < 0.5)),
        "R_5_accuracy": float(np.mean(hi < 5)),
        "T_5_accuracy": float(np.mean(lo < 5)),
        "R_20_accuracy": float(np.mean(hi < 20)),
        "T_20_accuracy": float(np.mean(lo < 20)),
        "R_median": float(np.median(hi)),
        "T_median": float(np.median(lo)),
    }
    if point_errs is not None and len(point_errs):
        out["err_median"] = float(np.median(np.asarray(point_errs)))
    out.update(error_auc(hi))
    return out


def match_precision_recall(ml: np.ndarray, mr: np.ndarray,
                           H: np.ndarray, threshold_px: float = 3.0
                           ) -> Dict[str, float]:
    """Correspondence-level precision under a known homography.

    Equivalent of the reference's accuracy/recall breakdown
    (Compute_accuracy, utils/utils.py:356-608) for homography-supervised
    pairs: a match (row, col) -> (row, col) is correct when H maps the
    left point within ``threshold_px`` of the right point.
    """
    if len(ml) == 0:
        return {"precision": 0.0, "num_matches": 0}
    xy = np.concatenate([ml[:, [1, 0]], np.ones((len(ml), 1))], axis=1)
    proj = xy @ np.asarray(H, np.float64).T
    proj = proj[:, :2] / proj[:, 2:3]
    err = np.linalg.norm(proj - mr[:, [1, 0]], axis=1)
    return {
        "precision": float((err < threshold_px).mean()),
        "median_err_px": float(np.median(err)),
        "num_matches": int(len(ml)),
    }
