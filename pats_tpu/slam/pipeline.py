"""Matching -> pose pipeline: the on-device alternative to the host
OpenCV RANSAC path, plus a simple sequence-odometry runner for the demo
trajectory (north-star ATE harness).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pats_tpu.slam.geometry import (
    decompose_essential,
    essential_from_matches,
)


def normalize_keypoints(kpts_rc: np.ndarray, K: np.ndarray) -> np.ndarray:
    """(row, col) pixel keypoints -> normalized camera coordinates (x, y)."""
    xy = kpts_rc[:, [1, 0]].astype(np.float64)
    return ((xy - K[[0, 1], [2, 2]][None]) / K[[0, 1], [0, 1]][None]
            ).astype(np.float32)


def two_view_pose(ml: np.ndarray, mr: np.ndarray, K0: np.ndarray,
                  K1: np.ndarray, threshold_px: float = 0.5,
                  capacity: int = 4096, num_hypotheses: int = 512,
                  seed: int = 18027
                  ) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """Relative pose (R, t_dir, num_inliers) from (row, col) matches.

    Runs the batched device RANSAC + cheirality decomposition; returns
    None with fewer than 15 matches (the protocol's sentinel,
    utils/metrics.py:23-24).
    """
    if ml.shape[0] < 15:
        return None
    x1 = normalize_keypoints(ml, np.asarray(K0, np.float64))
    x2 = normalize_keypoints(mr, np.asarray(K1, np.float64))
    f_mean = float(np.mean([K0[0, 0], K1[1, 1], K0[0, 0], K1[1, 1]]))
    thresh = threshold_px / f_mean

    n = min(len(x1), capacity)
    x1p = np.zeros((capacity, 2), np.float32)
    x2p = np.zeros((capacity, 2), np.float32)
    x1p[:n] = x1[:n]
    x2p[:n] = x2[:n]
    valid = np.zeros(capacity, bool)
    valid[:n] = True

    res = essential_from_matches(
        jnp.asarray(x1p), jnp.asarray(x2p), jnp.asarray(valid),
        threshold=thresh, num_hypotheses=num_hypotheses,
        key=jax.random.PRNGKey(seed))
    R, t = decompose_essential(res.E, jnp.asarray(x1p), jnp.asarray(x2p),
                               res.inliers)
    return np.asarray(R), np.asarray(t), int(res.num_inliers)


def sequence_trajectory(matcher, frames, K: np.ndarray,
                        threshold_px: float = 0.5) -> List[np.ndarray]:
    """Odometry over a frame sequence: match consecutive frames, chain the
    (unit-scale) relative poses into camera centers.

    ``matcher`` is a pats_tpu.matcher.Matcher; ``frames`` an iterable of
    HWC images.  Returns the list of camera centers (world frame of frame
    0); translation scale is unobservable per pair, so centers are chained
    with unit baselines (evaluate with scale-aligned ATE).
    """
    centers = [np.zeros(3)]
    R_w = np.eye(3)
    t_w = np.zeros(3)
    prev = None
    for frame in frames:
        if prev is not None:
            ml, mr = matcher.match(prev, frame)
            pose = two_view_pose(ml, mr, K, K, threshold_px)
            if pose is not None:
                R, t, _ = pose
                # world-to-cam chaining: T_new = [R t] @ T_prev
                R_w = R @ R_w
                t_w = R @ t_w + t / max(np.linalg.norm(t), 1e-9)
                centers.append(-R_w.T @ t_w)
            else:
                centers.append(centers[-1])
        prev = frame
    return centers
