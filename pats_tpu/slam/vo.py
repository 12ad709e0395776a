"""Monocular visual odometry with landmark scale propagation + BA.

``pipeline.sequence_trajectory`` chains UNIT-baseline two-view poses —
per-pair translation scale is unobservable, so any speed change in the
real camera path becomes trajectory error that no amount of per-pair
accuracy removes (the round-4 demo-ATE's dominant residual).  This module
closes that loop with the classic monocular recipe the reference has no
counterpart for (it ships matching only; BASELINE.md's north star asks
for the trajectory):

1. every frame becomes a camera; pair (i-1, i) contributes a two-view
   pose (device RANSAC, slam/geometry.py) with a unit translation;
2. the new pair's matches in frame i-1 are ASSOCIATED by pixel distance
   with landmarks already observed in frame i-1; the median ratio of the
   landmark depth to the unit-baseline triangulated depth recovers the
   pair's metric scale relative to the bootstrap pair's gauge;
3. associated matches extend the existing landmark's track into frame i
   (multi-view observations — exactly what couples scale across pairs in
   bundle adjustment); the rest are triangulated fresh at the recovered
   scale;
4. the Schur-complement BA (slam/ba.py) refines all poses + landmarks
   jointly over the multi-view tracks.

The global gauge (scale of the whole map) stays free, as in any
monocular system; evaluate with the scale-aligned ATE (slam/ate.py).
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import jax.numpy as jnp

from pats_tpu.slam.geometry import triangulate
from pats_tpu.slam.keyframes import Keyframe, KeyframeGraph
from pats_tpu.slam.pipeline import normalize_keypoints, two_view_pose


def _triangulate_np(R0, t0, R1, t1, x0, x1):
    X = np.asarray(triangulate(
        jnp.asarray(R0, jnp.float32), jnp.asarray(t0, jnp.float32),
        jnp.asarray(R1, jnp.float32), jnp.asarray(t1, jnp.float32),
        jnp.asarray(x0, jnp.float32), jnp.asarray(x1, jnp.float32)))
    return X


def _associate(prev_px: np.ndarray, ml_px: np.ndarray, tol: float):
    """Nearest-match association: for each row of ``prev_px`` (landmark
    pixels in the shared frame) the closest row of ``ml_px`` within
    ``tol`` px.  Returns (landmark_rows, match_rows)."""
    if len(prev_px) == 0 or len(ml_px) == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    d = np.linalg.norm(prev_px[:, None, :] - ml_px[None, :, :], axis=2)
    j = d.argmin(axis=1)
    keep = d[np.arange(len(prev_px)), j] <= tol
    return np.nonzero(keep)[0], j[keep]


def sequence_trajectory_ba(matcher, frames, K: np.ndarray,
                           threshold_px: float = 0.5,
                           assoc_px: float = 3.0,
                           max_points: int = 512,
                           ba_iters: int = 30,
                           ba_every: int = 0,
                           min_scale_assoc: int = 8,
                           max_track_cap: int = 10,
                           scale_mode: str = "propagate",
                           return_graph: bool = False):
    """Camera centers for a frame sequence via scale-propagated VO + BA.

    ``ba_every > 0`` additionally runs a sliding-window BA every that
    many frames (windowed to 2*ba_every cameras); the full-graph BA at
    the end runs either way.  Returns (N, 3) centers, or (centers,
    KeyframeGraph) with ``return_graph``.

    ``scale_mode`` picks the BA initialization: "propagate" recovers
    each pair's metric scale from re-observed landmark depths (right
    when the camera speed varies — the error unit chaining cannot
    remove), "unit" keeps unit baselines like ``sequence_trajectory``
    (a better init when the speed is near constant, since the depth-
    ratio estimate adds multiplicative noise).  Either way the
    multi-view tracks couple scale across pairs, so the final BA
    re-estimates the relative baselines from the data.
    """
    assert scale_mode in ("propagate", "unit"), scale_mode
    frames = list(frames)
    g = KeyframeGraph(K=np.asarray(K, np.float64))
    g.keyframes.append(Keyframe(0, np.eye(3), np.zeros(3)))
    # per-keyframe landmark pixel table for association: lm_px[i] is a
    # (ids list, (n, 2) row/col pixel array) pair for frame i
    lm_ids: List[np.ndarray] = [np.zeros(0, np.int64)]
    lm_px: List[np.ndarray] = [np.zeros((0, 2), np.float32)]
    scale = 1.0

    for i in range(1, len(frames)):
        prev_kf = g.keyframes[-1]
        ml, mr = matcher.match(frames[i - 1], frames[i])
        pose = two_view_pose(ml, mr, K, K, threshold_px)
        if pose is None:
            # tracking failure: freeze the pose (same convention as
            # sequence_trajectory) and break the landmark chain
            g.keyframes.append(Keyframe(i, prev_kf.R.copy(),
                                        prev_kf.t.copy()))
            lm_ids.append(np.zeros(0, np.int64))
            lm_px.append(np.zeros((0, 2), np.float32))
            continue
        R_rel, t_rel, _ = pose
        t_unit = t_rel / max(np.linalg.norm(t_rel), 1e-9)

        # spread the observation budget over the match set
        if len(ml) > max_points:
            sel = np.linspace(0, len(ml) - 1, max_points).astype(np.int64)
            ml_s, mr_s = ml[sel], mr[sel]
        else:
            ml_s, mr_s = ml, mr
        x0 = normalize_keypoints(ml_s, K)
        x1 = normalize_keypoints(mr_s, K)

        # candidate pose at UNIT baseline for depth comparison
        R_new = R_rel @ prev_kf.R
        t_new_u = R_rel @ prev_kf.t + t_unit
        X_u = _triangulate_np(prev_kf.R, prev_kf.t, R_new, t_new_u, x0, x1)
        z_prev_u = (X_u @ prev_kf.R.T + prev_kf.t)[:, 2]

        # scale from depths of landmarks re-observed in frame i-1
        li, mi = _associate(lm_px[i - 1], ml_s, assoc_px)
        pair_scale = scale  # fallback: carry the previous pair's scale
        if scale_mode == "unit":
            pair_scale = 1.0
        elif len(li) >= min_scale_assoc:
            ids = lm_ids[i - 1][li]
            X_old = np.stack([g.landmarks[p] for p in ids])
            z_old = (X_old @ prev_kf.R.T + prev_kf.t)[:, 2]
            z_new = z_prev_u[mi]
            ok = (z_old > 0.05) & (z_new > 0.05)
            if ok.sum() >= min_scale_assoc:
                r = z_old[ok] / z_new[ok]
                r = r[(r > 0.05) & (r < 20.0)]
                if len(r) >= min_scale_assoc:
                    pair_scale = float(np.median(r))
        scale = pair_scale

        t_new = R_rel @ prev_kf.t + scale * t_unit
        kf = Keyframe(i, R_new, t_new)
        g.keyframes.append(kf)
        g.odo_edges.append((i - 1, i, R_rel, t_unit, 1.0))

        # triangulate at the recovered scale
        X = _triangulate_np(prev_kf.R, prev_kf.t, R_new, t_new, x0, x1)
        z0 = (X @ prev_kf.R.T + prev_kf.t)[:, 2]
        z1 = (X @ R_new.T + t_new)[:, 2]
        sane = (z0 > 0.05) & (z1 > 0.05) & (np.abs(X) < 1e3).all(1)

        assoc_of_match = np.full(len(ml_s), -1, np.int64)
        assoc_of_match[mi] = lm_ids[i - 1][li]
        ids_i, px_i = [], []
        for m in range(len(ml_s)):
            pid = assoc_of_match[m]
            if pid >= 0:
                # extend the existing track into frame i (multi-view)
                g.obs_cam.append(i)
                g.obs_pt.append(int(pid))
                g.obs_uv.append(x1[m])
            elif sane[m]:
                pid = len(g.landmarks)
                g.landmarks.append(X[m])
                g.obs_cam += [i - 1, i]
                g.obs_pt += [pid, pid]
                g.obs_uv += [x0[m], x1[m]]
            else:
                continue
            ids_i.append(pid)
            px_i.append(mr_s[m])
        lm_ids.append(np.asarray(ids_i, np.int64))
        lm_px.append(np.asarray(px_i, np.float32).reshape(-1, 2))

        if ba_every and i % ba_every == 0 and len(g.keyframes) > 2:
            _safe_optimize(g, iters=ba_iters, window=2 * ba_every,
                           max_track=min(len(g.keyframes) + 1,
                                         max_track_cap))

    if len(g.landmarks):
        # the Schur cross terms are quadratic in the track-table width
        # (P, T, T, 6, 6): T = 25 on a 24-frame sequence OOM'd a 16 GB
        # v5e (~17 GB with remat copies).  Cap T — observations beyond
        # it still contribute to U/V/b exactly; only the camera coupling
        # of the overflow tail degrades to block-Jacobi
        # (ba.build_point_tracks docstring).
        _safe_optimize(g, iters=ba_iters, window=None,
                       max_track=min(len(g.keyframes) + 1, max_track_cap))
    centers = g.trajectory()
    return (centers, g) if return_graph else centers


def _safe_optimize(g: KeyframeGraph, **kwargs):
    """BA with real-matcher hygiene: outlier gate + Huber weights, and a
    full rollback if the solve still diverges (non-finite poses/points
    must never replace a finite trajectory)."""
    snap = ([ (kf.R.copy(), kf.t.copy()) for kf in g.keyframes ],
            [x.copy() for x in g.landmarks])
    g.optimize(huber_px=3.0, gate_px=8.0, **kwargs)
    finite = all(np.isfinite(kf.R).all() and np.isfinite(kf.t).all()
                 for kf in g.keyframes) \
        and all(np.isfinite(x).all() for x in g.landmarks)
    if not finite:
        for kf, (R, t) in zip(g.keyframes, snap[0]):
            kf.R, kf.t = R, t
        g.landmarks[:] = snap[1]
