"""Loop closure: place recognition + geometric verification + PGO.

Completes the keyframe back-end (slam/keyframes.py): without closures,
chained two-view odometry drifts unboundedly on long sequences.  The
pipeline is the classic one, built from this framework's own pieces:

1. retrieval — every keyframe carries a global descriptor
   (Matcher.embed: coarse-trunk features, mean-pooled); candidate pairs
   are non-adjacent keyframes above a cosine-similarity threshold,
2. verification — the candidate pair is matched with the full cascade
   and passed through the batched device RANSAC
   (slam/pipeline.two_view_pose); enough inliers promote it to a
   loop edge with the measured relative pose,
3. correction — sequential odometry edges + loop edges are optimized
   by the SE(3) pose-graph Gauss-Newton (slam/pose_graph.py).

No reference analog (zju3dv/pats ships no SLAM back-end).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import numpy as np

from pats_tpu.slam.pipeline import two_view_pose
from pats_tpu.slam.pose_graph import graph_from_edges, optimize_pose_graph


def find_loop_candidates(descs: np.ndarray, min_gap: int = 5,
                         min_similarity: float = 0.85,
                         max_candidates: int = 5
                         ) -> List[Tuple[int, int, float]]:
    """Cosine-similarity retrieval over keyframe descriptors.

    Returns up to ``max_candidates`` (i, j, similarity) pairs with
    j - i >= min_gap, best first.  ``descs``: (N, D) L2-normalized.
    """
    d = np.asarray(descs, np.float32)
    n = len(d)
    if n < min_gap + 1:
        return []
    sim = d @ d.T
    ii, jj = np.triu_indices(n, k=min_gap)
    vals = sim[ii, jj]
    order = np.argsort(-vals)
    out = []
    for o in order[: max_candidates * 4]:
        if vals[o] < min_similarity:
            break
        out.append((int(ii[o]), int(jj[o]), float(vals[o])))
        if len(out) >= max_candidates:
            break
    return out


def verify_loop(matcher, image_i: np.ndarray, image_j: np.ndarray,
                K: np.ndarray, threshold_px: float = 0.5,
                min_inliers: int = 50
                ) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """Match the candidate pair and estimate the relative pose; returns
    (R_ij, t_ij_unit, n_inliers) or None when verification fails."""
    ml, mr = matcher.match(image_i, image_j)
    if len(ml) < min_inliers:
        return None
    pose = two_view_pose(ml, mr, K, K, threshold_px)
    if pose is None:
        return None
    R_rel, t_rel, n_inl = pose
    if int(n_inl) < min_inliers:
        return None
    t_unit = t_rel / max(np.linalg.norm(t_rel), 1e-9)
    return np.asarray(R_rel), np.asarray(t_unit), int(n_inl)


def close_loops(graph, matcher, min_gap: int = 5,
                min_similarity: float = 0.85, threshold_px: float = 0.5,
                min_inliers: int = 50, loop_weight: float = 2.0,
                pgo_iters: int = 10) -> List[Tuple[int, int]]:
    """Detect + verify loop closures on a KeyframeGraph and correct its
    poses with pose-graph optimization.  Returns the accepted (i, j)
    loop edges.  Requires keyframes with stored images and descriptors
    (KeyframeGraph.track fills both when the matcher has ``embed``)."""
    kfs = graph.keyframes
    descs = [k.descriptor for k in kfs if k.descriptor is not None]
    if len(descs) != len(kfs) or len(kfs) < min_gap + 1:
        return []
    cands = find_loop_candidates(np.stack(descs), min_gap, min_similarity)
    accepted = []
    edges = list(graph.odo_edges)
    for i, j, _sim in cands:
        got = verify_loop(matcher, kfs[i].image, kfs[j].image, graph.K,
                          threshold_px, min_inliers)
        if got is None:
            continue
        R_ij, t_ij, _n = got
        # the two-view translation is DIRECTION-only (monocular, unit
        # norm); its magnitude is unobservable.  Mark the edge
        # scale_free: the PGO rescales it to the current estimate's
        # i->j chord at every relinearization, so the edge constrains
        # rotation + bearing without asserting a fictitious metric gap
        # (an always-1.0 norm would stretch closed loops).
        edges.append((i, j, R_ij, t_ij, loop_weight, True))
        accepted.append((i, j))
    if not accepted:
        return []
    pg = graph_from_edges(np.stack([k.R for k in kfs]),
                          np.stack([k.t for k in kfs]), edges)
    R, t, _hist = optimize_pose_graph(pg, iters=pgo_iters)
    R, t = np.asarray(R), np.asarray(t)
    old = [(kf.R, kf.t) for kf in kfs]
    for idx, kf in enumerate(kfs):
        kf.R, kf.t = R[idx], t[idx]
    _correct_landmarks(graph, old)
    return accepted


def _correct_landmarks(graph, old_poses) -> None:
    """Move each landmark with its anchor keyframe's PGO correction so the
    map stays consistent with the corrected trajectory (a follow-up BA
    would otherwise fight huge residuals against the drifted map).  The
    anchor is the landmark's first observing keyframe; its camera-frame
    coordinates are held fixed: X' = R_new^T (R_old X + t_old - t_new)."""
    landmarks = getattr(graph, "landmarks", None)
    if not landmarks:
        return
    anchor = {}
    for cam, pid in zip(graph.obs_cam, graph.obs_pt):
        anchor.setdefault(pid, cam)
    kfs = graph.keyframes
    for pid, X in enumerate(landmarks):
        a = anchor.get(pid)
        if a is None:
            continue
        R_old, t_old = old_poses[a]
        kf = kfs[a]
        landmarks[pid] = kf.R.T @ (R_old @ X + t_old - kf.t)
