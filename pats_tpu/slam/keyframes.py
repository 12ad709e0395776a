"""Keyframe graph: incremental mapping over matched pairs.

Host-side bookkeeping around the device math (slam/geometry.py RANSAC /
triangulation, slam/ba.py bundle adjustment): keyframes are added when the
inlier ratio against the last keyframe drops (viewpoint changed), matches
are triangulated into landmarks, and windows of the graph are refined with
the Schur-complement BA.

This is deliberately simple, deterministic scaffolding for the north-star
engine: fixed-capacity observation arrays, explicit world-to-camera
poses.  Loop closure lives in slam/loopclosure.py (retrieval over
keyframe descriptors + RANSAC verification + pose-graph optimization)
and is reached via ``close_loops``.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from pats_tpu.slam.ba import (BAProblem, build_point_tracks,
                              run_bundle_adjustment)
from pats_tpu.slam.geometry import triangulate
from pats_tpu.slam.pipeline import normalize_keypoints, two_view_pose


@dataclass
class Keyframe:
    index: int
    R: np.ndarray                  # (3, 3) world->cam
    t: np.ndarray                  # (3,)
    image: Optional[np.ndarray] = None
    descriptor: Optional[np.ndarray] = None   # place-recognition gdesc


@dataclass
class KeyframeGraph:
    K: np.ndarray                  # (3, 3) shared intrinsics
    min_inlier_ratio: float = 0.6  # below this vs last KF -> new keyframe
    # bootstrap: the 2nd keyframe needs real parallax (median match flow in
    # px) or its triangulation is degenerate (monocular-init criterion)
    min_bootstrap_flow_px: float = 12.0
    keyframes: List[Keyframe] = field(default_factory=list)
    landmarks: List[np.ndarray] = field(default_factory=list)   # (3,) world
    obs_cam: List[int] = field(default_factory=list)
    obs_pt: List[int] = field(default_factory=list)
    obs_uv: List[np.ndarray] = field(default_factory=list)      # normalized
    # sequential odometry measurements (i, j, R_ij, t_ij_unit, weight)
    # kept for pose-graph optimization at loop closure
    odo_edges: List[tuple] = field(default_factory=list)

    def add_first(self, image: Optional[np.ndarray] = None,
                  matcher=None) -> Keyframe:
        kf = Keyframe(0, np.eye(3), np.zeros(3), image,
                      self._embed(matcher, image))
        self.keyframes.append(kf)
        return kf

    @staticmethod
    def _embed(matcher, image):
        if matcher is not None and image is not None \
                and hasattr(matcher, "embed"):
            return matcher.embed(image)
        return None

    def track(self, matcher, image: np.ndarray,
              threshold_px: float = 0.5) -> Tuple[bool, Optional[Keyframe]]:
        """Match against the last keyframe; spawn a keyframe on low
        overlap.  Returns (tracked, new_keyframe_or_None)."""
        last = self.keyframes[-1]
        if last.image is None:
            raise ValueError("keyframes need stored images for tracking")
        ml, mr = matcher.match(last.image, image)
        if len(ml) < 15:
            # matching failed outright (scene cut, blur): report tracking
            # lost — even during bootstrap, where a zero-flow reading
            # must not masquerade as "waiting for parallax"
            return False, None
        if len(self.keyframes) == 1:
            # bootstrapping: wait for parallax before spawning keyframe #2
            # (a zero-baseline pair triangulates to garbage)
            flow = float(np.median(np.linalg.norm(ml - mr, axis=1)))
            if flow < self.min_bootstrap_flow_px:
                return True, None
        pose = two_view_pose(ml, mr, self.K, self.K, threshold_px)
        if pose is None:
            return False, None
        R_rel, t_rel, n_inl = pose
        ratio = n_inl / max(len(ml), 1)
        if ratio >= self.min_inlier_ratio and len(self.keyframes) > 1:
            return True, None
        # chain pose (unit-scale baseline) and spawn a keyframe
        t_unit = t_rel / max(np.linalg.norm(t_rel), 1e-9)
        R_new = R_rel @ last.R
        t_new = R_rel @ last.t + t_unit
        kf = Keyframe(len(self.keyframes), R_new, t_new, image,
                      self._embed(matcher, image))
        self.keyframes.append(kf)
        self.odo_edges.append((last.index, kf.index, np.asarray(R_rel),
                               np.asarray(t_unit), 1.0))
        self._triangulate_pair(last, kf, ml, mr)
        return True, kf

    def _triangulate_pair(self, kf0: Keyframe, kf1: Keyframe,
                          ml: np.ndarray, mr: np.ndarray,
                          max_points: int = 512):
        x0 = normalize_keypoints(ml, self.K)[:max_points]
        x1 = normalize_keypoints(mr, self.K)[:max_points]
        X = np.asarray(triangulate(
            jnp.asarray(kf0.R, jnp.float32), jnp.asarray(kf0.t, jnp.float32),
            jnp.asarray(kf1.R, jnp.float32), jnp.asarray(kf1.t, jnp.float32),
            jnp.asarray(x0), jnp.asarray(x1)))
        # keep points in front of both cameras with sane depth
        z0 = (X @ kf0.R.T + kf0.t)[:, 2]
        z1 = (X @ kf1.R.T + kf1.t)[:, 2]
        keep = (z0 > 0.1) & (z1 > 0.1) & (np.abs(X) < 1e3).all(1)
        for j in np.nonzero(keep)[0]:
            pid = len(self.landmarks)
            self.landmarks.append(X[j])
            self.obs_cam += [kf0.index, kf1.index]
            self.obs_pt += [pid, pid]
            self.obs_uv += [x0[j], x1[j]]

    def optimize(self, iters: int = 5, damping: float = 1e-4,
                 window: Optional[int] = None, max_track: int = 8,
                 huber_px: float = 0.0, gate_px: float = 0.0) -> float:
        """Bundle-adjust the graph; returns final MSE.

        ``window=None``: full BA (camera 0 is the gauge anchor).
        ``window=K``: local/sliding-window BA — only the last K
        keyframes move; landmarks they observe are refined, and older
        cameras co-observing those landmarks participate FROZEN (they
        anchor scale/gauge without being solved for).  This keeps
        mapping cost bounded as the graph grows — the standard local-BA
        scheme (e.g. ORB-SLAM); the reference has no mapping back-end.

        Both paths use the sparse track-table Schur solve (slam/ba.py
        ``tracks``), never materializing the dense (M, P, 6, 3) cross
        blocks.

        ``huber_px`` > 0 robustifies the solve (IRLS sqrt-Huber weights
        past that pixel error); ``gate_px`` > 0 drops observations whose
        INITIAL reprojection error exceeds it (mismatches triangulated
        to garbage otherwise dominate the normal equations — the
        round-5 demo sequence diverged to NaN without both).
        """
        M = len(self.keyframes)
        if M < 2 or not self.landmarks:
            return 0.0
        obs_cam = np.asarray(self.obs_cam, np.int32)
        obs_pt = np.asarray(self.obs_pt, np.int32)
        obs_uv = np.stack(self.obs_uv).astype(np.float32)

        if window is None or window >= M:
            cam_order = np.arange(M)
            n_fixed = 1
            keep_obs = np.arange(len(obs_cam))
            pt_sel = np.arange(len(self.landmarks))
        else:
            free_from = M - window
            pt_sel = np.unique(obs_pt[obs_cam >= free_from])
            keep_obs = np.nonzero(np.isin(obs_pt, pt_sel))[0]
            cams_in = np.unique(obs_cam[keep_obs])
            frozen = cams_in[cams_in < free_from]
            free = np.arange(free_from, M)
            cam_order = np.concatenate([frozen, free])
            # local BA needs an anchor: with no frozen co-observer the
            # oldest window camera becomes the gauge
            n_fixed = max(len(frozen), 1)
        if len(pt_sel) == 0 or len(keep_obs) == 0:
            return 0.0
        cam_remap = np.full(M, -1, np.int32)
        cam_remap[cam_order] = np.arange(len(cam_order))
        pt_remap = np.full(len(self.landmarks), -1, np.int32)
        pt_remap[pt_sel] = np.arange(len(pt_sel))

        cam_idx = cam_remap[obs_cam[keep_obs]]
        pt_idx = pt_remap[obs_pt[keep_obs]]
        valid = np.ones(len(keep_obs), bool)
        f = float(np.mean([self.K[0, 0], self.K[1, 1]]))
        if gate_px > 0.0:
            # initial-reprojection outlier gate (normalized coords)
            Rs = np.stack([self.keyframes[i].R for i in cam_order])
            ts = np.stack([self.keyframes[i].t for i in cam_order])
            Xs = np.stack([self.landmarks[j] for j in pt_sel])
            pc = np.einsum("oij,oj->oi", Rs[cam_idx], Xs[pt_idx]) \
                + ts[cam_idx]
            z = np.maximum(pc[:, 2], 1e-6)
            res = pc[:, :2] / z[:, None] - obs_uv[keep_obs]
            valid &= (np.linalg.norm(res, axis=1) <= gate_px / f) \
                & (pc[:, 2] > 1e-3)
        tracks = build_point_tracks(pt_idx, valid, len(pt_sel), max_track)
        prob = BAProblem(
            R=jnp.asarray(np.stack([self.keyframes[i].R
                                    for i in cam_order]), jnp.float32),
            t=jnp.asarray(np.stack([self.keyframes[i].t
                                    for i in cam_order]), jnp.float32),
            X=jnp.asarray(np.stack([self.landmarks[j] for j in pt_sel]),
                          jnp.float32),
            cam_idx=jnp.asarray(cam_idx),
            pt_idx=jnp.asarray(pt_idx),
            uv=jnp.asarray(obs_uv[keep_obs]),
            valid=jnp.asarray(valid))
        out, hist = run_bundle_adjustment(
            prob, iters=iters, damping=damping,
            tracks=jnp.asarray(tracks), n_fixed=n_fixed,
            huber_delta=huber_px / f if huber_px > 0.0 else 0.0)
        R = np.asarray(out.R)
        t = np.asarray(out.t)
        # frozen cams get dx == 0; skip them to avoid an f32 round-trip
        skip = n_fixed if window is not None and window < M else 0
        for k, i in enumerate(cam_order):
            if k >= skip:
                self.keyframes[i].R = R[k]
                self.keyframes[i].t = t[k]
        X = np.asarray(out.X)
        for k, j in enumerate(pt_sel):
            self.landmarks[j] = X[k]
        return float(np.asarray(hist)[-1])

    def close_loops(self, matcher, **kwargs):
        """Detect/verify loop closures and correct poses with PGO; see
        slam/loopclosure.close_loops.  Returns accepted (i, j) edges."""
        from pats_tpu.slam.loopclosure import close_loops

        return close_loops(self, matcher, **kwargs)

    def trajectory(self) -> np.ndarray:
        """(N, 3) camera centers."""
        return np.stack([-k.R.T @ k.t for k in self.keyframes])
