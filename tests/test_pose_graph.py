"""Pose-graph optimization + loop closure: synthetic-loop tests.

The done-criterion from round 1: on a synthetic loop sequence the
chained-odometry drift exceeds a bound before closure and drops under a
tighter bound after pose-graph optimization.
"""

import numpy as np
import pytest

from pats_tpu.slam.loopclosure import close_loops, find_loop_candidates
from pats_tpu.slam.pose_graph import (PoseGraph, exp_so3, graph_from_edges,
                                      log_so3, optimize_pose_graph)


def test_so3_roundtrip(rng):
    w = rng.normal(size=(16, 3)).astype(np.float32) * 0.8
    import jax.numpy as jnp

    R = exp_so3(jnp.asarray(w))
    w2 = np.asarray(log_so3(R))
    np.testing.assert_allclose(w2, w, atol=1e-4)
    # identity edge cases
    np.testing.assert_allclose(np.asarray(exp_so3(jnp.zeros(3))), np.eye(3),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(log_so3(jnp.eye(3))), np.zeros(3),
                               atol=1e-6)


def _circle_poses(n, radius=5.0):
    """World->cam poses looking inward on a circle (returns R (n,3,3),
    t (n,3), centers (n,3))."""
    Rs, ts, cs = [], [], []
    for k in range(n):
        a = 2 * np.pi * k / n
        c = np.array([radius * np.cos(a), radius * np.sin(a), 0.0])
        # camera z axis points at the origin
        z = -c / np.linalg.norm(c)
        x = np.array([-np.sin(a), np.cos(a), 0.0])
        y = np.cross(z, x)
        R = np.stack([x, y, z])            # rows = cam axes -> world->cam
        Rs.append(R)
        ts.append(-R @ c)
        cs.append(c)
    return np.stack(Rs), np.stack(ts), np.stack(cs)


def _rel(Ri, ti, Rj, tj):
    R = Rj @ Ri.T
    return R, tj - R @ ti


def _drifted_sequence(rng, n=12, noise=0.03):
    """GT loop + odometry with noise -> (gt, init chained poses, edges)."""
    Rg, tg, cg = _circle_poses(n)
    edges = []
    R_init = [Rg[0]]
    t_init = [tg[0]]
    for k in range(n - 1):
        R_ij, t_ij = _rel(Rg[k], tg[k], Rg[k + 1], tg[k + 1])
        # corrupt the measurement (accumulates into drift when chained)
        dR = np.asarray(exp_so3(rng.normal(size=3) * noise))
        R_m = dR @ R_ij
        t_m = t_ij + rng.normal(size=3) * noise
        edges.append((k, k + 1, R_m, t_m, 1.0))
        R_init.append(R_m @ R_init[-1])
        t_init.append(R_m @ t_init[-1] + t_m)
    return (Rg, tg, cg), (np.stack(R_init), np.stack(t_init)), edges


def _center_err(R, t, cg):
    centers = np.stack([-R[i].T @ t[i] for i in range(len(t))])
    return np.linalg.norm(centers - cg, axis=1).max()


def test_pgo_closes_drifted_loop(rng):
    (Rg, tg, cg), (R0, t0), edges = _drifted_sequence(rng)
    drift = _center_err(R0, t0, cg)
    assert drift > 0.25          # chained noise produced real drift

    # exact loop edge last->first
    n = len(Rg)
    R_loop, t_loop = _rel(Rg[n - 1], tg[n - 1], Rg[0], tg[0])
    pg = graph_from_edges(R0, t0, edges + [(n - 1, 0, R_loop, t_loop, 2.0)])
    R, t, hist = optimize_pose_graph(pg, iters=15)
    hist = np.asarray(hist)
    assert hist[-1] < hist[0]
    err = _center_err(np.asarray(R), np.asarray(t), cg)
    assert err < drift / 3
    assert err < 0.25


def test_pgo_gauge_fixed(rng):
    (_, _, _), (R0, t0), edges = _drifted_sequence(rng, n=6)
    pg = graph_from_edges(R0, t0, edges)
    R, t, _ = optimize_pose_graph(pg, iters=5)
    np.testing.assert_allclose(np.asarray(R)[0], R0[0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(t)[0], t0[0], atol=1e-5)


def test_find_loop_candidates():
    n, d = 12, 16
    rs = np.random.default_rng(3)
    descs = rs.normal(size=(n, d))
    descs /= np.linalg.norm(descs, axis=1, keepdims=True)
    descs[11] = descs[0]          # revisit: keyframe 11 sees keyframe 0
    cands = find_loop_candidates(descs, min_gap=5, min_similarity=0.9)
    assert (0, 11) in [(i, j) for i, j, _ in cands]
    # nothing above threshold -> empty
    assert find_loop_candidates(descs[1:11], min_gap=5,
                                min_similarity=0.999) == []


class _OracleMatcher:
    """Matcher stub backed by a synthetic 3D scene: match(i, j) projects
    shared world points into both cameras; embed returns a descriptor
    encoding the camera's viewing position."""

    def __init__(self, Rs, ts, K, n_pts=300, seed=0):
        rng = np.random.default_rng(seed)
        self.X = rng.normal(size=(n_pts, 3)) * 1.2
        self.Rs, self.ts, self.K = Rs, ts, K

    def _idx(self, image):
        return int(image[0, 0, 0])

    def _project(self, i):
        Xc = self.X @ self.Rs[i].T + self.ts[i]
        uv = Xc[:, :2] / Xc[:, 2:3]
        px = uv * self.K[0, 0] + self.K[[0, 1], [2, 2]][None]
        return px[:, [1, 0]], Xc[:, 2]       # (row, col), depth

    def match(self, image_i, image_j):
        i, j = self._idx(image_i), self._idx(image_j)
        pi, zi = self._project(i)
        pj, zj = self._project(j)
        keep = (zi > 0.2) & (zj > 0.2)
        return pi[keep].astype(np.float32), pj[keep].astype(np.float32)

    def embed(self, image):
        i = self._idx(image)
        c = -self.Rs[i].T @ self.ts[i]
        v = np.concatenate([c, [1.0]])
        return v / np.linalg.norm(v)


@pytest.mark.slow
def test_close_loops_end_to_end(rng):
    """KeyframeGraph-shaped object + oracle matcher: close_loops accepts
    the revisit edge and PGO pulls the drifted trajectory back."""
    from pats_tpu.slam.keyframes import Keyframe, KeyframeGraph

    n = 12
    (Rg, tg, cg), (R0, t0), edges = _drifted_sequence(rng, n=n)
    K = np.array([[200.0, 0, 64], [0, 200.0, 64], [0, 0, 1]])
    # oracle sees GT poses; keyframe 11's image revisits keyframe 0's view
    oracle = _OracleMatcher(Rg, tg, K)
    g = KeyframeGraph(K=K)
    for i in range(n):
        img = np.full((8, 8, 3), float(i), np.float32)
        g.keyframes.append(Keyframe(i, R0[i], t0[i], img,
                                    oracle.embed(img)))
    g.odo_edges = edges
    # make frames 0 and 11 look alike to retrieval
    g.keyframes[11].descriptor = g.keyframes[0].descriptor

    drift = _center_err(R0, t0, cg)
    accepted = close_loops(g, oracle, min_gap=5, min_similarity=0.99,
                           threshold_px=2.0, min_inliers=30)
    assert accepted == [(0, 11)]
    R = np.stack([k.R for k in g.keyframes])
    t = np.stack([k.t for k in g.keyframes])
    err = _center_err(R, t, cg)
    assert err < drift


@pytest.mark.slow
def test_close_loops_unit_norm_odometry(rng):
    """Production KeyframeGraph convention: odo_edges carry UNIT-norm
    translations.  The loop edge's translation must be scaled to the
    estimated i->j chord (here ~the 12-gon diameter, 3.9 units), not to
    the odometry step norm (1.0) — the old mean-of-norms rescale asserted
    a 1.0-length chord and stretched closed loops (round-2 review)."""
    from pats_tpu.slam.keyframes import Keyframe, KeyframeGraph

    n = 12
    Rg, tg, cg = _circle_poses(n)
    s = np.linalg.norm(cg[1] - cg[0])     # metric odometry step
    K = np.array([[200.0, 0, 64], [0, 200.0, 64], [0, 0, 1]])
    oracle = _OracleMatcher(Rg, tg, K)

    # chain unit-norm noisy odometry (the monocular scale convention)
    edges = []
    R_init, t_init = [Rg[0]], [tg[0] / s]
    for k in range(n - 1):
        R_ij, t_ij = _rel(Rg[k], tg[k], Rg[k + 1], tg[k + 1])
        dR = np.asarray(exp_so3(rng.normal(size=3) * 0.03))
        R_m = dR @ R_ij
        t_m = t_ij + rng.normal(size=3) * 0.03 * s
        t_m = t_m / np.linalg.norm(t_m)   # unit norm
        edges.append((k, k + 1, R_m, t_m, 1.0))
        R_init.append(R_m @ R_init[-1])
        t_init.append(R_m @ t_init[-1] + t_m)

    g = KeyframeGraph(K=K)
    for i in range(n):
        img = np.full((8, 8, 3), float(i), np.float32)
        g.keyframes.append(Keyframe(i, R_init[i], t_init[i], img,
                                    oracle.embed(img)))
    g.odo_edges = edges
    # retrieval: make the diametral pair (0, 6) look alike; its chord in
    # the unit-odometry frame is ~2R/s = 3.86, nowhere near 1.0
    g.keyframes[6].descriptor = g.keyframes[0].descriptor

    cg_unit = cg / s
    drift = _center_err(np.stack(R_init), np.stack(t_init), cg_unit)
    accepted = close_loops(g, oracle, min_gap=5, min_similarity=0.99,
                           threshold_px=2.0, min_inliers=30)
    assert accepted == [(0, 6)]
    R = np.stack([k.R for k in g.keyframes])
    t = np.stack([k.t for k in g.keyframes])
    err = _center_err(R, t, cg_unit)
    assert err < drift, (err, drift)
