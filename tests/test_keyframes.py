"""Keyframe graph on synthetic matches (no neural matcher needed)."""

import numpy as np
import pytest

from pats_tpu.slam.keyframes import Keyframe, KeyframeGraph


class _SyntheticMatcher:
    """Fake matcher: projects a fixed 3D point cloud through poses keyed by
    image identity (images are 1x1 arrays holding the frame index)."""

    def __init__(self, rng, n=300):
        self.pts = rng.uniform([-2, -2, 4], [2, 2, 9], size=(n, 3))
        self.K = np.array([[400.0, 0, 320], [0, 400.0, 240], [0, 0, 1]])
        self.poses = {}

    def pose(self, idx):
        ang = 0.12 * idx
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        t = np.array([0.8 * idx, 0.0, 0.0])
        return R, t

    def project(self, idx):
        R, t = self.pose(idx)
        pc = self.pts @ R.T + t
        uv = (self.K @ pc.T).T
        return uv[:, :2] / uv[:, 2:3]

    def match(self, img0, img1):
        i0, i1 = float(img0[0, 0, 0]), float(img1[0, 0, 0])
        p0 = self.project(i0)[:, ::-1]   # (row, col)
        p1 = self.project(i1)[:, ::-1]
        return p0, p1


def _frame(i):
    return np.full((1, 1, 1), float(i))


def test_keyframe_graph_builds_and_optimizes(rng):
    m = _SyntheticMatcher(rng)
    g = KeyframeGraph(K=m.K, min_inlier_ratio=2.0)  # force KF every frame
    g.add_first(_frame(0))
    for i in range(1, 4):
        tracked, kf = g.track(m, _frame(i))
        assert tracked
        assert kf is not None and kf.index == i
    assert len(g.landmarks) > 100
    mse = g.optimize(iters=4, damping=1e-6)
    assert mse < 1e-6, mse
    traj = g.trajectory()
    assert traj.shape == (4, 3)
    # with world->cam translation +0.8x per frame the camera centers
    # (-R^T t) march along -x; unit-baseline chaining keeps the direction
    # even though the absolute scale is unobservable
    dx = np.diff(traj[:, 0])
    assert (dx < 0).all()


def test_bootstrap_requires_parallax(rng):
    """With one keyframe, a near-zero-baseline frame must NOT spawn
    keyframe #2 (degenerate triangulation); a real-baseline frame must."""
    m = _SyntheticMatcher(rng)
    g = KeyframeGraph(K=m.K, min_inlier_ratio=2.0)
    g.add_first(_frame(0))
    tracked, kf = g.track(m, _frame(0.001))   # ~0.1 px median flow
    assert tracked and kf is None
    assert len(g.keyframes) == 1
    tracked, kf = g.track(m, _frame(1))       # ~50 px flow: init the map
    assert tracked and kf is not None
    assert len(g.keyframes) == 2
    assert len(g.landmarks) > 100


def test_windowed_local_ba(rng):
    """window=K: older keyframes stay EXACTLY fixed, window poses and
    co-observed landmarks improve."""
    m = _SyntheticMatcher(rng)
    g = KeyframeGraph(K=m.K, min_inlier_ratio=2.0)
    g.add_first(_frame(0))
    for i in range(1, 6):
        g.track(m, _frame(i))
    # perturb the last two keyframe poses + all landmarks slightly
    rs = np.random.default_rng(3)
    for kf in g.keyframes[-2:]:
        kf.t = kf.t + rs.normal(scale=0.02, size=3)
    old = [(kf.R.copy(), kf.t.copy()) for kf in g.keyframes[:-2]]
    mse = g.optimize(iters=5, damping=1e-6, window=2)
    assert mse < 1e-8, mse
    for (R0, t0), kf in zip(old, g.keyframes[:-2]):
        np.testing.assert_array_equal(kf.R, R0)
        np.testing.assert_array_equal(kf.t, t0)
