"""Scale-propagated VO + BA (slam/vo.py) vs unit-baseline chaining.

The round-4 demo-ATE residual was cross-frame scale drift: unit-baseline
chaining (pipeline.sequence_trajectory) assigns every pair the same
baseline, so a camera that changes speed produces trajectory error that
no per-pair accuracy removes.  These tests build an oracle matcher over
a synthetic scene on a VARIABLE-SPEED path and assert that

- unit chaining fails (scale-aligned ATE above a floor), and
- the landmark-depth scale propagation + multi-view-track BA recovers
  the path (ATE under a ceiling well below that floor).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pats_tpu.slam.ate import absolute_trajectory_error
from pats_tpu.slam.pipeline import sequence_trajectory
from pats_tpu.slam.vo import sequence_trajectory_ba

from test_pose_graph import _OracleMatcher

pytestmark = pytest.mark.slow


def _accelerating_path(n, step0=0.12, accel=1.25):
    """Sideways track whose per-frame step grows geometrically — the
    canonical case unit-baseline chaining cannot represent."""
    Rs, ts, cs = [], [], []
    x = -1.0
    step = step0
    for _ in range(n):
        c = np.array([x, 0.0, -6.0])
        R = np.eye(3)
        Rs.append(R)
        ts.append(-R @ c)
        cs.append(c)
        x += step
        step *= accel
    return np.stack(Rs), np.stack(ts), np.stack(cs)


def _ate(centers, cs):
    return float(absolute_trajectory_error(
        jnp.asarray(np.asarray(centers), jnp.float32),
        jnp.asarray(cs, jnp.float32)))


def test_vo_recovers_variable_speed():
    n = 10
    Rs, ts, cs = _accelerating_path(n)
    K = np.array([[300.0, 0, 64], [0, 300.0, 64], [0, 0, 1]])
    oracle = _OracleMatcher(Rs, ts, K, n_pts=400)
    frames = [np.full((8, 8, 3), float(i), np.float32) for i in range(n)]

    chained = sequence_trajectory(oracle, frames, K, threshold_px=2.0)
    ate_chain = _ate(chained, cs)
    # total path ~1.9 with steps 0.12 -> 0.9: equal steps are far off
    assert ate_chain > 0.15, ate_chain

    centers = sequence_trajectory_ba(oracle, frames, K, threshold_px=2.0,
                                     assoc_px=1.5)
    assert np.asarray(centers).shape == (n, 3)
    ate_vo = _ate(centers, cs)
    assert ate_vo < 0.05, (ate_vo, ate_chain)
    assert ate_vo < ate_chain / 3


class _NoisyOracle(_OracleMatcher):
    """Oracle + gaussian pixel noise + 10% gross outliers: the regime
    that diverged the unrobustified BA to NaN on the real demo run."""

    def __init__(self, *a, noise_px=0.5, outlier_frac=0.1, **kw):
        super().__init__(*a, **kw)
        self._noise = noise_px
        self._ofrac = outlier_frac
        self._rng = np.random.default_rng(7)

    def match(self, image_i, image_j):
        pi, pj = super().match(image_i, image_j)
        pj = pj + self._rng.normal(0, self._noise, pj.shape)
        n_out = int(len(pj) * self._ofrac)
        idx = self._rng.choice(len(pj), n_out, replace=False)
        pj[idx] += self._rng.uniform(20, 60, (n_out, 2))
        return pi.astype(np.float32), pj.astype(np.float32)


def test_vo_survives_outliers():
    n = 10
    Rs, ts, cs = _accelerating_path(n)
    K = np.array([[300.0, 0, 64], [0, 300.0, 64], [0, 0, 1]])
    oracle = _NoisyOracle(Rs, ts, K, n_pts=400)
    frames = [np.full((8, 8, 3), float(i), np.float32) for i in range(n)]
    centers = sequence_trajectory_ba(oracle, frames, K, threshold_px=2.0,
                                     assoc_px=2.5)
    assert np.isfinite(np.asarray(centers)).all()
    ate_vo = _ate(centers, cs)
    chained = sequence_trajectory(oracle, frames, K, threshold_px=2.0)
    ate_chain = _ate(chained, cs)
    # robust BA must stay finite and still beat unit chaining
    assert ate_vo < ate_chain, (ate_vo, ate_chain)
    assert ate_vo < 0.15, ate_vo   # measured 0.11 with 10% gross outliers


def test_vo_builds_multiview_tracks():
    """Scale coupling requires tracks seen by 3+ cameras — assert the
    association actually extends tracks instead of duplicating points."""
    n = 6
    Rs, ts, cs = _accelerating_path(n)
    K = np.array([[300.0, 0, 64], [0, 300.0, 64], [0, 0, 1]])
    oracle = _OracleMatcher(Rs, ts, K, n_pts=300)
    frames = [np.full((8, 8, 3), float(i), np.float32) for i in range(n)]
    centers, g = sequence_trajectory_ba(oracle, frames, K,
                                        threshold_px=2.0, assoc_px=1.5,
                                        return_graph=True)
    counts = np.bincount(np.asarray(g.obs_pt),
                         minlength=len(g.landmarks))
    assert (counts >= 3).sum() > 50, counts.max()
    assert counts.max() >= n - 1   # some landmark tracked through most frames
