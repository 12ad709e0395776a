"""Demo-trajectory ATE regression: odometry + ATE on a synthetic path.

Exercises the full pose math of the demo harness (sequence_trajectory ->
two_view_pose -> chaining -> Umeyama ATE) with an oracle matcher over a
synthetic 3D scene, pinning the ATE under a bound.  The real-matcher
end-to-end run lives in tools/make_demo_sequence.py + slam/demo_ate.py
(needs trained weights for meaningful numbers).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from pats_tpu.slam.ate import absolute_trajectory_error
from pats_tpu.slam.pipeline import sequence_trajectory

from test_pose_graph import _OracleMatcher


def _line_path(n, step=0.25):
    """Constant-speed sideways track orbiting the scene at distance 6."""
    Rs, ts, cs = [], [], []
    for k in range(n):
        c = np.array([-(n - 1) / 2 * step + k * step, 0.0, -6.0])
        R = np.eye(3)
        Rs.append(R)
        ts.append(-R @ c)
        cs.append(c)
    return np.stack(Rs), np.stack(ts), np.stack(cs)


@pytest.mark.slow
def test_sequence_trajectory_ate_bound():
    n = 10
    Rs, ts, cs = _line_path(n)
    K = np.array([[300.0, 0, 64], [0, 300.0, 64], [0, 0, 1]])
    oracle = _OracleMatcher(Rs, ts, K, n_pts=400)
    frames = [np.full((8, 8, 3), float(i), np.float32) for i in range(n)]
    centers = sequence_trajectory(oracle, frames, K, threshold_px=2.0)
    est = np.asarray(centers)
    assert est.shape == (n, 3)
    ate = float(absolute_trajectory_error(
        jnp.asarray(est, jnp.float32), jnp.asarray(cs, jnp.float32)))
    # constant-baseline path: unit-scale chaining is exact up to one
    # global similarity -> scale-aligned ATE must be tiny
    assert ate < 0.05


def test_gt_loader(tmp_path):
    from pats_tpu.slam.demo_ate import load_gt_trajectory

    p = tmp_path / "gt.txt"
    p.write_text("# comment\n1 2 3\n4 5 6\n")
    np.testing.assert_array_equal(load_gt_trajectory(str(p)),
                                  [[1, 2, 3], [4, 5, 6]])
    # TUM style: timestamp then xyz
    p.write_text("0.0 1 2 3 0 0 0 1\n")
    np.testing.assert_array_equal(load_gt_trajectory(str(p)), [[1, 2, 3]])
