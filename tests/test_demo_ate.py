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


def test_load_matcher_checkpoint_overlay(tmp_path):
    """A coarse-only checkpoint (tools/train_run.py --save) overlays onto
    the full cascade tree; a full checkpoint restores directly."""
    import jax
    import jax.numpy as jnp

    from pats_tpu.io.checkpoint import save_checkpoint
    from pats_tpu.slam.demo_ate import load_matcher_checkpoint

    variables = {
        "params": {"coarse": {"w": jnp.zeros((2,))},
                   "fine": {"w": jnp.ones((3,))},
                   "refine": {"w": jnp.ones((4,))}},
        "batch_stats": {"coarse": {"m": jnp.zeros((2,))},
                        "fine": {"m": jnp.zeros((3,))},
                        "refine": {"m": jnp.zeros((4,))}},
    }
    coarse_only = {"params": {"w": jnp.full((2,), 7.0)},
                   "batch_stats": {"m": jnp.full((2,), 3.0)}}
    p = str(tmp_path / "coarse_ckpt")
    save_checkpoint(p, coarse_only)
    out = load_matcher_checkpoint(p, variables)
    assert float(out["params"]["coarse"]["w"][0]) == 7.0
    assert float(out["batch_stats"]["coarse"]["m"][0]) == 3.0
    assert float(out["params"]["fine"]["w"][0]) == 1.0   # untouched

    p2 = str(tmp_path / "full_ckpt")
    full = jax.tree.map(lambda x: x + 1.0, variables)
    save_checkpoint(p2, full)
    out2 = load_matcher_checkpoint(p2, variables)
    assert float(out2["params"]["refine"]["w"][0]) == 2.0
