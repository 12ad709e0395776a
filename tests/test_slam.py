"""Synthetic-geometry tests for the device RANSAC / triangulation / ATE."""

import numpy as np
import jax.numpy as jnp

from pats_tpu.slam.geometry import (
    decompose_essential,
    essential_from_matches,
    sampson_distance,
    triangulate,
)
from pats_tpu.slam.ate import absolute_trajectory_error, align_umeyama


def _synthetic(rng, n=256, outlier_frac=0.3, noise=1e-3):
    pts = rng.uniform([-2, -2, 4], [2, 2, 10], size=(n, 3))
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = 0.3
    K_ = np.eye(3)
    c, s = np.cos(ang), np.sin(ang)
    ax = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                   [-axis[1], axis[0], 0]])
    R = np.eye(3) * c + s * ax + (1 - c) * np.outer(axis, axis)
    t = np.array([1.0, 0.2, -0.1])

    x1 = pts[:, :2] / pts[:, 2:3]
    p2 = pts @ R.T + t
    x2 = p2[:, :2] / p2[:, 2:3]
    x1 = x1 + rng.normal(scale=noise, size=x1.shape)
    x2 = x2 + rng.normal(scale=noise, size=x2.shape)
    n_out = int(outlier_frac * n)
    out_idx = rng.choice(n, n_out, replace=False)
    x2[out_idx] += rng.uniform(-0.5, 0.5, size=(n_out, 2))
    inlier_gt = np.ones(n, bool)
    inlier_gt[out_idx] = False
    return (x1.astype(np.float32), x2.astype(np.float32), R, t, inlier_gt)


def test_ransac_essential_recovers_pose(rng):
    x1, x2, R_gt, t_gt, inlier_gt = _synthetic(rng)
    valid = jnp.ones(len(x1), bool)
    res = essential_from_matches(jnp.asarray(x1), jnp.asarray(x2), valid,
                                 threshold=5e-3)
    # most true inliers recovered, few false positives
    inl = np.asarray(res.inliers)
    recall = inl[inlier_gt].mean()
    precision = inlier_gt[inl].mean()
    assert recall > 0.9, recall
    assert precision > 0.9, precision

    R, t = decompose_essential(res.E, jnp.asarray(x1), jnp.asarray(x2),
                               res.inliers)
    R = np.asarray(R)
    t = np.asarray(t)
    ang = np.rad2deg(np.arccos(np.clip((np.trace(R.T @ R_gt) - 1) / 2,
                                       -1, 1)))
    t_dir = t / np.linalg.norm(t)
    t_gt_dir = t_gt / np.linalg.norm(t_gt)
    t_ang = np.rad2deg(np.arccos(np.clip(abs(t_dir @ t_gt_dir), -1, 1)))
    assert ang < 1.0, ang
    assert t_ang < 2.0, t_ang


def test_sampson_zero_for_exact(rng):
    x1, x2, R, t, inlier_gt = _synthetic(rng, outlier_frac=0.0, noise=0.0)
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    d = np.asarray(sampson_distance(jnp.asarray(E, jnp.float32),
                                    jnp.asarray(x1), jnp.asarray(x2)))
    assert d.max() < 1e-6


def test_triangulate_roundtrip(rng):
    x1, x2, R, t, _ = _synthetic(rng, outlier_frac=0.0, noise=0.0)
    X = np.asarray(triangulate(jnp.eye(3), jnp.zeros(3),
                               jnp.asarray(R, jnp.float32),
                               jnp.asarray(t, jnp.float32),
                               jnp.asarray(x1), jnp.asarray(x2)))
    reproj = X[:, :2] / X[:, 2:3]
    np.testing.assert_allclose(reproj, x1, atol=1e-3)


def test_ate_alignment(rng):
    traj = rng.normal(size=(50, 3)).astype(np.float32)
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1.0]])
    est = (2.5 * traj @ R.T + np.array([1, 2, 3])).astype(np.float32)
    # est is a similarity transform of traj -> ATE ~ 0 after alignment
    ate = float(absolute_trajectory_error(jnp.asarray(est),
                                          jnp.asarray(traj)))
    assert ate < 1e-4, ate
    s, R2, t2 = align_umeyama(jnp.asarray(est), jnp.asarray(traj))
    assert abs(float(s) - 1 / 2.5) < 1e-4


def test_write_ply(tmp_path, rng):
    from pats_tpu.slam.export import write_ply

    pts = rng.normal(size=(10, 3))
    colors = rng.integers(0, 256, (10, 3)).astype(np.uint8)
    path = str(tmp_path / "cloud.ply")
    write_ply(path, pts, colors)
    text = open(path).read()
    assert text.startswith("ply")
    assert "element vertex 10" in text
    assert len(text.strip().splitlines()) == 10 + 10  # header + points
