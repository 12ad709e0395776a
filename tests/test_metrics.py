"""Pose-metric tests with synthetic geometry: project random 3D points
through two known cameras and verify the estimated relative pose error is
near zero, and that AUC aggregation behaves."""

import numpy as np

from pats_tpu.utils.metrics import (
    aggregate_metrics,
    compute_pose_error,
    error_auc,
)
from pats_tpu.train.labels import make_pair_labels, to_level_labels


def _synthetic_pair(rng, n=200):
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    pts = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n, 3))
    R, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(R) < 0:
        R[:, 0] *= -1
    # small rotation: blend with identity
    R = np.eye(3) + 0.2 * (R - np.eye(3))
    U, _, Vt = np.linalg.svd(R)
    R = U @ Vt
    t = np.array([0.5, 0.1, 0.05])
    T0 = np.eye(4)
    T1 = np.eye(4)
    T1[:3, :3] = R
    T1[:3, 3] = t

    def project(T):
        p = (T[:3, :3] @ pts.T + T[:3, 3:4]).T
        uv = (K @ p.T).T
        return uv[:, :2] / uv[:, 2:3]

    kp0 = project(T0)
    kp1 = project(T1)
    return kp0[:, [1, 0]], kp1[:, [1, 0]], K, T0, T1   # (row, col)


def test_pose_error_perfect_matches(rng):
    kp0, kp1, K, T0, T1 = _synthetic_pair(rng)
    err_R, err_t = compute_pose_error(kp0, kp1, K, K, T0, T1)
    assert err_R < 0.5 and err_t < 2.0, (err_R, err_t)


def test_pose_error_too_few_matches(rng):
    kp0, kp1, K, T0, T1 = _synthetic_pair(rng, n=10)
    assert compute_pose_error(kp0, kp1, K, K, T0, T1) == (np.inf, np.inf)


def test_error_auc_extremes():
    perfect = error_auc([0.01] * 100)
    assert perfect["auc@5"] > 0.95
    terrible = error_auc([90.0] * 100)
    assert terrible["auc@5"] < 0.05
    agg = aggregate_metrics([1.0, 100.0], [2.0, 1.0])
    assert 0 < agg["auc@20"] < 1


def test_depth_labels_identity(rng):
    """Identity pose + constant depth: every patch projects onto itself."""
    K = np.array([[100.0, 0, 64], [0, 100.0, 64], [0, 0, 1]])
    depth = np.full((128, 128), 5.0)
    out = make_pair_labels(K, K, depth, depth, np.eye(4), np.eye(4))
    lab32 = out["labels"][0]          # patch 32 -> 4x4 patches
    assert lab32.shape == (16, 3)
    xs = np.arange(4) * 32 + 16
    want = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1)[..., ::-1]
    np.testing.assert_allclose(lab32[:, :2], want.reshape(16, 2), atol=1e-6)
    np.testing.assert_allclose(lab32[:, 2], 1.0)
    pos, cls = to_level_labels(lab32, 32)
    assert (cls == 1).all()
    np.testing.assert_allclose(pos[:, 0] * 32, want.reshape(16, 2)[:, 1])


def test_homography_labels_identity_and_scale():
    from pats_tpu.train.labels import homography_labels

    H = np.eye(3)
    lab = homography_labels(H, (128, 128), 32)
    assert lab.shape == (16, 3)
    xs = np.arange(4) * 32 + 16
    want = np.stack(np.meshgrid(xs, xs), -1).reshape(16, 2)
    np.testing.assert_allclose(lab[:, :2],
                               want[:, [0, 1]].astype(float), atol=1e-9)
    np.testing.assert_allclose(lab[:, 2], 1.0)

    # pure 2x scaling: projections at 2x, local scale 2; most leave the
    # image -> negatives
    H2 = np.diag([2.0, 2.0, 1.0])
    lab2 = homography_labels(H2, (128, 128), 32)
    inb = lab2[:, 0] > -1e6
    np.testing.assert_allclose(lab2[inb, 2], 2.0, rtol=1e-6)
    assert (~inb).sum() > 0


def test_rotate_pair_augment(rng):
    from pats_tpu.train.synthetic import rotate_pair_augment, warp_pair

    img = rng.integers(0, 255, (64, 64, 3), dtype=np.uint8)
    ex = warp_pair(img, np.random.default_rng(1), level=0,
                   max_rotation=0.01, max_scale=0.01, max_translation=0.005)
    # force a rotation by trying seeds until k != 0
    for seed in range(10):
        out = rotate_pair_augment(ex, np.random.default_rng(seed))
        if not np.array_equal(out["left"], ex["left"]):
            break
    assert out["left"].shape == ex["left"].shape
    assert set(np.unique(out["gt_class"])) <= {-1, 0, 1}
    # positive labels stay positive and in-range after remap
    m = out["gt_class"] == 1
    if m.any():
        assert (out["gt_pos"][m] >= 0).all()
        assert (out["gt_pos"][m] <= 2.0 + 1e-6).all()


def test_match_precision_recall_identity():
    from pats_tpu.utils.metrics import match_precision_recall

    ml = np.array([[10.0, 20.0], [30.0, 40.0], [50.0, 60.0]])
    res = match_precision_recall(ml, ml, np.eye(3))
    assert res["precision"] == 1.0
    mr = ml + np.array([[0.0, 10.0]])
    res2 = match_precision_recall(ml, mr, np.eye(3))
    assert res2["precision"] == 0.0


def test_epipolar_errors_perfect_and_offset(rng):
    """Exact projections lie on their GT epipolar lines; perturbing the
    right points perpendicular-ish to the line raises the px distance."""
    from pats_tpu.utils.metrics import epipolar_errors

    kp0, kp1, K, T0, T1 = _synthetic_pair(rng)
    d = epipolar_errors(kp0, kp1, K, K, T0, T1)
    assert np.abs(d).max() < 1e-6, np.abs(d).max()
    noisy = kp1 + rng.normal(scale=5.0, size=kp1.shape)
    dn = epipolar_errors(kp0, noisy, K, K, T0, T1)
    assert np.mean(np.abs(dn)) > 0.5
    assert epipolar_errors(kp0[:0], kp1[:0], K, K, T0, T1).shape == (0,)


def test_accuracy_breakdown():
    """Reference Compute_accuracy stats (utils/utils.py:551-575): R_* are
    max(err_R, err_t) per pair, T_* the min; AUC over the max errors."""
    from pats_tpu.utils.metrics import accuracy_breakdown

    out = accuracy_breakdown([0.2, 3.0, 30.0], [0.1, 10.0, 2.0],
                             point_errs=[0.5, 1.0, 9.0])
    # per-pair (hi, lo): (0.2, 0.1), (10, 3), (30, 2)
    assert out["R_0.5_accuracy"] == 1 / 3
    assert out["R_5_accuracy"] == 1 / 3
    assert out["T_5_accuracy"] == 3 / 3
    assert out["R_20_accuracy"] == 2 / 3
    assert out["R_median"] == 10.0 and out["T_median"] == 2.0
    assert out["err_median"] == 1.0
    assert 0 < out["auc@20"] < 1
