"""Bundle adjustment: synthetic SfM convergence + sharded equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pats_tpu.slam.ba import BAProblem, run_bundle_adjustment


def _synthetic_ba(rng, n_cams=4, n_pts=60, noise=0.02):
    pts = rng.uniform([-2, -2, 4], [2, 2, 8], size=(n_pts, 3))
    Rs, ts, obs = [], [], []
    for i in range(n_cams):
        ang = 0.1 * i
        R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                      [-np.sin(ang), 0, np.cos(ang)]])
        t = np.array([0.5 * i, 0.0, 0.0])
        Rs.append(R)
        ts.append(t)
    cam_idx, pt_idx, uv = [], [], []
    for i in range(n_cams):
        pc = pts @ Rs[i].T + ts[i]
        proj = pc[:, :2] / pc[:, 2:3]
        for j in range(n_pts):
            cam_idx.append(i)
            pt_idx.append(j)
            uv.append(proj[j])
    # perturb initial states
    R0 = np.stack(Rs)
    t0 = np.stack(ts) + np.concatenate(
        [np.zeros((1, 3)), rng.normal(scale=noise, size=(n_cams - 1, 3))])
    X0 = pts + rng.normal(scale=noise, size=pts.shape)
    prob = BAProblem(
        R=jnp.asarray(R0, jnp.float32), t=jnp.asarray(t0, jnp.float32),
        X=jnp.asarray(X0, jnp.float32),
        cam_idx=jnp.asarray(cam_idx, jnp.int32),
        pt_idx=jnp.asarray(pt_idx, jnp.int32),
        uv=jnp.asarray(np.stack(uv), jnp.float32),
        valid=jnp.ones(len(uv), bool))
    return prob, pts, np.stack(Rs), np.stack(ts)


def test_ba_converges(rng):
    prob, pts_gt, R_gt, t_gt = _synthetic_ba(rng)
    out, hist = run_bundle_adjustment(prob, iters=8, damping=1e-6)
    hist = np.asarray(hist)
    assert hist[-1] < 1e-10, hist
    # camera 0 is the gauge anchor; camera poses recovered
    np.testing.assert_allclose(np.asarray(out.t)[1], t_gt[1], atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.R)[2], R_gt[2], atol=1e-3)


def test_ba_sharded_matches_single(rng):
    """Observations sharded over the mesh + psum == single device."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    prob, *_ = _synthetic_ba(rng, n_cams=4, n_pts=64)
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("obs",))

    single, hist1 = run_bundle_adjustment(prob, iters=3, damping=1e-6)

    def sharded_run(R, t, X, cam_idx, pt_idx, uv, valid):
        p = BAProblem(R, t, X, cam_idx, pt_idx, uv, valid)
        out, hist = run_bundle_adjustment(p, iters=3, damping=1e-6,
                                          axis_name="obs")
        return out.R, out.t, out.X, hist

    fn = shard_map(
        sharded_run, mesh=mesh,
        in_specs=(P(), P(), P(), P("obs"), P("obs"), P("obs"), P("obs")),
        out_specs=(P(), P(), P(), P()))
    R2, t2, X2, hist2 = fn(prob.R, prob.t, prob.X, prob.cam_idx,
                           prob.pt_idx, prob.uv, prob.valid)
    np.testing.assert_allclose(np.asarray(hist2), np.asarray(hist1),
                               rtol=1e-3, atol=1e-9)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(single.t),
                               atol=1e-4)


def test_ba_sparse_tracks_matches_dense(rng):
    """Track-table Schur path == dense-W path, bitwise-compatible GN."""
    from pats_tpu.slam.ba import build_point_tracks

    prob, *_ = _synthetic_ba(rng, n_cams=5, n_pts=40)
    # drop some observations so tracks have uneven lengths
    valid = np.asarray(prob.valid).copy()
    valid[rng.choice(len(valid), size=30, replace=False)] = False
    prob = prob._replace(valid=jnp.asarray(valid))
    tracks = build_point_tracks(prob.pt_idx, prob.valid, prob.X.shape[0],
                                max_track=8)
    dense, h1 = run_bundle_adjustment(prob, iters=4, damping=1e-6)
    sparse, h2 = run_bundle_adjustment(prob, iters=4, damping=1e-6,
                                       tracks=jnp.asarray(tracks))
    # f32 accumulation order differs (segment_sum over tracks vs dense
    # einsum); histories agree to absolute noise at converged magnitudes
    np.testing.assert_allclose(np.asarray(h2), np.asarray(h1),
                               rtol=1e-3, atol=1e-10)
    assert np.asarray(h2)[-1] < 1e-10
    np.testing.assert_allclose(np.asarray(sparse.t), np.asarray(dense.t),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(sparse.X), np.asarray(dense.X),
                               atol=1e-3)


def test_ba_n_fixed_freezes_cameras(rng):
    prob, *_ = _synthetic_ba(rng, n_cams=5, n_pts=40)
    out, _ = run_bundle_adjustment(prob, iters=3, damping=1e-6, n_fixed=3)
    np.testing.assert_array_equal(np.asarray(out.R)[:3],
                                  np.asarray(prob.R)[:3])
    np.testing.assert_array_equal(np.asarray(out.t)[:3],
                                  np.asarray(prob.t)[:3])
    # free cameras moved
    assert np.abs(np.asarray(out.t)[3:] - np.asarray(prob.t)[3:]).max() > 0
