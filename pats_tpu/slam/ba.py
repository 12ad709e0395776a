"""Gauss-Newton bundle adjustment with a Schur-complement camera solve.

TPU-first formulation: observations are a fixed-capacity masked array; all
Jacobian blocks are built with batched einsums, the per-camera (U), per-
point (V) and cross (W) normal-equation blocks accumulate with
segment-sums, and the reduced camera system

    S = U - W V^-1 W^T,    S dx_c = b_c - W V^-1 b_p

is assembled densely (6M x 6M) and solved with Cholesky.  Under a device
mesh the observation axis shards and U/V/W/b accumulate with ``psum``
(pass ``axis_name``), which is exactly the distributed-BA reduction the
north star asks for.

Parameterization: world-to-camera poses, right-multiplied se3 increments
(R exp(w), t + dt); points in world coordinates; pinhole normalized
observations.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class BAProblem(NamedTuple):
    R: jnp.ndarray        # (M, 3, 3) world->cam rotations
    t: jnp.ndarray        # (M, 3)
    X: jnp.ndarray        # (P, 3) world points
    cam_idx: jnp.ndarray  # (O,) int32
    pt_idx: jnp.ndarray   # (O,) int32
    uv: jnp.ndarray       # (O, 2) normalized observations
    valid: jnp.ndarray    # (O,) bool


def _hat(w):
    zeros = jnp.zeros_like(w[..., 0])
    return jnp.stack([
        jnp.stack([zeros, -w[..., 2], w[..., 1]], -1),
        jnp.stack([w[..., 2], zeros, -w[..., 0]], -1),
        jnp.stack([-w[..., 1], w[..., 0], zeros], -1),
    ], -2)


def _exp_so3(w):
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)[..., None]
    K = _hat(w / jnp.maximum(jnp.linalg.norm(w, axis=-1, keepdims=True),
                             1e-12))
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    return (eye + jnp.sin(theta) * K
            + (1 - jnp.cos(theta)) * (K @ K))


def _residual_jacobians(prob: BAProblem, huber_delta: float = 0.0):
    """Per-observation residuals + camera/point Jacobian blocks.

    ``huber_delta`` > 0 applies the standard IRLS/Triggs robust
    weighting: residual and Jacobians scale by sqrt(min(1, delta/|r|)),
    so observations past delta (normalized-coordinate units) contribute
    linearly instead of quadratically — without it a handful of
    mismatched PATS correspondences (triangulated to garbage) dominates
    the normal equations and Gauss-Newton diverges (NaN on the round-5
    demo sequence)."""
    Rc = prob.R[prob.cam_idx]                     # (O, 3, 3)
    tc = prob.t[prob.cam_idx]                     # (O, 3)
    Xp = prob.X[prob.pt_idx]                      # (O, 3)
    pc = jnp.einsum("oij,oj->oi", Rc, Xp) + tc    # camera-frame points
    z = jnp.maximum(pc[:, 2], 1e-6)
    proj = pc[:, :2] / z[:, None]
    r = proj - prob.uv                            # (O, 2)

    # d proj / d pc
    inv_z = 1.0 / z
    dproj = jnp.stack([
        jnp.stack([inv_z, jnp.zeros_like(z), -pc[:, 0] * inv_z ** 2], -1),
        jnp.stack([jnp.zeros_like(z), inv_z, -pc[:, 1] * inv_z ** 2], -1),
    ], -2)                                        # (O, 2, 3)
    # camera: pc = R exp(w) X + t + dt  =>  d pc/d w = -R [X]_x ; d pc/dt = I
    dw = -jnp.einsum("oij,ojk->oik", Rc, _hat(Xp))
    A = jnp.concatenate([jnp.einsum("oij,ojk->oik", dproj, dw), dproj],
                        axis=-1)                  # (O, 2, 6)
    # point: d pc/d X = R
    B = jnp.einsum("oij,ojk->oik", dproj, Rc)     # (O, 2, 3)
    w = prob.valid[:, None].astype(r.dtype)
    # a point behind (or grazing) the camera plane has a clamped z and
    # O(1/z^2) Jacobians that poison the normal equations — mask it out
    # entirely rather than letting the clamp manufacture huge gradients
    w = w * (pc[:, 2:3] > 1e-3).astype(r.dtype)
    if huber_delta > 0.0:
        rn = jnp.linalg.norm(r, axis=-1, keepdims=True)
        w = w * jnp.sqrt(jnp.minimum(1.0, huber_delta
                                     / jnp.maximum(rn, 1e-12)))
    return r * w, A * w[..., None], B * w[..., None]


def _robust_mse(prob: BAProblem, huber_delta: float = 0.0,
                axis_name: Optional[str] = None):
    """Huber-weighted mean squared residual (the LM acceptance cost) —
    residuals only, no Jacobian work."""
    Rc = prob.R[prob.cam_idx]
    tc = prob.t[prob.cam_idx]
    Xp = prob.X[prob.pt_idx]
    pc = jnp.einsum("oij,oj->oi", Rc, Xp) + tc
    z = jnp.maximum(pc[:, 2], 1e-6)
    r = pc[:, :2] / z[:, None] - prob.uv
    w = prob.valid[:, None].astype(r.dtype)
    w = w * (pc[:, 2:3] > 1e-3).astype(r.dtype)
    if huber_delta > 0.0:
        rn = jnp.linalg.norm(r, axis=-1, keepdims=True)
        w = w * jnp.sqrt(jnp.minimum(1.0, huber_delta
                                     / jnp.maximum(rn, 1e-12)))
    r = r * w
    sq = jnp.sum(jnp.square(r))
    denom = jnp.maximum(jnp.sum(prob.valid), 1)
    if axis_name is not None:
        sq = jax.lax.psum(sq, axis_name)
        denom = jax.lax.psum(denom, axis_name)
    return sq / denom


def build_point_tracks(pt_idx, valid, num_points: int,
                       max_track: int = 8):
    """Host-side point-major observation table for the sparse Schur path.

    Returns (P, max_track) int32 of observation indices, -1 padded.
    Observations beyond ``max_track`` per point still contribute to
    U/V/b exactly, but are absent from every track-table consumer: the
    Schur cross terms AND the W^T dx_c term of the point
    back-substitution, so the overflow point's update is a block-Jacobi
    approximation (its V/b_p see all observations, its camera coupling
    only the first max_track).  Shapes stay static; size max_track above
    the realistic track length (a landmark is seen by few keyframes) so
    the approximation is never exercised.
    """
    import numpy as np

    pt = np.asarray(pt_idx)
    ok = np.asarray(valid)
    tracks = np.full((num_points, max_track), -1, np.int32)
    fill = np.zeros(num_points, np.int32)
    for o in np.nonzero(ok)[0]:
        p = pt[o]
        if fill[p] < max_track:
            tracks[p, fill[p]] = o
            fill[p] += 1
    return tracks


def gauss_newton_step(prob: BAProblem, damping: float = 1e-4,
                      axis_name: Optional[str] = None,
                      tracks: Optional[jnp.ndarray] = None,
                      n_fixed: int = 1, huber_delta: float = 0.0
                      ) -> Tuple[BAProblem, jnp.ndarray]:
    """One damped GN step; returns (updated problem, mean sq residual).

    With ``axis_name`` the normal-equation accumulations psum over the
    mesh axis (observations sharded, states replicated).

    With ``tracks`` (point-major observation table, build_point_tracks)
    the camera-point cross blocks are never materialized as the dense
    (M, P, 6, 3) W array: the Schur products reduce over each point's
    track instead — O(P * D^2) memory/work for track cap D, the same
    sparsity a CPU solver (e.g. ceres SPARSE_SCHUR) exploits.  Single
    device only (the track table is point-major while psum shards
    observations).

    ``n_fixed`` leading cameras are frozen (gauge / sliding-window BA).
    """
    if tracks is not None and axis_name is not None:
        raise ValueError("tracks path is single-device (no axis_name)")
    M = prob.R.shape[0]
    P = prob.X.shape[0]
    r, A, B = _residual_jacobians(prob, huber_delta)

    U = jax.ops.segment_sum(jnp.einsum("oki,okj->oij", A, A),
                            prob.cam_idx, num_segments=M)   # (M, 6, 6)
    V = jax.ops.segment_sum(jnp.einsum("oki,okj->oij", B, B),
                            prob.pt_idx, num_segments=P)    # (P, 3, 3)
    b_c = jax.ops.segment_sum(jnp.einsum("oki,ok->oi", A, r),
                              prob.cam_idx, num_segments=M)  # (M, 6)
    b_p = jax.ops.segment_sum(jnp.einsum("oki,ok->oi", B, r),
                              prob.pt_idx, num_segments=P)   # (P, 3)
    if axis_name is not None:
        U = jax.lax.psum(U, axis_name)
        V = jax.lax.psum(V, axis_name)
        b_c = jax.lax.psum(b_c, axis_name)
        b_p = jax.lax.psum(b_p, axis_name)

    U = U + damping * jnp.eye(6)
    V = V + damping * jnp.eye(3)
    Vinv = jnp.linalg.inv(V)                                 # (P, 3, 3)

    G = jnp.einsum("oki,okj->oij", A, B)      # per-obs W block (O, 6, 3)
    if tracks is None:
        # dense cross blocks W (M, P, 6, 3) via one-hot scatter
        Wd = jnp.zeros((M, P, 6, 3))
        Wd = Wd.at[prob.cam_idx, prob.pt_idx].add(G)
        if axis_name is not None:
            Wd = jax.lax.psum(Wd, axis_name)
        # Schur complement: S = U_blkdiag - W Vinv W^T
        WVinv = jnp.einsum("mpij,pjk->mpik", Wd, Vinv)       # (M, P, 6, 3)
        S_off = jnp.einsum("mpik,npjk->mnij", WVinv, Wd)     # (M, M, 6, 6)
        rhs = b_c - jnp.einsum("mpik,pk->mi", WVinv, b_p)    # (M, 6)

        def back_substitute(dx_c):
            return jnp.einsum(
                "pij,pj->pi", Vinv,
                -(b_p + jnp.einsum("mpik,mi->pk", Wd, dx_c)))
    else:
        # sparse Schur over point tracks: only a point's own
        # observations couple cameras through it
        tmask = tracks >= 0                                  # (P, D)
        tr = jnp.maximum(tracks, 0)
        H = G[tr] * tmask[..., None, None]                   # (P, D, 6, 3)
        cams = jnp.where(tmask, prob.cam_idx[tr], M)         # M = pad slot
        T = jnp.einsum("pdij,pjk->pdik", H, Vinv)            # H Vinv
        # S_off[m, n] = sum_p sum_{d,e} T[p,d] H[p,e]^T  (cams d->m, e->n)
        pair = jnp.einsum("pdik,pejk->pdeij", T, H)          # (P,D,D,6,6)
        mn = (cams[:, :, None] * (M + 1) + cams[:, None, :]).reshape(-1)
        S_off = jax.ops.segment_sum(
            pair.reshape(-1, 6, 6), mn,
            num_segments=(M + 1) * (M + 1)
        ).reshape(M + 1, M + 1, 6, 6)[:M, :M]
        corr = jax.ops.segment_sum(
            jnp.einsum("pdik,pk->pdi", T, b_p).reshape(-1, 6),
            cams.reshape(-1), num_segments=M + 1)[:M]
        rhs = b_c - corr

        def back_substitute(dx_c):
            dxc_pad = jnp.concatenate([dx_c, jnp.zeros((1, 6))])
            acc = jnp.einsum("pdij,pdi->pj", H, dxc_pad[cams])
            return jnp.einsum("pij,pj->pi", Vinv, -(b_p + acc))

    S = -S_off
    S = S.at[jnp.arange(M), jnp.arange(M)].add(U)

    # gauge fixing: freeze the first n_fixed cameras
    Sd = S.transpose(0, 2, 1, 3).reshape(6 * M, 6 * M)
    rd = rhs.reshape(6 * M)
    fix = jnp.arange(6 * M) < 6 * n_fixed
    Sd = jnp.where(fix[:, None] | fix[None, :], 0.0, Sd)
    Sd = Sd + jnp.diag(fix.astype(Sd.dtype))
    rd = jnp.where(fix, 0.0, rd)

    dx_c = jnp.linalg.solve(Sd, -rd).reshape(M, 6)
    dx_p = back_substitute(dx_c)

    R_new = jnp.einsum("mij,mjk->mik", prob.R, _exp_so3(dx_c[:, :3]))
    t_new = prob.t + dx_c[:, 3:]
    X_new = prob.X + dx_p

    denom = jnp.maximum(jnp.sum(prob.valid), 1)
    if axis_name is not None:
        sq = jax.lax.psum(jnp.sum(jnp.square(r)), axis_name)
        denom = jax.lax.psum(denom, axis_name)
    else:
        sq = jnp.sum(jnp.square(r))
    mse = sq / denom
    return prob._replace(R=R_new, t=t_new, X=X_new), mse


def run_bundle_adjustment(prob: BAProblem, iters: int = 10,
                          damping: float = 1e-4,
                          axis_name: Optional[str] = None,
                          tracks: Optional[jnp.ndarray] = None,
                          n_fixed: int = 1, huber_delta: float = 0.0
                          ) -> Tuple[BAProblem, jnp.ndarray]:
    """Run ``iters`` Levenberg-Marquardt steps; returns (problem, history).

    ``damping`` seeds the LM lambda; each iteration proposes a damped GN
    step, ACCEPTS it only if the Huber-weighted cost decreases (lambda /=
    3), and otherwise keeps the state and retries stiffer (lambda *= 10).
    Plain fixed-damping GN diverged to NaN on the round-5 VO problems —
    the first overshoot raised the cost 2000x and the next normal
    equations exploded; with rejection the cost history is monotone
    non-increasing by construction, so a diverging step can never
    propagate.  History entries are the accepted cost after each
    iteration (a rejected iteration repeats the previous value)."""

    cost0 = _robust_mse(prob, huber_delta, axis_name)

    def body(carry, _):
        p, lam, cost = carry
        cand, _ = gauss_newton_step(p, lam, axis_name, tracks, n_fixed,
                                    huber_delta)
        new_cost = _robust_mse(cand, huber_delta, axis_name)
        good = jnp.isfinite(new_cost) & (new_cost <= cost)
        p2 = jax.tree.map(lambda a, b: jnp.where(good, b, a), p, cand)
        lam2 = jnp.clip(jnp.where(good, lam / 3.0, lam * 10.0),
                        1e-8, 1e8)
        c2 = jnp.where(good, new_cost, cost)
        return (p2, lam2, c2), c2

    (prob, _, _), hist = jax.lax.scan(
        body, (prob, jnp.asarray(damping, jnp.float32), cost0),
        length=iters)
    return prob, hist
