"""Pose-graph optimization over SE(3), batched on device.

Back-end for loop closure: nodes are keyframe poses (world->cam R, t),
edges are relative-pose measurements (sequential odometry and verified
loop closures).  Each Gauss-Newton iteration linearizes all edge
residuals at once with ``jax.jacrev`` over the stacked (N, 6) tangent
increments and solves the dense damped normal equations — one batched
(6N x 6N) solve on the MXU instead of a host sparse solver; PATS-scale
graphs (hundreds of keyframes) fit comfortably.

No reference analog (zju3dv/pats has no SLAM back-end); this completes
the north-star keyframe engine (slam/keyframes.py) whose odometry
otherwise drifts unboundedly.

Conventions: T_i maps world -> cam_i, stored as (R (3,3), t (3,)).
Edge (i, j) measures T_ij = T_j * T_i^{-1} (cam_i -> cam_j).  Residual
is the SE(3) pseudo-log of T_meas^{-1} * T_j * T_i^{-1} (rotation log +
translation difference — the standard chordal approximation).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def exp_so3(w: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation.

    Differentiable at w = 0 (linearization point of every Gauss-Newton
    step): the small-angle branch is a polynomial in ||w||^2, and the
    sqrt/sin arguments are masked away from 0 so no NaN flows through
    ``where`` under jacrev.
    """
    t2 = jnp.sum(jnp.square(w), axis=-1, keepdims=True)[..., None]
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    K = jnp.stack([
        jnp.stack([zeros, -wz, wy], -1),
        jnp.stack([wz, zeros, -wx], -1),
        jnp.stack([-wy, wx, zeros], -1)], -2)
    eye = jnp.broadcast_to(jnp.eye(3), K.shape)
    small = t2 < 1e-10
    t2_safe = jnp.where(small, 1.0, t2)
    theta = jnp.sqrt(t2_safe)
    a = jnp.where(small, 1.0 - t2 / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - t2 / 24.0, (1.0 - jnp.cos(theta)) / t2_safe)
    return eye + a * K + b * (K @ K)


def log_so3(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) rotation -> (..., 3) axis-angle (angle < pi).

    Differentiable at R = I (exact-residual edges): near identity the
    scale factor uses its series in theta^2 = 3 - trace, keeping both
    arccos' and 1/sin away from their singularities under jacrev.
    """
    cos = (jnp.trace(R, axis1=-2, axis2=-1) - 1.0) / 2.0
    v = jnp.stack([R[..., 2, 1] - R[..., 1, 2],
                   R[..., 0, 2] - R[..., 2, 0],
                   R[..., 1, 0] - R[..., 0, 1]], -1)
    small = cos > 1.0 - 1e-5
    cos_safe = jnp.clip(jnp.where(small, 0.0, cos), -1.0 + 1e-7, 1.0)
    theta = jnp.arccos(cos_safe)[..., None]
    # series: theta / (2 sin theta) ~ 1/2 + theta^2/12, theta^2 ~ 2(1-cos)
    s_series = 0.5 + (1.0 - cos[..., None]) / 6.0
    s = jnp.where(small[..., None], s_series,
                  theta / (2.0 * jnp.sin(theta)))
    return v * s


class PoseGraph(NamedTuple):
    R: jnp.ndarray        # (N, 3, 3) world->cam
    t: jnp.ndarray        # (N, 3)
    edge_i: jnp.ndarray   # (M,) int32 source node
    edge_j: jnp.ndarray   # (M,) int32 target node
    R_meas: jnp.ndarray   # (M, 3, 3) measured cam_i -> cam_j
    t_meas: jnp.ndarray   # (M, 3)
    weight: jnp.ndarray   # (M,) residual weight (loop edges can be upweighted)
    # (M,) bool: translation magnitude is unobservable (monocular loop
    # edge) - t_meas is a DIRECTION, rescaled to the current estimate's
    # chord at every relinearization
    scale_free: jnp.ndarray = None


def _residuals(xi: jnp.ndarray, g: PoseGraph) -> jnp.ndarray:
    """(N, 6) tangent increments -> (M, 6) weighted edge residuals.

    Pose i under increment: R_i' = exp(xi_w) R_i, t_i' = exp(xi_w) t_i
    + xi_v (left multiplication by exp([xi_w, xi_v])).
    """
    dR = exp_so3(xi[:, :3])                       # (N, 3, 3)
    R = dR @ g.R
    t = jnp.einsum("nij,nj->ni", dR, g.t) + xi[:, 3:]
    Ri, ti = R[g.edge_i], t[g.edge_i]
    Rj, tj = R[g.edge_j], t[g.edge_j]
    R_rel = Rj @ jnp.swapaxes(Ri, -1, -2)         # (M, 3, 3)
    t_rel = tj - jnp.einsum("mij,mj->mi", R_rel, ti)
    R_err = jnp.swapaxes(g.R_meas, -1, -2) @ R_rel
    t_err = jnp.einsum("mji,mj->mi", g.R_meas, t_rel - g.t_meas)
    r = jnp.concatenate([log_so3(R_err), t_err], axis=-1)
    return r * g.weight[:, None]


@partial(jax.jit, static_argnames=("iters",))
def optimize_pose_graph(g: PoseGraph, iters: int = 10,
                        damping: float = 1e-6
                        ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Damped Gauss-Newton; returns (R, t, cost_history).

    Node 0 is the gauge anchor (its increment is projected out).  Each
    iteration relinearizes at the current estimate: J = d r / d xi at
    xi = 0, solve (J^T J + lambda I) dx = -J^T r, retract.
    """
    N = g.R.shape[0]
    free = (jnp.arange(N) > 0).astype(g.R.dtype)[:, None]   # gauge mask

    def body(state, _):
        R, t, _ = state
        gi = g._replace(R=R, t=t)
        if g.scale_free is not None:
            # monocular loop edges: keep the measured DIRECTION, take the
            # magnitude from the current estimate's i->j chord (rescaled
            # at every relinearization - the bearing-only constraint)
            R_rel = R[g.edge_j] @ jnp.swapaxes(R[g.edge_i], -1, -2)
            t_rel = t[g.edge_j] - jnp.einsum("mij,mj->mi", R_rel,
                                             t[g.edge_i])
            chord = jnp.linalg.norm(t_rel, axis=-1, keepdims=True)
            unit = g.t_meas / jnp.maximum(
                jnp.linalg.norm(g.t_meas, axis=-1, keepdims=True), 1e-9)
            gi = gi._replace(t_meas=jnp.where(
                g.scale_free[:, None], unit * chord, g.t_meas))
        xi0 = jnp.zeros((N, 6), g.R.dtype)
        r = _residuals(xi0, gi).reshape(-1)
        J = jax.jacrev(lambda x: _residuals(x, gi).reshape(-1))(xi0)
        J = (J * free[None, :, :1]).reshape(r.shape[0], N * 6)
        A = J.T @ J + damping * jnp.eye(N * 6, dtype=J.dtype)
        b = -J.T @ r
        dx = jnp.linalg.solve(A, b).reshape(N, 6) * free
        dR = exp_so3(dx[:, :3])
        R_new = dR @ R
        t_new = jnp.einsum("nij,nj->ni", dR, t) + dx[:, 3:]
        cost = jnp.sum(jnp.square(r))
        return (R_new, t_new, cost), cost

    init = (g.R, g.t, jnp.float32(0.0))
    (R, t, _), hist = jax.lax.scan(body, init, None, length=iters)
    return R, t, hist


def graph_from_edges(poses_R: np.ndarray, poses_t: np.ndarray,
                     edges) -> PoseGraph:
    """edges: list of (i, j, R_ij, t_ij, weight[, scale_free]) numpy
    measurements; scale_free (default False) marks direction-only
    monocular translations."""
    ei = np.asarray([e[0] for e in edges], np.int32)
    ej = np.asarray([e[1] for e in edges], np.int32)
    Rm = np.stack([e[2] for e in edges]).astype(np.float32)
    tm = np.stack([e[3] for e in edges]).astype(np.float32)
    w = np.asarray([e[4] for e in edges], np.float32)
    sf = np.asarray([bool(e[5]) if len(e) > 5 else False for e in edges])
    return PoseGraph(jnp.asarray(poses_R, jnp.float32),
                     jnp.asarray(poses_t, jnp.float32),
                     jnp.asarray(ei), jnp.asarray(ej),
                     jnp.asarray(Rm), jnp.asarray(tm), jnp.asarray(w),
                     jnp.asarray(sf))
