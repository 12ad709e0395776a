"""Batched two-view geometry on device.

TPU-native replacement for the host OpenCV RANSAC path
(utils/metrics.py:42-55): hypotheses are generated, solved and scored as
one batched computation - K 8-point solves are a (K, 8, 9) batched SVD and
inlier scoring one (K, N) Sampson evaluation, all on the MXU/VPU instead
of a serial CPU loop.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class EssentialResult(NamedTuple):
    E: jnp.ndarray            # (3, 3) best essential matrix
    inliers: jnp.ndarray      # (N,) bool inlier mask
    num_inliers: jnp.ndarray  # () int32
    score: jnp.ndarray        # () float32 (negative truncated loss)


def _normalize_h(p: jnp.ndarray) -> jnp.ndarray:
    """(N, 2) -> (N, 3) homogeneous."""
    return jnp.concatenate([p, jnp.ones_like(p[:, :1])], axis=1)


def sampson_distance(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray
                     ) -> jnp.ndarray:
    """Squared Sampson distance of correspondences under E.

    E: (..., 3, 3); x1/x2: (N, 2) normalized camera coordinates.
    Returns (..., N).
    """
    p1 = _normalize_h(x1)
    p2 = _normalize_h(x2)
    Ep1 = jnp.einsum("...ij,nj->...ni", E, p1)
    Etp2 = jnp.einsum("...ji,nj->...ni", E, p2)
    num = jnp.square(jnp.einsum("ni,...ni->...n", p2, Ep1))
    den = (jnp.square(Ep1[..., 0]) + jnp.square(Ep1[..., 1])
           + jnp.square(Etp2[..., 0]) + jnp.square(Etp2[..., 1]))
    return num / (den + 1e-12)


def _eight_point(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Batched 8-point essential solve with rank-2/singular projection.

    x1/x2: (K, 8, 2) normalized coordinates -> (K, 3, 3).
    """
    p1 = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    p2 = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], axis=-1)
    # constraint rows: p2^T E p1 = 0 -> kron(p1, p2)
    A = jnp.einsum("kni,knj->knij", p2, p1).reshape(x1.shape[0], 8, 9)
    # nullspace via SVD of A
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    e = vt[:, -1, :].reshape(-1, 3, 3)
    # project to the essential manifold: singular values (s, s, 0)
    u, s, vt2 = jnp.linalg.svd(e)
    s_mean = (s[:, 0] + s[:, 1]) / 2.0
    s_fix = jnp.stack([s_mean, s_mean, jnp.zeros_like(s_mean)], axis=-1)
    return jnp.einsum("kij,kj,kjl->kil", u, s_fix, vt2)


def essential_from_matches(x1: jnp.ndarray, x2: jnp.ndarray,
                           valid: jnp.ndarray, threshold: float,
                           num_hypotheses: int = 512,
                           key: jnp.ndarray = None) -> EssentialResult:
    """Robust essential-matrix estimation, fully batched on device.

    Args:
      x1/x2: (N, 2) normalized camera coordinates (fixed capacity).
      valid: (N,) bool mask of real correspondences.
      threshold: inlier threshold on the (non-squared) Sampson distance in
        normalized coordinates (the protocol's ``thresh_px / f_mean``).
      num_hypotheses: RANSAC hypothesis count (static).
      key: PRNG key (defaults to a fixed seed for determinism).

    Returns EssentialResult with an MSAC-style truncated score.
    """
    N = x1.shape[0]
    if key is None:
        key = jax.random.PRNGKey(18027)
    # sample 8 distinct-ish indices per hypothesis among valid points:
    # weighted categorical without replacement via Gumbel top-k
    logits = jnp.where(valid, 0.0, -1e30)
    g = jax.random.gumbel(key, (num_hypotheses, N)) + logits[None]
    _, idx = jax.lax.top_k(g, 8)                       # (K, 8)
    E = _eight_point(x1[idx], x2[idx])                 # (K, 3, 3)

    d2 = sampson_distance(E, x1, x2)                   # (K, N)
    t2 = threshold * threshold
    inl = (d2 < t2) & valid[None]
    # MSAC score: sum of truncated losses (lower better) -> negate
    score = -jnp.sum(jnp.where(valid[None], jnp.minimum(d2, t2), 0.0),
                     axis=1)
    best = jnp.argmax(score)
    return EssentialResult(E[best], inl[best],
                           jnp.sum(inl[best].astype(jnp.int32)),
                           score[best])


def decompose_essential(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray,
                        valid: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Recover (R, t) from E by cheirality voting over the 4 candidates."""
    u, _, vt = jnp.linalg.svd(E)
    # enforce proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))[..., None]
    W = jnp.asarray([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[:, 2]
    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]

    def count_front(Rt):
        R, t = Rt
        X = triangulate(jnp.eye(3), jnp.zeros(3), R, t, x1, x2)
        z1 = X[:, 2]
        z2 = (X @ R.T + t)[:, 2]
        return jnp.sum(((z1 > 0) & (z2 > 0) & valid).astype(jnp.int32))

    counts = jnp.stack([count_front(c) for c in cands])
    best = jnp.argmax(counts)
    Rs = jnp.stack([c[0] for c in cands])
    ts = jnp.stack([c[1] for c in cands])
    return Rs[best], ts[best]


def triangulate(R1: jnp.ndarray, t1: jnp.ndarray, R2: jnp.ndarray,
                t2: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray
                ) -> jnp.ndarray:
    """Batched DLT midpoint triangulation in normalized coordinates.

    Camera i maps world X to R_i X + t_i; x_i are (N, 2) normalized.
    Returns (N, 3) points in camera-1=world frame when R1=I, t1=0.
    """
    P1 = jnp.concatenate([R1, t1[:, None]], axis=1)    # (3, 4)
    P2 = jnp.concatenate([R2, t2[:, None]], axis=1)
    N = x1.shape[0]
    rows = jnp.stack([
        x1[:, 0, None] * P1[2] - jnp.broadcast_to(P1[0], (N, 4)),
        x1[:, 1, None] * P1[2] - jnp.broadcast_to(P1[1], (N, 4)),
        x2[:, 0, None] * P2[2] - jnp.broadcast_to(P2[0], (N, 4)),
        x2[:, 1, None] * P2[2] - jnp.broadcast_to(P2[1], (N, 4)),
    ], axis=1)                                          # (N, 4, 4)
    _, _, vt = jnp.linalg.svd(rows)
    X = vt[:, -1, :]
    return X[:, :3] / (X[:, 3:4] + 1e-12)
