"""Trajectory evaluation: Umeyama alignment + absolute trajectory error."""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def align_umeyama(est: jnp.ndarray, gt: jnp.ndarray, with_scale: bool = True
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Similarity transform (s, R, t) minimizing ||gt - (s R est + t)||.

    est/gt: (N, 3) trajectories.  Standard Umeyama closed form.
    """
    mu_e = est.mean(0)
    mu_g = gt.mean(0)
    e = est - mu_e
    g = gt - mu_g
    cov = g.T @ e / est.shape[0]
    u, d, vt = jnp.linalg.svd(cov)
    s = jnp.ones(3).at[2].set(jnp.sign(jnp.linalg.det(u)
                                       * jnp.linalg.det(vt)))
    R = u @ jnp.diag(s) @ vt
    if with_scale:
        var_e = jnp.mean(jnp.sum(e * e, axis=1))
        scale = jnp.sum(d * s) / (var_e + 1e-12)
    else:
        scale = jnp.asarray(1.0)
    t = mu_g - scale * R @ mu_e
    return scale, R, t


def absolute_trajectory_error(est: jnp.ndarray, gt: jnp.ndarray,
                              with_scale: bool = True) -> jnp.ndarray:
    """RMSE of positions after similarity alignment."""
    s, R, t = align_umeyama(est, gt, with_scale)
    aligned = s * est @ R.T + t
    return jnp.sqrt(jnp.mean(jnp.sum(jnp.square(aligned - gt), axis=1)))
