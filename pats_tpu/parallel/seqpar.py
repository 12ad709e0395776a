"""Sequence-parallel primitives for very large images.

The reference caps resolution and serializes work to fit one GPU
(SURVEY.md par.5 "long-context"); on TPU the level-1 token count
(N = H/32 * W/32 patches) instead SHARDS over a mesh axis:

- ``ring_attention``: full softmax attention with the K/V blocks rotating
  around the ICI ring (ppermute) and a streaming max/num/den softmax
  accumulator - O(N/k) memory per device, exact result.
- ``sharded_log_sinkhorn``: log-Sinkhorn on a row-sharded coupling
  matrix; the row update is local, the column update distributes the
  logsumexp with pmax/psum.

Both are plain jnp functions meant to run under ``jax.shard_map`` with the
token axis sharded; tested for exactness against their dense versions on
the virtual 8-device mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   axis_name: str, scale: float) -> jnp.ndarray:
    """Exact softmax attention over ring-rotated K/V blocks.

    Args (per device, under shard_map):
      q: (n_loc, d) local queries.
      k, v: (n_loc, d) local key/value blocks.
      axis_name: mesh axis the tokens are sharded over.
      scale: score scale (1/sqrt(head_dim)).

    Returns (n_loc, d) attention outputs identical to dense softmax(q K^T) V
    over the full token axis.
    """
    size = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % size) for i in range(size)]

    def step(carry, _):
        k_blk, v_blk, m, num, den = carry
        s = (q @ k_blk.T) * scale                        # (n_loc, n_blk)
        blk_max = jnp.max(s, axis=-1)
        m_new = jnp.maximum(m, blk_max)
        corr = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new[:, None])
        num = num * corr[:, None] + p @ v_blk
        den = den * corr + jnp.sum(p, axis=-1)
        k_blk = jax.lax.ppermute(k_blk, axis_name, perm)
        v_blk = jax.lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, m_new, num, den), None

    # derive carries from q so they inherit its varying mesh axes
    m0 = jnp.full_like(q[:, 0], -jnp.inf)
    num0 = jnp.zeros_like(q)
    den0 = jnp.zeros_like(q[:, 0])
    (k, v, m, num, den), _ = jax.lax.scan(
        step, (k, v, m0, num0, den0), None, length=size)
    del idx
    return num / den[:, None]


def _dist_logsumexp(x_local: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """logsumexp over local axis 0 AND the mesh axis; x_local (n_loc, m)."""
    local = jax.nn.logsumexp(x_local, axis=0)            # (m,)
    gmax = jax.lax.pmax(local, axis_name)
    return jnp.log(jax.lax.psum(jnp.exp(local - gmax), axis_name)) + gmax


def sharded_log_sinkhorn(Z_local: jnp.ndarray, log_mu_local: jnp.ndarray,
                         log_nu: jnp.ndarray, iters: int,
                         axis_name: str) -> jnp.ndarray:
    """Row-sharded log-Sinkhorn.

    Args (per device): Z_local (m_loc, n) rows of the coupling matrix;
    log_mu_local (m_loc,) matching row marginals; log_nu (n,) replicated
    column marginals.

    Returns the local rows of the log transport plan, identical to the
    dense ``ops.sinkhorn.log_sinkhorn``.
    """

    def body(_, uv):
        u_loc, v = uv
        u_loc = log_mu_local - jax.nn.logsumexp(Z_local + v[None, :],
                                                axis=1)
        v = log_nu - _dist_logsumexp(Z_local + u_loc[:, None], axis_name)
        return u_loc, v

    u0 = jnp.zeros_like(log_mu_local)
    v0 = jnp.zeros_like(log_nu)
    u_loc, v = jax.lax.fori_loop(0, iters, body, (u0, v0))
    return Z_local + u_loc[:, None] + v[None, :]
