"""Log-space Sinkhorn optimal transport with learned target marginals.

TPU-native re-design of the reference's three OT variants
(reference: models/modules.py:137-196):

- ``log_sinkhorn``       : the inner u/v iteration (modules.py:137-143)
- ``ot_learned_dustbin`` : level-1 OT with a learned scalar dustbin appended
                           as an extra row+column (modules.py:145-162)
- ``ot_inline_dustbin``  : level-2/3 OT where the dustbin is already the last
                           token of the score matrix (modules.py:165-182)

Design notes (TPU): the iteration runs as a ``lax.fori_loop`` over fused
row/col logsumexp reductions - each step is two bandwidth-bound passes over
the (m x n) matrix that XLA fuses with the +u/+v broadcasts.  All math in
f32.  For sharded score matrices the logsumexp reductions distribute over the
mesh with ``psum`` (see pats_tpu.parallel).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _fits_vmem(m: int, n: int) -> bool:
    """The fused Pallas kernel keeps one (block, m, n) tile plus a few
    temporaries resident in the ~16 MB VMEM; very large level-1 matrices
    (>1024-px images) must fall back to the XLA loop."""
    mp = (m + 7) // 8 * 8
    np_ = (n + 127) // 128 * 128
    return mp * np_ * 4 * 4 < 10 * 1024 * 1024


def log_sinkhorn(Z: jnp.ndarray, log_mu: jnp.ndarray, log_nu: jnp.ndarray,
                 iters: int, tol: float = 0.0) -> jnp.ndarray:
    """Sinkhorn normalization in log space.

    Args:
      Z:      (..., m, n) log-cost/coupling matrix.
      log_mu: (..., m) target log row-marginals.
      log_nu: (..., n) target log column-marginals.
      iters:  number of u/v update pairs (static upper bound).
      tol:    if > 0, stop once the row potential moves < tol between
              iterations (sup-norm).  The plans converge well before the
              reference's fixed 100 iterations (f32-exact by ~50 even for
              sharp trained-like scores); the default 0 keeps the exact
              reference iteration count.

    Returns:
      (..., m, n) log transport plan Z + u[...,None] + v[...,None,:].
    """

    def step(u, v):
        u = log_mu - jax.nn.logsumexp(Z + v[..., None, :], axis=-1)
        v = log_nu - jax.nn.logsumexp(Z + u[..., :, None], axis=-2)
        return u, v

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    if tol > 0.0:
        def cond(state):
            k, du, _, _ = state
            return jnp.logical_and(k < iters, du > tol)

        def wbody(state):
            k, _, u, v = state
            un, vn = step(u, v)
            return k + 1, jnp.max(jnp.abs(un - u)), un, vn

        _, _, u, v = jax.lax.while_loop(
            cond, wbody, (jnp.int32(0), jnp.float32(1e30), u0, v0))
    else:
        u, v = jax.lax.fori_loop(0, iters,
                                 lambda _, uv: step(*uv), (u0, v0))
    return Z + u[..., :, None] + v[..., None, :]


def ot_learned_dustbin(scores: jnp.ndarray, alpha: jnp.ndarray,
                       ns: jnp.ndarray, iters: int,
                       use_pallas: bool = False,
                       tol: float = 0.0) -> jnp.ndarray:
    """Level-1 optimal transport with learned dustbin and per-column scales.

    Semantics of reference modules.py:145-162: a scalar ``alpha`` is appended
    as an extra column (per row), an extra row (per column), and the corner;
    the column marginals are the predicted per-patch scales ``ns`` and the
    appended dustbin column absorbs ``m`` units of mass; row marginals are
    uniform with the dustbin row absorbing ``sum(ns)``.

    Args:
      scores: (b, m, n) similarity matrix (already temperature-scaled).
      alpha:  scalar dustbin logit (the reference uses ``|bin_score|``).
      ns:     (b, n) predicted per-target-patch scales (positive).
      iters:  Sinkhorn iterations.

    Returns:
      (b, m+1, n+1) log transport plan, de-normalized by +log(m + sum(ns))
      so that exp() sums to (m + sum(ns)) rather than 1.
    """
    scores = scores.astype(jnp.float32)
    b, m, n = scores.shape
    alpha = jnp.asarray(alpha, scores.dtype)
    bins0 = jnp.full((b, m, 1), alpha, scores.dtype)
    bins1 = jnp.full((b, 1, n), alpha, scores.dtype)
    corner = jnp.full((b, 1, 1), alpha, scores.dtype)
    couplings = jnp.concatenate(
        [jnp.concatenate([scores, bins0], axis=2),
         jnp.concatenate([bins1, corner], axis=2)], axis=1)

    ns = ns.astype(jnp.float32)
    ns_sum = jnp.sum(ns, axis=1)                       # (b,)
    norm = -jnp.log(m + ns_sum)                        # (b,)
    log_nu = jnp.concatenate(
        [jnp.log(ns) + norm[:, None],
         (jnp.log(float(m)) + norm)[:, None]], axis=1)  # (b, n+1)
    log_mu = jnp.concatenate(
        [jnp.broadcast_to(norm[:, None], (b, m)),
         (jnp.log(ns_sum) + norm)[:, None]], axis=1)    # (b, m+1)

    if use_pallas and _fits_vmem(m + 1, n + 1):
        from pats_tpu.ops.pallas.sinkhorn_kernel import fused_log_sinkhorn

        Z = fused_log_sinkhorn(couplings, log_mu, log_nu, iters, tol=tol)
    else:
        Z = log_sinkhorn(couplings, log_mu, log_nu, iters, tol=tol)
    return Z - norm[:, None, None]


def ot_inline_dustbin(scores: jnp.ndarray, ns: jnp.ndarray,
                      iters: int, use_pallas: bool = False,
                      valid=None, tol: float = 0.0) -> jnp.ndarray:
    """Level-2/3 optimal transport where the dustbin is the last token.

    Semantics of reference modules.py:165-182: ``scores`` is (b, m, n) with
    the last row/column being a learned "rubbish" token produced upstream;
    the effective source count is m-1.  Column marginals are the predicted
    scales ``ns`` for the n-1 real columns and (m-1) for the dustbin column.

    Args:
      scores: (b, m, n) similarity matrix including the dustbin row/column.
      ns:     (b, n-1) predicted per-cell scales (positive).
      iters:  Sinkhorn iterations.

    Returns:
      (b, m, n) log transport plan de-normalized by +log((m-1) + sum(ns)).
    """
    scores = scores.astype(jnp.float32)
    ns = ns.astype(jnp.float32)
    b, m, n = scores.shape
    ms = float(m - 1)
    ns_sum = jnp.sum(ns, axis=1)                       # (b,)
    norm = -jnp.log(ms + ns_sum)                       # (b,)
    log_nu = jnp.concatenate(
        [jnp.log(ns) + norm[:, None],
         (jnp.log(ms) + norm)[:, None]], axis=1)        # (b, n)
    log_mu = jnp.concatenate(
        [jnp.broadcast_to(norm[:, None], (b, m - 1)),
         (jnp.log(ns_sum) + norm)[:, None]], axis=1)    # (b, m)

    if use_pallas and _fits_vmem(m, n):
        from pats_tpu.ops.pallas.sinkhorn_kernel import fused_log_sinkhorn

        Z = fused_log_sinkhorn(scores, log_mu, log_nu, iters, valid=valid,
                               tol=tol)
    else:
        Z = log_sinkhorn(scores, log_mu, log_nu, iters, tol=tol)
    return Z - norm[:, None, None]
