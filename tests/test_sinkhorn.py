"""Unit tests for the log-space Sinkhorn OT variants.

Strategy (SURVEY.md par.4): property tests on the transport-plan marginals
(the de-normalized plan must reproduce the prescribed row/column masses) plus
an independent dense numpy oracle.
"""

import numpy as np
import jax.numpy as jnp

from pats_tpu.ops import log_sinkhorn, ot_learned_dustbin, ot_inline_dustbin


def np_sinkhorn(Z, log_mu, log_nu, iters):
    """Independent numpy oracle of log-domain Sinkhorn."""
    from scipy.special import logsumexp
    u = np.zeros_like(log_mu)
    v = np.zeros_like(log_nu)
    for _ in range(iters):
        u = log_mu - logsumexp(Z + v[:, None, :], axis=2)
        v = log_nu - logsumexp(Z + u[:, :, None], axis=1)
    return Z + u[:, :, None] + v[:, None, :]


def test_log_sinkhorn_matches_numpy(rng):
    b, m, n = 3, 7, 9
    Z = rng.normal(size=(b, m, n)).astype(np.float32)
    log_mu = np.log(rng.uniform(0.5, 2.0, size=(b, m)).astype(np.float32))
    log_nu = np.log(rng.uniform(0.5, 2.0, size=(b, n)).astype(np.float32))
    got = np.asarray(log_sinkhorn(jnp.asarray(Z), jnp.asarray(log_mu),
                                  jnp.asarray(log_nu), 50))
    want = np_sinkhorn(Z.astype(np.float64), log_mu.astype(np.float64),
                       log_nu.astype(np.float64), 50)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_ot_learned_dustbin_marginals(rng):
    """After de-normalization, exp(Z) must satisfy: real-row sums = 1,
    dustbin-row sum = sum(ns), real-col sums = ns, dustbin-col sum = m."""
    b, m, n = 2, 12, 12
    scores = rng.normal(size=(b, m, n)).astype(np.float32)
    ns = rng.uniform(0.2, 3.0, size=(b, n)).astype(np.float32)
    Z = np.asarray(ot_learned_dustbin(jnp.asarray(scores), 1.3,
                                      jnp.asarray(ns), 200))
    P = np.exp(Z)
    np.testing.assert_allclose(P[:, :m, :].sum(2), np.ones((b, m)),
                               rtol=1e-3)
    np.testing.assert_allclose(P[:, m, :].sum(1), ns.sum(1), rtol=1e-3)
    np.testing.assert_allclose(P[:, :, :n].sum(1), ns, rtol=1e-3)
    np.testing.assert_allclose(P[:, :, n].sum(1), np.full(b, float(m)),
                               rtol=1e-3)


def test_ot_inline_dustbin_marginals(rng):
    """Inline-dustbin variant: last token IS the dustbin.  exp(Z) row sums
    for real rows = 1, dustbin row = sum(ns); col sums = [ns, m-1]."""
    b, m = 2, 10
    scores = rng.normal(size=(b, m, m)).astype(np.float32)
    ns = rng.uniform(0.2, 3.0, size=(b, m - 1)).astype(np.float32)
    Z = np.asarray(ot_inline_dustbin(jnp.asarray(scores), jnp.asarray(ns), 200))
    P = np.exp(Z)
    np.testing.assert_allclose(P[:, :-1, :].sum(2), np.ones((b, m - 1)),
                               rtol=1e-3)
    np.testing.assert_allclose(P[:, -1, :].sum(1), ns.sum(1), rtol=1e-3)
    np.testing.assert_allclose(P[:, :, :-1].sum(1), ns, rtol=1e-3)
    np.testing.assert_allclose(P[:, :, -1].sum(1), np.full(b, float(m - 1)),
                               rtol=1e-3)


def test_ot_learned_dustbin_oracle(rng):
    """Full construction cross-checked against the numpy oracle with the
    reference's coupling/marginal layout (modules.py:145-162)."""
    b, m, n = 2, 6, 8
    scores = rng.normal(size=(b, m, n)).astype(np.float32)
    alpha = 0.7
    ns = rng.uniform(0.3, 2.0, size=(b, n)).astype(np.float32)
    got = np.asarray(ot_learned_dustbin(jnp.asarray(scores), alpha,
                                        jnp.asarray(ns), 30))

    couplings = np.zeros((b, m + 1, n + 1))
    couplings[:, :m, :n] = scores
    couplings[:, m, :] = alpha
    couplings[:, :, n] = alpha
    norm = -np.log(m + ns.sum(1))
    log_nu = np.concatenate([np.log(ns) + norm[:, None],
                             (np.log(m) + norm)[:, None]], 1)
    log_mu = np.concatenate([np.tile(norm[:, None], (1, m)),
                             (np.log(ns.sum(1)) + norm)[:, None]], 1)
    want = np_sinkhorn(couplings, log_mu, log_nu, 30) - norm[:, None, None]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_early_exit_matches_full(rng):
    """tol>0 stops early but the plan equals the full 100-iteration one
    (convergence is f32-exact well before 100 even for sharp scores)."""
    b, m, n = 4, 33, 33
    base = rng.normal(0, 0.5, size=(b, m, n))
    for i in range(b):                      # sharp trained-like winners
        base[i, np.arange(m), rng.permutation(n)] += 8.0
    scores = jnp.asarray(base, jnp.float32)
    ns = jnp.asarray(rng.uniform(0.1, 4.0, size=(b, n - 1)), jnp.float32)

    full = np.exp(np.asarray(ot_inline_dustbin(scores, ns, 100)))
    fast = np.exp(np.asarray(ot_inline_dustbin(scores, ns, 100, tol=1e-4)))
    np.testing.assert_allclose(fast, full, atol=2e-3)

    alpha = 0.7
    full = np.exp(np.asarray(ot_learned_dustbin(scores, alpha, ns2 :=
        jnp.asarray(rng.uniform(0.1, 4.0, size=(b, n)), jnp.float32), 100)))
    fast = np.exp(np.asarray(ot_learned_dustbin(scores, alpha, ns2, 100,
                                                tol=1e-4)))
    np.testing.assert_allclose(fast, full, atol=2e-3)
