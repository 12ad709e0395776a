"""Fused Pallas Sinkhorn vs the XLA reference implementation (interpreter
mode on CPU; the real kernel runs the same code path on TPU)."""

import numpy as np
import jax.numpy as jnp

from pats_tpu.ops.sinkhorn import log_sinkhorn
from pats_tpu.ops.pallas.sinkhorn_kernel import fused_log_sinkhorn


def test_fused_matches_reference(rng):
    b, m, n = 5, 13, 17
    Z = jnp.asarray(rng.normal(size=(b, m, n)), jnp.float32)
    mu = jnp.asarray(np.log(rng.uniform(0.5, 2, (b, m))), jnp.float32)
    nu = jnp.asarray(np.log(rng.uniform(0.5, 2, (b, n))), jnp.float32)
    want = np.asarray(log_sinkhorn(Z, mu, nu, 30))
    got = np.asarray(fused_log_sinkhorn(Z, mu, nu, 30, block_b=8,
                                        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_level3_shape(rng):
    b, m = 40, 65
    Z = jnp.asarray(rng.normal(size=(b, m, m)) * 0.1, jnp.float32)
    mu = jnp.zeros((b, m), jnp.float32)
    nu = jnp.zeros((b, m), jnp.float32)
    want = np.asarray(log_sinkhorn(Z, mu, nu, 20))
    got = np.asarray(fused_log_sinkhorn(Z, mu, nu, 20, block_b=16,
                                        interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fused_masked_skip_matches(rng):
    """Valid rows must be identical to the dense reference; dead trailing
    blocks may return garbage (they are masked downstream)."""
    b, m = 24, 33
    Z = jnp.asarray(rng.normal(size=(b, m, m)) * 0.1, jnp.float32)
    mu = jnp.zeros((b, m), jnp.float32)
    valid = jnp.arange(b) < 10          # alive-first compaction
    want = np.asarray(log_sinkhorn(Z, mu, mu, 15))
    got = np.asarray(fused_log_sinkhorn(Z, mu, mu, 15, block_b=8,
                                        interpret=True, valid=valid))
    np.testing.assert_allclose(got[:10], want[:10], rtol=1e-4, atol=1e-4)
    assert np.isfinite(got).all()


def test_fused_early_exit_matches(rng):
    """The kernel's tol early-exit equals the full fixed-count plan."""
    from pats_tpu.ops.pallas.sinkhorn_kernel import fused_log_sinkhorn
    from pats_tpu.ops.sinkhorn import log_sinkhorn

    b, m, n = 6, 65, 65
    base = rng.normal(0, 0.5, size=(b, m, n))
    for i in range(b):
        base[i, np.arange(m), rng.permutation(n)] += 8.0
    Z = jnp.asarray(base, jnp.float32)
    mu = jnp.asarray(np.log(rng.uniform(0.2, 1.0, size=(b, m))), jnp.float32)
    nu = jnp.asarray(np.log(rng.uniform(0.2, 1.0, size=(b, n))), jnp.float32)

    want = np.exp(np.asarray(log_sinkhorn(Z, mu, nu, 100)))
    got = np.exp(np.asarray(fused_log_sinkhorn(Z, mu, nu, 100, tol=1e-4,
                                               interpret=True)))
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_fused_masked_early_exit(rng):
    """tol early-exit composes with the dead-block skip: valid rows equal
    the dense full-count plan, dead blocks stay finite."""
    from pats_tpu.ops.pallas.sinkhorn_kernel import fused_log_sinkhorn
    from pats_tpu.ops.sinkhorn import log_sinkhorn

    b, m = 24, 33
    Z = jnp.asarray(rng.normal(size=(b, m, m)) * 0.1, jnp.float32)
    mu = jnp.zeros((b, m), jnp.float32)
    valid = jnp.arange(b) < 10
    want = np.exp(np.asarray(log_sinkhorn(Z, mu, mu, 100)))
    got = np.exp(np.asarray(fused_log_sinkhorn(Z, mu, mu, 100, block_b=8,
                                               interpret=True, valid=valid,
                                               tol=1e-4)))
    np.testing.assert_allclose(got[:10], want[:10], atol=2e-3)
    assert np.isfinite(got).all()
