"""Fused Pallas attention vs the einsum reference (interpreter on CPU)."""

import numpy as np
import jax.numpy as jnp

from pats_tpu.ops.pallas.attention_kernel import fused_attention


def einsum_attention(q, k, v, scale):
    s = np.einsum("bnd,bmd->bnm", q, k) * scale
    p = np.exp(s - s.max(-1, keepdims=True))
    p = p / p.sum(-1, keepdims=True)
    return np.einsum("bnm,bmd->bnd", p, v)


def test_fused_attention_matches(rng):
    b, n, d = 20, 65, 32
    q = rng.normal(size=(b, n, d)).astype(np.float32)
    k = rng.normal(size=(b, n, d)).astype(np.float32)
    v = rng.normal(size=(b, n, d)).astype(np.float32)
    scale = 1.0 / np.sqrt(d)
    got = np.asarray(fused_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), float(scale),
                                     block_b=8, interpret=True))
    want = einsum_attention(q, k, v, scale)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_attention_odd_dims(rng):
    b, n, d = 7, 145, 66
    q = rng.normal(size=(b, n, d)).astype(np.float32)
    k = rng.normal(size=(b, n, d)).astype(np.float32)
    v = rng.normal(size=(b, n, d)).astype(np.float32)
    got = np.asarray(fused_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), 0.2, block_b=4,
                                     interpret=True))
    want = einsum_attention(q, k, v, 0.2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
