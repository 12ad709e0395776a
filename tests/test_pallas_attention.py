"""Fused Pallas multi-head attention vs the einsum reference (interpreter)."""

import numpy as np
import jax.numpy as jnp

from pats_tpu.ops.pallas.attention_kernel import fused_attention


def mha_reference(q, k, v, scale, nheads):
    """Per-head-slice attention, concat-heads output (gnn.py slice path)."""
    b, n, d = q.shape
    dh = d // nheads
    out = np.zeros_like(q)
    for h in range(nheads):
        sl = slice(h * dh, (h + 1) * dh)
        s = np.einsum("bnd,bmd->bnm", q[..., sl], k[..., sl]) * scale
        p = np.exp(s - s.max(-1, keepdims=True))
        p = p / p.sum(-1, keepdims=True)
        out[..., sl] = np.einsum("bnm,bmd->bnd", p, v[..., sl])
    return out


def test_fused_attention_l3_shape(rng):
    b, n, d, heads = 20, 65, 128, 4
    q = rng.normal(size=(b, n, d)).astype(np.float32)
    k = rng.normal(size=(b, n, d)).astype(np.float32)
    v = rng.normal(size=(b, n, d)).astype(np.float32)
    scale = 1.0 / np.sqrt(d // heads)
    got = np.asarray(fused_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), float(scale),
                                     nheads=heads, block_b=8,
                                     interpret=True))
    want = mha_reference(q, k, v, scale, heads)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_attention_l2_shape(rng):
    # 264 channels / 4 heads = dh 66: exercises D padding to 384
    b, n, d, heads = 7, 145, 264, 4
    q = rng.normal(size=(b, n, d)).astype(np.float32)
    k = rng.normal(size=(b, n, d)).astype(np.float32)
    v = rng.normal(size=(b, n, d)).astype(np.float32)
    got = np.asarray(fused_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), 0.2, nheads=heads,
                                     block_b=4, interpret=True))
    want = mha_reference(q, k, v, 0.2, heads)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fused_attention_bf16(rng):
    b, n, d, heads = 16, 65, 128, 4
    q = rng.normal(size=(b, n, d)).astype(np.float32)
    k = rng.normal(size=(b, n, d)).astype(np.float32)
    v = rng.normal(size=(b, n, d)).astype(np.float32)
    scale = 1.0 / np.sqrt(d // heads)
    got = np.asarray(fused_attention(
        jnp.asarray(q, jnp.bfloat16), jnp.asarray(k, jnp.bfloat16),
        jnp.asarray(v, jnp.bfloat16), float(scale), nheads=heads,
        block_b=8, interpret=True)).astype(np.float32)
    want = mha_reference(q, k, v, scale, heads)
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.05)


def test_fused_attention_alive_skip(rng):
    b, n, d, heads = 24, 65, 128, 4
    q = rng.normal(size=(b, n, d)).astype(np.float32)
    k = rng.normal(size=(b, n, d)).astype(np.float32)
    v = rng.normal(size=(b, n, d)).astype(np.float32)
    alive = np.zeros(b, bool)
    alive[:10] = True            # alive-first, like the cascade compaction
    scale = 1.0 / np.sqrt(d // heads)
    got = np.asarray(fused_attention(jnp.asarray(q), jnp.asarray(k),
                                     jnp.asarray(v), float(scale),
                                     nheads=heads, block_b=8,
                                     alive=jnp.asarray(alive),
                                     interpret=True))
    want = mha_reference(q, k, v, scale, heads)
    # tile granularity (block_b=8): the mixed tile [8:16) computes all
    # its items; the fully-dead tile [16:24) is skipped and zeroed
    np.testing.assert_allclose(got[:16], want[:16], rtol=1e-4, atol=1e-5)
    assert (got[16:] == 0).all()
