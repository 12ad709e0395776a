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


def test_fused_attention_layer(rng):
    """Projections + attention + merge in one kernel == manual chain."""
    from pats_tpu.ops.pallas.attention_kernel import fused_attention_layer

    b, n, d, heads = 18, 65, 128, 4
    x = rng.normal(size=(b, n, d)).astype(np.float32)
    src = rng.normal(size=(b, n, d)).astype(np.float32)
    ws = {k: rng.normal(size=(d, d)).astype(np.float32) * 0.1
          for k in "qkvm"}
    bs = {k: rng.normal(size=d).astype(np.float32) * 0.1 for k in "qkvm"}
    scale = 1.0 / np.sqrt(d // heads)
    got = np.asarray(fused_attention_layer(
        jnp.asarray(x), jnp.asarray(src),
        jnp.asarray(ws["q"]), jnp.asarray(bs["q"]),
        jnp.asarray(ws["k"]), jnp.asarray(bs["k"]),
        jnp.asarray(ws["v"]), jnp.asarray(bs["v"]),
        jnp.asarray(ws["m"]), jnp.asarray(bs["m"]),
        float(scale), nheads=heads, block_b=8, interpret=True))
    q = x @ ws["q"] + bs["q"]
    k = src @ ws["k"] + bs["k"]
    v = src @ ws["v"] + bs["v"]
    want = mha_reference(q, k, v, scale, heads) @ ws["m"] + bs["m"]
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_fused_attention_layer_odd_dims_alive(rng):
    """264-d / dh 66 padding + dead-tile skip in the layer kernel."""
    from pats_tpu.ops.pallas.attention_kernel import fused_attention_layer

    b, n, d, heads = 8, 30, 264, 4
    x = rng.normal(size=(b, n, d)).astype(np.float32)
    ws = {k: rng.normal(size=(d, d)).astype(np.float32) * 0.1
          for k in "qkvm"}
    bz = np.zeros(d, np.float32)
    alive = np.zeros(b, bool)
    alive[:4] = True
    got = np.asarray(fused_attention_layer(
        jnp.asarray(x), jnp.asarray(x),
        jnp.asarray(ws["q"]), jnp.asarray(bz),
        jnp.asarray(ws["k"]), jnp.asarray(bz),
        jnp.asarray(ws["v"]), jnp.asarray(bz),
        jnp.asarray(ws["m"]), jnp.asarray(bz),
        0.15, nheads=heads, block_b=4,
        alive=jnp.asarray(alive), interpret=True))
    q, k, v = x @ ws["q"], x @ ws["k"], x @ ws["v"]
    want = mha_reference(q, k, v, 0.15, heads) @ ws["m"]
    np.testing.assert_allclose(got[:4], want[:4], rtol=1e-3, atol=1e-3)
    assert (got[4:] == 0).all()


def test_gnn_module_fused_layer_equivalence(rng):
    """MultiHeadAttention fused path == unfused path with shared params
    (the _DenseParams tree must be interchangeable with nn.Dense's)."""
    import jax
    from unittest import mock
    import pats_tpu.ops.pallas.attention_kernel as ak
    from pats_tpu.models.gnn import MultiHeadAttention

    b, n, d = 20, 33, 64
    x = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    fused = MultiHeadAttention(d, 4, fused=True)
    plain = MultiHeadAttention(d, 4, fused=False)
    variables = plain.init(jax.random.PRNGKey(0), x, x, x)
    real = ak.fused_attention_layer

    def interp(*args, **kw):
        kw["interpret"] = True
        return real(*args, **kw)

    with mock.patch.object(ak, "fused_attention_layer", side_effect=interp):
        got = np.asarray(fused.apply(variables, x, x, x))
    want = np.asarray(plain.apply(variables, x, x, x))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_pick_block_vmem_gate():
    """The row-stacked kernel's VMEM model must fit the 16 MB scoped
    limit at the cascade's shapes (values re-derived for the qexp
    design; device compiles validate the budget on TPU)."""
    import jax.numpy as jnp
    from pats_tpu.ops.pallas.attention_kernel import pick_block

    # fine level: N=145, D=264, H=4 — row-stacking shrinks the score
    # matrix ~2.5x, so even f32 now fits the layer kernel
    assert pick_block(145, 264, 4, jnp.float32, layer=True) >= 1
    assert pick_block(145, 264, 4, jnp.bfloat16, layer=True) >= 2
    assert pick_block(145, 264, 4, jnp.float32, layer=False) is not None
    # refine level: N=65, D=128
    assert pick_block(65, 128, 4, jnp.bfloat16, layer=True) >= 8
    assert pick_block(65, 128, 4, jnp.float32, layer=True) >= 8
    # coarse level: N=300, D=448 — layer variant does not fit, but the
    # attention-only kernel does
    assert pick_block(300, 448, 4, jnp.bfloat16, layer=False) >= 1


def test_vmap_folds_into_batch():
    """vmap over the fused kernels must fold the mapped axis into the
    kernel batch dim (custom_vmap rule) and match per-item calls exactly
    — XLA's fallback is a serial while loop with slice/copy glue that
    cost ~750 ms/step at bench batch 4."""
    import jax
    import jax.numpy as jnp
    from pats_tpu.ops.pallas.attention_kernel import (fused_attention,
                                                      fused_attention_layer)

    rng = np.random.default_rng(3)
    V, B, N, D, H = 3, 12, 20, 64, 4
    q = jnp.asarray(rng.normal(size=(V, B, N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(V, B, N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(V, B, N, D)), jnp.float32)
    alive = jnp.asarray(rng.integers(0, 2, (V, B)), jnp.int32)

    def att(q, k, v, a):
        return fused_attention(q, k, v, scale=0.125, nheads=H, block_b=4,
                               alive=a, interpret=True)

    got = jax.vmap(att)(q, k, v, alive)
    want = jnp.stack([att(q[i], k[i], v[i], alive[i]) for i in range(V)])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))

    ws = [jnp.asarray(rng.normal(size=(D, D)) * 0.1, jnp.float32)
          for _ in range(4)]
    bs = [jnp.asarray(rng.normal(size=(D,)) * 0.1, jnp.float32)
          for _ in range(4)]

    def layer(x, s, a):
        return fused_attention_layer(
            x, s, ws[0], bs[0], ws[1], bs[1], ws[2], bs[2], ws[3], bs[3],
            scale=0.125, nheads=H, block_b=4, alive=a, interpret=True)

    got = jax.vmap(layer)(q, k, alive)
    want = jnp.stack([layer(q[i], k[i], alive[i]) for i in range(V)])
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
