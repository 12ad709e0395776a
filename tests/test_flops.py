"""Analytic MXU FLOP count vs XLA's own cost analysis.

The analytic count (utils/flops.py) exists because cost_analysis()
returns None on some TPU runtimes; here, on CPU where cost_analysis
works, the two must agree: the analytic count covers only dot/conv
FLOPs, so it must be a large fraction of (and never exceed) XLA's
total, which also counts elementwise work.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pats_tpu.utils.flops import matmul_flops


def test_plain_matmul_exact():
    a = jnp.zeros((64, 128))
    b = jnp.zeros((128, 32))
    got = matmul_flops(lambda x, y: x @ y, a, b)
    assert got == 2 * 64 * 128 * 32


def test_conv_exact():
    x = jnp.zeros((2, 16, 16, 8))
    k = jnp.zeros((3, 3, 8, 24))
    got = matmul_flops(
        lambda x, k: jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")), x, k)
    assert got == 2 * (2 * 16 * 16 * 24) * (3 * 3 * 8)


def test_scan_multiplies():
    a = jnp.zeros((32, 32))

    def fn(a):
        def body(c, _):
            return c @ a, ()
        out, _ = jax.lax.scan(body, a, None, length=7)
        return out

    assert matmul_flops(fn, a) == 7 * 2 * 32 * 32 * 32


def test_trunk_matches_cost_analysis():
    """Cross-check vs XLA's cost analysis where it works (CPU, single
    conv trunk — for the full cascade jaxpr the lowered analysis returns
    a bogus ~1.6 kF).  XLA discounts padded-border MACs, so the analytic
    count sits slightly ABOVE it; both count the same algorithm."""
    from pats_tpu.models.backbone import CoarseTrunk

    m = CoarseTrunk()
    x = jnp.zeros((1, 96, 128, 3))
    v = m.init(jax.random.PRNGKey(0), x)
    fwd = lambda v, x: m.apply(v, x)                      # noqa: E731
    analytic = matmul_flops(fwd, v, x)
    ca = jax.jit(fwd).lower(v, x).cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    xla = float(ca["flops"])
    assert xla <= analytic <= xla * 1.3, (analytic, xla)


@pytest.mark.slow
def test_cascade_flops_scale():
    """The full-cascade count is GFLOP-scale and exactly batch-linear
    (static shapes; vmapped pair batch)."""
    from pats_tpu.models.cascade import PATSCascade
    from test_cascade import tiny_config

    cfg = tiny_config()
    model = PATSCascade(config=cfg, outdoor=True, merge_new=True)
    H, W = 96, 128
    left = jnp.zeros((H, W, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), left, left)

    def fwd(v, l, r):
        out, _ = model.apply(v, l, r, mutable=["batch_stats"])
        return out["matches_l"]

    one = matmul_flops(fwd, variables, left, left)
    assert one > 1e9

    def fwd2(v, l, r):
        return jax.vmap(lambda a, b: fwd(v, a, b))(l, r)

    stack = jnp.stack([left, left])
    two = matmul_flops(fwd2, variables, stack, stack)
    # vmap batches a few dots into slightly different contractions
    np.testing.assert_allclose(two, 2 * one, rtol=1e-3)
