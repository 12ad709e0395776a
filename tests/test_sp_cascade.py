"""Fully-sharded single-pair cascade == dense cascade on the virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pats_tpu.models.cascade import PATSCascade
from pats_tpu.parallel.mesh import make_mesh
from pats_tpu.parallel.sp_cascade import match_pair_fully_sharded

from test_cascade import tiny_config

pytestmark = pytest.mark.slow


def test_fully_sharded_matches_dense(rng):
    H, W = 128, 256                     # G = 4*8 = 32, divides the 8 chips
    cfg = tiny_config()
    mesh = make_mesh(data=1, model=8)

    g = np.random.default_rng(5)
    base = g.uniform(0, 255, (H // 4, W // 4, 3))
    left = jnp.asarray(np.kron(base, np.ones((4, 4, 1))), jnp.float32)
    right = jnp.asarray(np.roll(np.asarray(left), (16, 24), (0, 1)))

    dense = PATSCascade(config=cfg, outdoor=True, merge_new=True)
    variables = dense.init(jax.random.PRNGKey(0), left, right)
    want, _ = jax.jit(
        lambda v, a, b: dense.apply(v, a, b, mutable=["batch_stats"]))(
        variables, left, right)

    ml, mr, valid = match_pair_fully_sharded(
        variables, left, right, cfg, mesh)

    # sp_coarse is bit-close (not bit-exact) to the dense level 1: the fp
    # drift can flip survival decisions sitting exactly on a threshold.
    # Contract: >=99.9% of slots agree on validity, and the coordinates
    # agree tightly wherever both paths kept the match.
    v_want = np.asarray(want["valid"])
    v_got = np.asarray(valid)
    agree = float((v_got == v_want).mean())
    assert agree >= 0.999, f"validity agreement {agree:.4%}"
    both = v_want & v_got
    np.testing.assert_allclose(np.asarray(ml), np.asarray(want["matches_l"]),
                               atol=5e-2)
    if both.any():
        # a handful of matches sit on refine's 4-px window-quantization
        # boundary where the drift shifts the unfold window ~1px; gate the
        # bulk tightly and bound the boundary flips
        d = np.abs(np.asarray(mr)[both]
                   - np.asarray(want["matches_r"])[both]).max(-1)
        assert float((d < 5e-2).mean()) >= 0.995, d.max()
        assert float(d.max()) < 3.0
