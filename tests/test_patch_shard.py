"""Patch-sharded levels 2/3 equal the dense cascade on the virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from pats_tpu.config import PATSConfig
from pats_tpu.models.cascade import PATSCascade
from pats_tpu.parallel.mesh import make_mesh
from pats_tpu.parallel.patch_shard import (
    match_pair_patch_sharded, patch_sharded_cascade)

from test_cascade import tiny_config


def test_patch_sharded_matches_dense(rng):
    H, W = 96, 160                       # G = 15 crops, not divisible by 4
    cfg = tiny_config()
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])

    left = jnp.asarray(rng.uniform(0, 255, (H, W, 3)), jnp.float32)
    right = jnp.asarray(rng.uniform(0, 255, (H, W, 3)), jnp.float32)

    dense = PATSCascade(config=cfg, outdoor=True, merge_new=True)
    variables = dense.init(jax.random.PRNGKey(0), left, right)
    want, _ = jax.jit(
        lambda v, a, b: dense.apply(v, a, b, mutable=["batch_stats"]))(
        variables, left, right)

    # with random weights the refine level rejects everything, but levels
    # 1/2 are live (15 coarse / ~12 fine cells) - the sharded path must
    # reproduce their occupancy exactly and the composed left coordinates
    # (a pure function of the level-1/2 outputs) everywhere
    assert int(want["num_fine"]) > 0, "degenerate fixture: level 2 empty"

    sharded = patch_sharded_cascade(cfg, mesh)
    full = jax.jit(lambda v, a, b: sharded.apply(
        v, a[None], b[None], mutable=["batch_stats"])[0])(
        variables, left, right)
    for key in ("num_coarse", "num_fine", "num_final"):
        assert int(full[key][0]) == int(want[key]), key

    ml, mr, valid = match_pair_patch_sharded(
        variables, left, right, cfg, mesh)
    out = {"matches_l": ml, "matches_r": mr, "valid": valid}

    np.testing.assert_array_equal(np.asarray(out["valid"]),
                                  np.asarray(want["valid"]))
    np.testing.assert_allclose(np.asarray(out["matches_l"]),
                               np.asarray(want["matches_l"]), atol=1e-3)
    v = np.asarray(want["valid"])
    if v.any():
        np.testing.assert_allclose(np.asarray(out["matches_r"])[v],
                                   np.asarray(want["matches_r"])[v],
                                   atol=1e-3)
