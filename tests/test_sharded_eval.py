"""ShardedMatcher: batched data-parallel matching on the virtual mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from pats_tpu.config import PATSConfig
from pats_tpu.matcher import Matcher
from pats_tpu.parallel.eval import ShardedMatcher
from pats_tpu.parallel.mesh import make_mesh

from test_cascade import tiny_config


def test_sharded_matches_single(rng):
    cfg = PATSConfig(model=tiny_config())
    mesh = make_mesh(data=4, model=1, devices=jax.devices()[:4])
    single = Matcher(cfg, seed=0)
    sharded = ShardedMatcher(cfg, mesh, single.variables, batch_size=4)

    imgs0 = rng.uniform(0, 255, (4, 96, 128, 3)).astype(np.float32)
    imgs1 = rng.uniform(0, 255, (4, 96, 128, 3)).astype(np.float32)
    batch = sharded.match_batch(imgs0, imgs1)
    assert len(batch) == 4
    for i in range(4):
        ml, mr = single.match(imgs0[i], imgs1[i])
        bl, br = batch[i]
        assert bl.shape == ml.shape
        np.testing.assert_allclose(bl, ml, atol=1e-3)
        np.testing.assert_allclose(br, mr, atol=1e-3)
