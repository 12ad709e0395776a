"""Capacity-bucketed refine (ModelConfig.refine_bucket) parity.

The level-3 point batch runs at fixed capacity 16*G; trained occupancy
is ~47% of that (docs/perf.md), so refine_bucket=0.5 adds a
half-capacity lax.cond branch taken whenever every pair's surviving
cell count fits.  Because compaction is alive-first and every
BatchNorm statistic is masked to alive slots, the bucketed outputs
must equal the full-capacity ones bit-for-bit up to reduction-order
noise — on BOTH branches (small taken / fallback to big).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pats_tpu.config import PATSConfig
from pats_tpu.models.cascade import PATSCascade, PATSCascadeBatched

from test_cascade import tiny_config


def _images(rng, n, h=96, w=128):
    base = rng.uniform(0, 255, (n, h, w, 3)).astype(np.float32)
    return jnp.asarray(base), jnp.asarray(np.roll(base, (0, 4, 7, 0),
                                                  axis=(0, 1, 2, 3)))


@pytest.mark.parametrize("bucket,branch", [(0.5, "small"), (0.001, "big")])
def test_batched_bucket_parity(rng, bucket, branch):
    mc = tiny_config()
    left, right = _images(rng, 2)
    base_model = PATSCascadeBatched(config=mc, outdoor=True, merge_new=True)
    variables = jax.jit(base_model.init)(jax.random.PRNGKey(0),
                                         left[:1], right[:1])
    want, _ = base_model.apply(variables, left, right,
                               mutable=["batch_stats"])

    bmc = dataclasses.replace(mc, refine_bucket=bucket)
    bmodel = PATSCascadeBatched(config=bmc, outdoor=True, merge_new=True)
    got, _ = bmodel.apply(variables, left, right, mutable=["batch_stats"])

    np.testing.assert_array_equal(np.asarray(got["valid"]),
                                  np.asarray(want["valid"]))
    v = np.asarray(want["valid"])
    np.testing.assert_allclose(np.asarray(got["matches_r"])[v],
                               np.asarray(want["matches_r"])[v],
                               rtol=1e-5, atol=1e-3)
    np.testing.assert_array_equal(np.asarray(got["num_fine"]),
                                  np.asarray(want["num_fine"]))


def test_single_pair_bucket_parity(rng):
    mc = tiny_config()
    left, right = _images(rng, 1)
    left, right = left[0], right[0]
    base_model = PATSCascade(config=mc, outdoor=True, merge_new=True)
    variables = jax.jit(base_model.init)(jax.random.PRNGKey(0), left, right)
    want, _ = base_model.apply(variables, left, right,
                               mutable=["batch_stats"])

    bmc = dataclasses.replace(mc, refine_bucket=0.5)
    bmodel = PATSCascade(config=bmc, outdoor=True, merge_new=True)
    got, _ = bmodel.apply(variables, left, right, mutable=["batch_stats"])

    np.testing.assert_array_equal(np.asarray(got["valid"]),
                                  np.asarray(want["valid"]))
    v = np.asarray(want["valid"])
    np.testing.assert_allclose(np.asarray(got["matches_r"])[v],
                               np.asarray(want["matches_r"])[v],
                               rtol=1e-5, atol=1e-3)
