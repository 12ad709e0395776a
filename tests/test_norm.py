"""MaskedBatchNorm: grouped (flat-batch) statistics == vmapped per-pair.

The grouped path is what lets PATSCascadeBatched run levels 2/3 flat over
B*G crops while keeping the reference's per-pair batch-statistics
semantics (models/pats.py:112-118) in refine_batch_stats mode.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pats_tpu.models.norm import MaskedBatchNorm


def test_grouped_stats_match_vmapped(rng):
    B, G, Hs, C = 3, 5, 4, 8
    x = jnp.asarray(rng.normal(size=(B * G, Hs, Hs, C)), jnp.float32)
    mask = jnp.asarray(rng.random(B * G) > 0.3)
    groups = jnp.repeat(jnp.arange(B, dtype=jnp.int32), G)
    bn = MaskedBatchNorm(use_running_average=False)
    v = bn.init(jax.random.PRNGKey(0), x)

    flat = bn.apply(v, x, mask, (), groups, B)
    vm = jax.vmap(lambda xx, mm: bn.apply(v, xx, mm))(
        x.reshape(B, G, Hs, Hs, C), mask.reshape(B, G))
    np.testing.assert_allclose(
        np.asarray(flat).reshape(B, G, Hs, Hs, C), np.asarray(vm),
        rtol=2e-5, atol=2e-5)


def test_grouped_stats_with_group_axes(rng):
    """group_axes=(0,) (the stacked-image axis of the GNN) composes with
    per-pair groups: statistics are per (image, pair)."""
    B, G, T, C = 3, 5, 7, 8
    x = jnp.asarray(rng.normal(size=(2, B * G, T, C)), jnp.float32)
    mask = jnp.broadcast_to(jnp.asarray(rng.random(B * G) > 0.3)[None],
                            (2, B * G))
    groups = jnp.repeat(jnp.arange(B, dtype=jnp.int32), G)
    bn = MaskedBatchNorm(use_running_average=False)
    v = bn.init(jax.random.PRNGKey(0), x)

    flat = bn.apply(v, x, mask, (0,), groups, B)
    xr = x.reshape(2, B, G, T, C).transpose(1, 0, 2, 3, 4)
    mr = mask.reshape(2, B, G).transpose(1, 0, 2)
    vm = jax.vmap(lambda xx, mm: bn.apply(v, xx, mm, (0,)))(xr, mr)
    np.testing.assert_allclose(
        np.asarray(flat).reshape(2, B, G, T, C).transpose(1, 0, 2, 3, 4),
        np.asarray(vm), rtol=2e-5, atol=2e-5)


def test_grouped_all_dead_group_is_finite(rng):
    """A pair whose mask is entirely False must not produce NaNs."""
    B, G, C = 2, 4, 8
    x = jnp.asarray(rng.normal(size=(B * G, C)), jnp.float32)
    mask = jnp.asarray([True] * G + [False] * G)
    groups = jnp.repeat(jnp.arange(B, dtype=jnp.int32), G)
    bn = MaskedBatchNorm(use_running_average=False)
    v = bn.init(jax.random.PRNGKey(0), x)
    out = bn.apply(v, x, mask, (), groups, B)
    assert np.isfinite(np.asarray(out)).all()


def test_train_mode_updates_running_stats(rng):
    """Round-3 regression: train-mode MaskedBatchNorm must EMA the pooled
    masked statistics into batch_stats, or framework-trained checkpoints
    evaluate with init stats (mean 0 / var 1) in running-average mode."""
    import jax.numpy as jnp
    from pats_tpu.models.norm import MaskedBatchNorm

    x = jnp.asarray(rng.normal(3.0, 2.0, (16, 5, 4)), jnp.float32)
    mask = jnp.asarray(rng.uniform(size=(16,)) < 0.7)
    bn = MaskedBatchNorm(use_running_average=False, momentum=0.5)
    variables = bn.init(jax.random.PRNGKey(0), x, mask)
    stats = variables["batch_stats"]
    for _ in range(12):
        _, mut = bn.apply({"params": variables["params"],
                           "batch_stats": stats}, x, mask,
                          mutable=["batch_stats"])
        stats = mut["batch_stats"]
    xm = np.asarray(x)[np.asarray(mask)]
    want_mean = xm.reshape(-1, 4).mean(0)
    want_var = xm.reshape(-1, 4).var(0)
    np.testing.assert_allclose(np.asarray(stats["mean"]), want_mean,
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(stats["var"]), want_var,
                               rtol=0.05)
    # running-average mode with the refreshed stats ~ train-mode output
    y_train = bn.apply(variables, x, mask)
    y_eval = MaskedBatchNorm(use_running_average=True).apply(
        {"params": variables["params"], "batch_stats": stats}, x)
    np.testing.assert_allclose(np.asarray(y_eval)[np.asarray(mask)],
                               np.asarray(y_train)[np.asarray(mask)],
                               atol=0.05)
