"""Optimizer factory: clipping and schedule behavior."""

import jax
import jax.numpy as jnp
import optax

from pats_tpu.train.optim import make_optimizer


def test_clipping_bounds_update():
    tx = make_optimizer(1e-2, clip_norm=1.0)
    params = {"w": jnp.zeros(4)}
    opt = tx.init(params)
    huge = {"w": jnp.full(4, 1e6)}
    upd, _ = tx.update(huge, opt, params)
    # post-clip gradient norm 1 -> adam step magnitude <= lr per coord
    assert float(optax.global_norm(upd)) < 1.0


def test_warmup_cosine_progression():
    tx = make_optimizer(1e-3, total_steps=100, warmup_steps=10,
                        clip_norm=None)
    params = {"w": jnp.ones(2)}
    opt = tx.init(params)
    g = {"w": jnp.ones(2)}

    def norm_at(opt, n):
        for _ in range(n):
            upd, opt = tx.update(g, opt, params)
        return float(optax.global_norm(upd)), opt

    first, opt = norm_at(opt, 1)      # step 0: zero lr under warmup
    assert first == 0.0
    mid, opt = norm_at(opt, 10)       # past warmup: real steps
    assert mid > 0.0


def test_no_clip_passthrough():
    tx = make_optimizer(1e-3, clip_norm=None)
    params = {"w": jnp.zeros(2)}
    upd, _ = tx.update({"w": jnp.ones(2)}, tx.init(params), params)
    assert float(optax.global_norm(upd)) > 0


def test_nonfinite_update_skipped():
    """NaN/inf gradients (degenerate all-dead batches) must not poison
    the params: apply_if_finite swallows the update."""
    tx = make_optimizer(1e-2)
    params = {"w": jnp.ones(3)}
    opt = tx.init(params)
    upd, opt = tx.update({"w": jnp.array([jnp.nan, 1.0, 1.0])}, opt, params)
    new = optax.apply_updates(params, upd)
    assert bool(jnp.all(jnp.isfinite(new["w"])))
    assert float(jnp.abs(new["w"] - params["w"]).max()) == 0.0
    # a finite gradient afterwards still applies
    upd, opt = tx.update({"w": jnp.ones(3)}, opt, params)
    assert float(optax.global_norm(upd)) > 0


def test_dustbin_weight_schedule():
    import jax.numpy as jnp

    from pats_tpu.train.losses import dustbin_weight_schedule as sched

    # peak during the anti-collapse hold, linear decay, final plateau
    assert float(sched(jnp.int32(0))) == 5.0
    assert float(sched(jnp.int32(150))) == 5.0
    mid = float(sched(jnp.int32(275)))
    assert 2.9 < mid < 3.1
    assert float(sched(jnp.int32(400))) == 1.0
    assert float(sched(jnp.int32(10_000))) == 1.0


def test_scale_anchor_loss():
    """The anchor is zero when the head equals the GT per-target-cell
    source counts, and positive when the head collapses."""
    import jax.numpy as jnp
    import numpy as np

    from pats_tpu.train.losses import LevelLabels, scale_anchor_loss

    h = w = 2
    # sources 0 and 1 both map into target cell (0, 0); source 2 into
    # (1, 1); source 3 negative
    gt_pos = jnp.asarray([[0.2, 0.3], [0.7, 0.1], [1.5, 1.5],
                          [-1.0, -1.0]], jnp.float32)
    gt_class = jnp.asarray([1, 1, 1, -1], jnp.int32)
    labels = LevelLabels(gt_pos[None], gt_class[None])

    exact = jnp.asarray([2.0, 1.0, 1.0, 1.0], jnp.float32)   # cells 0..3
    # cells 1 and 2 have no GT source -> ungated, any value is fine
    exact = exact.at[1].set(17.0).at[2].set(0.01)
    exact = exact.at[3].set(1.0)
    np.testing.assert_allclose(
        float(scale_anchor_loss(exact[None], labels, h, w)), 0.0,
        atol=1e-9)

    collapsed = jnp.full((4,), 0.28, jnp.float32)
    assert float(scale_anchor_loss(collapsed[None], labels, h, w)) > 1.0
