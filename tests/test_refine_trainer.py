"""Level-3 trainer smoke on the virtual mesh (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp

from pats_tpu.parallel.mesh import make_mesh
from pats_tpu.train.refine_trainer import RefineTrainer

from test_parallel import tiny_cfg


def test_refine_trainer_step(rng):
    cfg = tiny_cfg()
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    trainer = RefineTrainer(cfg, mesh)
    H = W = 64
    key = jax.random.PRNGKey(0)
    left = jnp.asarray(rng.uniform(0, 255, (H, W, 3)), jnp.float32)
    coarse_vars = jax.jit(trainer.front.coarse.init)(key, left, left)
    G = (H // 32) * (W // 32)
    crops = jnp.zeros((G, 96, 96, 3))
    fine_vars = jax.jit(
        trainer.front.fine.init, static_argnums=(5, 6, 7, 8))(
        key, crops, crops, jnp.zeros((G, 448)), jnp.ones((G,), bool),
        H // 32, W // 32, True, True)
    state = trainer.init(key, coarse_vars, fine_vars, left, left)

    B = 2
    n2 = (H // 2) * (W // 2)
    labels2 = rng.uniform(0, W, (B, n2, 3)).astype(np.float32)
    labels2[:, ::4, 0] = -1e7
    batch = {
        "left": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
        "right": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
        "labels2": labels2,
    }
    state1, m1 = trainer.step(state, batch)
    assert np.isfinite(float(m1["loss"])), m1
    assert int(state1.step) == 1
    # with random-weight levels 1+2 on noise images the merge may kill all
    # points (zero loss, zero gradient); only require movement when there
    # was a signal
    if float(m1["loss"]) > 0:
        diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                            state.params, state1.params)
        assert max(jax.tree.leaves(diff)) > 0

    # held-out metrics: finite loss, precision a valid fraction, and the
    # masked-residual NaN guard holds even with zero positives
    em = trainer.eval_metrics(state1, batch)
    assert np.isfinite(float(em["loss"])), em
    prec = float(em["precision"])
    assert 0.0 <= prec <= 1.0, em
    # a fully-degenerate batch can produce non-finite gradients via 0/0
    # VJPs; the optimizer must skip those updates, so params stay finite
    # regardless of what grad_norm reports
    finite = jax.tree.map(lambda a: bool(jnp.all(jnp.isfinite(a))),
                          state1.params)
    assert all(jax.tree.leaves(finite)), "non-finite params after step"
