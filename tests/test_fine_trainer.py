"""Level-2 trainer smoke on the virtual mesh (tiny configs)."""

import numpy as np
import jax
import jax.numpy as jnp

from pats_tpu.parallel.mesh import make_mesh
from pats_tpu.train.fine_trainer import FineTrainer, _crop_cell_source_index

from test_parallel import tiny_cfg


def test_crop_cell_source_index():
    idx = np.asarray(_crop_cell_source_index(2, 3))
    assert idx.shape == (6, 144)
    # patch (0,0), cell (d0=1, i4=0, d2=1, j4=0) = own top-left cell ->
    # global cell (0, 0)
    cell = 1 * 48 + 0 * 12 + 1 * 4 + 0
    assert idx[0, cell] == 0
    # patch (0,0), cells in the d0=0 band fall above the image -> -1
    assert idx[0, 0] == -1
    # patch (1,2) center band cell maps inside
    g = 1 * 3 + 2
    assert idx[g, cell] == (1 * 4) * 12 + 2 * 4


def test_fine_trainer_step(rng):
    cfg = tiny_cfg()
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    trainer = FineTrainer(cfg, mesh)
    H = W = 64
    key = jax.random.PRNGKey(0)
    left = jnp.asarray(rng.uniform(0, 255, (H, W, 3)), jnp.float32)
    c = cfg.model.coarse
    coarse_vars = jax.jit(trainer.coarse.init)(key, left, left)
    state = trainer.init(key, coarse_vars, left, left)

    B = 2
    h8 = (H // 8) * (W // 8)
    labels8 = rng.uniform(0, W, (B, h8, 3)).astype(np.float32)
    labels8[:, ::3, 0] = -1e7          # some definite negatives
    batch = {
        "left": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
        "right": rng.uniform(0, 255, (B, H, W, 3)).astype(np.float32),
        "labels8": labels8,
    }
    state1, m1 = trainer.step(state, batch)
    assert np.isfinite(float(m1["loss"])), m1
    state2, m2 = trainer.step(state1, batch)
    assert int(state2.step) == 2
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        state1.params, state2.params)
    assert max(jax.tree.leaves(diff)) > 0
