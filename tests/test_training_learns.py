"""End-to-end training sanity: the coarse trainer's loss DECREASES on
self-supervised homography-warp data (tiny model, CPU mesh).

This exercises the full training stack - synthetic pipeline, labels,
losses, data-parallel step - as a learning system, not just mechanics.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pats_tpu.parallel.mesh import make_mesh
from pats_tpu.train.synthetic import synthetic_batches, warp_pair
from pats_tpu.train.trainer import CoarseTrainer

from test_parallel import tiny_cfg


def _textured_images(rng, n, h, w):
    """Smooth random textures (noise is unlearnable for matching)."""
    import cv2

    imgs = []
    for _ in range(n):
        base = rng.uniform(0, 255, (h // 8, w // 8, 3)).astype(np.float32)
        img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
        imgs.append(np.clip(img, 0, 255).astype(np.uint8))
    return imgs


def test_warp_pair_labels(rng):
    imgs = _textured_images(rng, 1, 64, 64)
    ex = warp_pair(imgs[0], rng, level=0)
    assert ex["gt_pos"].shape == (4, 2)
    assert set(np.unique(ex["gt_class"])) <= {-1, 0, 1}
    # identity-ish warps keep most patches positive
    assert (ex["gt_class"] != 0).any()


def test_coarse_training_loss_decreases(rng):
    cfg = tiny_cfg()
    mesh = make_mesh(data=2, model=1, devices=jax.devices()[:2])
    trainer = CoarseTrainer(cfg, mesh, learning_rate=3e-4)
    H = W = 64
    key = jax.random.PRNGKey(0)
    left = jnp.zeros((H, W, 3), jnp.float32)
    state = trainer.init(key, left, left)

    imgs = _textured_images(rng, 8, H, W)
    losses = []
    it = synthetic_batches(imgs, batch_size=2, level=0, seed=7,
                           max_rotation=0.05, max_scale=0.05,
                           max_translation=0.02)
    for step, batch in enumerate(it):
        batch = {k: batch[k] for k in ("left", "right", "gt_pos",
                                       "gt_class")}
        state, m = trainer.step(state, jax.random.fold_in(key, step), batch)
        losses.append(float(m["loss"]))
        if step >= 11:
            break
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert np.isfinite(losses).all(), losses
    assert last < first, (first, last, losses)
