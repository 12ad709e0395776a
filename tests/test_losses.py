"""Invariance properties of the transport losses.

Round-3 regression guards: the matching CE and dustbin penalties must be
invariant to the OT plan's learnable de-normalization (the raw plan
carries +log(m + sum(ns)) with ns the LEARNED scale head; a loss that
moves under that shift has a matching-free descent direction — the bug
that kept fine-level training at chance through rounds 2-3, see
train/losses.matching_nll)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pats_tpu.ops.expand import ExpandResult
from pats_tpu.train.losses import (LevelLabels, dustbin_losses,
                                   matching_nll, scale_anchor_loss)


def _fixture(rng, B=2, M=16, h=4, w=4):
    N = h * w
    plan = jnp.asarray(rng.normal(size=(B, M + 1, N + 1)), jnp.float32)
    gt_pos = jnp.asarray(
        np.stack([rng.uniform(0, h, (B, M)), rng.uniform(0, w, (B, M))],
                 axis=-1), jnp.float32)
    gt_class = jnp.asarray(rng.choice([-1, 0, 1], (B, M)), jnp.int32)
    res = ExpandResult(
        whole_cost=jnp.zeros((B, M)), core_cost=jnp.zeros((B, M)),
        average_point=gt_pos, x_scale=jnp.ones((B, M)),
        y_scale=jnp.ones((B, M)),
        bound=jnp.zeros((B, M, 4), jnp.int32),
        if_nomatching=jnp.asarray(rng.uniform(size=(B, M)) < 0.3))
    return plan, LevelLabels(gt_pos, gt_class), res


def test_matching_nll_invariant_to_plan_mass(rng):
    """Adding any per-row constant (the de-norm term is one) must not
    move the CE: otherwise the learned marginals are a loss cheat."""
    plan, labels, _ = _fixture(rng)
    base = float(matching_nll(plan, labels, 4, 4, all_positives=True))
    shifted = plan + 3.7                       # global de-norm shift
    assert float(matching_nll(shifted, labels, 4, 4,
                              all_positives=True)) == pytest.approx(
        base, abs=1e-5)
    row = jnp.asarray(rng.normal(size=plan.shape[:2]), jnp.float32)
    per_row = plan + row[..., None]            # row-potential shift
    assert float(matching_nll(per_row, labels, 4, 4,
                              all_positives=True)) == pytest.approx(
        base, abs=1e-4)


def test_matching_nll_decreases_with_gt_mass(rng):
    """Raising the GT entry (and only it) must lower the CE."""
    plan, labels, _ = _fixture(rng)
    cell = (jnp.floor(labels.gt_pos[..., 0]).astype(jnp.int32) * 4
            + jnp.floor(labels.gt_pos[..., 1]).astype(jnp.int32))
    cell = jnp.clip(cell, 0, 15)
    bumped = plan.at[
        jnp.arange(2)[:, None], jnp.arange(16)[None, :], cell].add(2.0)
    assert float(matching_nll(bumped, labels, 4, 4, all_positives=True)) \
        < float(matching_nll(plan, labels, 4, 4, all_positives=True))


def test_dustbin_losses_invariant_to_plan_mass(rng):
    plan, labels, res = _fixture(rng)
    base = float(dustbin_losses(plan, res, labels))
    shifted = float(dustbin_losses(plan + 2.5, res, labels))
    assert shifted == pytest.approx(base, abs=1e-5)


def test_scale_anchor_pulls_toward_gt_marginal(rng):
    _, labels, _ = _fixture(rng)
    pos = np.asarray(labels.gt_class > 0, np.float32)
    cell = np.clip(np.floor(np.asarray(labels.gt_pos[..., 0])) * 4
                   + np.floor(np.asarray(labels.gt_pos[..., 1])),
                   0, 15).astype(np.int64)
    ns_gt = np.zeros((2, 16), np.float32)
    for b in range(2):
        np.add.at(ns_gt[b], cell[b], pos[b])
    exact = float(scale_anchor_loss(jnp.asarray(np.maximum(ns_gt, 1e-6)),
                                    labels, 4, 4))
    off = float(scale_anchor_loss(jnp.asarray(np.maximum(ns_gt, 1e-6)) * 3,
                                  labels, 4, 4))
    assert exact == pytest.approx(0.0, abs=1e-6)
    assert off > exact
