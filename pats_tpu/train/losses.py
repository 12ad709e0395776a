"""Training losses for the patch-area transport levels.

Cleaned-up implementation of the reference training recipe, whose loss code
survives only as drifted dead code (utils/utils.py:1438-1762; SURVEY.md
par.2.3).  The semantics captured per level:

- ``matching_nll``     <- loss_function_matches (utils.py:1438-1448):
  negative log transport score of the GT target cell for positive patches
  whose argmax is wrong.
- ``position_loss``    <- Position_loss (utils.py:1460-1481): squared
  distance between the expansion soft-argmax and the GT position, with x2
  emphasis multipliers as the error drops below 1 / 0.5 / 0.25 cells,
  gated to patches whose argmax lies within 1 cell of the GT.
- ``dustbin_losses``   <- nomatching/mismatching terms
  (utils.py:1572-1579): pull dustbin mass up for GT-negative patches the
  model matched, and down for GT-positive patches the model dustbinned.
- trust terms: the expansion whole/core costs averaged over confidently
  positive patches (utils.py:1590-1591).
- ``sampson_epipolar`` <- Epipolar_loss (utils.py:1498-1525): clamped,
  proximity-weighted Sampson error for (semi-)supervised refinement.

Labels per patch: ``gt_pos`` (target position in target-grid units; any
negative component = invalid) and ``gt_class`` in {-1 negative (no true
match), 0 unknown, +1 positive}.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from pats_tpu.ops.expand import ExpandResult


class LevelLabels(NamedTuple):
    gt_pos: jnp.ndarray     # (B, M, 2) float (row, col) in target-grid units
    gt_class: jnp.ndarray   # (B, M) int32: -1 negative / 0 unknown / +1 positive


def matching_nll(plan: jnp.ndarray, labels: LevelLabels, height: int,
                 width: int, all_positives: bool = False) -> jnp.ndarray:
    """Row-softmax cross-entropy of the GT cell.

    The reference's loss_function_matches (utils.py:1438-1448) takes
    -plan[gt] on the RAW log plan.  That plan is de-normalized by
    +log(m + sum(ns)) with ns the LEARNED scale head
    (ops/sinkhorn.ot_*_dustbin, reference modules.py:162) — so -plan[gt]
    has a degenerate descent direction: inflate ns_sum and every
    positive's loss falls by the same additive constant with zero
    matching improvement.  The round-3 single-batch overfit test caught
    exactly this: loss 102 -> 12 while transport argmax accuracy fell
    BELOW chance and the scale head saturated its sigmoid.  SuperGlue
    does not have the cheat because its de-norm constant is fixed; with
    learned marginals the loss must be mass-invariant.  Row log-softmax
    (over the 144 cells + dustbin) is: column-marginal games move the
    row's logsumexp together with the GT entry, so the only way down is
    to beat the row's OTHER entries — i.e. match.

    ``all_positives=True`` applies the CE to EVERY positive (SuperGlue
    style) instead of only wrong-argmax positives (the reference's
    gate).  The wrong-only gate starves the gradient once a cell's
    argmax is right but its score barely beats the runner-up."""
    B, M1, N1 = plan.shape
    M, N = M1 - 1, N1 - 1
    positive = labels.gt_class > 0
    cell = (jnp.floor(labels.gt_pos[..., 0]).astype(jnp.int32) * width
            + jnp.floor(labels.gt_pos[..., 1]).astype(jnp.int32))
    cell = jnp.clip(cell, 0, N - 1)
    max0 = jnp.argmax(plan[:, :-1, :-1], axis=2)
    logp = plan[:, :-1, :] - jax.nn.logsumexp(plan[:, :-1, :], axis=2,
                                              keepdims=True)
    gt_logp = jnp.take_along_axis(logp, cell[..., None], axis=2)[..., 0]
    wrong = positive if all_positives else (positive & (max0 != cell))
    denom = jnp.sum(positive.astype(jnp.float32)) + 1e-7
    return jnp.sum(jnp.where(wrong, -gt_logp, 0.0)) / denom


def position_loss(res: ExpandResult, plan: jnp.ndarray, labels: LevelLabels,
                  height: int, width: int, weight: float = 5.0
                  ) -> jnp.ndarray:
    """Proximity-emphasized squared soft-argmax error."""
    positive = labels.gt_class > 0
    max0 = jnp.argmax(plan[:, :-1, :-1], axis=2)
    max_r = (max0 // width).astype(jnp.float32)
    max_c = (max0 % width).astype(jnp.float32)
    gt = labels.gt_pos
    near = ((jnp.abs(jnp.floor(gt[..., 0]) - max_r) <= 1)
            & (jnp.abs(jnp.floor(gt[..., 1]) - max_c) <= 1))
    gate = positive & near & jnp.logical_not(res.if_nomatching)
    d2 = jnp.sum(jnp.square(res.average_point - gt), axis=-1)
    err = jnp.sqrt(d2 + 1e-12)
    d2 = jnp.where(err < 1.0, d2 * 2, d2)
    d2 = jnp.where(err < 0.5, d2 * 2, d2)
    d2 = jnp.where(err < 0.25, d2 * 2, d2)
    denom = jnp.sum(gate.astype(jnp.float32)) + 1e-7
    return (weight ** 2) * jnp.sum(jnp.where(gate, d2, 0.0)) / denom


def dustbin_losses(plan: jnp.ndarray, res: ExpandResult, labels: LevelLabels,
                   anti_collapse: bool = True,
                   mismatch_weight=5.0) -> jnp.ndarray:
    """Push negative patches into the dustbin, positives out of it.

    The reference's mismatching term is the raw dustbin LOG-score
    (utils.py:1572-1579), which vanishes as p_dustbin -> 1: confidently
    dustbinning every positive is then a near-zero-loss attractor, and
    from-scratch training fell into it for ~200 steps (round-2 curve,
    STATUS.md).  ``anti_collapse`` swaps it for -log(1 - p_dustbin),
    which grows without bound as the dustbin saturates — same gradient
    direction, no attractor.

    Both terms use the ROW-SOFTMAX dustbin share, not the raw
    de-normalized log plan: the raw plan's additive +log(m + sum(ns))
    term (learned, see matching_nll) makes raw-logit dustbin penalties
    cheatable through the scale head, and exp(raw logit) is not a
    probability at all once the plan mass exceeds 1.

    ``mismatch_weight`` scales the anti-collapse term.  It only needs to
    be large while collapse is a live attractor (early training); late in
    training it competes with the position term for gradient budget — the
    round-2 curve showed precision dipping mid-run while the loss kept
    falling.  Trainers anneal it with :func:`dustbin_weight_schedule`.
    """
    # row-softmax dustbin share per source cell
    db_logp = (plan[:, :-1, -1]
               - jax.nn.logsumexp(plan[:, :-1, :], axis=2))
    negative = labels.gt_class < 0
    positive = labels.gt_class > 0
    matched = jnp.logical_not(res.if_nomatching)
    n_neg = jnp.sum(negative.astype(jnp.float32)) + 10.0
    n_pos = jnp.sum(positive.astype(jnp.float32)) + 10.0
    nomatching = jnp.sum(jnp.where(negative & matched, -db_logp, 0.0)) / n_neg
    if anti_collapse:
        p = jnp.exp(jnp.minimum(db_logp, -1e-4))
        pen = jnp.minimum(-jnp.log1p(-p), 20.0)
    else:
        pen = db_logp
    mismatching = jnp.sum(
        jnp.where(positive & res.if_nomatching, pen, 0.0)) / n_pos
    return nomatching + mismatch_weight * mismatching


def dustbin_weight_schedule(step, hold_steps: int = 150,
                            decay_steps: int = 250,
                            peak: float = 5.0, final: float = 1.0):
    """Anneal the mismatching weight: ``peak`` while collapse is a danger,
    linearly down to ``final`` once the model has escaped it.

    step may be a traced int array (the trainer passes TrainState.step).
    """
    t = jnp.clip((step - hold_steps) / max(decay_steps, 1), 0.0, 1.0)
    return peak + (final - peak) * t


def scale_anchor_loss(ns_pred: jnp.ndarray, labels: LevelLabels,
                      height: int, width: int) -> jnp.ndarray:
    """Anchor the learned per-target-cell scale head to its GT marginal.

    The scale head's output is the OT column marginal: the mass target
    cell j absorbs, which by construction (each source row carries unit
    mass) should equal the NUMBER of GT-positive source cells mapping
    into j.  That count is derivable from the labels alone.  Without
    this anchor nothing in the loss pins the head's magnitude, and
    500-step runs collapse it (scale_med 1.0 -> 0.28, TRAIN_AB_r2.md
    diagnostic) which wrecks the expansion's soft-argmax and the
    level-2 crop boxes.  Squared log-error over target cells with at
    least one GT source.

    ns_pred: (..., N) positive scale-head outputs (N = height*width).
    """
    pos = (labels.gt_class > 0).astype(jnp.float32)
    cell = (jnp.floor(labels.gt_pos[..., 0]).astype(jnp.int32) * width
            + jnp.floor(labels.gt_pos[..., 1]).astype(jnp.int32))
    cell = jnp.clip(cell, 0, height * width - 1)
    if ns_pred.ndim == 1:
        ns_gt = jax.ops.segment_sum(pos, cell,
                                    num_segments=height * width)
    else:
        ns_gt = jax.vmap(lambda p, c: jax.ops.segment_sum(
            p, c, num_segments=height * width))(pos, cell)
    gate = ns_gt > 0.5
    d = jnp.log(jnp.maximum(ns_pred, 1e-6)) - jnp.log(
        jnp.maximum(ns_gt, 1e-6))
    denom = jnp.sum(gate.astype(jnp.float32)) + 1e-7
    return jnp.sum(jnp.where(gate, jnp.square(d), 0.0)) / denom


def trust_loss(res: ExpandResult, labels: LevelLabels) -> jnp.ndarray:
    """Expansion whole/core costs over confidently positive patches."""
    positive = labels.gt_class > 0
    err = jnp.sqrt(jnp.sum(jnp.square(res.average_point - labels.gt_pos),
                           axis=-1) + 1e-12)
    gate = positive & (err < 1.0)
    denom = jnp.sum(gate.astype(jnp.float32)) + 1e-7
    whole = jnp.sum(jnp.where(gate, res.whole_cost, 0.0)) / denom
    core = jnp.sum(jnp.where(gate, res.core_cost, 0.0)) / denom
    return whole + core


def sampson_epipolar(F: jnp.ndarray, src_pts: jnp.ndarray,
                     dst_pts: jnp.ndarray, valid: jnp.ndarray,
                     point_scale: float = 32.0) -> jnp.ndarray:
    """Clamped, proximity-weighted Sampson error (utils.py:1498-1525).

    Args: F (B, 3, 3); src_pts/dst_pts (B, M, 2) pixel (x, y); valid (B, M).
    """
    ones = jnp.ones(src_pts.shape[:-1] + (1,), src_pts.dtype)
    p0 = jnp.concatenate([src_pts, ones], axis=-1)
    p1 = jnp.concatenate([dst_pts, ones], axis=-1)
    Fp0 = jnp.einsum("bij,bmj->bmi", F, p0)
    num = jnp.abs(jnp.einsum("bmi,bmi->bm", p1, Fp0))
    den = jnp.sum(jnp.square(Fp0[..., :2]), axis=-1)
    sampson = num ** 2 / (den + 1e-7)
    dist = num / (jnp.sqrt(den) + 1e-7)
    sampson = jnp.minimum(sampson, point_scale ** 2)
    sampson = jnp.where(dist < point_scale / 2, sampson * 2, sampson)
    sampson = jnp.where(dist < point_scale / 4, sampson * 2, sampson)
    denom = jnp.sum(valid.astype(jnp.float32)) + 1e-8
    return jnp.sum(jnp.where(valid, sampson, 0.0)) / denom


def transport_level_loss(plan: jnp.ndarray, res: ExpandResult,
                         labels: LevelLabels, height: int, width: int,
                         weight_position: float = 5.0,
                         dustbin_mismatch_weight=5.0,
                         nll_all_positives: bool = False) -> jnp.ndarray:
    """Combined per-level loss ('distance' recipe, utils.py:1562-1591)."""
    return (matching_nll(plan, labels, height, width,
                         all_positives=nll_all_positives)
            + position_loss(res, plan, labels, height, width, weight_position)
            + dustbin_losses(plan, res, labels,
                             mismatch_weight=dustbin_mismatch_weight)
            + trust_loss(res, labels))
