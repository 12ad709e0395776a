"""Trained-checkpoint accuracy floor (round-3 verdict weak #4/#5).

The headline trained numbers existed only as JSON artifacts; nothing
failed if the checkpoint or model silently regressed.  These slow tests
pin a floor under the trained cascade on the in-domain synthetic plane
protocol using exact epipolar geometry (no RANSAC noise, 3 pairs):

- r3 floor (coarse+fine trained, max_level 2, 8-px granularity):
  calibrated from 6 pairs at 320x256 — n>=970 matches/pair,
  median |epipolar| 2.5-10.1 px, frac<2px 0.25-0.42.  Floors set at
  roughly half the observed worst pair.
- r4 floor (full 3-level): added once the refine level is trained; the
  PATS_TRAINED_CKPT gate in test_trained_parity.py shares the path.

Skips when the pinned checkpoint directory is absent (fresh clone
without /root/ckpts) — the checkpoint manifest (ckpts/MANIFEST.json)
records which artifact carries each floor.
"""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

# Default to the IN-REPO checkpoint (ckpts/ is committed): /root/ckpts
# did not survive the round-3/4 environment boundary, which silently
# skipped these floors — in-tree artifacts are the only durable option.
_CKPTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      os.pardir, "ckpts")
# Both floors run against the same committed full-cascade tree by
# default; the names describe WHICH LEVELS each floor exercises (advisor
# round 4: the old R3_/R4_ names implied distinct checkpoints that no
# longer exist).  Override with PATS_COARSE_FINE_CKPT / PATS_TRAINED_CKPT.
COARSE_FINE_CKPT = os.environ.get(
    "PATS_COARSE_FINE_CKPT",
    os.environ.get("PATS_TRAINED_CKPT", os.path.join(_CKPTS, "r4_full")))
FULL_CKPT = os.environ.get("PATS_TRAINED_CKPT",
                           os.path.join(_CKPTS, "r4_full"))


def _epi_stats(ckpt, max_level, n_pairs=3, texture="default", fx=400.0):
    from pats_tpu.config import load_config
    from pats_tpu.data.synthetic_pairs import SyntheticPlanePairs
    from pats_tpu.io.checkpoint import load_matcher_checkpoint
    from pats_tpu.matcher import Matcher
    from pats_tpu.utils.metrics import epipolar_errors

    cfg = load_config(None, {
        "eval": {"if_outdoor": True, "merge_new": True},
        "model": {"refine_batch_stats": True, "max_level": max_level}})
    m = Matcher(cfg, seed=0)
    m.variables = load_matcher_checkpoint(ckpt, m.variables)
    ds = SyntheticPlanePairs(n_pairs=n_pairs, width=320, height=256, seed=0,
                             texture=texture, fx=fx)
    stats = []
    for i in range(n_pairs):
        it = ds[i]
        ml, mr = m.match(it["image0"], it["image1"])
        e = np.abs(epipolar_errors(ml, mr, it["K0"], it["K1"],
                                   it["T0"], it["T1"]))
        assert e.size, f"pair {i}: zero matches"
        stats.append((ml.shape[0], float(np.median(e)),
                      float((e < 2.0).mean())))
    return stats


@pytest.mark.skipif(not os.path.isdir(COARSE_FINE_CKPT),
                    reason=f"no trained checkpoint at {COARSE_FINE_CKPT}")
def test_coarse_fine_floor():
    """8-px-stage floor (the round-3 numbers, re-pinned on the r4
    checkpoint's coarse+fine levels at max_level 2)."""
    stats = _epi_stats(COARSE_FINE_CKPT, max_level=2)
    for i, (n, med, frac2) in enumerate(stats):
        assert n >= 500, f"pair {i}: only {n} matches"
        assert med <= 20.0, f"pair {i}: median epipolar {med:.2f}px"
    assert np.mean([s[2] for s in stats]) >= 0.15, stats


MIXED_CKPT = os.environ.get("PATS_MIXED_CKPT",
                            os.path.join(_CKPTS, "r5_full"))


@pytest.mark.skipif(not os.path.isdir(MIXED_CKPT),
                    reason=f"no mixed checkpoint at {MIXED_CKPT}")
@pytest.mark.parametrize("texture", ["blobs", "waves"])
def test_mixed_family_floor(texture):
    """Cross-family floor at the TRAINED apparent scale (round 5).

    The mixed cascade (ckpts/r5_full) is family-even at 320x256/fx=200
    — the scale the trainers render at — including the fully held-out
    waves family (EVAL_r5b_waves_320.json auc@5 0.130 vs in-family
    0.140); the 640-px collapse is a scale extrapolation, not family
    memorization (STATUS.md round-5 diagnosis).  Floors at ~2x the
    worst protocol pair so texture-family regressions (sampler, BN
    recal, converter) fail loudly."""
    stats = _epi_stats(MIXED_CKPT, max_level=3, texture=texture, fx=200.0)
    for i, (n, med, frac2) in enumerate(stats):
        assert n >= 1000, f"{texture} pair {i}: only {n} matches"
        assert med <= 60.0, f"{texture} pair {i}: median epi {med:.2f}px"


@pytest.mark.skipif(not os.path.isdir(FULL_CKPT),
                    reason=f"no trained checkpoint at {FULL_CKPT}")
def test_r4_full_cascade_floor():
    """3-level floor: refine's 2-px granularity must beat the 8-px
    stage's epipolar stats, not just match them."""
    stats = _epi_stats(FULL_CKPT, max_level=3)
    for i, (n, med, frac2) in enumerate(stats):
        assert n >= 500, f"pair {i}: only {n} matches"
        assert med <= 10.0, f"pair {i}: median epipolar {med:.2f}px"
    assert np.mean([s[2] for s in stats]) >= 0.30, stats
