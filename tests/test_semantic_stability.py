"""Semantic-drift guard: the tiny cascade's outputs on fixed inputs must
stay stable across refactors (CPU, fixed seeds).

If an intentional semantics change moves these numbers, regenerate the
fixture by running this file with UPDATE=1 in the environment.
"""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from pats_tpu.config import PATSConfig
from pats_tpu.matcher import Matcher

from test_cascade import tiny_config

FIXTURE = os.path.join(os.path.dirname(__file__),
                       "fixtures", "semantic_tiny_cascade.json")


def _run():
    # Pin PER-LEVEL occupancy counters plus the final matches: with
    # random tiny weights the full cascade can legitimately keep zero
    # final matches (the round-4 BN fixes tightened the dustbin), and a
    # zero-only fixture would guard nothing — num_coarse/num_fine are
    # the live drift signal either way.
    rng = np.random.default_rng(20260817)
    cfg = PATSConfig(model=tiny_config())
    m = Matcher(cfg, seed=11)
    base = rng.uniform(0, 255, (96, 128, 3)).astype(np.float32)
    img2 = np.roll(base, (6, 10), axis=(0, 1))
    out = m.match_raw(base, img2)
    valid = np.asarray(out["valid"])
    ml = np.asarray(out["matches_l"])[valid]
    mr = np.asarray(out["matches_r"])[valid]
    return {
        "num_coarse": int(np.asarray(out["num_coarse"])),
        "num_fine": int(np.asarray(out["num_fine"])),
        "num_matches": int(len(ml)),
        "ml_sum": round(float(ml.sum()), 2) if len(ml) else 0.0,
        "mr_sum": round(float(mr.sum()), 2) if len(ml) else 0.0,
        "ml_first": [round(float(v), 3) for v in ml[0]] if len(ml) else [],
    }


def test_semantic_stability():
    got = _run()
    if os.environ.get("UPDATE") == "1" or not os.path.exists(FIXTURE):
        os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
        with open(FIXTURE, "w") as f:
            json.dump(got, f, indent=1)
    with open(FIXTURE) as f:
        want = json.load(f)
    for key in ("num_coarse", "num_fine", "num_matches"):
        assert got[key] == want[key], (key, got, want)
    np.testing.assert_allclose(got["ml_sum"], want["ml_sum"], rtol=1e-4)
    np.testing.assert_allclose(got["mr_sum"], want["mr_sum"], rtol=1e-3)
