"""Composition + subdivision geometry tests.

Synthetic-geometry check (SURVEY.md par.4c): identical images should
compose left == right up to the crop resampling quantization, given an
identity transport (crop centered on the patch with unit scale).
"""

import numpy as np
import jax.numpy as jnp

from pats_tpu.ops.compose import compose_matches
from pats_tpu.ops.extract import extract_patch_neighborhoods


def test_compose_identity():
    gh, gw = 2, 3
    G = gh * gw
    # crops centered exactly on each patch center with unit scale
    prow = np.arange(G) // gw
    pcol = np.arange(G) % gw
    center = np.stack([prow * 32 + 16, pcol * 32 + 16], -1).astype(np.float32)
    scale = np.ones(G, np.float32)
    # refined points = the sub-grid positions themselves (in 2px units):
    # cell (r48, c48) at crop coordinate (r48*2+1, c48*2+1) px -> /2
    sub = (np.arange(48) * 2 + 1) / 2.0
    refined = np.zeros((G, 48, 48, 2), np.float32)
    refined[..., 0] = sub[None, :, None]
    refined[..., 1] = sub[None, None, :]
    valid = np.ones((G, 48, 48), bool)

    ml, mr, v = compose_matches(jnp.asarray(center), jnp.asarray(scale),
                                jnp.asarray(refined), jnp.asarray(valid),
                                gh, gw)
    ml, mr = np.asarray(ml), np.asarray(mr)
    # left: patch corner - 32 + sub*2 + 1; right: center - 48 + refined*2
    np.testing.assert_allclose(ml, mr, atol=1e-4)


def test_extract_neighborhoods_alignment(rng):
    img = rng.normal(size=(64, 96, 3)).astype(np.float32)
    out = np.asarray(extract_patch_neighborhoods(jnp.asarray(img), 32))
    assert out.shape == (6, 96, 96, 3)
    # patch (1, 1): window covers original rows 0..95 (rows 64.. are pad),
    # cols 0..95
    np.testing.assert_array_equal(out[4][:64], img[0:64, 0:96])
    assert np.all(out[4][64:] == 0)
    # patch (0, 0): upper-left quadrant zero-padded
    assert np.all(out[0][:32, :, :] == 0)
    assert np.all(out[0][:, :32, :] == 0)
    np.testing.assert_array_equal(out[0][32:, 32:], img[:64, :64])


def test_compose_fine_consistent_with_subpoint_mean():
    """compose_matches_fine's left keypoints are the mean of the 16
    level-3 sub-point left keypoints of the same cell, and its right
    algebra matches compose_matches when the sub-points all sit at the
    cell's fine position (pts_cell in 8-px units == refined in 2-px/4)."""
    from pats_tpu.ops.compose import compose_matches_fine

    rng = np.random.default_rng(3)
    gh, gw = 2, 3
    G = gh * gw
    center = rng.uniform(40, 200, (G, 2)).astype(np.float32)
    scale = rng.uniform(0.5, 2.0, (G,)).astype(np.float32)
    pts_cell = rng.uniform(0, 12, (G, 144, 2)).astype(np.float32)

    ml_f, mr_f, _ = compose_matches_fine(
        jnp.asarray(center), jnp.asarray(scale), jnp.asarray(pts_cell),
        jnp.ones((G, 144), bool), gh, gw)
    ml_f = np.asarray(ml_f).reshape(G, 12, 12, 2)
    mr_f = np.asarray(mr_f).reshape(G, 12, 12, 2)

    # all 16 sub-points of cell (i, j) at the cell position (2-px units)
    refined = np.repeat(np.repeat(
        pts_cell.reshape(G, 12, 12, 1, 1, 2) * 4.0, 4, axis=3), 4, axis=4)
    refined = refined.transpose(0, 1, 3, 2, 4, 5).reshape(G, 48, 48, 2)
    ml3, mr3, _ = compose_matches(
        jnp.asarray(center), jnp.asarray(scale), jnp.asarray(refined),
        jnp.ones((G, 48, 48), bool), gh, gw)
    ml3 = np.asarray(ml3).reshape(G, 12, 4, 12, 4, 2)
    mr3 = np.asarray(mr3).reshape(G, 12, 4, 12, 4, 2)

    np.testing.assert_allclose(ml_f, ml3.mean(axis=(2, 4)), atol=1e-3)
    np.testing.assert_allclose(mr_f, mr3[:, :, 0, :, 0], rtol=1e-5,
                               atol=1e-3)


def test_compose_coarse_identity():
    from pats_tpu.ops.compose import compose_matches_coarse

    gh, gw = 2, 3
    G = gh * gw
    # expected position == own patch center (identity match)
    prow = np.arange(G) // gw + 0.5
    pcol = np.arange(G) % gw + 0.5
    pts = np.stack([prow, pcol], -1).astype(np.float32)
    ml, mr, v = compose_matches_coarse(
        jnp.asarray(pts), jnp.ones(G, bool), gh, gw)
    np.testing.assert_allclose(np.asarray(ml), np.asarray(mr), atol=1e-5)
    assert np.asarray(v).all()
