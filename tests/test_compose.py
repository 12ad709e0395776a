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
