"""Patch neighborhood extraction.

Equivalent of the reference ``origin_extract`` (utils/utils.py:1300-1318):
for every 32-px coarse patch of the source image, extract the 96x96 window
covering the patch and its 3x3 neighborhood (window origin = patch corner
minus one patch).  The reference pads by ``margin`` then re-slices to an
effective 32-px pad; here we pad by exactly one patch directly.

On TPU this is a static strided-window gather over the whole grid - every
slot is extracted (fixed capacity); dead slots are masked downstream.
"""

from __future__ import annotations

import jax.numpy as jnp


def extract_patch_neighborhoods(image: jnp.ndarray, patch: int = 32) -> jnp.ndarray:
    """Extract all (3*patch)x(3*patch) neighborhoods at stride ``patch``.

    Args:
      image: (H, W, C) source image; H, W multiples of ``patch``.
      patch: patch side length (32 in the reference).

    Returns:
      (G, 3*patch, 3*patch, C) windows, G = (H//patch) * (W//patch), in
      row-major grid order; window g covers original-image rows
      [row(g)*patch - patch, row(g)*patch + 2*patch) (zero-padded at edges).
    """
    H, W, C = image.shape
    gh, gw = H // patch, W // patch
    win = 3 * patch
    padded = jnp.pad(image, ((patch, patch), (patch, patch), (0, 0)))
    Hp, Wp = padded.shape[:2]

    # flat gather indices: window origin (r*patch, c*patch) in padded coords
    orow = jnp.arange(gh) * patch                       # (gh,)
    ocol = jnp.arange(gw) * patch                       # (gw,)
    wrow = jnp.arange(win)                              # (win,)
    wcol = jnp.arange(win)
    rows = (orow[:, None] + wrow[None, :])              # (gh, win)
    cols = (ocol[:, None] + wcol[None, :])              # (gw, win)
    flat_idx = (rows[:, None, :, None] * Wp + cols[None, :, None, :])
    out = jnp.take(padded.reshape(Hp * Wp, C), flat_idx.reshape(-1), axis=0)
    return out.reshape(gh * gw, win, win, C)
