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
    padded = jnp.pad(image, ((patch, patch), (patch, patch), (0, 0)))

    # gather-free: the 3x3-patch windows are assembled from 9 shifted
    # whole-grid views (slice + reshape + transpose; TPU gathers are slow)
    tiles = []
    for di in range(3):
        row_tiles = []
        for dj in range(3):
            view = padded[di * patch:di * patch + gh * patch,
                          dj * patch:dj * patch + gw * patch]
            row_tiles.append(view.reshape(gh, patch, gw, patch, C))
        tiles.append(jnp.stack(row_tiles, axis=0))      # (3, gh, p, gw, p, C)
    t = jnp.stack(tiles, axis=0)                        # (3, 3, gh, p, gw, p, C)
    # -> (gh, gw, 3, p, 3, p, C) -> (G, 3p, 3p, C)
    t = t.transpose(2, 4, 0, 3, 1, 5, 6)
    return t.reshape(gh * gw, 3 * patch, 3 * patch, C)
