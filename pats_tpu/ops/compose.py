"""Final correspondence composition across the cascade levels.

Equivalent of the reference ``get_result`` (utils/utils.py:189-213) as
invoked from models/pats.py:72-80 with patch_size [[32, gh, gw], [2, 48, 48]]:
the left keypoint of sub-point (g, s) is the 2-px sub-grid position inside
patch g's 96x96 crop; the right keypoint is the crop origin in the right
image plus the refined within-crop coordinate scaled by the crop's resample
scale.

Derivation (matching the reference algebra exactly):
  left  = patch_row*32 + 16 - 48 + (sub_row*2 + 1)          [rows; cols alike]
  right = (center/32 - 1.5*scale)*32 + refined_2px * 2 * scale
where ``center`` is the crop-box center in pixels (Compute_imgs
average_new), ``scale`` the per-crop resample scale (Compute_imgs
x_scale_new - the reference uses the row-derived scale for BOTH axes,
models/pats.py:74), and ``refined_2px`` the level-3 sub-pixel position in
2-px units within the crop.

TPU design: output is a fixed-capacity (G*2304, 2) array plus a validity
mask; compaction to the dense match list happens on the host after the
device step (one bounded transfer instead of data-dependent shapes).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def compose_matches(center_px: jnp.ndarray, crop_scale: jnp.ndarray,
                    refined_2px: jnp.ndarray, valid: jnp.ndarray,
                    gh: int, gw: int, patch: int = 32
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Compose final (row, col) pixel correspondences.

    Args:
      center_px: (G, 2) right-image crop-box centers in pixels (row, col).
      crop_scale: (G,) per-crop resample scale (box_size / 96).
      refined_2px: (G, 48, 48, 2) refined right positions in 2-px units
        within each crop (row, col), scattered back on the 48x48 sub-grid.
      valid: (G, 48, 48) mask of surviving sub-points.
      gh, gw: coarse grid dims.
      patch: coarse patch size (32).

    Returns:
      (matches_l, matches_r, valid_flat): (G*2304, 2), (G*2304, 2), (G*2304,)
    """
    G = gh * gw
    assert center_px.shape == (G, 2)
    prow = (jnp.arange(G) // gw).astype(jnp.float32)
    pcol = (jnp.arange(G) % gw).astype(jnp.float32)
    sub = jnp.arange(48, dtype=jnp.float32)
    # left: patch corner - 32 (the 3x3 crop origin), + sub-cell center at 2px
    l_row = (prow * patch - patch)[:, None, None] + (sub * 2 + 1)[None, :, None]
    l_col = (pcol * patch - patch)[:, None, None] + (sub * 2 + 1)[None, None, :]
    matches_l = jnp.stack([jnp.broadcast_to(l_row, (G, 48, 48)),
                           jnp.broadcast_to(l_col, (G, 48, 48))], axis=-1)

    origin = center_px - 1.5 * crop_scale[:, None] * patch   # (G, 2)
    matches_r = (origin[:, None, None, :]
                 + refined_2px * 2.0 * crop_scale[:, None, None, None])

    return (matches_l.reshape(-1, 2), matches_r.reshape(-1, 2),
            valid.reshape(-1))


def compose_matches_coarse(pts_patch: jnp.ndarray, alive: jnp.ndarray,
                           gh: int, gw: int, patch: int = 32
                           ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Level-1 (32-px) composition: one match per alive coarse patch.

    The max_level=1 output mode has no reference analog (the reference
    always runs all three levels); left keypoints are patch centers,
    right keypoints the coarse expected positions (patch units -> px).

    Args:
      pts_patch: (G, 2) expected right positions (row, col) in patch units.
      alive: (G,) matched-patch mask.

    Returns: (matches_l, matches_r, valid): (G, 2), (G, 2), (G,)
    """
    G = gh * gw
    prow = ((jnp.arange(G) // gw).astype(jnp.float32) + 0.5) * patch
    pcol = ((jnp.arange(G) % gw).astype(jnp.float32) + 0.5) * patch
    matches_l = jnp.stack([prow, pcol], axis=-1)
    return matches_l, pts_patch * patch, alive


def compose_matches_fine(center_px: jnp.ndarray, crop_scale: jnp.ndarray,
                         pts_cell: jnp.ndarray, cell_valid: jnp.ndarray,
                         gh: int, gw: int, patch: int = 32
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Level-2 (8-px) composition: one match per surviving 12x12 cell.

    Same crop-box algebra as :func:`compose_matches` but at the fine
    level's 8-px cell granularity (the max_level=2 output mode): the left
    keypoint of cell (i, j) is its center inside the patch's 96x96 crop,
    the right keypoint the fine expected position scaled back through the
    crop resample.

    Args:
      center_px: (G, 2) right-image crop-box centers in pixels (row, col).
      crop_scale: (G,) per-crop resample scale (box_size / 96).
      pts_cell: (G, 144, 2) expected right positions (row, col) in 8-px
        cell units within the crop (FineMatcher output ``pts``).
      cell_valid: (G, 144) surviving-cell mask after the merge.

    Returns: (matches_l, matches_r, valid): (G*144, 2), (G*144, 2), (G*144,)
    """
    G = gh * gw
    prow = (jnp.arange(G) // gw).astype(jnp.float32)
    pcol = (jnp.arange(G) % gw).astype(jnp.float32)
    ci = jnp.arange(12, dtype=jnp.float32) * 8.0 + 4.0
    l_row = (prow * patch - patch)[:, None, None] + ci[None, :, None]
    l_col = (pcol * patch - patch)[:, None, None] + ci[None, None, :]
    matches_l = jnp.stack([jnp.broadcast_to(l_row, (G, 12, 12)),
                           jnp.broadcast_to(l_col, (G, 12, 12))], axis=-1)

    origin = center_px - 1.5 * crop_scale[:, None] * patch   # (G, 2)
    matches_r = (origin[:, None, :]
                 + pts_cell * 8.0 * crop_scale[:, None, None])

    return (matches_l.reshape(-1, 2), matches_r.reshape(-1, 2),
            cell_valid.reshape(-1))
