"""Cross-patch cell deduplication ("merge") for the fine matcher level.

Each matched 32-px coarse patch is subdivided into a 12x12 grid of 8-px
cells covering the patch AND its 3x3 neighborhood, so every global 8-px cell
can be claimed by up to 9 overlapping patches.  The merge selects one winner
per conflict and kills the other claims.

Two variants, faithful to the reference (second_layer.py:137-238):

- ``merge_cells(..., new=True)``  <- merge_patches_new: for every cell slot,
  the argmin is taken over the 9 claims *made by the patch containing that
  slot* (claimant-centric), the winner's claim is scattered to the claimed
  cell.  Used outdoor (MegaDepth / YFCC).
- ``merge_cells(..., new=False)`` <- merge_patches_old: the claims are first
  realigned so the argmin ranges over the 9 claims *on* each cell
  (claimed-centric).  Kept because "fixing" it hurts indoor pose
  (reference comment at second_layer.py:136).  Used indoor (ScanNet).

Both start from the same gating: border cells of the 12x12 grid die, ring
multipliers (x2 per ring outside the center 5x5/7x7/9x9) inflate the trust
cost, trust > 2 dies, and alive claims get a -10000 bonus so they always
outrank dead ones in the argmin.

Design notes (TPU): the reference runs this per work-chunk with an f64
``scores_back`` carry across chunks (models/pats.py:32-39).  Here the whole
grid is processed as ONE fixed-capacity batch, so the carry disappears and
f32 suffices (values are trust costs in [0, ~32] plus +-1e4/1e5 offsets).
All steps are static reshapes/transposes, one argmin, one gather and one
scatter - no data-dependent shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

_KILL_BONUS = 10000.0
_OOB_PENALTY = 100000.0


def _gate_cells(trust: jnp.ndarray, cell_alive: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Border + ring-multiplier + threshold gating (second_layer.py:190-201).

    trust: (G, 144) expansion whole_cost per crop cell.
    cell_alive: (G, 144) cells matched by the level-2 expansion.
    Returns (gated_alive, gated_trust).
    """
    pos = jnp.arange(12)
    px = jnp.broadcast_to(pos[None, :], (12, 12))   # column index
    py = jnp.broadcast_to(pos[:, None], (12, 12))   # row index
    border = ((px < 1) | (px > 10) | (py < 1) | (py > 10)).reshape(144)
    mult = jnp.ones((12, 12), trust.dtype)
    for i in range(3):
        ring = ((px < 3 - i) | (px > 7 + i) | (py < 3 - i) | (py > 7 + i))
        mult = jnp.where(ring, mult * 2.0, mult)
    trust = trust * mult.reshape(1, 144)
    alive = cell_alive & (trust <= 2.0) & jnp.logical_not(border)[None, :]
    return alive, trust


def _claimant_layout(x: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """(G, 144) per-patch crop-cell array -> (gh*4, gw*4, 9) claimant layout.

    Slot [(pr*4+i4, pc*4+j4), k=(da*3+db)] holds patch (pr, pc)'s value for
    its crop cell (da*4+i4, db*4+j4), which covers GLOBAL 8-px cell
    ((pr+da-1)*4+i4, (pc+db-1)*4+j4).  Mirrors the reshape/permute at
    second_layer.py:209/212.
    """
    x = x.reshape(gh, gw, 3, 4, 3, 4)               # (pr, pc, da, i4, db, j4)
    x = x.transpose(0, 3, 1, 5, 2, 4)               # (pr, i4, pc, j4, da, db)
    return x.reshape(gh * 4, gw * 4, 9)


def _from_claimant_layout(x: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """Inverse read-back: (gh*4, gw*4, 9) -> (G, 144) per-patch crop cells.

    Mirrors the final reshape at second_layer.py:185-186/237-238.
    """
    x = x.reshape(gh, 4, gw, 4, 3, 3)               # (pr, i4, pc, j4, da, db)
    x = x.transpose(0, 2, 4, 1, 5, 3)               # (pr, pc, da, i4, db, j4)
    return x.reshape(gh * gw, 144)


def _shift_channels(x: jnp.ndarray, reverse: bool) -> jnp.ndarray:
    """Per-channel spatial realignment between claimant- and claimed-centric
    layouts (the 9-step shift loops at second_layer.py:163-166/225-229).

    With channel k = 3*a + b:
    - ``reverse=False`` ("old" merge, second_layer.py:165-166):
      dst[r, c, k] = src[r - 4*(a-1), c - 4*(b-1), k]
      (aligns each claim onto the cell it claims).
    - ``reverse=True`` ("new" merge, second_layer.py:225-229):
      dst[r, c, k] = src[r + 4*(a-1), c + 4*(b-1), 8-k]
      (aligns the reciprocal claim of the offset-k neighbor onto (r, c)).

    Out-of-range regions keep their original values, exactly as the
    reference's in-place slice assignment leaves the cloned tensor.
    """
    H4, W4, _ = x.shape
    out = []
    for k in range(9):
        a, b = k // 3, k % 3
        src_ch = (8 - k) if reverse else k
        src = x[:, :, src_ch]
        sign = -1 if reverse else 1
        # dst[r, c] = src[r - dr, c - dc]
        dr, dc = sign * 4 * (a - 1), sign * 4 * (b - 1)
        pad_r = (max(dr, 0), max(-dr, 0))
        pad_c = (max(dc, 0), max(-dc, 0))
        shifted = jnp.pad(src, (pad_r, pad_c))[
            pad_r[1]:pad_r[1] + H4, pad_c[1]:pad_c[1] + W4]
        # out-of-range destination rows/cols keep original channel-k values
        r = jnp.arange(H4)[:, None]
        c = jnp.arange(W4)[None, :]
        in_range = ((r - dr >= 0) & (r - dr < H4)
                    & (c - dc >= 0) & (c - dc < W4))
        out.append(jnp.where(in_range, shifted, x[:, :, k]))
    return jnp.stack(out, axis=-1)


def merge_cells(trust: jnp.ndarray, patch_alive: jnp.ndarray,
                cell_alive: jnp.ndarray, gh: int, gw: int,
                new: bool = True) -> jnp.ndarray:
    """Deduplicate overlapping fine cells across the 3x3 patch neighborhood.

    Args:
      trust: (G, 144) level-2 expansion whole_cost per crop cell (G = gh*gw,
        one slot per coarse patch; dead patch slots may hold garbage).
      patch_alive: (G,) coarse-level alive mask.
      cell_alive: (G, 144) level-2 expansion matched mask.
      gh, gw: coarse grid dims (H//32, W//32).
      new: select merge_patches_new (outdoor) vs _old (indoor).

    Returns:
      (G, 144) bool mask of surviving claims (False for dead patches).
    """
    G = gh * gw
    assert trust.shape == (G, 144)
    alive, trust = _gate_cells(trust, cell_alive)
    alive = alive & patch_alive[:, None]
    # dead-patch slots contribute neutral scores, like the reference's
    # zero-initialized scores_back for unscattered patches
    trust = jnp.where(patch_alive[:, None], trust, 0.0)
    if new:
        trust = jnp.where(alive, trust - _KILL_BONUS, trust)

    claims = _claimant_layout(trust, gh, gw)          # (H4, W4, 9)
    matching = _claimant_layout(alive, gh, gw)
    H4, W4 = gh * 4, gw * 4
    r = jnp.arange(H4)[:, None, None]
    c = jnp.arange(W4)[None, :, None]
    k = jnp.arange(9)[None, None, :]
    ka, kb = k // 3, k % 3
    # global cell claimed by slot (r, c, k)
    tr = r + 4 * (ka - 1)
    tc = c + 4 * (kb - 1)
    oob = (tr < 0) | (tr >= H4) | (tc < 0) | (tc >= W4)

    if new:
        # "new": argmin over the 9 claims MADE BY the patch containing the
        # slot; OOB claims are pushed out of contention with +1e5
        # (second_layer.py:214-236)
        claims = jnp.where(oob, claims + _OOB_PENALTY, claims)
        matching2 = _shift_channels(matching, reverse=True)
        winner = jnp.argmin(claims, axis=-1)                       # (H4, W4)
        win_alive = jnp.take_along_axis(
            matching2, winner[:, :, None], axis=-1)[:, :, 0]
        # scatter the winning claim to the CLAIMED cell, reciprocal channel
        wa, wb = winner // 3, winner % 3
        dst_r = r[:, :, 0] + 4 * (wa - 1)
        dst_c = c[:, :, 0] + 4 * (wb - 1)
        dst_k = 8 - winner
    else:
        # "old": realign claims/matches to claimed-centric first, kill-bonus
        # applied after alignment (second_layer.py:143-168), then argmin per
        # claimed cell; scatter back to the CLAIMANT slot, same channel
        claims = _shift_channels(claims, reverse=False)
        matching_s = _shift_channels(matching, reverse=False)
        claims = jnp.where(matching_s, claims - _KILL_BONUS, claims)
        winner = jnp.argmin(claims, axis=-1)
        win_alive = jnp.take_along_axis(
            matching_s, winner[:, :, None], axis=-1)[:, :, 0]
        wa, wb = winner // 3, winner % 3
        dst_r = r[:, :, 0] - 4 * (wa - 1)
        dst_c = c[:, :, 0] - 4 * (wb - 1)
        dst_k = winner
        critical = (dst_r < 0) | (dst_r >= H4) | (dst_c < 0) | (dst_c >= W4)
        win_alive = win_alive & jnp.logical_not(critical)

    flat_dst = (dst_r * W4 + dst_c) * 9 + dst_k
    # redirect out-of-range destinations to a dummy slot instead of the
    # reference's clamp-and-collide (utils equivalent of scatter safety)
    valid_dst = (dst_r >= 0) & (dst_r < H4) & (dst_c >= 0) & (dst_c < W4)
    flat_dst = jnp.where(valid_dst, flat_dst, H4 * W4 * 9)
    survived = jnp.zeros((H4 * W4 * 9 + 1,), bool)
    survived = survived.at[flat_dst.reshape(-1)].set(win_alive.reshape(-1))
    survived = survived[:-1].reshape(H4, W4, 9)

    out = _from_claimant_layout(survived, gh, gw)
    return out & patch_alive[:, None]
