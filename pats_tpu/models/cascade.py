"""PATS cascade orchestrator: coarse -> subdivide -> fine -> refine -> compose.

Re-implements reference models/pats.py:10-119 TPU-first.  Design inversions
vs the reference (SURVEY.md par.7):

- The dynamic boolean filtering of patches (pats.py:40-56), the host-side
  ``split_patches`` work cycles (utils/utils.py:152-181) and the serial
  native crop loop all become ONE fixed-capacity masked batch: every coarse
  grid slot flows through levels 2/3 carrying an ``alive`` mask, and the
  level-3 points are compacted to the static capacity 16*G (the merge emits
  at most one claim per global 8-px cell slot, so no work is dropped).
- The f64 ``scores_refine_iter`` carry (pats.py:32) disappears: with a
  single global batch the merge sees every patch's trust scores at once,
  which is exactly the reference semantics when all patches fit one cycle.
- No early exits: a pair with zero coarse matches simply produces an
  all-False validity mask through the same compiled graph.

The output is a fixed-size (G*2304, 2) correspondence array + validity
mask; host code compacts it after the device step.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from pats_tpu.config import ModelConfig
from pats_tpu.models.coarse import CoarseMatcher
from pats_tpu.models.fine import FineMatcher
from pats_tpu.models.refine import SubpixelRefiner
from pats_tpu.ops.compose import (compose_matches, compose_matches_coarse,
                                  compose_matches_fine)
from pats_tpu.ops.extract import extract_patch_neighborhoods
from pats_tpu.ops.resize import crop_resize_batch

_MARGIN = 128  # right-image pad before cropping (utils/utils.py:1343)

# indoor mode keeps only sub-points (1,1),(1,3),(3,1),(3,3) of the 4x4
# (third_layer.py:162-166)
_INDOOR_SUBPOINTS = (5, 7, 13, 15)


def _subdivide(pts, x_scale, y_scale, H, W, patch=32):
    """Crop-box computation of Compute_imgs (utils/utils.py:1350-1382).

    Returns (boxes_int (G,4) in padded coords, crop_scale (G,),
    center_px (G,2) row/col in unpadded pixels).
    """
    m = float(_MARGIN)
    b0 = (pts[:, 0] - y_scale * 1.5) * patch + m
    b1 = (pts[:, 0] + y_scale * 1.5) * patch + m
    b2 = (pts[:, 1] - x_scale * 1.5) * patch + m
    b3 = (pts[:, 1] + x_scale * 1.5) * patch + m
    zero = jnp.float32(0.0)
    b0 = jnp.where(b0 >= 0, b0, zero)
    b1 = jnp.where(b1 >= 0, b1, zero)
    b2 = jnp.where(b2 >= 0, b2, zero)
    b3 = jnp.where(b3 >= 0, b3, zero)
    b1 = jnp.where(b1 < H + 2 * m, b1, jnp.float32(H - 1))
    b3 = jnp.where(b3 < W + 2 * m, b3, jnp.float32(W))
    # crop scale from the FLOAT row bounds (utils/utils.py:1367; the
    # reference uses the row-derived scale for both axes downstream)
    crop_scale = (b1 - b0 + 1.0) / 96.0
    boxes = jnp.stack([b0, b1, b2, b3], axis=-1).astype(jnp.int32)
    bf = boxes.astype(jnp.float32)
    center = jnp.stack([(bf[:, 0] + bf[:, 1]) / 2.0 - m + 0.5,
                        (bf[:, 2] + bf[:, 3]) / 2.0 - m + 0.5], axis=-1)
    return boxes, crop_scale, center


def prepare_crops(left, right, pts, x_scale, y_scale):
    """Subdivision for one pair: level-1 outputs -> level-2/3 crop inputs.

    Returns (left_crops (G,96,96,3), right_crops (G,96,96,3),
    crop_scale (G,), center (G,2))."""
    H, W = left.shape[:2]
    boxes, crop_scale, center = _subdivide(pts, x_scale, y_scale, H, W)
    right_pad = jnp.pad(right, ((_MARGIN, _MARGIN), (_MARGIN, _MARGIN),
                                (0, 0)))
    right_crops = crop_resize_batch(right_pad, boxes, out_size=96)
    left_crops = extract_patch_neighborhoods(left, patch=32)
    return left_crops, right_crops, crop_scale, center


def compact_cells(cell_alive, pts, G):
    """Alive-first compaction of the (G, 144) fine cells to the static
    level-3 capacity 16*G.  Returns (order, point_pid, point_cell,
    point_tgt, point_valid)."""
    K3 = 16 * G
    flat_alive = cell_alive.reshape(G * 144)
    order = jnp.argsort(jnp.logical_not(flat_alive).astype(jnp.int32),
                        stable=True)[:K3]
    point_pid = (order // 144).astype(jnp.int32)
    point_cell = (order % 144).astype(jnp.int32)
    point_tgt = pts.reshape(G * 144, 2)[order]
    point_valid = flat_alive[order]
    return order, point_pid, point_cell, point_tgt, point_valid


def finish_matches(mkpts1, valid16_raw, point_valid, order, center,
                   crop_scale, gh, gw, outdoor: bool):
    """Level-3 outputs -> final (matches_l, matches_r, valid) for one pair
    (scatter back to the (G, 144, 16) grid, 48x48 reorder, composition)."""
    G = gh * gw
    if outdoor:
        valid16 = valid16_raw & point_valid[:, None]
    else:
        keep = jnp.zeros((16,), bool).at[jnp.asarray(_INDOOR_SUBPOINTS)
                                         ].set(True)
        valid16 = keep[None, :] & point_valid[:, None]

    # refined right positions (x, y crop px) -> (row, col) in 2-px units
    refined = jnp.stack([mkpts1[..., 1], mkpts1[..., 0]],
                        axis=-1) / 2.0                         # (K3, 16, 2)

    full_pts = jnp.zeros((G * 144, 16, 2), refined.dtype)
    full_pts = full_pts.at[order].set(refined)
    full_valid = jnp.zeros((G * 144, 16), bool)
    full_valid = full_valid.at[order].set(valid16)

    # (G, 144, 16, ...) -> (G, 48, 48, ...): cell (i12, j12), sub-point
    # (i4, j4) -> row i12*4+i4, col j12*4+j4 (models/pats.py:70-71)
    full_pts = full_pts.reshape(G, 12, 12, 4, 4, 2).transpose(
        0, 1, 3, 2, 4, 5).reshape(G, 48, 48, 2)
    full_valid = full_valid.reshape(G, 12, 12, 4, 4).transpose(
        0, 1, 3, 2, 4).reshape(G, 48, 48)

    return compose_matches(center, crop_scale, full_pts, full_valid,
                           gh, gw, patch=32)


class PATSCascade(nn.Module):
    """Full three-level matcher for one image pair."""

    config: ModelConfig
    outdoor: bool = True
    merge_new: bool = True

    @nn.compact
    def __call__(self, left: jnp.ndarray, right: jnp.ndarray):
        """Args: left/right (H, W, 3) raw-valued float images (0..255),
        H and W multiples of 32.

        Returns dict with fixed-shape arrays:
          matches_l / matches_r: (G*2304, 2) (row, col) pixel coordinates
          valid: (G*2304,) survival mask
        """
        cfg = self.config
        H, W = left.shape[:2]
        gh, gw = H // 32, W // 32
        G = gh * gw
        dtype = jnp.bfloat16 if cfg.use_bfloat16 else None

        c = cfg.coarse
        r1 = CoarseMatcher(
            descriptor_dim=c.descriptor_dim, gnn_layers=c.gnn_layers,
            num_heads=c.num_heads, sinkhorn_iterations=c.sinkhorn_iterations,
            score_temperature=c.score_temperature,
            expand_iters=c.expand_iters,
            expand_lower_bound=c.expand_lower_bound,
            fused_attention=cfg.use_fused_attention,
            pallas_sinkhorn=cfg.use_pallas_sinkhorn,
            sinkhorn_tol=cfg.sinkhorn_tol,
            dtype=dtype, name="coarse")(left, right)

        assert cfg.max_level in (1, 2, 3), cfg.max_level
        if cfg.max_level == 1:
            matches_l, matches_r, valid = compose_matches_coarse(
                r1["pts"], r1["alive"], gh, gw)
            return {
                "matches_l": matches_l, "matches_r": matches_r,
                "valid": valid,
                "num_coarse": jnp.sum(r1["alive"].astype(jnp.int32)),
                "num_fine": jnp.int32(0),
                "num_final": jnp.sum(valid.astype(jnp.int32)),
            }

        left_crops, right_crops, crop_scale, center = prepare_crops(
            left, right, r1["pts"], r1["x_scale"], r1["y_scale"])

        f = cfg.fine
        r2 = FineMatcher(
            descriptor_dim=f.descriptor_dim, title_dim=f.title_dim,
            gnn_layers=f.gnn_layers, num_heads=f.num_heads,
            sinkhorn_iterations=f.sinkhorn_iterations,
            score_temperature=f.score_temperature,
            expand_iters=f.expand_iters,
            expand_lower_bound=f.expand_lower_bound,
            fused_attention=cfg.use_fused_attention,
            pallas_sinkhorn=cfg.use_pallas_sinkhorn,
            sinkhorn_tol=cfg.sinkhorn_tol,
            dtype=dtype, name="fine")(
            left_crops, right_crops, r1["desc0"], r1["alive"],
            gh, gw, self.outdoor, self.merge_new)

        if cfg.max_level == 2:
            matches_l, matches_r, valid = compose_matches_fine(
                center, crop_scale, r2["pts"], r2["cell_alive"], gh, gw)
            return {
                "matches_l": matches_l, "matches_r": matches_r,
                "valid": valid,
                "num_coarse": jnp.sum(r1["alive"].astype(jnp.int32)),
                "num_fine": jnp.sum(r2["cell_alive"].astype(jnp.int32)),
                "num_final": jnp.sum(valid.astype(jnp.int32)),
            }

        # ---- compact alive cells to the static level-3 capacity 16*G ----
        order, point_pid, point_cell, point_tgt, point_valid = compact_cells(
            r2["cell_alive"], r2["pts"], G)

        rcfg = cfg.refine
        refiner = SubpixelRefiner(
            descriptor_dim=rcfg.descriptor_dim, gnn_layers=rcfg.gnn_layers,
            num_heads=rcfg.num_heads,
            sinkhorn_iterations=rcfg.sinkhorn_iterations,
            score_temperature=rcfg.score_temperature,
            window=rcfg.window, padded_map=rcfg.padded_map,
            neighborhood=rcfg.neighborhood,
            fused_attention=cfg.use_fused_attention,
            pallas_sinkhorn=cfg.use_pallas_sinkhorn,
            sinkhorn_tol=cfg.sinkhorn_tol,
            use_running_average=not cfg.refine_batch_stats,
            dtype=dtype, name="refine")
        # level-3 batch statistics run over patches SURVIVING level 2
        # (the reference filters with if_ndelete before third_layer,
        # pats.py:40-56) — coarse-alive would add dead patches to the
        # BN batch and drift every feature (round-3 indoor parity bug)
        kept = r1["alive"] & jnp.any(r2["cell_alive"], axis=-1)

        def run_refine(mdl, pid, cellv, tgtv, validv):
            r = mdl(left_crops, right_crops, r2["tokens0"], r2["tokens1"],
                    pid, cellv, tgtv, validv, kept)
            return r["mkpts1"], r["valid16"]

        K3 = 16 * G
        if cfg.refine_bucket:
            # see PATSCascadeBatched: device-side half-capacity branch
            Kb = max(1, int(math.ceil(cfg.refine_bucket * K3)))
            count = jnp.sum(r2["cell_alive"].astype(jnp.int32))

            def small(mdl):
                mk, v16 = run_refine(mdl, point_pid[:Kb], point_cell[:Kb],
                                     point_tgt[:Kb], point_valid[:Kb])
                return (jnp.pad(mk, ((0, K3 - Kb), (0, 0), (0, 0))),
                        jnp.pad(v16, ((0, K3 - Kb), (0, 0))))

            def big(mdl):
                return run_refine(mdl, point_pid, point_cell, point_tgt,
                                  point_valid)

            mkpts1, valid16_raw = nn.cond(count <= Kb, small, big, refiner)
        else:
            mkpts1, valid16_raw = run_refine(refiner, point_pid,
                                             point_cell, point_tgt,
                                             point_valid)

        matches_l, matches_r, valid = finish_matches(
            mkpts1, valid16_raw, point_valid, order, center,
            crop_scale, gh, gw, self.outdoor)

        return {
            "matches_l": matches_l,
            "matches_r": matches_r,
            "valid": valid,
            # per-level occupancy counters (observability; cheap scalars)
            "num_coarse": jnp.sum(r1["alive"].astype(jnp.int32)),
            "num_fine": jnp.sum(r2["cell_alive"].astype(jnp.int32)),
            "num_final": jnp.sum(valid.astype(jnp.int32)),
        }


class PATSCascadeBatched(nn.Module):
    """Natively pair-batched cascade: levels 2/3 run FLAT over B*G crops.

    ``jax.vmap(PATSCascade)`` is semantically identical but slower: the
    vmap batch axis turns every level-2/3 activation into a rank-5
    (B, G, h, w, C) tensor whose conv-adjacent reshapes force multi-GB
    layout copies on TPU (~15-20% of the step at 640x480 batch 4).  Here
    level 1 stays vmapped (its convs batch natively at rank 4), the crop
    levels run as ONE flat (B*G, ...) batch, and the only per-pair
    semantics — the cross-patch merge, the level-3 compaction, the
    composition, and the batch-statistics BatchNorms of the refine level
    (grouped MaskedBatchNorm) — are keyed by a pair-id vector.

    The parameter tree is IDENTICAL to PATSCascade (same submodule names,
    broadcast vmap axes), so converted reference checkpoints and trained
    variables load into either.

    ``patch_sharding`` (a ``jax.sharding.NamedSharding`` over the flat
    crop axis) turns the flat level-2/3 batch into a PATCH-SHARDED batch:
    the B*G crops are spread over the mesh and XLA/GSPMD inserts the
    collectives the cross-patch steps need (the per-pair merge, the
    level-3 compaction and the grouped batch statistics).  This is the
    device-parallel replacement for the reference's sequential
    ``split_patches`` work cycles (utils/utils.py:152-181, SURVEY par.2.7):
    one large pair's patch work scales out over chips instead of looping.
    """

    config: ModelConfig
    outdoor: bool = True
    merge_new: bool = True
    patch_sharding: Optional[jax.sharding.NamedSharding] = None

    def _shard(self, x):
        if self.patch_sharding is None:
            return x
        return jax.lax.with_sharding_constraint(x, self.patch_sharding)

    @nn.compact
    def __call__(self, left: jnp.ndarray, right: jnp.ndarray):
        """Args: left/right (B, H, W, 3) raw-valued float images.

        Returns the PATSCascade dict with a leading batch axis:
        matches_l/matches_r (B, G*2304, 2), valid (B, G*2304), and
        per-pair (B,) occupancy counters.
        """
        cfg = self.config
        B, H, W = left.shape[:3]
        gh, gw = H // 32, W // 32
        G = gh * gw
        BG = B * G
        dtype = jnp.bfloat16 if cfg.use_bfloat16 else None

        c = cfg.coarse
        CoarseV = nn.vmap(
            CoarseMatcher, in_axes=(0, 0), out_axes=0,
            variable_axes={"params": None, "batch_stats": None},
            split_rngs={"params": False, "dropout": False})
        r1 = CoarseV(
            descriptor_dim=c.descriptor_dim, gnn_layers=c.gnn_layers,
            num_heads=c.num_heads, sinkhorn_iterations=c.sinkhorn_iterations,
            score_temperature=c.score_temperature,
            expand_iters=c.expand_iters,
            expand_lower_bound=c.expand_lower_bound,
            fused_attention=cfg.use_fused_attention,
            pallas_sinkhorn=cfg.use_pallas_sinkhorn,
            sinkhorn_tol=cfg.sinkhorn_tol,
            dtype=dtype, name="coarse")(left, right)

        assert cfg.max_level in (1, 2, 3), cfg.max_level
        if cfg.max_level == 1:
            matches_l, matches_r, valid = jax.vmap(
                lambda p, a: compose_matches_coarse(p, a, gh, gw))(
                r1["pts"], r1["alive"])
            return {
                "matches_l": matches_l, "matches_r": matches_r,
                "valid": valid,
                "num_coarse": jnp.sum(r1["alive"].astype(jnp.int32),
                                      axis=1),
                "num_fine": jnp.zeros((B,), jnp.int32),
                "num_final": jnp.sum(valid.astype(jnp.int32), axis=1),
            }

        boxes, crop_scale, center = jax.vmap(
            lambda p, xs, ys: _subdivide(p, xs, ys, H, W))(
            r1["pts"], r1["x_scale"], r1["y_scale"])
        right_pad = jnp.pad(right, ((0, 0), (_MARGIN, _MARGIN),
                                    (_MARGIN, _MARGIN), (0, 0)))
        right_crops = jax.vmap(
            lambda img, bx: crop_resize_batch(img, bx, out_size=96))(
            right_pad, boxes)
        left_crops = jax.vmap(
            lambda im: extract_patch_neighborhoods(im, patch=32))(left)

        def flat(a):
            return self._shard(a.reshape((BG,) + a.shape[2:]))

        patch_pair = self._shard(
            jnp.repeat(jnp.arange(B, dtype=jnp.int32), G))

        f = cfg.fine
        r2 = FineMatcher(
            descriptor_dim=f.descriptor_dim, title_dim=f.title_dim,
            gnn_layers=f.gnn_layers, num_heads=f.num_heads,
            sinkhorn_iterations=f.sinkhorn_iterations,
            score_temperature=f.score_temperature,
            expand_iters=f.expand_iters,
            expand_lower_bound=f.expand_lower_bound,
            fused_attention=cfg.use_fused_attention,
            pallas_sinkhorn=cfg.use_pallas_sinkhorn,
            sinkhorn_tol=cfg.sinkhorn_tol,
            dtype=dtype, name="fine")(
            flat(left_crops), flat(right_crops), flat(r1["desc0"]),
            flat(r1["alive"]), gh, gw, self.outdoor, self.merge_new,
            patch_pair=patch_pair, num_pairs=B)

        if cfg.max_level == 2:
            matches_l, matches_r, valid = jax.vmap(
                lambda ce, cs, p, a: compose_matches_fine(ce, cs, p, a,
                                                          gh, gw))(
                center, crop_scale, r2["pts"].reshape(B, G, 144, 2),
                r2["cell_alive"].reshape(B, G, 144))
            return {
                "matches_l": matches_l, "matches_r": matches_r,
                "valid": valid,
                "num_coarse": jnp.sum(
                    r1["alive"].astype(jnp.int32), axis=1),
                "num_fine": jnp.sum(
                    r2["cell_alive"].reshape(B, -1).astype(jnp.int32),
                    axis=1),
                "num_final": jnp.sum(valid.astype(jnp.int32), axis=1),
            }

        # ---- per-pair compaction to the static level-3 capacity 16*G ----
        K3 = 16 * G
        cell_alive = r2["cell_alive"].reshape(B, G * 144)
        order = jax.vmap(lambda fa: jnp.argsort(
            jnp.logical_not(fa).astype(jnp.int32), stable=True)[:K3])(
            cell_alive)                                        # (B, K3)
        pid_local = (order // 144).astype(jnp.int32)
        point_pid = self._shard(
            (pid_local + (jnp.arange(B, dtype=jnp.int32) * G)[:, None]
             ).reshape(B * K3))                                # global
        point_cell = self._shard(
            (order % 144).astype(jnp.int32).reshape(B * K3))
        point_tgt = self._shard(jnp.take_along_axis(
            r2["pts"].reshape(B, G * 144, 2), order[..., None],
            axis=1).reshape(B * K3, 2))
        point_valid = self._shard(jnp.take_along_axis(
            cell_alive, order, axis=1).reshape(B * K3))
        point_pair = self._shard(
            jnp.repeat(jnp.arange(B, dtype=jnp.int32), K3))

        rcfg = cfg.refine
        refiner = SubpixelRefiner(
            descriptor_dim=rcfg.descriptor_dim, gnn_layers=rcfg.gnn_layers,
            num_heads=rcfg.num_heads,
            sinkhorn_iterations=rcfg.sinkhorn_iterations,
            score_temperature=rcfg.score_temperature,
            window=rcfg.window, padded_map=rcfg.padded_map,
            neighborhood=rcfg.neighborhood,
            fused_attention=cfg.use_fused_attention,
            pallas_sinkhorn=cfg.use_pallas_sinkhorn,
            sinkhorn_tol=cfg.sinkhorn_tol,
            use_running_average=not cfg.refine_batch_stats,
            dtype=dtype, name="refine")
        lc, rc = flat(left_crops), flat(right_crops)
        # post-level-2 kept mask (reference if_ndelete, pats.py:40-56)
        kept = flat(r1["alive"]) & jnp.any(cell_alive.reshape(B * G, 144),
                                           axis=-1)

        def run_refine(mdl, pid, cellv, tgtv, validv, ppair, npairs):
            r = mdl(lc, rc, r2["tokens0"], r2["tokens1"], pid, cellv,
                    tgtv, validv, kept, patch_pair=patch_pair,
                    point_pair=ppair, num_pairs=npairs)
            return r["mkpts1"], r["valid16"]

        if cfg.refine_bucket:
            # capacity-bucketed refine: a half-capacity branch taken on
            # device (lax.cond — one executable, no host sync) whenever
            # every pair's surviving cell count fits; points are
            # alive-first per pair, so the slice keeps every live point
            Kb = max(1, int(math.ceil(cfg.refine_bucket * K3)))
            counts = jnp.sum(cell_alive.astype(jnp.int32), axis=1)

            def cut(x):
                return x.reshape((B, K3) + x.shape[1:])[:, :Kb].reshape(
                    (B * Kb,) + x.shape[1:])

            def small(mdl):
                mk, v16 = run_refine(mdl, cut(point_pid), cut(point_cell),
                                     cut(point_tgt), cut(point_valid),
                                     cut(point_pair), B)
                mk = jnp.pad(mk.reshape((B, Kb) + mk.shape[1:]),
                             ((0, 0), (0, K3 - Kb), (0, 0), (0, 0)))
                v16 = jnp.pad(v16.reshape((B, Kb) + v16.shape[1:]),
                              ((0, 0), (0, K3 - Kb), (0, 0)))
                return (mk.reshape((B * K3,) + mk.shape[2:]),
                        v16.reshape((B * K3,) + v16.shape[2:]))

            def big(mdl):
                return run_refine(mdl, point_pid, point_cell, point_tgt,
                                  point_valid, point_pair, B)

            mkpts1, valid16_raw = nn.cond(jnp.max(counts) <= Kb,
                                          small, big, refiner)
        else:
            mkpts1, valid16_raw = run_refine(refiner, point_pid,
                                             point_cell, point_tgt,
                                             point_valid, point_pair, B)
        r3 = {"mkpts1": mkpts1, "valid16": valid16_raw}

        if self.outdoor:
            valid16 = r3["valid16"] & point_valid[:, None]
        else:
            keep = jnp.zeros((16,), bool).at[jnp.asarray(_INDOOR_SUBPOINTS)
                                             ].set(True)
            valid16 = keep[None, :] & point_valid[:, None]

        refined = jnp.stack([r3["mkpts1"][..., 1], r3["mkpts1"][..., 0]],
                            axis=-1) / 2.0                     # (B*K3, 16, 2)

        def scatter_back(o, r, v):
            fp = jnp.zeros((G * 144, 16, 2), r.dtype).at[o].set(r)
            fv = jnp.zeros((G * 144, 16), bool).at[o].set(v)
            return fp, fv

        full_pts, full_valid = jax.vmap(scatter_back)(
            order, refined.reshape(B, K3, 16, 2),
            valid16.reshape(B, K3, 16))

        full_pts = full_pts.reshape(B, G, 12, 12, 4, 4, 2).transpose(
            0, 1, 2, 4, 3, 5, 6).reshape(B, G, 48, 48, 2)
        full_valid = full_valid.reshape(B, G, 12, 12, 4, 4).transpose(
            0, 1, 2, 4, 3, 5).reshape(B, G, 48, 48)

        matches_l, matches_r, valid = jax.vmap(
            lambda ce, cs, fp, fv: compose_matches(ce, cs, fp, fv, gh, gw,
                                                   patch=32))(
            center, crop_scale, full_pts, full_valid)

        return {
            "matches_l": matches_l,
            "matches_r": matches_r,
            "valid": valid,
            "num_coarse": jnp.sum(
                r1["alive"].reshape(B, G).astype(jnp.int32), axis=1),
            "num_fine": jnp.sum(
                r2["cell_alive"].reshape(B, G, 144).astype(jnp.int32),
                axis=(1, 2)),
            "num_final": jnp.sum(valid.astype(jnp.int32), axis=1),
        }
