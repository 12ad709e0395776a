"""Fully-sharded single-pair cascade: every level scaled over the mesh.

The complete large-image story (SURVEY.md par.2.7 / par.7.5), composing
the two scale-out primitives end-to-end for ONE pair:

- level 1 runs token-sharded (`sp_coarse_forward`: ring attention,
  distributed Sinkhorn, sharded expansion — O(G/k) quadratic work per
  chip),
- levels 2/3 run patch-sharded (the flat (G,) crop batch carries a
  GSPMD sharding constraint; backbone convs, GNN tokens and transport
  matrices live G/k-per-chip, with XLA inserting the merge/compaction
  collectives).

The reference bounds this axis by capping resolution and serializing
patch work into `split_patches` cycles on one GPU
(utils/utils.py:152-181); here a >1600-px pair's whole pipeline spreads
over the slice.  Throughput-style scaling (many pairs) lives in
parallel/eval.ShardedMatcher — this is the latency complement.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pats_tpu.config import ModelConfig
from pats_tpu.models.cascade import (compact_cells, finish_matches,
                                     prepare_crops)
from pats_tpu.models.fine import FineMatcher
from pats_tpu.models.refine import SubpixelRefiner
from pats_tpu.parallel.sp_coarse import sp_coarse_forward


def match_pair_fully_sharded(variables, left: jnp.ndarray,
                             right: jnp.ndarray, config: ModelConfig,
                             mesh: Mesh, axis: str = "model",
                             outdoor: bool = True, merge_new: bool = True,
                             return_stats: bool = False):
    """Match ONE (H, W, 3) pair with all three levels sharded over
    ``mesh[axis]``.  Requires (H/32)*(W/32) % mesh.shape[axis] == 0 (the
    sp_coarse token-split constraint).

    ``variables`` is the PATSCascade tree (params/batch_stats with
    coarse/fine/refine subtrees).  Returns (matches_l, matches_r, valid)
    with the fixed single-pair cascade shapes; with ``return_stats`` also
    a dict of per-level liveness counts (n_coarse = alive coarse patches,
    n_fine = live fine cells post-merge) so callers can check that the
    merge/compaction collectives carried live data.
    """
    cfg = config
    shard = NamedSharding(mesh, P(axis))

    @jax.jit
    def fwd(variables, left, right):
        def sub(name):
            return {"params": variables["params"][name],
                    "batch_stats": variables["batch_stats"][name]}

        H, W = left.shape[:2]
        gh, gw = H // 32, W // 32
        G = gh * gw
        dtype = jnp.bfloat16 if cfg.use_bfloat16 else None

        c = cfg.coarse
        r1 = sp_coarse_forward(
            sub("coarse"), left, right, mesh,
            num_layers=c.gnn_layers, heads=c.num_heads,
            sinkhorn_iterations=c.sinkhorn_iterations,
            score_temperature=c.score_temperature,
            expand_iters=c.expand_iters,
            expand_lower_bound=c.expand_lower_bound, axis_name=axis)

        left_crops, right_crops, crop_scale, center = prepare_crops(
            left, right, r1["pts"], r1["x_scale"], r1["y_scale"])

        def sh(x):
            return jax.lax.with_sharding_constraint(x, shard)

        f = cfg.fine
        r2, _ = FineMatcher(
            descriptor_dim=f.descriptor_dim, title_dim=f.title_dim,
            gnn_layers=f.gnn_layers, num_heads=f.num_heads,
            sinkhorn_iterations=f.sinkhorn_iterations,
            score_temperature=f.score_temperature,
            expand_iters=f.expand_iters,
            expand_lower_bound=f.expand_lower_bound,
            fused_attention=cfg.use_fused_attention,
            pallas_sinkhorn=cfg.use_pallas_sinkhorn,
            sinkhorn_tol=cfg.sinkhorn_tol, dtype=dtype).apply(
            sub("fine"), sh(left_crops), sh(right_crops), sh(r1["desc0"]),
            sh(r1["alive"]), gh, gw, outdoor, merge_new,
            mutable=["batch_stats"])

        order, point_pid, point_cell, point_tgt, point_valid = \
            compact_cells(r2["cell_alive"], r2["pts"], G)

        rcfg = cfg.refine
        r3, _ = SubpixelRefiner(
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
            dtype=dtype).apply(
            sub("refine"), sh(left_crops), sh(right_crops),
            r2["tokens0"], r2["tokens1"], sh(point_pid), sh(point_cell),
            sh(point_tgt), sh(point_valid),
            # post-level-2 kept mask (reference if_ndelete, pats.py:40-56)
            sh(r1["alive"] & jnp.any(r2["cell_alive"], axis=-1)),
            mutable=["batch_stats"])

        ml, mr, valid = finish_matches(
            r3["mkpts1"], r3["valid16"], point_valid, order, center,
            crop_scale, gh, gw, outdoor)
        stats = {"n_coarse": jnp.sum(r1["alive"].astype(jnp.int32)),
                 "n_fine": jnp.sum(r2["cell_alive"].astype(jnp.int32))}
        return ml, mr, valid, stats

    ml, mr, valid, stats = fwd(variables, left, right)
    if return_stats:
        return ml, mr, valid, stats
    return ml, mr, valid
