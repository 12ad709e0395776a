"""Sequence-parallel execution of the coarse GNN with converted weights.

Runs the level-1 AttentionalGNN's exact math with the token axis sharded
over a mesh axis: projections are local matmuls, attention uses
ring_attention (K/V rotating over ICI), and the eval-mode BatchNorms are
per-channel affine maps (running statistics), so the whole 18-layer stack
executes with O(N/k) tokens per device.  This is the scale-out path for
very large images whose level-1 token count exceeds one device
(SURVEY.md par.7.5); results are bit-close to the single-device module.

Usage (params = the flax CoarseMatcher 'gnn' subtree + batch_stats):

    fn = shard_map(partial(sp_gnn_forward, params, num_layers=18, heads=4),
                   mesh=mesh, in_specs=(P("seq"), P("seq")),
                   out_specs=(P("seq"), P("seq")))
    out0, out1 = fn(tokens0, tokens1)      # tokens (N, D) sharded on N
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from pats_tpu.parallel.seqpar import ring_attention, sharded_log_sinkhorn


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _bn_eval(params, stats, x):
    scale = params["scale"] / jnp.sqrt(stats["var"] + 1e-5)
    return x * scale + (params["bias"] - stats["mean"] * scale)


def _mlp(p, s, x):
    x = _dense(p["dense_0"], x)
    x = _bn_eval(p["bn_0"], s["bn_0"], x)
    x = jnp.maximum(x, 0.0)
    return _dense(p["dense_1"], x)


def _attention(p, x, src, heads: int, axis_name: str):
    d = x.shape[-1]
    dh = d // heads
    q = _dense(p["proj_q"], x)
    k = _dense(p["proj_k"], src)
    v = _dense(p["proj_v"], src)
    outs = []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        outs.append(ring_attention(q[:, sl], k[:, sl], v[:, sl],
                                   axis_name, 1.0 / float(dh) ** 0.5))
    return _dense(p["merge"], jnp.concatenate(outs, axis=-1))


def sp_gnn_forward(params: dict, batch_stats: dict,
                   tokens0: jnp.ndarray, tokens1: jnp.ndarray,
                   num_layers: int = 18, heads: int = 4,
                   axis_name: str = "seq"
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact AttentionalGNN forward, token-sharded.  tokens (n_loc, D)."""
    x0, x1 = tokens0, tokens1
    for i in range(num_layers):
        lp = params[f"layer_{i}"]
        ls = batch_stats[f"layer_{i}"]
        src0, src1 = (x1, x0) if i % 2 == 1 else (x0, x1)
        m0 = _attention(lp["attn"], x0, src0, heads, axis_name)
        m1 = _attention(lp["attn"], x1, src1, heads, axis_name)
        d0 = _mlp(lp["mlp"], ls["mlp"], jnp.concatenate([x0, m0], -1))
        d1 = _mlp(lp["mlp"], ls["mlp"], jnp.concatenate([x1, m1], -1))
        x0 = x0 + d0
        x1 = x1 + d1
    return x0, x1


# ---------------------------------------------------------------------------
# Full token-sharded level 1: GNN -> projection -> scale head -> learned-
# dustbin OT -> region-growing expansion, all with the source-token axis
# sharded.  Reference end-to-end path: first_layer.py:52-122 + the
# Compute_positions consumer (utils/utils.py:1179-1297).
# ---------------------------------------------------------------------------


def _conv3x3(p, grid):
    """flax nn.Conv(1, (3,3), padding 1) forward; grid (h, w, D) -> (h*w,)."""
    out = jax.lax.conv_general_dilated(
        grid[None], p["kernel"], (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0, :, :, 0]
    return (out + p["bias"][0]).reshape(-1)


def sp_coarse_tail(params: dict, batch_stats: dict,
                   tokens0_local: jnp.ndarray, tokens1_local: jnp.ndarray,
                   h: int, w: int, *, num_layers: int = 18, heads: int = 4,
                   sinkhorn_iterations: int = 100,
                   score_temperature: float = 0.1,
                   expand_iters: int = 15,
                   expand_lower_bound: float = 1e-5,
                   axis_name: str = "seq"):
    """Level-1 tail (everything after the backbone), token-sharded.

    Runs under ``shard_map`` with the G = h*w source-token axis sharded
    over ``axis_name``; exact vs the dense ``CoarseMatcher`` tail.  The
    dustbin row of the (G+1, G+1) transport lives on device 0 (every other
    device carries a -1e9 ghost row whose mass is exactly zero); target
    columns stay full per device — O(G^2/k) memory.

    Args: params/batch_stats — the CoarseMatcher variables subtrees
    (gnn/final_proj/scalex_proj/bin_score); tokens*_local (G/k, D) =
    backbone descriptors + keypoint encoding, row-sharded.

    Returns (local-row arrays unless noted):
      desc0, desc1 (G/k, D); pts (G/k, 2); x_scale/y_scale/alive/
      whole_cost (G/k,); scales_head (G,) replicated.
    """
    from pats_tpu.ops.expand import expand_transport

    x0, x1 = sp_gnn_forward(params["gnn"], batch_stats["gnn"],
                            tokens0_local, tokens1_local,
                            num_layers=num_layers, heads=heads,
                            axis_name=axis_name)
    mdesc0_l = _dense(params["final_proj"], x0)          # (m_loc, D)
    mdesc1_l = _dense(params["final_proj"], x1)
    D = mdesc0_l.shape[-1]

    mdesc1_full = jax.lax.all_gather(mdesc1_l, axis_name, tiled=True)
    scale_map = _conv3x3(params["scalex_proj"],
                         mdesc1_full.reshape(h, w, D))
    scales_head = jnp.exp(jax.nn.sigmoid(scale_map) * math.log(256.0)
                          - math.log(256.0) / 2)          # (G,)

    # --- learned-dustbin OT, row-sharded (ops/sinkhorn.py:60-106) ---
    alpha = jnp.abs(params["bin_score"]).astype(jnp.float32)
    G = h * w
    scores_l = (score_temperature
                * (mdesc0_l @ mdesc1_full.T)
                / math.sqrt(D)).astype(jnp.float32)       # (m_loc, G)
    is0 = jax.lax.axis_index(axis_name) == 0
    couplings_l = jnp.concatenate(
        [scores_l, jnp.full((scores_l.shape[0], 1), alpha)], axis=1)
    ghost = jnp.where(is0, alpha, -1e9)
    couplings_l = jnp.concatenate(
        [couplings_l, jnp.full((1, G + 1), ghost)], axis=0)

    ns = scales_head.astype(jnp.float32)
    ns_sum = jnp.sum(ns)
    norm = -jnp.log(G + ns_sum)
    log_nu = jnp.concatenate([jnp.log(ns) + norm,
                              (jnp.log(float(G)) + norm)[None]])
    log_mu_l = jnp.concatenate(
        [jnp.full((scores_l.shape[0],), norm),
         jnp.where(is0, jnp.log(ns_sum) + norm, -1e9)[None]])

    Z_l = sharded_log_sinkhorn(couplings_l, log_mu_l, log_nu,
                               sinkhorn_iterations, axis_name) - norm
    plan_exp_l = jnp.exp(Z_l[:-1])                        # (m_loc, G+1)
    dustbin_row = jax.lax.psum(
        jnp.where(is0, jnp.exp(Z_l[-1]), 0.0), axis_name)  # (G+1,)

    # per-target matched-mass scales (first_layer.py:117-118)
    scales = jnp.sqrt(jax.lax.psum(plan_exp_l[:, :-1].sum(0), axis_name)
                      + 1e-8)                              # (G,)

    mini_plan = jnp.concatenate([plan_exp_l, dustbin_row[None]], axis=0)
    res = expand_transport(mini_plan[None], scales[None], scales[None],
                           h, w, expand_iters, expand_lower_bound)
    return {
        "desc0": mdesc0_l,
        "desc1": mdesc1_l,
        "pts": res.average_point[0],
        "x_scale": res.x_scale[0],
        "y_scale": res.y_scale[0],
        "alive": jnp.logical_not(res.if_nomatching[0]),
        "whole_cost": res.whole_cost[0],
        "scales_head": scales_head,
    }


def sp_coarse_forward(variables: dict, left: jnp.ndarray,
                      right: jnp.ndarray, mesh, *,
                      num_layers: int = 18, heads: int = 4,
                      sinkhorn_iterations: int = 100,
                      score_temperature: float = 0.1,
                      expand_iters: int = 15,
                      expand_lower_bound: float = 1e-5,
                      axis_name: str = "model"):
    """Full sequence-parallel level 1: replicated backbone + sharded tail.

    Equals ``CoarseMatcher.apply`` (models/coarse.py:84-160) with the
    G-token axis sharded over ``mesh[axis_name]``.  The backbone is
    data-local (its cost is O(HW), not O(G^2)); everything quadratic in G
    runs sharded.  Requires G % mesh.shape[axis_name] == 0.

    Returns the same dict as CoarseMatcher (full arrays, gathered).
    """
    from functools import partial

    from flax import linen as nn
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from pats_tpu.models.coarse import CoarseMatcher, imagenet_normalize
    from pats_tpu.models.gnn import KeypointEncoder

    params = variables["params"]
    stats = variables["batch_stats"]

    class _Descriptors(CoarseMatcher):
        @nn.compact
        def __call__(self, pair):                # noqa: D102
            return self._descriptors(pair)

    pair = imagenet_normalize(jnp.stack([left, right], axis=0))
    sub = {k: params[k] for k in
           ("trunk", "compress_0", "compress_1", "compress_2")}
    desc = _Descriptors(descriptor_dim=params["final_proj"]["bias"].shape[0]
                        ).apply({"params": sub,
                                 "batch_stats": {"trunk": stats["trunk"]}},
                                pair)
    D = desc.shape[-1]
    h, w = desc.shape[1:3]
    G = h * w
    k = mesh.shape[axis_name]
    assert G % k == 0, (
        f"token count {G} must divide the '{axis_name}' axis ({k}); pad the "
        f"image so (H/32)*(W/32) is a multiple of {k}")

    rows = jnp.arange(h, dtype=jnp.float32) / h
    cols = jnp.arange(w, dtype=jnp.float32) / w
    kpts = jnp.stack([jnp.broadcast_to(rows[:, None], (h, w)),
                      jnp.broadcast_to(cols[None, :], (h, w))],
                     axis=-1).reshape(G, 2)
    kenc = KeypointEncoder(D).apply(
        {"params": params["kenc"], "batch_stats": stats["kenc"]}, kpts)
    tokens = desc.reshape(2, G, D) + kenc[None]

    shard = P(axis_name)
    fn = shard_map(
        partial(sp_coarse_tail, params, stats, h=h, w=w,
                num_layers=num_layers, heads=heads,
                sinkhorn_iterations=sinkhorn_iterations,
                score_temperature=score_temperature,
                expand_iters=expand_iters,
                expand_lower_bound=expand_lower_bound,
                axis_name=axis_name),
        mesh=mesh, in_specs=(shard, shard),
        out_specs={"desc0": shard, "desc1": shard, "pts": shard,
                   "x_scale": shard, "y_scale": shard, "alive": shard,
                   "whole_cost": shard, "scales_head": P()},
        # scales_head is derived from an all_gather so it IS replicated,
        # but vma tracking can't see through the conv that follows it
        check_vma=False)
    out = fn(tokens[0], tokens[1])
    out["grid"] = (h, w)
    return out
