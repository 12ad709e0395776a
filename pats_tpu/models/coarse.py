"""Level-1 coarse matcher: 32-px patch-area transport.

Re-implements reference models/first_layer.py:9-178 TPU-first:

pipeline: ImageNet-normalize (on raw 0..255 values, exactly as the
reference does) -> 3-scale image pyramid -> shared ResNet trunk on each
scale -> align-corners upsample to the 1/32 grid -> 1x1 channel compression
(256+128+64) -> concat 448-d patch descriptors -> keypoint-position MLP
encoding -> 18-layer self/cross attentional GNN -> final projection ->
per-target-patch scale head exp(sigmoid(conv3x3) * log256 - log256/2) ->
descriptor similarity / sqrt(448) -> learned-dustbin Sinkhorn OT (0.1x
temperature, 100 iters) with scale marginals -> per-patch matched-mass
scales -> region-grow position estimation (15 iters, lb 1e-5).

Design: one image pair per call (the reference is batch-1); data
parallelism shards pairs across the mesh outside.  The pyramid trunk runs
with batch 2 (left+right stacked) per scale.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from pats_tpu.models.backbone import CoarseTrunk
from pats_tpu.models.gnn import AttentionalGNN, KeypointEncoder
from pats_tpu.ops.expand import expand_transport
from pats_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_bilinear_half_pixel,
)
from pats_tpu.ops.sinkhorn import ot_learned_dustbin

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def imagenet_normalize(x: jnp.ndarray) -> jnp.ndarray:
    """The reference normalizes raw 0..255 float images with ImageNet
    mean/std WITHOUT dividing by 255 (first_layer.py:48,54-55)."""
    mean = jnp.asarray(IMAGENET_MEAN, x.dtype)
    std = jnp.asarray(IMAGENET_STD, x.dtype)
    return (x - mean) / std


class CoarseMatcher(nn.Module):
    """Level-1 matcher over the (H/32, W/32) patch grid."""

    descriptor_dim: int = 448
    gnn_layers: int = 18
    num_heads: int = 4
    sinkhorn_iterations: int = 100
    score_temperature: float = 0.1
    expand_iters: int = 15
    expand_lower_bound: float = 1e-5
    fused_attention: bool = False
    pallas_sinkhorn: bool = False
    sinkhorn_tol: float = 0.0
    use_running_average: bool = True
    deterministic: bool = True     # trunk dropout off (inference)
    dtype: Optional[jnp.dtype] = None

    def _descriptors(self, pair: jnp.ndarray) -> jnp.ndarray:
        """(2, H, W, 3) normalized pair -> (2, h, w, 448) descriptors."""
        H, W = pair.shape[1:3]
        trunk = CoarseTrunk(use_running_average=self.use_running_average,
                            deterministic=self.deterministic,
                            dtype=self.dtype, name="trunk")
        d0 = trunk(pair)                                           # (2,h,w,512)
        p1 = resize_bilinear_half_pixel(pair, (H // 2, W // 2), 1, 2)
        p2 = resize_bilinear_half_pixel(pair, (H // 4, W // 4), 1, 2)
        d1 = trunk(p1)
        d2 = trunk(p2)
        h, w = d0.shape[1:3]
        d1 = resize_bilinear_align_corners(d1, (h, w), 1, 2)
        d2 = resize_bilinear_align_corners(d2, (h, w), 1, 2)
        c0 = nn.Dense(256, dtype=self.dtype, name="compress_0")(d0)
        c1 = nn.Dense(128, dtype=self.dtype, name="compress_1")(d1)
        c2 = nn.Dense(64, dtype=self.dtype, name="compress_2")(d2)
        return jnp.concatenate([c0, c1, c2], axis=-1)              # (2,h,w,448)

    @nn.compact
    def __call__(self, left: jnp.ndarray, right: jnp.ndarray):
        """Args: left/right (H, W, 3) raw-valued float images (0..255).

        Returns a dict of per-grid-slot results (G = h*w slots):
          desc0/desc1: (G, D) projected descriptors (for level 2's titles)
          plan:        (G+1, G+1) log transport incl. dustbin
          pts:         (G, 2) expected target position (row, col) grid units
          x_scale/y_scale: (G,) reprojection scales
          alive:       (G,) matched mask
          whole_cost:  (G,) trust cost
          scales_head: (G,) learned per-target-patch scale marginals
        """
        D = self.descriptor_dim
        pair = imagenet_normalize(jnp.stack([left, right], axis=0))
        desc = self._descriptors(pair)
        h, w = desc.shape[1:3]
        G = h * w

        # keypoint-position encoding: (row/h, col/w) per grid slot
        rows = (jnp.arange(h, dtype=jnp.float32) / h)
        cols = (jnp.arange(w, dtype=jnp.float32) / w)
        kpts = jnp.stack([jnp.broadcast_to(rows[:, None], (h, w)),
                          jnp.broadcast_to(cols[None, :], (h, w))],
                         axis=-1).reshape(G, 2)
        kenc = KeypointEncoder(D, use_running_average=self.use_running_average,
                               dtype=self.dtype, name="kenc")(kpts)
        tokens = desc.reshape(2, G, D) + kenc[None]

        gnn = AttentionalGNN(D, self.gnn_layers, self.num_heads,
                             fused=self.fused_attention,
                             use_running_average=self.use_running_average,
                             remat=not self.use_running_average,
                             dtype=self.dtype, name="gnn")
        desc0, desc1 = gnn(tokens[0], tokens[1])

        final = nn.Dense(D, dtype=self.dtype, name="final_proj")
        mdesc0, mdesc1 = final(desc0), final(desc1)                # (G, D)

        # per-target-patch scale head on the right image's projected grid.
        # near-zero kernel init: sigmoid(~0) = 0.5 -> scale ~1, so the OT
        # column marginals start uniform (SuperGlue's fixed marginals)
        # instead of an exp-amplified random spread that hands ~99% of
        # the initial plan mass to the dustbin column (round-3
        # fine-training diagnosis); 1e-4 stddev (not exact zeros) keeps
        # sharded-vs-dense reductions off exact ties.  Training
        # (train/losses.scale_anchor_loss) moves the head off 1
        scale_map = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                            kernel_init=nn.initializers.normal(1e-4),
                            dtype=self.dtype, name="scalex_proj")(
            mdesc1.reshape(h, w, D))
        scales_head = jnp.exp(
            nn.sigmoid(scale_map.reshape(G)) * math.log(256.0)
            - math.log(256.0) / 2)

        bin_score = self.param("bin_score", nn.initializers.zeros, ())

        scores = jnp.einsum("nd,md->nm", mdesc0, mdesc1) / math.sqrt(D)
        plan = ot_learned_dustbin(
            (self.score_temperature * scores)[None].astype(jnp.float32),
            jnp.abs(bin_score), scales_head[None],
            self.sinkhorn_iterations,
            use_pallas=self.pallas_sinkhorn,
            tol=self.sinkhorn_tol)                       # (1,G+1,G+1)

        # per-target matched-mass scales (first_layer.py:117-118)
        plan_exp = jnp.exp(plan)
        scales = jnp.sqrt(plan_exp[0, :-1, :-1].sum(0) + 1e-8)      # (G,)

        res = expand_transport(plan_exp, scales[None], scales[None],
                               h, w, self.expand_iters,
                               self.expand_lower_bound,
                               use_pallas=self.pallas_sinkhorn)

        return {
            "desc0": mdesc0,
            "desc1": mdesc1,
            "plan": plan[0],
            "pts": res.average_point[0],
            "x_scale": res.x_scale[0],
            "y_scale": res.y_scale[0],
            "alive": jnp.logical_not(res.if_nomatching[0]),
            "whole_cost": res.whole_cost[0],
            "core_cost": res.core_cost[0],
            "scales_head": scales_head,
            "grid": (h, w),
        }
