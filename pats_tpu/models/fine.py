"""Level-2 fine matcher: 8-px cells inside scale-normalized 96x96 crops.

Re-implements reference models/second_layer.py:10-259 TPU-first:

pipeline (per alive coarse patch, fixed-capacity batch over ALL grid
slots): ImageNet-normalize crops -> truncated ResNet-34 multiscale features
-> gather at the 12x12 cell centers (strides 4/2/1, avg-pooled for the two
finer maps) -> 256-d cell descriptors + 8-d "title" MLP of the coarse
descriptor -> 264-d tokens, plus a learned "rubbish" (dustbin) token from a
second MLP -> 18-layer GNN -> scale_x/scale_y heads -> inline-dustbin
Sinkhorn OT (100 iters) + outdoor/indoor dustbin bonus -> region-grow
position estimation (8 iters, lb 1e-3) -> cross-patch cell merge.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from pats_tpu.models.backbone import FineTrunk
from pats_tpu.models.coarse import imagenet_normalize
from pats_tpu.models.gnn import AttentionalGNN, MLPStack
from pats_tpu.ops.expand import expand_transport
from pats_tpu.ops.merge import merge_cells
from pats_tpu.ops.resize import avg_pool_2x2_pad
from pats_tpu.ops.sinkhorn import ot_inline_dustbin


def _grid_gather(feat: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Gather features at the 12x12 cell centers: position (r, c) samples
    feat[(r + 0.5) * stride, (c + 0.5) * stride] (second_layer.py:76-79,
    integer truncation)."""
    n, fh, fw, c = feat.shape
    idx = (jnp.arange(12, dtype=jnp.float32) + 0.5) * stride
    idx = idx.astype(jnp.int32)
    flat = (idx[:, None] * fw + idx[None, :]).reshape(-1)           # (144,)
    return jnp.take(feat.reshape(n, fh * fw, c), flat, axis=1)      # (n,144,c)


class FineMatcher(nn.Module):
    """Level-2 matcher over (G, 144) crop cells."""

    descriptor_dim: int = 264
    title_dim: int = 8
    gnn_layers: int = 18
    num_heads: int = 4
    sinkhorn_iterations: int = 100
    score_temperature: float = 0.1
    expand_iters: int = 8
    expand_lower_bound: float = 1e-3
    fused_attention: bool = False
    pallas_sinkhorn: bool = False
    sinkhorn_tol: float = 0.0
    use_running_average: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, left_crops: jnp.ndarray, right_crops: jnp.ndarray,
                 coarse_desc: jnp.ndarray, patch_alive: jnp.ndarray,
                 gh: int, gw: int, outdoor: bool, merge_new: bool,
                 patch_pair=None, num_pairs: int = 1):
        """Args:
          left_crops/right_crops: (G, 96, 96, 3) raw-valued crops.
          coarse_desc: (G, 448) level-1 projected left descriptors.
          patch_alive: (G,) coarse alive mask.
          gh, gw: coarse grid dims (G = gh * gw).
          outdoor: dustbin bonus log2 (outdoor) vs log3 (indoor).
          merge_new: merge algorithm selector.
          patch_pair/num_pairs: optional int32 (G,) pair ids for the FLAT
            pair-batched path (G = num_pairs * per-pair grid): the merge
            runs per pair and batch-statistics BNs group per pair.

        Returns dict:
          cell_alive: (G, 144) surviving cells after merge
          pts:        (G, 144, 2) expected positions (row, col) 12-grid units
          trust:      (G, 144) whole_cost
          tokens0/1:  (G, 145, 264) final projected GNN tokens (level-3 input)
          feats:      tuple of trunk multiscale maps for left+right (2G, ...)
        """
        G = left_crops.shape[0]
        D = self.descriptor_dim
        crops = jnp.concatenate([left_crops, right_crops], axis=0)
        crops = imagenet_normalize(crops)
        mask2 = jnp.concatenate([patch_alive, patch_alive], axis=0)
        pair2 = None if patch_pair is None else jnp.concatenate(
            [patch_pair, patch_pair], axis=0)
        trunk = FineTrunk(use_running_average=self.use_running_average,
                          dtype=self.dtype, name="trunk")
        x0, x1, x2 = trunk(crops, mask2, pair2, num_pairs)      # (2G,48,48,64),(2G,24,24,64),(2G,12,12,128)

        d0 = _grid_gather(avg_pool_2x2_pad(x0), 4)          # (2G, 144, 64)
        d1 = _grid_gather(avg_pool_2x2_pad(x1), 2)          # (2G, 144, 64)
        d2 = _grid_gather(x2, 1)                            # (2G, 144, 128)
        desc = jnp.concatenate([d0, d1, d2], axis=-1)       # (2G, 144, 256)

        # title/rubbish MLPs of the coarse descriptor (second_layer.py:82-83);
        # both images share the LEFT coarse descriptor
        title = MLPStack((256, 128, 64, 32, 16, self.title_dim),
                         use_running_average=self.use_running_average,
                         dtype=self.dtype, name="compress_1")(
            coarse_desc[:, None, :], patch_alive, (), patch_pair,
            num_pairs)                                      # (G, 1, 8)
        rubbish = MLPStack((448, 448, D),
                           use_running_average=self.use_running_average,
                           dtype=self.dtype, name="compress_2")(
            coarse_desc[:, None, :], patch_alive, (), patch_pair,
            num_pairs)                                      # (G, 1, 264)

        title2 = jnp.broadcast_to(title[:, :, :], (G, 144, self.title_dim))
        tokens = jnp.concatenate(
            [jnp.tile(title2, (2, 1, 1)), desc], axis=-1)   # (2G, 144, 264)
        tokens = jnp.concatenate(
            [tokens, jnp.tile(rubbish, (2, 1, 1))], axis=1)  # (2G, 145, 264)

        gnn = AttentionalGNN(D, self.gnn_layers, self.num_heads,
                             fused=self.fused_attention,
                             use_running_average=self.use_running_average,
                             remat=not self.use_running_average,
                             dtype=self.dtype, name="gnn")
        desc0, desc1 = gnn(tokens[:G], tokens[G:], patch_alive,
                           patch_pair, num_pairs)

        final = nn.Dense(D, dtype=self.dtype, name="final_proj")
        mdesc0, mdesc1 = final(desc0), final(desc1)          # (G, 145, D)

        # scale heads on the right tokens' 12x12 grid (second_layer.py:92-97)
        grid1 = mdesc1[:, :-1, :].reshape(G, 12, 12, D)
        # near-zero kernel init -> scale ~1 at init (uniform OT column
        # marginals); see models/coarse.py scale-head note
        sx = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                     kernel_init=nn.initializers.normal(1e-4), dtype=self.dtype,
                     name="scalex_proj")(grid1).reshape(G, 144)
        sy = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                     kernel_init=nn.initializers.normal(1e-4), dtype=self.dtype,
                     name="scaley_proj")(grid1).reshape(G, 144)
        scale_x = jnp.exp(nn.sigmoid(sx) * math.log(256.0)
                          - math.log(256.0) / 2)
        scale_y = jnp.exp(nn.sigmoid(sy) * math.log(256.0)
                          - math.log(256.0) / 2)

        scores = jnp.einsum("gnd,gmd->gnm", mdesc0, mdesc1) / math.sqrt(D)
        plan = ot_inline_dustbin(
            (self.score_temperature * scores).astype(jnp.float32),
            (scale_x * scale_y), self.sinkhorn_iterations,
            use_pallas=self.pallas_sinkhorn,
            tol=self.sinkhorn_tol)                 # (G, 145, 145)

        bonus = math.log(2.0 if outdoor else 3.0)
        plan = plan.at[:, :, -1].add(bonus)
        plan = plan.at[:, -1, :].add(bonus)

        res = expand_transport(jnp.exp(plan), scale_x, scale_y, 12, 12,
                               self.expand_iters, self.expand_lower_bound,
                               use_pallas=self.pallas_sinkhorn)

        if num_pairs > 1:
            # per-pair cross-patch merge: the grid structure is per pair
            import jax

            gp = G // num_pairs
            cell_alive = jax.vmap(
                lambda wc, pa, cm: merge_cells(wc, pa, cm, gh, gw,
                                               new=merge_new))(
                res.whole_cost.reshape(num_pairs, gp, 144),
                patch_alive.reshape(num_pairs, gp),
                jnp.logical_not(res.if_nomatching).reshape(
                    num_pairs, gp, 144)).reshape(G, 144)
        else:
            cell_alive = merge_cells(res.whole_cost, patch_alive,
                                     jnp.logical_not(res.if_nomatching),
                                     gh, gw, new=merge_new)

        return {
            "cell_alive": cell_alive,
            "pts": res.average_point,
            "trust": res.whole_cost,
            "core_cost": res.core_cost,
            "cell_matched": jnp.logical_not(res.if_nomatching),
            "plan": plan,
            "tokens0": mdesc0,
            "tokens1": mdesc1,
            "x_scale": res.x_scale,
            "y_scale": res.y_scale,
            # learned OT column marginals (scale heads), for the training
            # scale anchor (train/losses.scale_anchor_loss)
            "scales_head": scale_x * scale_y,
        }
