"""Level-3 sub-pixel refiner: 2-px granularity inside the 96x96 crops.

Re-implements reference models/third_layer.py:21-217 TPU-first:

pipeline: fresh truncated-ResNet-34 features on the crops (the reference
recomputes them, third_layer.py:115) -> FPN fusing the level-2 GNN tokens
(12x12x264) with the backbone skips up to 1/2 resolution -> 128-d 52x52
maps (48 + 2x2 zero pad) -> per-point 8x8 window unfold around the level-2
match in both images (coords quantized to multiples of 4) + keypoint
encoding + per-point rubbish token from an MLP of the coarse cell feature
-> 10-layer GNN -> scale head -> inline-dustbin OT (100 iters) -> argmax +
5x5 soft-argmax weighted by sqrt(score)/scale -> 16 sub-pixel points per
level-2 cell + validity labels.

Design: points are COMPACTED to a fixed capacity K (<= number of global
8-px cells, since the merge emits at most one claim per cell slot) via a
stable sort on the alive mask - the TPU replacement for the reference's
dynamic boolean filtering (models/pats.py:57-62).

When ``use_running_average=False`` (the reference's deliberate
BatchNorm-train-at-eval mode, models/pats.py:112-118) all BatchNorms use
masked batch statistics over alive slots only.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from pats_tpu.models.backbone import FineTrunk
from pats_tpu.models.gnn import AttentionalGNN, KeypointEncoder, MLPStack
from pats_tpu.models.norm import MaskedBatchNorm
from pats_tpu.ops.resize import resize_bilinear_half_pixel
from pats_tpu.ops.sinkhorn import ot_inline_dustbin


class FPN82(nn.Module):
    """FPN fusing 12x12 GNN tokens with backbone skips -> 128-d 52x52.

    Reference FPN_8_2 (third_layer.py:21-77); block dims [128, 192, 264],
    LeakyReLU(0.01), align_corners=False x2 upsampling, zero pads +1/+2.
    """

    use_running_average: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, skips, mask: Optional[jnp.ndarray] = None,
                 groups: Optional[jnp.ndarray] = None, num_groups: int = 1):
        ura = self.use_running_average
        x0, x1, x2 = skips            # (N,48,48,64), (N,24,24,64), (N,12,12,128)

        def conv1(f, name):
            return nn.Conv(f, (1, 1), use_bias=False, dtype=self.dtype,
                           name=name)

        def conv3(f, name):
            return nn.Conv(f, (3, 3), padding=[(1, 1), (1, 1)],
                           use_bias=False, dtype=self.dtype, name=name)

        def block(x, f_mid, f_out, prefix, mask):
            y = conv3(f_mid, f"{prefix}_conv1")(x)
            y = MaskedBatchNorm(use_running_average=ura,
                                name=f"{prefix}_bn")(y, mask, (), groups,
                                                     num_groups)
            y = nn.leaky_relu(y, 0.01)
            return conv3(f_out, f"{prefix}_conv2")(y)

        x3_out = block(x, 264, 264, "layer3_outconv2", mask) \
            + conv1(264, "layer3_outconv")(x2)                    # (N,12,12,264)
        x3_2x = resize_bilinear_half_pixel(x3_out, (24, 24), 1, 2)
        x3_2x = jnp.pad(x3_2x, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (N,26,26,264)
        x2_out = jnp.pad(conv1(264, "layer2_outconv")(x1),
                         ((0, 0), (1, 1), (1, 1), (0, 0)))        # (N,26,26,264)
        x2_out = block(x2_out + x3_2x, 264, 192, "layer2_outconv2", mask)
        x2_2x = resize_bilinear_half_pixel(x2_out, (52, 52), 1, 2)
        x1_out = jnp.pad(conv1(192, "layer1_outconv")(x0),
                         ((0, 0), (2, 2), (2, 2), (0, 0)))        # (N,52,52,192)
        x1_out = block(x1_out + x2_2x, 192, 128, "layer1_outconv2", mask)
        return x1_out                                              # (N,52,52,128)


class SubpixelRefiner(nn.Module):
    """Level-3 refiner over compacted (K,) points."""

    descriptor_dim: int = 128
    gnn_layers: int = 10
    num_heads: int = 4
    sinkhorn_iterations: int = 100
    score_temperature: float = 0.1
    window: int = 8                # W
    padded_map: int = 52           # M
    neighborhood: int = 5          # T
    fused_attention: bool = False
    pallas_sinkhorn: bool = False
    sinkhorn_tol: float = 0.0
    use_running_average: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, left_crops, right_crops, tokens0, tokens1,
                 point_pid, point_cell, point_tgt, point_valid,
                 patch_alive, patch_pair=None, point_pair=None,
                 num_pairs: int = 1):
        """Args:
          left_crops/right_crops: (G, 96, 96, 3) raw crops.
          tokens0/tokens1: (G, 145, 264) level-2 projected GNN tokens.
          point_pid:  (K,) int32 patch id of each compacted point.
          point_cell: (K,) int32 crop-cell id (0..143).
          point_tgt:  (K, 2) level-2 position (row, col) in 12-grid units.
          point_valid: (K,) slot validity.
          patch_alive: (G,) coarse alive mask (for trunk/FPN batch stats).
          patch_pair/point_pair: optional int32 pair ids per patch/point
            for the FLAT pair-batched path (PATSCascadeBatched) — in
            batch-statistics mode every BatchNorm then keeps per-pair
            statistics (grouped MaskedBatchNorm), exactly matching the
            per-pair vmapped semantics, without rank-5 tensors.

        Returns dict:
          mkpts1: (K, 16, 2) refined right positions (x, y) crop pixels.
          valid16: (K, 16) per-sub-point validity from the matching labels
            (caller intersects with indoor selection / point_valid).
        """
        G = left_crops.shape[0]
        K = point_pid.shape[0]
        W, M, T = self.window, self.padded_map, self.neighborhood
        D = self.descriptor_dim

        crops = jnp.concatenate([left_crops, right_crops], axis=0)
        # the reference feeds RAW (un-normalized) crops to the level-3 trunk
        # (third_layer.py:113-115 has no Normalize)
        mask2 = jnp.concatenate([patch_alive, patch_alive], axis=0)
        pair2 = None if patch_pair is None else jnp.concatenate(
            [patch_pair, patch_pair], axis=0)
        trunk = FineTrunk(use_running_average=self.use_running_average,
                          dtype=self.dtype, name="trunk")
        skips = trunk(crops, mask2, pair2, num_pairs)

        tokens = jnp.concatenate([tokens0, tokens1], axis=0)       # (2G,145,264)
        grid = tokens[:, :-1, :].reshape(2 * G, 12, 12, 264)
        fpn = FPN82(use_running_average=self.use_running_average,
                    dtype=self.dtype, name="backbone")
        feat = fpn(grid, skips, mask2, pair2, num_pairs)           # (2G,52,52,128)
        feat_f0, feat_f1 = feat[:G], feat[G:]

        # per-cell rubbish features from the LEFT coarse tokens
        rubbish = MLPStack((264, 264, D),
                           use_running_average=self.use_running_average,
                           dtype=self.dtype, name="compress")(
            tokens0[:, :-1, :], patch_alive, (), patch_pair,
            num_pairs)                                              # (G,144,128)

        # source/target window centers in crop pixels, quantized to 4
        cell_c = (point_cell % 12).astype(jnp.float32)
        cell_r = (point_cell // 12).astype(jnp.float32)
        src_x = cell_c * 8.0 + 4.0
        src_y = cell_r * 8.0 + 4.0
        # reference rounding order (models/pats.py:58, third_layer.py:126-128):
        # round(pts * 4) -> x2 -> clamp [0, 96] -> round(/4) * 4
        tgt = jnp.round(
            jnp.stack([point_tgt[:, 1], point_tgt[:, 0]], axis=-1) * 4.0) * 2.0
        tgt = jnp.clip(tgt, 0.0, 96.0)
        tgt = jnp.round(tgt / 4.0) * 4.0                            # (K,2) x,y

        def unfold(feat_maps, cx, cy, pid):
            # 8x8 window in the 52x52 map centered per the reference
            # arithmetic: col = cx//2 + k - W/2 + 2 (third_layer.py:123-131)
            k = jnp.arange(W, dtype=jnp.float32)
            xs = (jnp.floor(cx / 2.0)[:, None] + k[None, :] - W / 2 + 2)
            ys = (jnp.floor(cy / 2.0)[:, None] + k[None, :] - W / 2 + 2)
            xs = xs.astype(jnp.int32)
            ys = ys.astype(jnp.int32)
            flat = (pid[:, None, None] * M * M
                    + ys[:, :, None] * M + xs[:, None, :])          # (K,W,W)
            fm = feat_maps.reshape(G * M * M, D)
            out = jnp.take(fm, flat.reshape(-1), axis=0)
            return out.reshape(K, W * W, D)

        f0 = unfold(feat_f0, src_x, src_y, point_pid)
        f1 = unfold(feat_f1, tgt[:, 0], tgt[:, 1], point_pid)

        kw = jnp.arange(W, dtype=jnp.float32) / W
        kpts = jnp.stack([jnp.broadcast_to(kw[:, None], (W, W)),
                          jnp.broadcast_to(kw[None, :], (W, W))],
                         axis=-1).reshape(W * W, 2)
        kenc = KeypointEncoder(D, use_running_average=self.use_running_average,
                               dtype=self.dtype, name="kenc")(kpts)
        f0 = f0 + kenc[None]
        f1 = f1 + kenc[None]

        # per-point rubbish token, gathered at the coarse 12x12 cell of the
        # SOURCE point (banker's rounding as torch.round; third_layer.py:141-144)
        x2 = jnp.round(src_x / 8.0).astype(jnp.int32)
        y2 = jnp.round(src_y / 8.0).astype(jnp.int32)
        idx2 = jnp.clip(point_pid * 144 + y2 * 12 + x2, 0, G * 144 - 1)
        rub = jnp.take(rubbish.reshape(G * 144, D), idx2, axis=0)    # (K, D)

        t0 = jnp.concatenate([f0, rub[:, None, :]], axis=1)          # (K,65,D)
        t1 = jnp.concatenate([f1, rub[:, None, :]], axis=1)

        gnn = AttentionalGNN(D, self.gnn_layers, self.num_heads,
                             fused=self.fused_attention,
                             use_running_average=self.use_running_average,
                             remat=not self.use_running_average,
                             dtype=self.dtype, name="gnn")
        t0, t1 = gnn(t0, t1, point_valid, point_pair, num_pairs)

        # near-zero kernel init -> scale ~1 at init; see models/coarse.py
        smap = nn.Conv(1, (3, 3), padding=[(1, 1), (1, 1)],
                       kernel_init=nn.initializers.normal(1e-4), dtype=self.dtype,
                       name="scale_proj")(
            t1[:, :-1, :].reshape(K, W, W, D)).reshape(K, W * W)
        scale = jnp.exp(nn.sigmoid(smap) * math.log(256.0)
                        - math.log(256.0) / 2)                      # (K, 64)
        scale_xy = jnp.sqrt(scale + 1e-8)

        scores = jnp.einsum("knd,kmd->knm", t0, t1) / math.sqrt(D)
        # compacted points are alive-first, so trailing all-dead blocks of
        # the fused kernel skip the 100 iterations entirely
        plan = ot_inline_dustbin(
            (self.score_temperature * scores).astype(jnp.float32),
            scale, self.sinkhorn_iterations,
            use_pallas=self.pallas_sinkhorn,
            valid=point_valid, tol=self.sinkhorn_tol)                                      # (K,65,65)
        p = jnp.exp(plan)

        mkpts1, valid16 = self._compute_result(p, scale_xy, tgt)
        return {"mkpts1": mkpts1, "valid16": valid16}

    def _compute_result(self, p, scale_xy, tgt):
        """argmax + 5x5 soft-argmax (third_layer.py:184-217) and the
        outdoor validity labels (third_layer.py:161-170)."""
        W, T = self.window, self.neighborhood
        K = p.shape[0]
        # padded per-source target maps: (K, 64, 12, 12)
        maps = p[:, :-1, :-1].reshape(K, W * W, W, W)
        maps = jnp.pad(maps, ((0, 0), (0, 0), (2, 2), (2, 2)))
        maps = maps.reshape(K, W, W, (W + 4) * (W + 4))
        central = maps[:, 2:6, 2:6, :].reshape(K, 16, -1)            # (K,16,144)

        max0 = jnp.argmax(p[:, :-1, :-1], axis=2).reshape(K, W, W)
        max0 = max0[:, 2:6, 2:6].reshape(K, 16)                      # 0..63

        spad = jnp.pad(scale_xy.reshape(K, W, W), ((0, 0), (2, 2), (2, 2)),
                       constant_values=1e-2).reshape(K, 1, -1)       # (K,1,144)
        wgt = jnp.sqrt(central + 1e-7) / spad

        # TxT window selection as a masked reduction over the 144 padded
        # cells (per-element TPU gathers are orders of magnitude slower)
        wpad = W + 4
        cell = jnp.arange(wpad * wpad)
        cy = (cell // wpad)[None, None, :]
        cx = (cell % wpad)[None, None, :]
        dy = cy - (max0 // W)[:, :, None]
        dxx = cx - (max0 % W)[:, :, None]
        inw = (dy >= 0) & (dy < T) & (dxx >= 0) & (dxx < T)
        w = jnp.where(inw, wgt, 0.0)                                 # (K,16,144)
        wsum = jnp.sum(w, axis=2)
        wx = jnp.sum(w * (dxx * 2 - (T - 1)), axis=2)
        wy = jnp.sum(w * (dy * 2 - (T - 1)), axis=2)

        fx = wx / wsum + ((max0 % W).astype(jnp.float32) + 0.5 - W / 2) * 2.0
        fy = wy / wsum + ((max0 // W).astype(jnp.float32) + 0.5 - W / 2) * 2.0
        mkpts1 = jnp.stack([fx, fy], axis=-1) + tgt[:, None, :]      # (K,16,2)

        # outdoor validity: central 4x4 source positions whose argmax over
        # the 65-wide row (incl. dustbin) is NOT the dustbin
        used = p[:, :-1, :].reshape(K, W, W, -1)[:, 2:6, 2:6, :]
        used = used.reshape(K, 16, -1) + 1e-8
        valid16 = jnp.argmax(used, axis=2) != W * W
        return mkpts1, valid16
