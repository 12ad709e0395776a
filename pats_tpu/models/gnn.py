"""Attentional GNN building blocks (token-last layout, MXU-friendly).

TPU-native re-design of reference models/modules.py:58-134:

- ``MLPStack``            <- MLP (1x1 conv stack + BN + ReLU)
- ``KeypointEncoder``     <- KeypointEncoder (position MLP)
- ``MultiHeadAttention``  <- MultiHeadedAttention (full softmax attention)
- ``AttentionalPropagation`` / ``AttentionalGNN`` <- same names

Layout: tokens are (..., N, C) so every projection is a plain dense matmul
on the MXU and attention is two batched einsums with head-major
(..., N, H, head_dim) splits.  The reference splits channels head-MINOR
(channel c -> head c % H, modules.py:102); the converter folds the channel
permutation into the projection/merge kernels (io/convert.py) so converted
weights remain bit-compatible while the runtime layout stays fast.

Attention scores are scaled by sqrt(head_dim) (modules.py:84-86).

Both images are processed as one stacked call per layer (2x the tokens per
matmul); in batch-statistics mode (the level-3 BatchNorm quirk,
models/pats.py:112-118) the image axis is a BN statistics GROUP so each
image keeps its own statistics, exactly like the reference's two separate
calls.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from pats_tpu.models.norm import MaskedBatchNorm


class MLPStack(nn.Module):
    """Dense stack with BatchNorm + ReLU between layers (not after last).

    Equivalent to reference MLP() (modules.py:58-69): per-token 1x1 convs.
    Input (..., N, C_in) -> (..., N, features[-1]).  BatchNorm normalizes
    each channel over all leading/token dims (minus ``group_axes``),
    matching torch BatchNorm1d on (B, C, N).
    """

    features: Sequence[int]
    use_bn: bool = True
    use_running_average: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 group_axes: tuple = (),
                 groups: Optional[jnp.ndarray] = None, num_groups: int = 1):
        n = len(self.features)
        for i, feat in enumerate(self.features):
            x = nn.Dense(feat, dtype=self.dtype, name=f"dense_{i}")(x)
            if i < n - 1:
                if self.use_bn:
                    x = MaskedBatchNorm(
                        use_running_average=self.use_running_average,
                        name=f"bn_{i}")(x, mask, group_axes, groups,
                                        num_groups)
                x = nn.relu(x)
        return x


class KeypointEncoder(nn.Module):
    """Position MLP: normalized (row_frac, col_frac) -> feature_dim.

    Equivalent to reference KeypointEncoder (modules.py:71-81): MLP over
    [2] + layers + [feature_dim] with zero-initialized final bias.  The
    input grid is constant, so batch statistics are deterministic and no
    mask is needed even in batch-stats mode.
    """

    feature_dim: int
    layers: Sequence[int] = (32, 64, 128, 256, 512)
    use_running_average: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, kpts):
        # kpts: (N, 2); BN statistics run over the N tokens (torch batch=1)
        return MLPStack(tuple(self.layers) + (self.feature_dim,),
                        use_running_average=self.use_running_average,
                        dtype=self.dtype, name="encoder")(kpts)


class _DenseParams(nn.Module):
    """Parameters of an nn.Dense (same names/shapes/init) WITHOUT applying
    it — the fused attention-layer kernel consumes the raw kernels, and
    declaring them through this module keeps the variable tree (and thus
    converted checkpoints, io/convert.py) identical to the unfused path."""

    din: int
    dout: int

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.din, self.dout))
        bias = self.param("bias", nn.initializers.zeros_init(),
                          (self.dout,))
        return kernel, bias


class MultiHeadAttention(nn.Module):
    """Full softmax multi-head attention (modules.py:84-105), head-major.

    With ``fused=True`` and short token sequences, the WHOLE layer
    (q/k/v projections + attention + merge projection) runs as one
    Pallas kernel (ops/pallas/attention_kernel.fused_attention_layer):
    the levels-2/3 GNNs are otherwise bound on HBM round-trips for q, k,
    v, the (batch*heads, N, N) softmax tensor and the attention output.
    The fused path requires key is value (true for the GNN's
    message-passing calls); anything else falls back to XLA ops.
    """

    d_model: int
    num_heads: int = 4
    fused: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query, key, value, item_alive=None):
        # (..., N, D) tokens; item_alive: optional per-tokenset mask with
        # shape == the leading dims (dead items skip compute in the fused
        # kernel and output zeros — they are masked downstream anyway)
        dh = self.d_model // self.num_heads
        n = query.shape[-2]
        lead = query.shape[:-2]
        batch = 1
        for s in lead:
            batch *= s

        dt = self.dtype or query.dtype
        use_layer = use_attn = False
        if self.fused and n <= 256 and batch >= 16:
            from pats_tpu.ops.pallas import attention_kernel as ak

            # whole-layer fusion needs the projections inline and scoped
            # VMEM for weights + tiles; attention-only fusion is the
            # fallback (still removes the HBM probs round-trip); the XLA
            # slice path is the last resort (shape too big for VMEM)
            use_layer = (key is value
                         and query.shape[-1] == self.d_model
                         and ak.pick_block(n, self.d_model, self.num_heads,
                                           dt, layer=True) is not None)
            use_attn = not use_layer and ak.pick_block(
                n, self.d_model, self.num_heads, dt,
                layer=False) is not None

        if use_layer:
            from pats_tpu.ops.pallas.attention_kernel import \
                fused_attention_layer

            wq, bq = _DenseParams(self.d_model, self.d_model,
                                  name="proj_q")()
            wk, bk = _DenseParams(self.d_model, self.d_model,
                                  name="proj_k")()
            wv, bv = _DenseParams(self.d_model, self.d_model,
                                  name="proj_v")()
            wm, bm = _DenseParams(self.d_model, self.d_model,
                                  name="merge")()
            out = fused_attention_layer(
                query.reshape((batch, n, self.d_model)).astype(dt),
                key.reshape((batch, n, self.d_model)).astype(dt),
                wq, bq, wk, bk, wv, bv, wm, bm,
                float(1.0 / float(dh) ** 0.5), nheads=self.num_heads,
                alive=None if item_alive is None
                else item_alive.reshape(batch))
            return out.reshape(lead + (n, self.d_model))

        q = nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(query)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(key)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(value)
        scale = 1.0 / jnp.sqrt(jnp.asarray(dh, q.dtype))
        if use_attn:
            from pats_tpu.ops.pallas.attention_kernel import fused_attention

            out = fused_attention(
                q.reshape((batch, n, self.d_model)),
                k.reshape((batch, n, self.d_model)),
                v.reshape((batch, n, self.d_model)),
                float(1.0 / float(dh) ** 0.5), nheads=self.num_heads,
                alive=None if item_alive is None
                else item_alive.reshape(batch))
            out = out.reshape(lead + (n, self.d_model))
            return nn.Dense(self.d_model, dtype=self.dtype,
                            name="merge")(out)
        # per-head contiguous channel slices: no layout shuffles.
        # (A block-diagonal TB-grouped variant won 5x in isolation but
        # REGRESSED the full graph by ~50% - the extra softmax volume
        # dominates once XLA fuses the surrounding ops; keep it simple.)
        outs = []
        for h in range(self.num_heads):
            sl = slice(h * dh, (h + 1) * dh)
            s = jnp.einsum("...nd,...md->...nm", q[..., sl],
                           k[..., sl]) * scale
            prob = nn.softmax(s, axis=-1)
            outs.append(jnp.einsum("...nm,...md->...nd", prob,
                                   v[..., sl]))
        out = jnp.concatenate(outs, axis=-1)
        return nn.Dense(self.d_model, dtype=self.dtype, name="merge")(out)


class AttentionalPropagation(nn.Module):
    """attention message + MLP on [x, message] (modules.py:107-116)."""

    d_model: int
    num_heads: int = 4
    fused: bool = False
    use_running_average: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, source, mask: Optional[jnp.ndarray] = None,
                 group_axes: tuple = (),
                 groups: Optional[jnp.ndarray] = None, num_groups: int = 1):
        # the BN mask is per token-set (e.g. (2, G)); when it matches the
        # attention's leading dims exactly it doubles as the dead-item skip
        item_alive = None
        if mask is not None and mask.shape == x.shape[:-2]:
            item_alive = mask
        message = MultiHeadAttention(self.d_model, self.num_heads,
                                     fused=self.fused,
                                     dtype=self.dtype, name="attn")(
            x, source, source, item_alive=item_alive)
        y = jnp.concatenate([x, message], axis=-1)
        return MLPStack((self.d_model * 2, self.d_model),
                        use_running_average=self.use_running_average,
                        dtype=self.dtype, name="mlp")(y, mask, group_axes,
                                                      groups, num_groups)


class AttentionalGNN(nn.Module):
    """Alternating self/cross attentional refinement of two token sets.

    Equivalent to reference AttentionalGNN (modules.py:118-134) with layers
    ['self', 'cross'] * (num_layers // 2).  Each layer applies the SAME
    weights to both images; residual update desc += delta.  Both images run
    as one stacked call (axis 0) with per-image BN statistic groups.
    """

    d_model: int
    num_layers: int               # must be even (self/cross pairs)
    num_heads: int = 4
    fused: bool = False
    use_running_average: bool = True
    dtype: Optional[jnp.dtype] = None
    # rematerialize each layer's activations in the backward pass: the
    # 18-layer GNN's saved activations dominate training HBM (the fine
    # level OOMs a 16 GB v5e at batch 8 / 64 patches without this);
    # numerics are identical, backward recomputes the forward per layer
    remat: bool = False

    @nn.compact
    def __call__(self, desc0, desc1,
                 mask: Optional[jnp.ndarray] = None,
                 groups: Optional[jnp.ndarray] = None, num_groups: int = 1
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert self.num_layers % 2 == 0
        x = jnp.stack([desc0, desc1], axis=0)           # (2, ..., N, C)
        mask2 = None
        if mask is not None:
            mask2 = jnp.broadcast_to(mask[None], (2,) + mask.shape)
        layer_cls = AttentionalPropagation
        if self.remat:
            # call args: (self=0, x=1, source=2, mask=3, group_axes=4,
            # groups=5, num_groups=6); group_axes/num_groups are python
            # constants, everything else is traced
            layer_cls = nn.remat(AttentionalPropagation,
                                 static_argnums=(4, 6))
        for i in range(self.num_layers):
            is_cross = i % 2 == 1
            layer = layer_cls(
                self.d_model, self.num_heads, fused=self.fused,
                use_running_average=self.use_running_average,
                dtype=self.dtype, name=f"layer_{i}")
            src = jnp.flip(x, axis=0) if is_cross else x
            if self.remat:
                # positional call: lifted remat rejects kwargs; None args
                # pass through as empty pytrees
                x = x + layer(x, src, mask2, (0,), groups, num_groups)
            else:
                x = x + layer(x, src, mask2, group_axes=(0,),
                              groups=groups, num_groups=num_groups)
        return x[0], x[1]
