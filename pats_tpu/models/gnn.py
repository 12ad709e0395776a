"""Attentional GNN building blocks (token-last layout, MXU-friendly).

TPU-native re-design of reference models/modules.py:58-134:

- ``MLPStack``            <- MLP (1x1 conv stack + BN + ReLU)
- ``KeypointEncoder``     <- KeypointEncoder (position MLP)
- ``MultiHeadAttention``  <- MultiHeadedAttention (full softmax attention)
- ``AttentionalPropagation`` / ``AttentionalGNN`` <- same names

Layout: tokens are (..., N, C) so every projection is a plain dense matmul
on the MXU and attention is two batched einsums.  The reference's
channel-first conv1d layout maps 1:1 (the converter transposes kernels).

Head split convention: the reference splits the channel dim as
(head_dim, num_heads) - channel c belongs to head c % num_heads
(modules.py:102 ``view(b, self.dim, self.num_heads, -1)``).  Preserved here
so converted weights are bit-compatible.

Attention scores are scaled by sqrt(head_dim) (modules.py:84-86).

All BatchNorms are MaskedBatchNorm so the level-3 batch-statistics mode
(models/pats.py:112-118 quirk) can exclude dead fixed-capacity slots; the
optional ``mask`` argument is a per-sample alive mask over the leading dims.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pats_tpu.models.norm import MaskedBatchNorm


class MLPStack(nn.Module):
    """Dense stack with BatchNorm + ReLU between layers (not after last).

    Equivalent to reference MLP() (modules.py:58-69): per-token 1x1 convs.
    Input (..., N, C_in) -> (..., N, features[-1]).  BatchNorm normalizes
    each channel over all leading/token dims, matching torch BatchNorm1d
    on (B, C, N).
    """

    features: Sequence[int]
    use_bn: bool = True
    use_running_average: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        n = len(self.features)
        for i, feat in enumerate(self.features):
            x = nn.Dense(feat, dtype=self.dtype, name=f"dense_{i}")(x)
            if i < n - 1:
                if self.use_bn:
                    x = MaskedBatchNorm(
                        use_running_average=self.use_running_average,
                        name=f"bn_{i}")(x, mask)
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


class MultiHeadAttention(nn.Module):
    """Full softmax multi-head attention (modules.py:84-105)."""

    d_model: int
    num_heads: int = 4
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, query, key, value):
        # (..., N, D) tokens
        dh = self.d_model // self.num_heads
        q = nn.Dense(self.d_model, dtype=self.dtype, name="proj_q")(query)
        k = nn.Dense(self.d_model, dtype=self.dtype, name="proj_k")(key)
        v = nn.Dense(self.d_model, dtype=self.dtype, name="proj_v")(value)

        def split(x):
            # channel c -> (head_dim index c // H, head index c % H), i.e.
            # reshape (..., N, dh, H) to preserve the reference's split
            return x.reshape(x.shape[:-1] + (dh, self.num_heads))

        q, k, v = split(q), split(k), split(v)
        scores = jnp.einsum("...ndh,...mdh->...hnm", q, k) / jnp.sqrt(
            jnp.asarray(dh, q.dtype))
        prob = nn.softmax(scores, axis=-1)
        out = jnp.einsum("...hnm,...mdh->...ndh", prob, v)
        out = out.reshape(out.shape[:-2] + (self.d_model,))
        return nn.Dense(self.d_model, dtype=self.dtype, name="merge")(out)


class AttentionalPropagation(nn.Module):
    """attention message + MLP on [x, message] (modules.py:107-116)."""

    d_model: int
    num_heads: int = 4
    use_running_average: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, source, mask: Optional[jnp.ndarray] = None):
        message = MultiHeadAttention(self.d_model, self.num_heads,
                                     dtype=self.dtype, name="attn")(
            x, source, source)
        y = jnp.concatenate([x, message], axis=-1)
        return MLPStack((self.d_model * 2, self.d_model),
                        use_running_average=self.use_running_average,
                        dtype=self.dtype, name="mlp")(y, mask)


class AttentionalGNN(nn.Module):
    """Alternating self/cross attentional refinement of two token sets.

    Equivalent to reference AttentionalGNN (modules.py:118-134) with layers
    ['self', 'cross'] * (num_layers // 2).  Each layer applies the SAME
    weights to both images; residual update desc += delta.
    """

    d_model: int
    num_layers: int               # must be even (self/cross pairs)
    num_heads: int = 4
    use_running_average: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, desc0, desc1,
                 mask: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert self.num_layers % 2 == 0
        for i in range(self.num_layers):
            is_cross = i % 2 == 1
            layer = AttentionalPropagation(
                self.d_model, self.num_heads,
                use_running_average=self.use_running_average,
                dtype=self.dtype, name=f"layer_{i}")
            src0, src1 = (desc1, desc0) if is_cross else (desc0, desc1)
            # shared weights, two separate calls per image - matching the
            # reference's per-image BatchNorm statistics in batch-stats mode
            delta0 = layer(desc0, src0, mask)
            delta1 = layer(desc1, src1, mask)
            desc0 = desc0 + delta0
            desc1 = desc1 + delta1
        return desc0, desc1
