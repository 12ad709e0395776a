"""Masked BatchNorm for batch-statistics inference.

The reference deliberately runs the level-3 refiner with BatchNorm in train
mode at inference when ``if_local=False`` (models/pats.py:112-118), so its
normalization statistics are computed over the *current batch of alive
patches*.  Under this framework's fixed-capacity batching the batch also
contains dead (masked) slots; a plain batch-stats BatchNorm would mix their
zeros into the statistics and break parity.  ``MaskedBatchNorm`` computes
weighted statistics over alive samples only.

Parameter/variable layout matches flax ``nn.BatchNorm`` (params: scale,
bias; batch_stats: mean, var) so the torch->jax converter treats both
uniformly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class MaskedBatchNorm(nn.Module):
    """BatchNorm over all non-channel axes with optional per-sample mask.

    Args (call):
      x: (..., C) activations.
      mask: optional boolean/float array broadcastable to x's non-channel
        dims (e.g. (B,) or (B, 1, 1)); samples with mask 0 are excluded
        from the statistics.  Ignored when use_running_average=True.
    """

    use_running_average: bool = True
    epsilon: float = 1e-5
    momentum: float = 0.9

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 group_axes: tuple = ()):
        """group_axes: leading axes whose indices keep SEPARATE statistics
        (e.g. the image axis when both images of a pair are stacked but the
        reference computes per-image BN statistics)."""
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,)))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(i for i in range(x.ndim - 1) if i not in group_axes)
            xf = x.astype(jnp.float32)
            if mask is None:
                mean = jnp.mean(xf, axis=axes, keepdims=True)
                var = (jnp.mean(jnp.square(xf), axis=axes, keepdims=True)
                       - jnp.square(mean))
            else:
                m = jnp.asarray(mask, jnp.float32)
                m = m.reshape(m.shape + (1,) * (x.ndim - 1 - m.ndim))
                w = jnp.broadcast_to(m, x.shape[:-1])[..., None]
                denom = jnp.maximum(jnp.sum(w, axis=axes, keepdims=True), 1.0)
                mean = jnp.sum(xf * w, axis=axes, keepdims=True) / denom
                var = (jnp.sum(jnp.square(xf) * w, axis=axes,
                               keepdims=True) / denom - jnp.square(mean))
            # torch uses biased variance for normalization in train mode
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias
