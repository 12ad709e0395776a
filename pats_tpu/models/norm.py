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


def np_prod(shape) -> int:
    out = 1
    for s in shape:
        out *= int(s)
    return out


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
                 group_axes: tuple = (),
                 groups: Optional[jnp.ndarray] = None,
                 num_groups: int = 1):
        """group_axes: leading axes whose indices keep SEPARATE statistics
        (e.g. the image axis when both images of a pair are stacked but the
        reference computes per-image BN statistics).

        groups/num_groups: per-ITEM statistics groups over the axis right
        after ``group_axes`` — the flat-batch equivalent of vmapping the
        module over image pairs.  ``groups`` is an int32 (N,) pair id for
        x of shape group_axes + (N, ...spatial, C); statistics are
        computed per (group_axes index, pair) via one-hot segment
        reductions, keeping every tensor FLAT (rank <= 4) so XLA never
        materializes the rank-5 layout copies the vmapped form causes.
        """
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,)))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,)))
        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
        elif groups is not None:
            assert group_axes == tuple(range(len(group_axes)))
            nlead = len(group_axes)
            lead = x.shape[:nlead]
            N = x.shape[nlead]
            spatial = x.shape[nlead + 1:-1]
            xf = x.astype(jnp.float32).reshape(-1, N,
                                               int(np_prod(spatial)), c)
            if mask is None:
                w = jnp.ones(xf.shape[:3], jnp.float32)
            else:
                m = jnp.asarray(mask, jnp.float32)
                m = m.reshape(m.shape + (1,) * (x.ndim - 1 - m.ndim))
                w = jnp.broadcast_to(m, x.shape[:-1]).reshape(xf.shape[:3])
            onehot = jax.nn.one_hot(groups, num_groups,
                                    dtype=jnp.float32)          # (N, P)
            s1 = jnp.einsum("lnsc,lns,np->lpc", xf, w, onehot)
            s2 = jnp.einsum("lnsc,lnsc,lns,np->lpc", xf, xf, w, onehot)
            cnt = jnp.einsum("lns,np->lp", w, onehot)
            denom = jnp.maximum(cnt, 1.0)[..., None]
            mean_g = s1 / denom                                  # (L, P, C)
            var_g = s2 / denom - jnp.square(mean_g)
            mean = jnp.einsum("np,lpc->lnc", onehot, mean_g)
            var = jnp.einsum("np,lpc->lnc", onehot, var_g)
            shape = lead + (N,) + (1,) * len(spatial) + (c,)
            mean = mean.reshape(shape)
            var = var.reshape(shape)
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
        # EMA of the POOLED (masked) statistics in train mode, so
        # framework-trained checkpoints carry usable running stats for
        # running-average inference (round-3: without this, trained
        # cascades evaluated with init stats — mean 0 / var 1 — and the
        # fine level rejected every cell at eval).  Pooled over ALL
        # non-channel axes: the single (c,) buffer is exactly what
        # running-average mode consumes.
        if (not self.use_running_average and not self.is_initializing()
                and self.is_mutable_collection("batch_stats")):
            xf = x.astype(jnp.float32)
            axes = tuple(range(x.ndim - 1))
            if mask is None:
                cnt = jnp.float32(xf.size // xf.shape[-1])
                pm = jnp.mean(xf, axis=axes)
                pv = jnp.mean(jnp.square(xf), axis=axes) - jnp.square(pm)
            else:
                m = jnp.asarray(mask, jnp.float32)
                m = m.reshape(m.shape + (1,) * (x.ndim - 1 - m.ndim))
                w = jnp.broadcast_to(m, x.shape[:-1])[..., None]
                cnt = jnp.sum(w)
                denom = jnp.maximum(cnt, 1.0)
                pm = jnp.sum(xf * w, axis=axes) / denom
                pv = (jnp.sum(jnp.square(xf) * w, axis=axes) / denom
                      - jnp.square(pm))
            # torch EMAs the UNBIASED batch variance into running_var
            # (Bessel), and a fully-dead batch must not drag the carried
            # stats toward mean 0 / var 0 (advisor r3)
            pv = pv * cnt / jnp.maximum(cnt - 1.0, 1.0)
            mom = self.momentum
            new_mean = mom * ra_mean.value + (1.0 - mom) * pm
            new_var = mom * ra_var.value + (1.0 - mom) * pv
            live = cnt > 0
            ra_mean.value = jnp.where(live, new_mean, ra_mean.value)
            ra_var.value = jnp.where(live, new_var, ra_var.value)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        return y * scale + bias
