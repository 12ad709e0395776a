"""Convolutional backbones (NHWC, MXU-friendly).

Re-implements the two ResNet variants of reference models/resnet.py:

- ``CoarseTrunk`` <- ResNet(BasicBlock, [2,2,2,2]) (resnet.py:82-136):
  full 4-stage ResNet-18-style trunk, stride 32, 512 channels, dropout 0.5
  after layer4 (eval: identity).  Used by the level-1 matcher.
- ``FineTrunk``   <- ResNet2(BasicBlock, [3,4,6,3]).forward2
  (resnet.py:149-200): conv1 + layer1 + layer2 of ResNet-34, returning the
  three multiscale feature maps (stride 2 / 4 / 8 with 64 / 64 / 128
  channels).  Used by levels 2 and 3 on the 96x96 crops.

All convolutions are NHWC with explicit torch-style padding so converted
torch weights reproduce identical outputs.  BatchNorms are MaskedBatchNorm
so the level-3 batch-statistics mode can exclude dead fixed-capacity crops
(the optional per-sample ``mask`` argument, shape (B,)).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pats_tpu.models.norm import MaskedBatchNorm


def _conv(features: int, kernel: int, stride: int = 1, name: str = None,
          dtype=None):
    pad = (kernel - 1) // 2
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(pad, pad), (pad, pad)], use_bias=False,
                   dtype=dtype, name=name)


def _max_pool_3x3_s2(x):
    """torch MaxPool2d(kernel=3, stride=2, padding=1) on NHWC."""
    return nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])


class BasicBlock(nn.Module):
    """Two 3x3 convs + BN with identity/projection shortcut
    (resnet.py:13-42)."""

    features: int
    stride: int = 1
    use_running_average: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 groups: Optional[jnp.ndarray] = None, num_groups: int = 1):
        ura = self.use_running_average
        residual = x
        y = _conv(self.features, 3, self.stride, "conv1", self.dtype)(x)
        y = MaskedBatchNorm(use_running_average=ura, name="bn1")(
            y, mask, (), groups, num_groups)
        y = nn.relu(y)
        y = _conv(self.features, 3, 1, "conv2", self.dtype)(y)
        y = MaskedBatchNorm(use_running_average=ura, name="bn2")(
            y, mask, (), groups, num_groups)
        if self.stride != 1 or x.shape[-1] != self.features:
            residual = _conv(self.features, 1, self.stride, "down_conv",
                             self.dtype)(x)
            residual = MaskedBatchNorm(use_running_average=ura,
                                       name="down_bn")(
                residual, mask, (), groups, num_groups)
        return nn.relu(y + residual)


class _Stage(nn.Module):
    features: int
    blocks: int
    stride: int = 1
    use_running_average: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 groups: Optional[jnp.ndarray] = None, num_groups: int = 1):
        for i in range(self.blocks):
            x = BasicBlock(self.features, self.stride if i == 0 else 1,
                           self.use_running_average, self.dtype,
                           name=f"block_{i}")(x, mask, groups, num_groups)
        return x


class CoarseTrunk(nn.Module):
    """ResNet-18-style stride-32 trunk for the level-1 matcher."""

    layers: Sequence[int] = (2, 2, 2, 2)
    use_running_average: bool = True
    deterministic: bool = True      # dropout off (inference)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None):
        ura = self.use_running_average
        x = _conv(64, 7, 2, "conv1", self.dtype)(x)
        x = MaskedBatchNorm(use_running_average=ura, name="bn1")(x, mask)
        x = nn.relu(x)
        x = _max_pool_3x3_s2(x)
        x = _Stage(64, self.layers[0], 1, ura, self.dtype, name="layer1")(x, mask)
        x = _Stage(128, self.layers[1], 2, ura, self.dtype, name="layer2")(x, mask)
        x = _Stage(256, self.layers[2], 2, ura, self.dtype, name="layer3")(x, mask)
        x = _Stage(512, self.layers[3], 2, ura, self.dtype, name="layer4")(x, mask)
        x = nn.Dropout(0.5, deterministic=self.deterministic)(x)
        return x


class FineTrunk(nn.Module):
    """Truncated ResNet-34 trunk for levels 2/3: returns the stride-2
    (64ch), stride-4 (64ch) and stride-8 (128ch) maps."""

    layers: Sequence[int] = (3, 4)
    use_running_average: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, mask: Optional[jnp.ndarray] = None,
                 groups: Optional[jnp.ndarray] = None, num_groups: int = 1
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        ura = self.use_running_average
        x0 = _conv(64, 7, 2, "conv1", self.dtype)(x)
        x0 = MaskedBatchNorm(use_running_average=ura, name="bn1")(
            x0, mask, (), groups, num_groups)
        x0 = nn.relu(x0)
        x1 = _max_pool_3x3_s2(x0)
        x1 = _Stage(64, self.layers[0], 1, ura, self.dtype, name="layer1")(
            x1, mask, groups, num_groups)
        x2 = _Stage(128, self.layers[1], 2, ura, self.dtype, name="layer2")(
            x1, mask, groups, num_groups)
        return x0, x1, x2
