"""Bilinear resampling kernels.

Replaces three resampling paths of the reference with batched, static-shape
device code:

- ``resize_bilinear_align_corners``: torch ``nn.Upsample(align_corners=True)``
  used for the level-1 pyramid feature fusion (first_layer.py:64-67).
- ``resize_bilinear_half_pixel``: torch ``F.interpolate(align_corners=False)``
  used by the level-3 FPN (third_layer.py:70-73) and the input pyramid
  (first_layer.py:57-61, non-antialiased).
- ``crop_resize_batch``: the ONLY native op of the reference - the C++
  ``tensor_resize`` extension (setup/library.cpp:47-66), a serial host loop
  issuing one crop + ``upsample_bilinear2d(align_corners=True)`` per box.
  Here it is a single batched gather + lerp over a fixed-capacity box array -
  no host loop, no dynamic shapes, fully fused by XLA.
- ``avg_pool_2x2_pad``: torch ``AvgPool2d(2, stride=1, padding=1)`` with
  count_include_pad=True (second_layer.py:53), used before the grid gather.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# re-exported for callers that need the lerp helpers
__all__ = [
    "resize_bilinear_align_corners",
    "resize_bilinear_half_pixel",
    "crop_resize_batch",
    "avg_pool_2x2_pad",
]


def _align_corners_coords(out_size: int, in_size: int, dtype=jnp.float32):
    """Source sampling coordinates for align_corners=True resizing."""
    if out_size == 1:
        return jnp.zeros((1,), dtype)
    scale = (in_size - 1) / (out_size - 1)
    return jnp.arange(out_size, dtype=dtype) * scale


def _half_pixel_coords(out_size: int, in_size: int, dtype=jnp.float32):
    """Source sampling coordinates for half-pixel (align_corners=False)."""
    scale = in_size / out_size
    coords = (jnp.arange(out_size, dtype=dtype) + 0.5) * scale - 0.5
    return coords


def _lerp_axis(x: jnp.ndarray, coords: jnp.ndarray, axis: int) -> jnp.ndarray:
    """1-D bilinear interpolation of `x` along `axis` at float `coords`."""
    in_size = x.shape[axis]
    lo = jnp.clip(jnp.floor(coords), 0, in_size - 1)
    hi = jnp.clip(lo + 1, 0, in_size - 1)
    w = jnp.clip(coords - lo, 0.0, 1.0)
    lo = lo.astype(jnp.int32)
    hi = hi.astype(jnp.int32)
    x_lo = jnp.take(x, lo, axis=axis)
    x_hi = jnp.take(x, hi, axis=axis)
    shape = [1] * x.ndim
    shape[axis] = -1
    w = w.reshape(shape)
    return x_lo * (1.0 - w) + x_hi * w


def resize_bilinear_align_corners(x: jnp.ndarray, out_hw, h_axis: int = -2,
                                  w_axis: int = -1) -> jnp.ndarray:
    """Bilinear resize with align_corners=True (separable lerp)."""
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    rows = _align_corners_coords(out_hw[0], x.shape[h_axis], x.dtype)
    cols = _align_corners_coords(out_hw[1], x.shape[w_axis], x.dtype)
    x = _lerp_axis(x, rows, h_axis)
    x = _lerp_axis(x, cols, w_axis)
    return x


def resize_bilinear_half_pixel(x: jnp.ndarray, out_hw, h_axis: int = -2,
                               w_axis: int = -1) -> jnp.ndarray:
    """Bilinear resize with half-pixel centers (align_corners=False),
    NO antialiasing - matches torch ``F.interpolate(mode='bilinear')``."""
    h_axis = h_axis % x.ndim
    w_axis = w_axis % x.ndim
    rows = _half_pixel_coords(out_hw[0], x.shape[h_axis], x.dtype)
    cols = _half_pixel_coords(out_hw[1], x.shape[w_axis], x.dtype)
    x = _lerp_axis(x, rows, h_axis)
    x = _lerp_axis(x, cols, w_axis)
    return x


def crop_resize_batch(image: jnp.ndarray, boxes: jnp.ndarray,
                      out_size: int = 96) -> jnp.ndarray:
    """Crop N boxes from one image and resize each to (out_size, out_size).

    Equivalent of the reference's native ``tensor_resize`` op
    (setup/library.cpp:47-66): for box [r0, r1, c0, c1] it crops
    ``image[r0:r1, c0:c1+1]`` (note: rows exclusive of r1, cols inclusive of
    c1, exactly as the C++ slice does) and bilinearly resizes with
    align_corners=True.

    Args:
      image: (H, W, C) source image (already padded as the caller requires).
      boxes: (N, 4) int32 [row0, row1, col0, col1] boxes.
      out_size: output side length (the reference hardcodes 96).

    Returns:
      (N, out_size, out_size, C) resampled crops.

    TPU design: instead of a host loop over variable-size crops (or slow
    per-element gathers), the separable bilinear interpolation is expressed
    as two batched matmuls with 2-nonzero-per-row sampling matrices - the
    MXU eats this, and TPU gathers (orders of magnitude slower) are
    avoided entirely.  N is a static capacity; dead boxes simply resample
    garbage that downstream masks ignore.
    """
    H, W, C = image.shape
    N = boxes.shape[0]
    r0 = boxes[:, 0].astype(jnp.float32)
    r1 = boxes[:, 1].astype(jnp.float32)
    c0 = boxes[:, 2].astype(jnp.float32)
    c1 = boxes[:, 3].astype(jnp.float32)
    # crop extents as the C++ op slices them: rows r0..r1-1, cols c0..c1
    crop_h = r1 - r0          # number of rows = r1 - r0
    crop_w = c1 - c0 + 1.0    # number of cols = c1 - c0 + 1

    t = jnp.arange(out_size, dtype=jnp.float32) / float(out_size - 1)
    # align_corners=True: out j maps to (in_size - 1) * j / (out - 1)
    rows = r0[:, None] + (crop_h[:, None] - 1.0) * t[None, :]   # (N, S)
    cols = c0[:, None] + (crop_w[:, None] - 1.0) * t[None, :]   # (N, S)

    def sampling_matrix(coords, size):
        lo = jnp.clip(jnp.floor(coords), 0, size - 1)
        hi = jnp.clip(lo + 1, 0, size - 1)
        w = jnp.clip(coords - lo, 0.0, 1.0)
        iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, size), 2)
        mat = (jnp.where(lo[..., None].astype(jnp.int32) == iota,
                         (1.0 - w)[..., None], 0.0)
               + jnp.where(hi[..., None].astype(jnp.int32) == iota,
                           w[..., None], 0.0))
        return mat                                              # (N, S, size)

    rw = sampling_matrix(rows, H)                               # (N, S, H)
    cw = sampling_matrix(cols, W)                               # (N, S, W)
    # full-f32 contractions: the default TPU matmul precision (bf16
    # multiplies) would lose image LSBs
    tmp = jnp.einsum("ish,hwc->iswc", rw, image,
                     precision=jax.lax.Precision.HIGHEST)       # (N, S, W, C)
    out = jnp.einsum("iswc,ijw->isjc", tmp, cw,
                     precision=jax.lax.Precision.HIGHEST)       # (N, S, S, C)
    return out


def avg_pool_2x2_pad(x: jnp.ndarray) -> jnp.ndarray:
    """torch ``AvgPool2d(kernel=2, stride=1, padding=1)`` with
    count_include_pad=True on NHWC input: output is (H+1, W+1)."""
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    return (x[:, :-1, :-1] + x[:, :-1, 1:] + x[:, 1:, :-1] + x[:, 1:, 1:]) * 0.25
