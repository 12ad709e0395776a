"""Resampling kernels vs torch ground truth.

The reference's resampling building blocks are torch ops
(first_layer.py:57-67, third_layer.py:70-73, second_layer.py:53) and the C++
``tensor_resize`` (setup/library.cpp:47-66 = crop + upsample_bilinear2d
align_corners=True).  torch-cpu is available in CI, so parity is checked
bit-for-bit-ish against the very ops the reference calls.
"""

import numpy as np
import torch
import torch.nn.functional as F
import jax.numpy as jnp

from pats_tpu.ops import (
    resize_bilinear_align_corners,
    resize_bilinear_half_pixel,
    crop_resize_batch,
    avg_pool_2x2_pad,
)


def test_align_corners_upsample_matches_torch(rng):
    x = rng.normal(size=(2, 5, 7, 3)).astype(np.float32)   # NHWC
    got = np.asarray(resize_bilinear_align_corners(
        jnp.asarray(x), (15, 20), h_axis=1, w_axis=2))
    want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                         size=(15, 20), mode="bilinear",
                         align_corners=True).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_half_pixel_resize_matches_torch(rng):
    x = rng.normal(size=(2, 16, 24, 3)).astype(np.float32)
    for out in [(8, 12), (32, 48), (11, 17)]:
        got = np.asarray(resize_bilinear_half_pixel(
            jnp.asarray(x), out, h_axis=1, w_axis=2))
        want = F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2),
                             size=out, mode="bilinear",
                             align_corners=False).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_crop_resize_matches_reference_native_op(rng):
    """Parity with the semantics of setup/library.cpp:47-66: crop
    image[r0:r1, c0:c1+1] then bilinear-resize (align_corners=True) to 96."""
    H, W, C = 100, 120, 3
    img = rng.normal(size=(H, W, C)).astype(np.float32)
    boxes = []
    for _ in range(8):
        r0 = int(rng.integers(0, H - 40))
        c0 = int(rng.integers(0, W - 40))
        r1 = r0 + int(rng.integers(10, 40))
        c1 = c0 + int(rng.integers(10, 40))
        boxes.append([r0, r1, c0, c1])
    boxes = np.array(boxes, np.int32)

    got = np.asarray(crop_resize_batch(jnp.asarray(img), jnp.asarray(boxes),
                                       out_size=96))
    t = torch.from_numpy(img).permute(2, 0, 1)[None]        # (1, C, H, W)
    for i, (r0, r1, c0, c1) in enumerate(boxes):
        crop = t[:, :, r0:r1, c0:c1 + 1]
        want = F.interpolate(crop, size=(96, 96), mode="bilinear",
                             align_corners=True)[0].permute(1, 2, 0).numpy()
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-4)


def test_avg_pool_matches_torch(rng):
    x = rng.normal(size=(2, 48, 48, 4)).astype(np.float32)
    got = np.asarray(avg_pool_2x2_pad(jnp.asarray(x)))
    want = torch.nn.AvgPool2d(2, stride=1, padding=1)(
        torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).numpy()
    assert got.shape == want.shape == (2, 49, 49, 4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
