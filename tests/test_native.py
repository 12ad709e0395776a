"""Native preprocessing library vs OpenCV parity (1-LSB tolerance: the
native path is float bilinear, cv2 is fixed-point)."""

import numpy as np
import pytest

from pats_tpu.data import native


@pytest.fixture(scope="module")
def lib_ok():
    if not native.native_available():
        pytest.skip("native toolchain unavailable")
    return True


def test_resize_matches_cv2(rng, lib_ok):
    import cv2

    img = rng.integers(0, 256, (123, 201, 3), dtype=np.uint8)
    got = native.resize_bilinear(img, 60, 100)
    want = cv2.resize(img, (100, 60), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1, diff.max()


def test_resize_upsample(rng, lib_ok):
    import cv2

    img = rng.integers(0, 256, (48, 64, 3), dtype=np.uint8)
    got = native.resize_bilinear(img, 97, 129)
    want = cv2.resize(img, (129, 97), interpolation=cv2.INTER_LINEAR)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1


def test_crop_resize_pad(rng, lib_ok):
    import cv2

    img = rng.integers(0, 256, (200, 300, 3), dtype=np.uint8)
    got = native.crop_resize_pad(img, 10, 20, 150, 250, 96, 128, 120, 160)
    crop = img[10:160, 20:270]
    want = np.zeros((120, 160, 3), np.uint8)
    want[:96, :128] = cv2.resize(crop, (128, 96),
                                 interpolation=cv2.INTER_LINEAR)
    diff = np.abs(got.astype(int) - want.astype(int))
    assert diff.max() <= 1
    assert (got[96:] == 0).all() and (got[:, 128:] == 0).all()
