"""Exact plane-pair training labels (data/synthetic_pairs.py).

Photometric oracle: a positive label means the view-1 pixel it names
shows the SAME texture content as its view-0 patch center, so the image
values must agree far better than chance.  Also checks the occlusion /
background / off-image classes are populated sanely.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from pats_tpu.data.synthetic_pairs import (SyntheticPlaneLabels,
                                           SyntheticPlanePairs,
                                           plane_pair_example)


def _bilinear(img, xy):
    x, y = xy[:, 0], xy[:, 1]
    x0, y0 = np.floor(x).astype(int), np.floor(y).astype(int)
    fx, fy = (x - x0)[:, None], (y - y0)[:, None]
    img = img.astype(np.float64)
    return ((1 - fx) * (1 - fy) * img[y0, x0]
            + fx * (1 - fy) * img[y0, x0 + 1]
            + (1 - fx) * fy * img[y0 + 1, x0]
            + fx * fy * img[y0 + 1, x0 + 1])


@pytest.mark.parametrize("patch", [32, 8])
def test_labels_photometric(patch):
    ds = SyntheticPlanePairs(n_pairs=2, width=320, height=256, fx=200.0,
                             seed=3)
    for idx in range(2):
        ex = ds[idx]
        raw = SyntheticPlaneLabels(ds, idx).level_labels(patch)
        h, w = ex["image0"].shape[:2]
        ys = (np.arange(h // patch) + 0.5) * patch
        xs = (np.arange(w // patch) + 0.5) * patch
        gx, gy = np.meshgrid(xs, ys)
        src = np.stack([gx.ravel(), gy.ravel()], axis=1)

        pos = raw[:, 0] > -0.5
        assert pos.sum() > 0.3 * len(raw), f"too few positives {pos.sum()}"
        v0 = _bilinear(ex["image0"], src[pos])
        v1 = _bilinear(ex["image1"], raw[pos, :2])
        err = np.abs(v0 - v1).mean(1)
        # matched texture: low photometric error for nearly all positives
        # (warp antialiasing leaves a few px of noise)
        assert np.median(err) < 12.0, np.median(err)
        assert (err < 40).mean() > 0.95, (err < 40).mean()

        # chance level: random pixels differ a lot on this texture
        rng = np.random.default_rng(0)
        rand = np.stack([rng.uniform(1, w - 2, pos.sum()),
                         rng.uniform(1, h - 2, pos.sum())], axis=1)
        base = np.abs(v0 - _bilinear(ex["image1"], rand)).mean(1)
        assert np.median(err) < np.median(base) / 3


def test_label_classes_and_example():
    rng = np.random.default_rng(5)
    ex = plane_pair_example(rng, 256, level=0)
    assert ex["left"].shape == (256, 256, 3)
    G = (256 // 32) ** 2
    assert ex["gt_pos"].shape == (G, 2)
    assert ex["labels_raw"].shape == (G, 3)
    cls = ex["gt_class"]
    assert (cls == 1).sum() > 0.3 * G
    # gt_pos is (row, col) in patch units for positives
    pos = cls == 1
    assert (ex["gt_pos"][pos] >= 0).all()
    assert (ex["gt_pos"][pos] <= 8).all()
    # fine-level labels from the same scene
    exf = plane_pair_example(np.random.default_rng(5), 256, level=1)
    assert exf["labels_raw"].shape == ((256 // 8) ** 2, 3)
