"""Synthetic two-depth pair dataset: GT geometry + pose-AUC harness.

Validates (1) that the rendered scene's K/T ground truth is exactly
consistent with its analytic correspondences (epipolar residual ~ 0,
recovered pose error ~ 0 — possible only because two depth layers make
the essential matrix well-posed), and (2) that the full evaluate()
protocol (pats_tpu/evaluate.py, reference /root/reference/evaluate.py:
21-39 semantics) scores an oracle matcher at AUC ~ 100 on this dataset.
"""

import numpy as np
import pytest

from pats_tpu.data.synthetic_pairs import SyntheticPlanePairs
from pats_tpu.utils.metrics import compute_pose_error, epipolar_errors


@pytest.fixture(scope="module")
def ds():
    return SyntheticPlanePairs(n_pairs=3, width=320, height=240,
                               fx=200.0, seed=4)


def test_gt_epipolar_consistency(ds):
    for i in range(len(ds)):
        d = ds[i]
        kp0, kp1 = ds.gt_correspondences(i)
        assert len(kp0) >= 30
        epi = epipolar_errors(kp0, kp1, d["K0"], d["K1"], d["T0"], d["T1"])
        assert np.nanmax(np.abs(epi)) < 1e-3


def test_gt_pose_recovery(ds):
    for i in range(len(ds)):
        d = ds[i]
        kp0, kp1 = ds.gt_correspondences(i)
        err_R, err_t = compute_pose_error(kp0, kp1, d["K0"], d["K1"],
                                          d["T0"], d["T1"])
        assert err_R < 0.5 and err_t < 1.0, (i, err_R, err_t)


def test_render_has_both_layers(ds):
    d = ds[0]
    for k in ("image0", "image1"):
        img = d[k]
        assert img.dtype == np.uint8 and img.shape == (240, 320, 3)
        assert img.std() > 10.0          # textured, not blank


def test_evaluate_oracle_auc(ds):
    """The full evaluate() loop scores an oracle matcher ~ perfectly."""
    from pats_tpu.config import PATSConfig
    from pats_tpu.evaluate import evaluate

    class Oracle:
        config = PATSConfig()

        def __init__(self):
            self._i = 0

        def match(self, img0, img1):
            kp0, kp1 = ds.gt_correspondences(self._i)
            self._i += 1
            return kp0, kp1

    metrics = evaluate(Oracle(), ds, scale_factor=1.0, threshold=0.25,
                       progress=False, batch_size=1)
    assert metrics["auc@5"] > 0.9, metrics
    assert metrics["err_median"] < 1.0


def test_build_dataset_option_string():
    import dataclasses

    from pats_tpu.config import PATSConfig
    from pats_tpu.evaluate import build_dataset

    cfg = PATSConfig()
    cfg = dataclasses.replace(cfg, eval=dataclasses.replace(
        cfg.eval, dataset="SyntheticPlane",
        pairs_path="n_pairs=2 width=320 height=240 baseline_deg=8.5"))
    got = build_dataset(cfg)
    assert len(got) == 2 and got.wh == (320, 240)
    assert got.baseline_deg == 8.5


def test_texture_families_distinct_and_renderable():
    """waves (held-out) and mixed (training) families render valid
    uint8 textures with family-distinct statistics, and the eval option
    string accepts texture= (configs/synthetic_waves3.yaml)."""
    import numpy as np

    from pats_tpu.data.synthetic_pairs import (_TEXTURE_FAMILIES,
                                               SyntheticPlanePairs)

    rng = np.random.default_rng(3)
    imgs = {}
    for name, fn in _TEXTURE_FAMILIES.items():
        t = fn(rng, 256)
        assert t.shape == (256, 256, 3) and t.dtype == np.uint8, name
        assert t.std() > 20, (name, t.std())  # textured, not flat
        imgs[name] = t

    ds = SyntheticPlanePairs(n_pairs=1, width=128, height=128,
                             texture="waves", seed=1)
    it = ds[0]
    assert it["image0"].shape == (128, 128, 3)


def test_mixed_texture_plane_example():
    """--texture mixed plumbs through plane_pair_example unchanged in
    label semantics (labels stay exact for whatever texture renders)."""
    import numpy as np

    from pats_tpu.data.synthetic_pairs import plane_pair_example

    ex = plane_pair_example(np.random.default_rng(5), 128, 0, 12.0,
                            "mixed")
    assert ex["left"].shape == (128, 128, 3)
    raw = ex["labels_raw"]
    inside = raw[:, 0] > -0.5
    assert inside.any()          # some positives exist
