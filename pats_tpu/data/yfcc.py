"""YFCC evaluation pairs (reference datasets/yfcc.py:11-71).

Per pair: long-side-1024 resize, /32-align pad both images to their common
max size, intrinsics rescale including principal-point shift.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

from pats_tpu.data.pairs import parse_pair_line
from pats_tpu.utils.geometry import (
    align32_up,
    crop_resize_image,
    pad_to,
    rescale_intrinsics,
)


class YfccPairs:
    def __init__(self, data_path: str, pairs_path: str):
        self.data_path = data_path
        with open(pairs_path) as f:
            self.lines = [ln for ln in f.read().splitlines() if ln.strip()]

    def __len__(self):
        return len(self.lines)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        import cv2

        rec = parse_pair_line(self.lines[index])

        def load(name, K):
            img = cv2.imread(self.data_path + name)[:, :, [2, 1, 0]]
            h, w = img.shape[:2]
            s = 1024 / max(h, w)
            new_w, new_h = int(w * s), int(h * s)
            img = crop_resize_image(img, (new_w, new_h))
            K = rescale_intrinsics(K, (w, h), (new_w, new_h))
            return img, K

        img0, K0 = load(rec.name0, rec.K0)
        img1, K1 = load(rec.name1, rec.K1)
        H = max(align32_up(img0.shape[0]), align32_up(img1.shape[0]))
        W = max(align32_up(img0.shape[1]), align32_up(img1.shape[1]))
        return {
            "image0": pad_to(img0, H, W), "image1": pad_to(img1, H, W),
            "K0": K0.astype(np.float32), "K1": K1.astype(np.float32),
            "T0": np.eye(4, dtype=np.float32),
            "T1": rec.T_0to1.astype(np.float32),
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for i in range(len(self)):
            yield self[i]
