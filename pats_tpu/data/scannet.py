"""ScanNet-1500 evaluation pairs (reference datasets/scannet.py:12-66).

Per pair: long-side-640 resize, zero-pad to 640x480, intrinsics rescale.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

from pats_tpu.data.pairs import parse_pair_line
from pats_tpu.utils.geometry import crop_resize_image, pad_to, rescale_intrinsics


class ScannetPairs:
    def __init__(self, data_path: str, pairs_path: str):
        self.data_path = data_path
        with open(pairs_path) as f:
            self.lines = [ln for ln in f.read().splitlines() if ln.strip()]

    def __len__(self):
        return len(self.lines)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        import cv2

        rec = parse_pair_line(self.lines[index])
        name0 = rec.name0.split("/")
        name1 = rec.name1.split("/")
        scene = name0[1]
        base = f"{self.data_path}scans/{scene}/color/"
        path0 = base + f"{int(name0[3][6:12])}.jpg"
        path1 = base + f"{int(name1[3][6:12])}.jpg"

        def load(path, K):
            img = cv2.imread(path)[:, :, [2, 1, 0]]
            h, w = img.shape[:2]
            s = 640 / max(h, w)
            new_w, new_h = int(w * s), int(h * s)
            img = crop_resize_image(img, (new_w, new_h))
            K = rescale_intrinsics(K, (w, h), (new_w, new_h))
            return pad_to(img, 480, 640), K

        img0, K0 = load(path0, rec.K0)
        img1, K1 = load(path1, rec.K1)
        return {
            "image0": img0, "image1": img1,
            "K0": K0.astype(np.float32), "K1": K1.astype(np.float32),
            "T0": np.eye(4, dtype=np.float32),
            "T1": rec.T_0to1.astype(np.float32),
        }

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for i in range(len(self)):
            yield self[i]
