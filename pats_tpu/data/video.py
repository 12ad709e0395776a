"""Video/frame-sequence loader for the demo (reference demo.py:53-80).

Matches frame 0 against every later frame; long-side-1600 resize with
/32-aligned zero padding.
"""

from __future__ import annotations

import os
from typing import Dict, Iterator

import numpy as np

from pats_tpu.utils.geometry import align32_up, crop_resize_image, pad_to

_EXTS = (".png", ".jpg", ".jpeg", ".bmp")


class VideoFrames:
    def __init__(self, frames_dir: str, long_side: int = 1600):
        self.dir = frames_dir
        self.long_side = long_side
        self.names = sorted(n for n in os.listdir(frames_dir)
                            if n.lower().endswith(_EXTS))
        if not self.names:
            raise FileNotFoundError(f"no frames in {frames_dir}")

    def _load(self, name: str) -> np.ndarray:
        import cv2

        img = cv2.imread(os.path.join(self.dir, name))[:, :, [2, 1, 0]]
        h, w = img.shape[:2]
        s = self.long_side / max(h, w)
        img = crop_resize_image(img, (int(w * s), int(h * s)))
        return pad_to(img, align32_up(img.shape[0]), align32_up(img.shape[1]))

    def __len__(self):
        return len(self.names) - 1

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        first = self._load(self.names[0])
        for name in self.names[1:]:
            frame = self._load(name)
            H = max(first.shape[0], frame.shape[0])
            W = max(first.shape[1], frame.shape[1])
            yield {
                "image0": pad_to(first, H, W),
                "image1": pad_to(frame, H, W),
                "name": name,
            }
