"""MegaDepth pairs + camera database (reference datasets/megadepth.py).

Test path: pairs from ``megadepth_test.npy``, camera DB parsed from the
per-scene img_cam.txt tree (utils/utils.py:252-313), crop-resize to
640x480 (or the long-side-1600 ``aug_resolution`` path).  Depth maps (.h5)
feed the training label generator (pats_tpu.train.labels).
"""

from __future__ import annotations

import os
from typing import Dict, Iterator, Optional

import numpy as np

from pats_tpu.utils.geometry import (
    align32_up,
    crop_resize_image,
    pad_to,
    rescale_intrinsics,
)


def load_camera_db(pairs_path: str, data_path: str, is_train: bool = False
                   ) -> Dict[str, dict]:
    """Parse the MegaDepth img_cam.txt tree (utils/utils.py:252-313).

    Returns {image_path: {K (4x4 resized-to-640x480), P (4x4 world-to-cam)}}.
    """
    scene_file = os.path.join(
        pairs_path,
        "megadepth_train_scenes.txt" if is_train
        else "megadepth_validation_scenes_full.txt")
    images: Dict[str, dict] = {}
    with open(scene_file) as f:
        scenes = [ln.rstrip("\n") for ln in f]
    for scene in scenes:
        scene_dir = pairs_path + scene
        if not os.path.exists(scene_dir):
            continue
        for dense in sorted(os.listdir(scene_dir)):
            cam_path = os.path.join(scene_dir, dense, "img_cam.txt")
            cam2_path = os.path.join(scene_dir, dense, "img_cam_new.txt")
            with open(cam_path) as fid, open(cam2_path) as fid2:
                for line, line2 in zip(fid, fid2):
                    line = line.strip()
                    line2 = line2.strip()
                    if not line or line[0] == "#":
                        continue
                    e = line.split()
                    e2 = line2.split()
                    name = e[0]
                    img_path = os.path.join(
                        data_path + scene + "/" + dense + "/imgs", name)
                    w, h = int(e2[1]), int(e2[2])
                    fx, fy, cx, cy = (float(e2[3]), float(e2[4]),
                                      float(e2[5]), float(e2[6]))
                    P = np.concatenate(
                        [np.asarray(e[7:19], float).reshape(3, 4),
                         np.array([[0, 0, 0, 1.0]])], axis=0)
                    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
                    K4 = np.identity(4)
                    K4[:3, :3] = rescale_intrinsics(K, (w, h), (640, 480))
                    images[img_path] = {"K": K4, "P": P, "wh": (w, h)}
    return images


class MegaDepthPairs:
    def __init__(self, data_path: str, pairs_path: str, is_train: bool = False,
                 aug_resolution: bool = False, with_depth: bool = False,
                 seed: Optional[int] = None):
        if is_train:
            pairs = np.load(os.path.join(pairs_path, "megadepth_train.npy"))
            rng = np.random.default_rng(seed)
            pairs = pairs[rng.permutation(len(pairs))]
            # the reference samples 5% of the training pairs per epoch
            self.pairs = pairs[:int(0.05 * len(pairs))]
        else:
            self.pairs = np.load(os.path.join(pairs_path, "megadepth_test.npy"))
        self.cameras = load_camera_db(pairs_path, data_path, is_train)
        self.data_path = data_path
        self.aug_resolution = aug_resolution
        self.with_depth = with_depth

    def __len__(self):
        return len(self.pairs)

    def _load_depth(self, path: str, shape) -> np.ndarray:
        import cv2
        import h5py

        d = np.asarray(h5py.File(path, "r")["depth"], dtype=float)
        h, w = d.shape
        w_new, h_new = shape
        if w / w_new < h / h_new:
            gap = int((h - w / w_new * h_new) / 2)
            d = d[gap:h - gap, :]
        else:
            gap = int((w - h / h_new * w_new) / 2)
            d = d[:, gap:w - gap]
        return cv2.resize(d, (int(w_new), int(h_new)),
                          interpolation=cv2.INTER_LINEAR)

    def __getitem__(self, item: int) -> Dict[str, np.ndarray]:
        import cv2

        pair = self.pairs[item]
        scene = pair[0]
        left_name, right_name = pair[3], pair[2]
        left_path = self.data_path + scene + "/imgs/" + left_name
        right_path = self.data_path + scene + "/imgs/" + right_name
        left = cv2.imread(left_path)[:, :, [2, 1, 0]]
        right = cv2.imread(right_path)[:, :, [2, 1, 0]]

        if self.aug_resolution:
            def prep(img):
                h, w = img.shape[:2]
                s = 1600.0 / max(h, w)
                img = crop_resize_image(img, (int(w * s), int(h * s)))
                return img[:img.shape[0] // 32 * 32, :img.shape[1] // 32 * 32]

            left, right = prep(left), prep(right)
            H = max(left.shape[0], right.shape[0])
            W = max(left.shape[1], right.shape[1])
            left, right = pad_to(left, H, W), pad_to(right, H, W)
        else:
            left = crop_resize_image(left, (640, 480))
            right = crop_resize_image(right, (640, 480))

        lcam = self.cameras[left_path]
        rcam = self.cameras[right_path]
        data = {
            "image0": left, "image1": right,
            "K0": lcam["K"][:3, :3].astype(np.float32),
            "K1": rcam["K"][:3, :3].astype(np.float32),
            "T0": lcam["P"].astype(np.float32),
            "T1": rcam["P"].astype(np.float32),
        }
        if self.with_depth:
            ldp = (self.data_path + scene + "/depths/"
                   + left_name.split(".")[0] + ".h5")
            rdp = (self.data_path + scene + "/depths/"
                   + right_name.split(".")[0] + ".h5")
            data["depth0"] = self._load_depth(ldp, (640, 480))
            data["depth1"] = self._load_depth(rdp, (640, 480))
        return data

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        for i in range(len(self)):
            yield self[i]
