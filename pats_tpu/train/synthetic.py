"""Self-supervised training pairs from random homography warps.

Generates (image, warped image, GT labels) triples from ANY image source -
no MegaDepth download required to train.  The reference only hints at this
path through its dead homography-label code (utils/utils.py:807-927); here
it is a first-class pipeline feeding the per-level trainers.
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

from pats_tpu.train.labels import homography_labels, to_level_labels


def random_homography(rng: np.random.Generator, shape,
                      max_rotation: float = 0.25,
                      max_scale: float = 0.25,
                      max_translation: float = 0.1,
                      max_perspective: float = 2e-4) -> np.ndarray:
    """Random similarity + mild perspective homography about the center."""
    h, w = shape
    ang = rng.uniform(-max_rotation, max_rotation)
    s = np.exp(rng.uniform(-max_scale, max_scale))
    tx = rng.uniform(-max_translation, max_translation) * w
    ty = rng.uniform(-max_translation, max_translation) * h
    c, si = np.cos(ang), np.sin(ang)
    center = np.array([[1, 0, -w / 2], [0, 1, -h / 2], [0, 0, 1.0]])
    sim = np.array([[s * c, -s * si, tx], [s * si, s * c, ty], [0, 0, 1.0]])
    persp = np.eye(3)
    persp[2, 0] = rng.uniform(-max_perspective, max_perspective)
    persp[2, 1] = rng.uniform(-max_perspective, max_perspective)
    return np.linalg.inv(center) @ persp @ sim @ center


def warp_pair(image: np.ndarray, rng: np.random.Generator,
              level: int = 0, **h_kwargs) -> Dict[str, np.ndarray]:
    """Image -> (image, warp(image), labels) at the given cascade level."""
    import cv2

    h, w = image.shape[:2]
    H = random_homography(rng, (h, w), **h_kwargs)
    warped = cv2.warpPerspective(image, H, (w, h))
    patch = (32, 8, 2)[level]
    raw = homography_labels(H, (h, w), patch)
    gt_pos, gt_class = to_level_labels(
        np.concatenate([raw[:, :2], raw[:, 2:3]], axis=1), patch)
    return {
        "left": image.astype(np.float32),
        "right": warped.astype(np.float32),
        "gt_pos": gt_pos,
        "gt_class": gt_class,
        "labels_raw": raw.astype(np.float32),
        "H": H.astype(np.float32),
    }


def rotate_pair_augment(example: Dict[str, np.ndarray],
                        rng: np.random.Generator) -> Dict[str, np.ndarray]:
    """90-degree rotation augmentation of a training pair + its labels
    (equivalent of the reference transform_input, utils/utils.py:1856-1881,
    which rotates both images and remaps the label grid)."""
    k = int(rng.integers(0, 4))
    h0, w0 = example["left"].shape[:2]
    if k % 2 == 1 and h0 != w0:
        k -= 1          # odd rotations change non-square shapes; skip
    if k == 0:
        return example
    left = np.rot90(example["left"], k, axes=(0, 1)).copy()
    right = np.rot90(example["right"], k, axes=(0, 1)).copy()
    h, w = example["left"].shape[:2]
    patch = 32
    gh, gw = h // patch, w // patch
    pos = example["gt_pos"].reshape(gh, gw, 2).copy()
    cls = example["gt_class"].reshape(gh, gw).copy()
    for _ in range(k):
        # rot90 ccw: new (r, c) = (gw-1-c_old... rotate grids and remap
        # coordinates: (row, col) -> (n_cols_old - 1 - col, row) in grid
        # units; positions likewise in target-grid units
        pos = np.rot90(pos, 1, axes=(0, 1)).copy()
        cls = np.rot90(cls, 1, axes=(0, 1)).copy()
        gw_cells = w // patch
        new_pos = np.stack([gw_cells - pos[..., 1], pos[..., 0]], axis=-1)
        invalid = cls != 1
        new_pos[invalid] = -1.0
        pos = new_pos
        gh, gw = gw, gh
        h, w = w, h
    return {**example, "left": left, "right": right,
            "gt_pos": pos.reshape(-1, 2).astype(np.float32),
            "gt_class": cls.reshape(-1)}


def synthetic_batches(images, batch_size: int, level: int = 0,
                      seed: int = 18027, epochs: Optional[int] = None,
                      **h_kwargs) -> Iterator[Dict[str, np.ndarray]]:
    """Endless (or epochs-bounded) batches of warped pairs.

    ``images``: sequence of HWC uint8 arrays (all the same /32-aligned
    shape).
    """
    rng = np.random.default_rng(seed)
    epoch = 0
    while epochs is None or epoch < epochs:
        order = rng.permutation(len(images))
        buf = []
        for i in order:
            buf.append(warp_pair(np.asarray(images[i]), rng, level,
                                 **h_kwargs))
            if len(buf) == batch_size:
                yield {k: np.stack([b[k] for b in buf]) for k in buf[0]}
                buf = []
        epoch += 1
