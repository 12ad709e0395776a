"""Video demo CLI: match frame 0 against every later frame and write
colored-keypoint visualizations (equivalent of reference demo.py:53-263).

    python -m pats_tpu.demo configs/test_demo.yaml --out results/
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def make_colorwheel() -> np.ndarray:
    """Optical-flow color wheel (55 hues; standard Baker et al. layout,
    as used by reference demo.py:82-130)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[0:RY, 0] = 255
    wheel[0:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col:col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col:col + YG, 1] = 255
    col += YG
    wheel[col:col + GC, 1] = 255
    wheel[col:col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col:col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col:col + CB, 2] = 255
    col += CB
    wheel[col:col + BM, 2] = 255
    wheel[col:col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col:col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col:col + MR, 0] = 255
    return wheel


def flow_colors(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Map normalized flow vectors to RGB via the color wheel."""
    wheel = make_colorwheel()
    ncols = wheel.shape[0]
    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    img = np.zeros(u.shape + (3,), np.uint8)
    for i in range(3):
        c0 = wheel[k0, i] / 255.0
        c1 = wheel[k1, i] / 255.0
        col = (1 - f) * c0 + f * c1
        col = np.where(rad <= 1, 1 - rad * (1 - col), col * 0.75)
        img[..., i] = np.floor(255 * col)
    return img


def keypoint_colors(kpts: np.ndarray, shape) -> np.ndarray:
    """Color keypoints by their normalized position (reference kp_color)."""
    H, W = shape
    u = (kpts[:, 1] - W / 2) / (W / 2)
    v = (kpts[:, 0] - H / 2) / (H / 2)
    return flow_colors(u, v)


def draw_matches(img0: np.ndarray, img1: np.ndarray, ml: np.ndarray,
                 mr: np.ndarray) -> np.ndarray:
    """Side-by-side visualization: keypoints colored by position in img0,
    matched keypoints in img1 with the same color."""
    import cv2

    colors = keypoint_colors(ml, img0.shape[:2])
    canvas = np.concatenate([img0, img1], axis=1).copy()
    off = img0.shape[1]
    for (r0, c0), (r1, c1), col in zip(ml, mr, colors):
        col = tuple(int(x) for x in col)
        cv2.circle(canvas, (int(c0), int(r0)), 1, col, -1)
        cv2.circle(canvas, (int(c1) + off, int(r1)), 1, col, -1)
    return canvas


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    parser.add_argument("--out", type=str, default="results")
    parser.add_argument("--torch-checkpoints", nargs=3, default=None)
    parser.add_argument("--long-side", type=int, default=1600,
                        help="frame resize long side (reference demo: 1600)")
    parser.add_argument("--platform", type=str, default=None,
                        choices=("cpu", "tpu", "axon"),
                        help="force the JAX platform (see evaluate.py)")
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import cv2

    from pats_tpu.config import load_config, reference_yaml_to_config
    from pats_tpu.data.video import VideoFrames
    from pats_tpu.matcher import Matcher

    try:
        cfg = load_config(args.config)
    except KeyError:
        cfg = reference_yaml_to_config(args.config)

    if args.torch_checkpoints:
        matcher = Matcher.from_torch_checkpoints(cfg, *args.torch_checkpoints)
    else:
        matcher = Matcher(cfg, seed=cfg.eval.seed)

    os.makedirs(args.out, exist_ok=True)
    frames = VideoFrames(cfg.eval.data_path, long_side=args.long_side)
    for data in frames:
        ml, mr = matcher.match(data["image0"], data["image1"])
        vis = draw_matches(data["image0"], data["image1"], ml, mr)
        out_path = os.path.join(args.out, data["name"])
        cv2.imwrite(out_path, vis[:, :, ::-1])
        print(f"{data['name']}: {len(ml)} matches -> {out_path}")


if __name__ == "__main__":
    main()
