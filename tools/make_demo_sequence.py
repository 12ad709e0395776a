"""Render a synthetic demo sequence with ground-truth trajectory.

A textured world plane (Z=0) viewed by a camera moving on a constant-
speed arc: every frame is an exact homography warp of the texture
(H = K [r1 r2 t] for plane points), so the geometry is analytically
perfect and the GT camera centers are known.  Feeds the demo-ATE
harness (slam/demo_ate.py) without needing any downloaded sequence —
the reference's demo protocol (demo.py:241-263) assumes a user video.

    python tools/make_demo_sequence.py --out /tmp/demo_seq --frames 24
    python -m pats_tpu.slam.demo_ate /tmp/demo_seq/frames \
        --K 400 400 320 240 --gt /tmp/demo_seq/gt_traj.txt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from pats_tpu.data.synthetic_pairs import (look_at, plane_texture,
                                           render_plane)


def camera_path(n: int, radius: float = 2.0, height: float = 4.0,
                arc: float = 1.2):
    """Constant-speed arc above the plane, always looking at the origin
    patch (constant baselines make unit-scale chaining exact up to one
    global scale)."""
    Rs, ts, cs = [], [], []
    for k in range(n):
        a = arc * k / max(n - 1, 1) - arc / 2
        c = np.array([radius * np.sin(a), radius * 0.3 * np.cos(a),
                      -height])
        R = look_at(c, np.array([0.0, 0.0, 0.0]))
        Rs.append(R)
        ts.append(-R @ c)
        cs.append(c)
    return np.stack(Rs), np.stack(ts), np.stack(cs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--fx", type=float, default=400.0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import cv2

    os.makedirs(os.path.join(args.out, "frames"), exist_ok=True)
    rng = np.random.default_rng(args.seed)
    tex = plane_texture(rng)
    K = np.array([[args.fx, 0, args.width / 2],
                  [0, args.fx, args.height / 2], [0, 0, 1.0]])
    Rs, ts, cs = camera_path(args.frames)
    with open(os.path.join(args.out, "gt_traj.txt"), "w") as f:
        for k in range(args.frames):
            frame = render_plane(tex, K, Rs[k], ts[k],
                           (args.width, args.height), plane_scale=0.006)
            cv2.imwrite(os.path.join(args.out, "frames", f"{k:04d}.png"),
                        frame)
            f.write(" ".join(f"{v:.6f}" for v in cs[k]) + "\n")
    print(f"wrote {args.frames} frames + gt_traj.txt to {args.out}")
    print(f"K: --K {args.fx} {args.fx} {args.width/2} {args.height/2}")


if __name__ == "__main__":
    main()
