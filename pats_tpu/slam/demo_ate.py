"""Demo-sequence trajectory harness: odometry over frames + ATE vs GT.

North-star metric (BASELINE.md): trajectory error on the demo sequence.

    python -m pats_tpu.slam.demo_ate <frames_dir> --K fx fy cx cy \
        [--gt gt_traj.txt] [--config cfg.yaml] [--long-side 640]

GT format: one "x y z" (or "t x y z ...": TUM - positions in cols 1:4)
line per frame.  Prints the scale-aligned ATE RMSE when GT is given,
otherwise just the estimated camera centers.
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def load_gt_trajectory(path: str) -> np.ndarray:
    rows = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if not parts or parts[0].startswith("#"):
                continue
            vals = [float(v) for v in parts]
            rows.append(vals[1:4] if len(vals) > 3 else vals[:3])
    return np.asarray(rows)


from pats_tpu.io.checkpoint import load_matcher_checkpoint  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("frames", type=str)
    parser.add_argument("--K", type=float, nargs=4, required=True,
                        metavar=("FX", "FY", "CX", "CY"))
    parser.add_argument("--gt", type=str, default=None)
    parser.add_argument("--config", type=str, default=None)
    parser.add_argument("--long-side", type=int, default=640)
    parser.add_argument("--threshold-px", type=float, default=0.5)
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="orbax checkpoint dir (e.g. a trained "
                             "tools/train_run.py --save output)")
    parser.add_argument("--platform", type=str, default=None,
                        choices=("cpu", "tpu", "axon"))
    parser.add_argument("--backend", default="chain",
                        choices=("chain", "ba"),
                        help="'chain': unit-baseline two-view chaining "
                             "(scale drift accumulates); 'ba': landmark "
                             "scale propagation + multi-view-track bundle "
                             "adjustment (slam/vo.py).  Default chain: on "
                             "the constant-speed demo sequence it measures "
                             "0.147 vs BA's 0.344 (round-5 ablation) — the "
                             "depth-ratio scale estimate adds multiplicative "
                             "noise real-matcher BA does not recover, while "
                             "BA wins on the oracle ablations where tracks "
                             "are clean (slam/vo.py docstring)")
    parser.add_argument("--ablate", action="store_true",
                        help="run BOTH backends on the same matches-free "
                             "frames and report both ATEs")
    parser.add_argument("--ba-iters", type=int, default=30,
                        help="LM iterations for the final bundle "
                             "adjustment (slam/ba.py: step-rejecting "
                             "Levenberg-Marquardt)")
    parser.add_argument("--scale-mode", default="propagate",
                        choices=("propagate", "unit"),
                        help="BA initialization: landmark-depth scale "
                             "propagation (default) or unit baselines")
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from pats_tpu.config import load_config
    from pats_tpu.data.video import VideoFrames
    from pats_tpu.matcher import Matcher
    from pats_tpu.slam.ate import absolute_trajectory_error
    from pats_tpu.slam.pipeline import sequence_trajectory

    cfg = load_config(args.config)
    matcher = Matcher(cfg, seed=cfg.eval.seed)
    if args.checkpoint:
        matcher.variables = load_matcher_checkpoint(args.checkpoint,
                                                    matcher.variables)
    fx, fy, cx, cy = args.K
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])

    frames_src = VideoFrames(args.frames, long_side=args.long_side)
    frames = [f["image1"] for f in frames_src]
    first = frames_src._load(frames_src.names[0])
    frames = [first] + frames

    from pats_tpu.slam.vo import sequence_trajectory_ba

    backends = ("chain", "ba") if args.ablate else (args.backend,)
    trajs = {}
    for backend in backends:
        if backend == "ba":
            centers = sequence_trajectory_ba(matcher, frames, K,
                                             args.threshold_px,
                                             ba_iters=args.ba_iters,
                                             scale_mode=args.scale_mode)
        else:
            centers = sequence_trajectory(matcher, frames, K,
                                          args.threshold_px)
        trajs[backend] = np.asarray(centers)

    traj = trajs[backends[-1]]
    out = {"frames": len(traj), "backend": backends[-1]}
    if args.gt:
        import jax.numpy as jnp

        gt = load_gt_trajectory(args.gt)
        for backend, tr in trajs.items():
            ate = float(absolute_trajectory_error(
                jnp.asarray(tr, jnp.float32),
                jnp.asarray(gt[:len(tr)], jnp.float32)))
            out["ate_rmse_" + backend] = ate
        out["ate_rmse"] = out["ate_rmse_" + backends[-1]]
    for i, c in enumerate(traj):
        print(f"frame {i}: center {c.tolist()}")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
