"""Benchmark CLI: pose AUC on MegaDepth / ScanNet / YFCC.

Equivalent of reference evaluate.py:20-117.  Accepts either this
framework's nested YAML or a reference-style flat config
(configs/test_*.yaml).

    python -m pats_tpu.evaluate configs/test_megadepth.yaml \
        --torch-checkpoints weights/outdoor_coarse.pt \
                            weights/outdoor_fine.pt \
                            weights/outdoor_third.pt
"""

from __future__ import annotations

import argparse
import json
import os
import random
import sys

import numpy as np

from pats_tpu.config import PATSConfig, load_config, reference_yaml_to_config
from pats_tpu.utils.metrics import aggregate_metrics, compute_pose_error


def build_dataset(cfg: PATSConfig):
    name = cfg.eval.dataset
    if name == "MegaDepth":
        from pats_tpu.data.megadepth import MegaDepthPairs

        return MegaDepthPairs(cfg.eval.data_path, cfg.eval.pairs_path)
    if name == "ScanNet":
        from pats_tpu.data.scannet import ScannetPairs

        return ScannetPairs(cfg.eval.data_path, cfg.eval.pairs_path)
    if name == "YFCC":
        from pats_tpu.data.yfcc import YfccPairs

        return YfccPairs(cfg.eval.data_path, cfg.eval.pairs_path)
    raise ValueError(f"unknown dataset {name!r}")


def evaluate(matcher, dataset, scale_factor: float, threshold: float,
             progress: bool = True, resume_path: str = None):
    """Evaluate pose AUC over a pair dataset.

    ``resume_path``: optional JSONL shard file; each completed pair is
    appended as {"i", "err_R", "err_t"} and already-recorded pairs are
    skipped, so a crashed run resumes where it stopped (the reference
    restarts from scratch, SURVEY.md par.5).
    """
    done = {}
    fh = None
    if resume_path:
        if os.path.exists(resume_path):
            with open(resume_path) as f:
                for line in f:
                    rec = json.loads(line)
                    done[rec["i"]] = (rec["err_R"], rec["err_t"])
        fh = open(resume_path, "a")
    err_R, err_t = [], []
    for i, data in enumerate(dataset):
        if i in done:
            r, t = done[i]
        else:
            ml, mr = matcher.match(data["image0"], data["image1"])
            r, t = compute_pose_error(ml, mr, data["K0"], data["K1"],
                                      data["T0"], data["T1"],
                                      scale_factor, threshold)
            if fh:
                fh.write(json.dumps(
                    {"i": i, "err_R": float(r), "err_t": float(t)}) + "\n")
                fh.flush()
        err_R.append(r)
        err_t.append(t)
        if progress and i % 50 == 0:
            print(f"[{i}/{len(dataset)}]", flush=True)
    if fh:
        fh.close()
    return aggregate_metrics(err_R, err_t)


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    parser.add_argument("--scale_factor", type=float, default=1.0)
    parser.add_argument("--torch-checkpoints", nargs=3, default=None,
                        metavar=("COARSE", "FINE", "THIRD"))
    parser.add_argument("--checkpoint", type=str, default=None,
                        help="orbax checkpoint dir")
    parser.add_argument("--resume", type=str, default=None,
                        help="JSONL shard file for crash-resumable eval")
    parser.add_argument("--debug-nans", action="store_true",
                        help="enable jax_debug_nans (aborts on first NaN)")
    parser.add_argument("--matmul-precision", type=str, default="float32",
                        choices=["default", "float32", "highest"],
                        help="TPU f32 matmuls default to bf16 multiplies; "
                             "checkpoint-parity eval should keep float32")
    args = parser.parse_args(argv)

    import yaml

    with open(args.config) as f:
        raw = yaml.safe_load(f) or {}
    if any(isinstance(v, dict) for v in raw.values()):
        cfg = load_config(args.config)       # nested: typos raise KeyError
    else:
        cfg = reference_yaml_to_config(args.config)

    random.seed(cfg.eval.seed)
    np.random.seed(cfg.eval.seed)

    import jax

    if args.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision",
                          args.matmul_precision)
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from pats_tpu.matcher import Matcher

    if args.torch_checkpoints:
        matcher = Matcher.from_torch_checkpoints(cfg, *args.torch_checkpoints)
    elif args.checkpoint or cfg.eval.checkpoint:
        from pats_tpu.io.checkpoint import load_checkpoint

        matcher = Matcher(cfg)
        matcher.variables = load_checkpoint(
            args.checkpoint or cfg.eval.checkpoint, like=matcher.variables)
    else:
        print("WARNING: no checkpoint given - random weights", file=sys.stderr)
        matcher = Matcher(cfg, seed=cfg.eval.seed)

    dataset = build_dataset(cfg)
    metric = evaluate(matcher, dataset, args.scale_factor, cfg.eval.threshold,
                      resume_path=args.resume)
    print("-" * 5 + f"Evaluation on {cfg.eval.dataset}" + "-" * 5)
    for key, value in metric.items():
        print(f"{key}: {value}")
    print(json.dumps(metric))


if __name__ == "__main__":
    main()
