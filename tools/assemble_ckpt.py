"""Assemble a full-matcher checkpoint from per-level training checkpoints.

tools/train_run.py saves one cascade level at a time (coarse, or fine
trained through a frozen coarse).  The evaluate/demo CLIs restore a
FULL matcher tree ({params,batch_stats} x {coarse,fine,refine}).  This
tool composes one from per-level files, leaving unspecified levels at
their random init:

    python tools/assemble_ckpt.py --config configs/synthetic.yaml \
        --coarse /tmp/coarse_ckpt --fine /tmp/fine_ckpt \
        --out /tmp/full_ckpt
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--coarse", default=None)
    ap.add_argument("--fine", default=None)
    ap.add_argument("--refine", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--platform", default="cpu",
                    help="init runs fine on CPU; the eval CLI re-puts "
                         "the tree on its own device")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    from pats_tpu.config import load_config
    from pats_tpu.io.checkpoint import load_checkpoint, save_checkpoint
    from pats_tpu.matcher import Matcher

    cfg = load_config(args.config)
    m = Matcher(cfg, seed=0)
    out = {"params": dict(m.variables["params"]),
           "batch_stats": dict(m.variables["batch_stats"])}
    for level, path in (("coarse", args.coarse), ("fine", args.fine),
                        ("refine", args.refine)):
        if not path:
            continue
        like = {"params": out["params"][level],
                "batch_stats": out["batch_stats"][level]}
        got = load_checkpoint(path, like=like)
        out["params"][level] = got["params"]
        out["batch_stats"][level] = got["batch_stats"]
        print(f"overlaid {level} from {path}")
    save_checkpoint(args.out, out)
    print(f"wrote full matcher checkpoint to {args.out}")


if __name__ == "__main__":
    main()
