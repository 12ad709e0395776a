"""Trained-weights step time at large image sizes (round-4 verdict #5).

The reference's outdoor protocol resizes the long side to 1600 px
(/root/reference/datasets/megadepth.py:159-188, aug_resolution path);
the only prior large-image numbers here were round-1 RANDOM-weight
figures (905 ms/pair @1024, 2690 @1600).  This tool times the trained
single-pair cascade on rendered plane pairs at /32-aligned large sizes
with interleaved best-of-rounds timing (same spell-proofing as
bench.py: a tunnel slow spell hits all sizes alike).

    python tools/bench_bigimage.py [--sizes 1024x768 1600x1216]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", nargs="+", default=["1024x768", "1600x1216"])
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--ckpt",
                    default=os.path.join(_HERE, "ckpts", "r4_full"))
    args = ap.parse_args()

    from pats_tpu.config import ModelConfig
    from pats_tpu.data.synthetic_pairs import SyntheticPlanePairs
    from pats_tpu.io.checkpoint import load_matcher_checkpoint
    from pats_tpu.models.cascade import PATSCascade

    on_tpu = jax.devices()[0].platform != "cpu"
    mc = dataclasses.replace(ModelConfig(), use_bfloat16=True,
                             use_pallas_sinkhorn=on_tpu,
                             use_fused_attention=on_tpu,
                             refine_bucket=0.5)
    model = PATSCascade(config=mc, outdoor=True, merge_new=True)

    runs = []
    for spec in args.sizes:
        w, h = (int(v) for v in spec.split("x"))
        assert w % 32 == 0 and h % 32 == 0, spec
        ds = SyntheticPlanePairs(n_pairs=1, width=w, height=h, seed=0)
        it = ds[0]
        left = jnp.asarray(it["image0"], jnp.float32)
        right = jnp.asarray(it["image1"], jnp.float32)

        variables = jax.jit(model.init)(jax.random.PRNGKey(0), left, right)
        if os.path.isdir(args.ckpt):
            variables = load_matcher_checkpoint(args.ckpt, variables)

        @jax.jit
        def fwd(variables, left, right, perturb):
            out, _ = model.apply(variables, left, right + perturb,
                                 mutable=["batch_stats"])
            return out["matches_r"][0, 0], out["valid"].sum()

        t0 = time.time()
        s, nv = fwd(variables, left, right, jnp.float32(0.0))
        np.asarray(s)
        compile_s = time.time() - t0
        runs.append({"size": spec, "fwd": fwd, "vars": variables,
                     "left": left, "right": right,
                     "compile_s": round(compile_s, 1),
                     "matches": int(np.asarray(nv))})

    times = {r["size"]: [] for r in runs}
    for _ in range(args.rounds):
        for r in runs:
            p = jnp.float32(0.0)
            t0 = time.time()
            for _ in range(args.iters):
                s, _ = r["fwd"](r["vars"], r["left"], r["right"], p)
                p = s * 1e-30
            np.asarray(p)
            times[r["size"]].append((time.time() - t0) / args.iters)

    for r in runs:
        ts = sorted(times[r["size"]])
        print(json.dumps({
            "size": r["size"], "weights": args.ckpt,
            "best_ms_per_pair": round(1000 * ts[0], 1),
            "median_ms_per_pair": round(1000 * ts[len(ts) // 2], 1),
            "spread": round(ts[-1] / ts[0], 2),
            "compile_s": r["compile_s"],
            "matches_per_pair": r["matches"],
            "rounds": args.rounds, "iters": args.iters,
            "device": str(jax.devices()[0]),
        }))


if __name__ == "__main__":
    main()
