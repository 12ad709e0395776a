"""Interleaved A/B benchmark of cascade configurations on one chip.

Single-run bench numbers through the TPU tunnel are unreliable: the
same binary + weights measured 11.06 s/step and then 2.13 s/step within
one hour (round-4 logs) because the tunnel has multi-minute slow
spells.  This harness compiles every variant FIRST, then times them in
interleaved rounds (A,B,A,B,...) and reports the per-variant BEST round
— concurrent slow spells hit all variants equally, and the best round
approximates the unthrottled device time.

    python tools/bench_ab.py --rounds 4 --iters 3 \
        --variant base sinkhorn_tol=0 \
        --variant tol1e4 sinkhorn_tol=1e-4
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H, W = 480, 640
BATCH = 4


def parse_overrides(kvs):
    out = {}
    for kv in kvs:
        k, v = kv.split("=", 1)
        try:
            out[k] = json.loads(v)
        except json.JSONDecodeError:
            out[k] = v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3,
                    help="chained steps per timing round")
    ap.add_argument("--ckpt", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ckpts", "r4_full"))
    ap.add_argument("--inputs", choices=("noise", "plane"), default="noise",
                    help="noise: uncorrelated uniform pairs (bench.py "
                         "regime); plane: rendered synthetic pairs "
                         "(realistic match occupancy)")
    ap.add_argument("--variant", nargs="+", action="append", required=True,
                    metavar=("NAME", "KEY=VAL"),
                    help="variant name + ModelConfig overrides")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_comp_cache"))
    import jax.numpy as jnp
    import numpy as np

    from pats_tpu.config import ModelConfig
    from pats_tpu.models.cascade import PATSCascade, PATSCascadeBatched

    on_tpu = jax.devices()[0].platform != "cpu"
    rng = np.random.default_rng(18027)
    if args.inputs == "plane":
        from pats_tpu.data.synthetic_pairs import SyntheticPlanePairs

        ds = SyntheticPlanePairs(n_pairs=BATCH, width=W, height=H, seed=0)
        items = [ds[i] for i in range(BATCH)]
        left = jnp.asarray(np.stack([it["image0"] for it in items]),
                           jnp.float32)
        right = jnp.asarray(np.stack([it["image1"] for it in items]),
                            jnp.float32)
    else:
        left = jnp.asarray(rng.uniform(0, 255, (BATCH, H, W, 3)),
                           jnp.float32)
        right = jnp.asarray(rng.uniform(0, 255, (BATCH, H, W, 3)),
                            jnp.float32)

    variants = []
    variables = None
    for spec in args.variant:
        name, overrides = spec[0], parse_overrides(spec[1:])
        mc = dataclasses.replace(
            ModelConfig(), use_bfloat16=True, use_pallas_sinkhorn=on_tpu,
            use_fused_attention=on_tpu, **overrides)
        model = PATSCascadeBatched(config=mc, outdoor=True, merge_new=True)
        one = jnp.zeros((H, W, 3), jnp.float32)
        imodel = PATSCascade(config=mc, outdoor=True, merge_new=True)
        if variables is None:
            # init through the UNBATCHED cascade (bench.py idiom) — the
            # batched variant shares the identical param tree
            variables = jax.jit(imodel.init)(jax.random.PRNGKey(0),
                                             one, one)
            ref_shapes = jax.tree.map(jnp.shape, variables)
            if os.path.isdir(args.ckpt):
                from pats_tpu.io.checkpoint import load_matcher_checkpoint

                variables = load_matcher_checkpoint(args.ckpt, variables)
                print(f"# weights: {args.ckpt}")
        else:
            # the ONE variables tree is shared across variants, so an
            # override that changes the param tree (gnn_layers,
            # descriptor_dim, ...) would silently mis-measure later
            # variants (advisor round 4) — reject it up front
            shapes = jax.tree.map(
                jnp.shape, jax.eval_shape(
                    lambda k: imodel.init(k, one, one),
                    jax.random.PRNGKey(0)))
            if shapes != ref_shapes:
                raise SystemExit(
                    f"variant {name!r}: overrides change the parameter "
                    "tree; only param-shape-neutral keys (sinkhorn_tol, "
                    "use_* toggles) can be A/B'd against shared weights")

        def make_fwd(model):
            @jax.jit
            def fwd(variables, left, right, perturb):
                out, _ = model.apply(variables, left, right + perturb,
                                     mutable=["batch_stats"])
                return out["matches_r"][0, 0, 0], out["valid"].sum()
            return fwd

        fwd = make_fwd(model)
        t0 = time.time()
        s, nv = fwd(variables, left, right, jnp.float32(0.0))
        np.asarray(s)
        print(f"# {name}: compile {time.time() - t0:.1f}s, "
              f"matches/pair {float(np.asarray(nv)) / BATCH:.0f}")
        variants.append((name, fwd, overrides))

    times = {name: [] for name, _, _ in variants}
    for r in range(args.rounds):
        for name, fwd, _ in variants:
            p = jnp.float32(0.0)
            t0 = time.time()
            for _ in range(args.iters):
                s, _ = fwd(variables, left, right, p)
                p = s * 1e-30
            np.asarray(p)
            dt = (time.time() - t0) / args.iters
            times[name].append(dt)
            print(f"# round {r} {name}: {1000 * dt:.1f} ms/step")

    for name, fwd, overrides in variants:
        best = min(times[name])
        med = sorted(times[name])[len(times[name]) // 2]
        print(json.dumps({
            "variant": name, "overrides": overrides,
            "best_step_ms": round(1000 * best, 1),
            "median_step_ms": round(1000 * med, 1),
            "best_pairs_per_s": round(BATCH / best, 3),
            "rounds": args.rounds, "iters": args.iters,
            "inputs": args.inputs,
            "weights": args.ckpt if os.path.isdir(args.ckpt) else "random",
        }))


if __name__ == "__main__":
    main()
