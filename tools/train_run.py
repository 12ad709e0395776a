"""Multi-hundred-step coarse training run with a precision curve.

Trains the coarse matcher from scratch on self-supervised homography
warps of procedural textures (train/synthetic.py) and tracks
correspondence precision on held-out warp pairs: a grid cell counts as
correct when its predicted right-image point lands within half a patch
of the homography-mapped left cell center.

Run on the TPU (several minutes):
    python tools/train_run.py --steps 600 --out /tmp/train_curve.jsonl

Emits one JSON line per eval interval:
    {"step": N, "loss": .., "grad_norm": .., "precision": ..,
     "n_alive": ..}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def textured_images(rng, n, h, w):
    import cv2

    imgs = []
    for _ in range(n):
        base = rng.uniform(0, 255, (h // 8, w // 8, 3)).astype(np.float32)
        img = cv2.resize(base, (w, h), interpolation=cv2.INTER_CUBIC)
        imgs.append(np.clip(img, 0, 255).astype(np.uint8))
    return imgs


def coarse_precision(model, params, batch_stats, pairs, rng_key,
                     threshold_px=16.0):
    """Held-out metrics of the coarse level.  Returns (precision, n_alive,
    diag) where diag decomposes failures: ``argmax_hit`` = fraction whose
    transport argmax lands within 1 cell of GT (the NLL's target),
    ``err_med`` = median px error of the soft-argmax points, ``err_hit``
    = median px error among argmax-hit cells only (position quality where
    the transport is right), ``scale_med`` = median predicted scale.

    GT comes from each example's raw labels (labels_raw: (G, 3) with the
    view-1 target in px, or sentinels) — works for homography warps AND
    the two-depth plane renders, whose geometry is not one homography."""
    import jax
    import jax.numpy as jnp

    n_ok = n_alive = n_hit = 0
    errs, errs_hit, scales = [], [], []
    for ex in pairs:
        out, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            jnp.asarray(ex["left"]), jnp.asarray(ex["right"]),
            mutable=["batch_stats"], rngs={"dropout": rng_key})
        pts = np.asarray(out["pts"], np.float64) * 32.0     # (G, 2) px
        alive = np.asarray(out["alive"])
        plan = np.asarray(out["plan"], np.float64)
        h, w = out["grid"]
        raw = np.asarray(ex["labels_raw"], np.float64)      # (G, 3)
        gt = raw[:, :2]                                     # x, y px
        err = np.hypot(pts[:, 1] - gt[:, 0], pts[:, 0] - gt[:, 1])
        inside = raw[:, 0] > -0.5                           # GT positives
        ok = alive & inside & (err < threshold_px)
        n_ok += int(ok.sum())
        n_alive += int((alive & inside).sum())
        # transport argmax vs GT cell (Chebyshev <= 1, the NLL's gate)
        amax = plan[:-1, :-1].argmax(1)
        ar, ac = np.divmod(amax, w)
        gr, gc = np.floor(gt[:, 1] / 32.0), np.floor(gt[:, 0] / 32.0)
        hit = (np.abs(ar - gr) <= 1) & (np.abs(ac - gc) <= 1)
        sel = alive & inside
        n_hit += int((hit & sel).sum())
        errs += list(err[sel])
        errs_hit += list(err[sel & hit])
        scales += list(np.asarray(out["x_scale"])[sel])
    diag = {
        "argmax_hit": round(n_hit / max(n_alive, 1), 4),
        "err_med": round(float(np.median(errs)) if errs else -1.0, 2),
        "err_hit": round(float(np.median(errs_hit))
                         if errs_hit else -1.0, 2),
        "scale_med": round(float(np.median(scales)) if scales else -1.0, 3),
    }
    return (n_ok / max(n_alive, 1)), n_alive, diag


def _maybe_overlay(variables, ckpt_path):
    """Overlay an orbax single-level checkpoint onto a variables tree."""
    if not ckpt_path:
        return variables
    from pats_tpu.io.checkpoint import load_checkpoint

    got = load_checkpoint(ckpt_path, like={
        "params": variables["params"],
        "batch_stats": variables["batch_stats"]})
    return {"params": got["params"], "batch_stats": got["batch_stats"]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--size", type=int, default=256)
    # 1e-4: the CPU LR sweep (TRAIN_AB_r2.md) showed 3e-4 blows the run
    # out of the high-precision basin mid-training (0.75 -> 0.25 held-out
    # precision while the loss plateaus); 1e-4 converges at the peak
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--warmup", type=int, default=50)
    ap.add_argument("--clip", type=float, default=1.0)
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--eval-pairs", type=int, default=8)
    ap.add_argument("--gnn-layers", type=int, default=18)
    ap.add_argument("--out", default="/tmp/train_curve.jsonl")
    ap.add_argument("--save", default=None,
                    help="orbax checkpoint dir for the final params")
    ap.add_argument("--level", default="coarse",
                    choices=("coarse", "fine", "refine"),
                    help="which cascade level to train (fine/refine train "
                         "through frozen upstream levels)")
    ap.add_argument("--init-coarse", default=None,
                    help="orbax coarse checkpoint to freeze under "
                         "--level fine/refine (default: random coarse)")
    ap.add_argument("--init-fine", default=None,
                    help="orbax fine checkpoint: frozen front under "
                         "--level refine, or the TRAINABLE init under "
                         "--level fine (default: random)")
    ap.add_argument("--init-refine", default=None,
                    help="orbax refine checkpoint: trainable init under "
                         "--level refine")
    ap.add_argument("--save-final", action="store_true",
                    help="also save the FINAL state (not only the best "
                         "held-out one) - required for --lr 0 BN "
                         "recalibration passes, whose precision never "
                         "improves but whose running stats do")
    ap.add_argument("--train-images", type=int, default=32,
                    help="size of the procedural texture pool (small pools "
                         "overfit: held-out precision decays while train "
                         "loss plateaus)")
    ap.add_argument("--fine-pos-weight", type=float, default=1.0,
                    help="position-loss weight for --level fine (round-3 "
                         "diagnosis: at the reference's 5.0 its gradient "
                         "swamps the matching CE 23:1; 1.0 + the "
                         "row-softmax CE fix lets the transport learn)")
    ap.add_argument("--fine-nll-all", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="fine-level CE over ALL positives (SuperGlue "
                         "style; default after the round-3 overfit A/B) "
                         "instead of wrong-argmax only")
    ap.add_argument("--fine-aniso", action="store_true",
                    help="map fine labels through the true per-axis crop "
                         "geometry instead of the isotropic row scale")
    ap.add_argument("--microbatch", type=int, default=None,
                    help="gradient-accumulation chunk (pairs per backward) "
                         "for --level fine/refine; default: the trainer's "
                         "(fine 2, refine 1 — HBM-bound)")
    ap.add_argument("--data", choices=("warps", "plane"), default="warps",
                    help="training pairs: homography warps of procedural "
                         "textures, or two-depth plane renders with exact "
                         "analytic labels (in-domain with the synthetic "
                         "pose-AUC protocol, configs/synthetic_trained.yaml)")
    ap.add_argument("--texture", default="default",
                    choices=("default", "blobs", "waves", "mixed"),
                    help="--data plane texture family; 'mixed' samples "
                         "default+blobs per render (waves stays held out "
                         "for the cross-family eval)")
    ap.add_argument("--baseline-deg", type=float, default=12.0,
                    help="plane-pair camera baseline (degrees)")
    ap.add_argument("--fx-jitter", type=float, nargs=2, default=None,
                    metavar=("LO", "HI"),
                    help="--data plane scale augmentation: per-example "
                         "fx multiplier sampled U(LO, HI).  HI=2.5 "
                         "zooms a 256-px canvas to the 640-px protocol's "
                         "apparent feature scale (round-5 scale-"
                         "extrapolation diagnosis, STATUS.md); shapes "
                         "stay constant so no re-jit")
    ap.add_argument("--dustbin-final", type=float, default=1.0,
                    help="annealed end value of the anti-collapse dustbin "
                         "weight (5.0 = no anneal)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.microbatch is not None:
        if args.microbatch <= 0:
            ap.error(f"--microbatch must be > 0 (got {args.microbatch})")
        if args.level == "coarse":
            ap.error("--microbatch applies to --level fine/refine only "
                     "(the coarse trainer has no gradient accumulation)")

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_comp_cache")

    from pats_tpu.config import load_config
    from pats_tpu.parallel.mesh import make_mesh
    from pats_tpu.train.synthetic import synthetic_batches, warp_pair
    from pats_tpu.train.trainer import CoarseTrainer

    cfg = load_config(None, {"model": {
        "coarse": {"gnn_layers": args.gnn_layers},
        "fine": {"gnn_layers": args.gnn_layers}}})

    mesh = make_mesh(data=1, model=1, devices=jax.devices()[:1])
    H = W = args.size
    key = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    level = {"coarse": 0, "fine": 1, "refine": 2}[args.level]
    if args.level == "coarse":
        trainer = CoarseTrainer(cfg, mesh, learning_rate=args.lr,
                                total_steps=args.steps,
                                warmup_steps=args.warmup,
                                clip_norm=args.clip,
                                dustbin_final=args.dustbin_final)
        state = trainer.init(key, jnp.zeros((H, W, 3)),
                             jnp.zeros((H, W, 3)))
        if args.init_coarse:
            got = _maybe_overlay({"params": state.params,
                                  "batch_stats": state.batch_stats},
                                 args.init_coarse)
            state = state._replace(params=got["params"],
                                   batch_stats=got["batch_stats"])
    elif args.level == "fine":
        from pats_tpu.train.fine_trainer import FineTrainer

        mb_kw = ({"microbatch": args.microbatch}
                 if args.microbatch is not None else {})
        trainer = FineTrainer(cfg, mesh, learning_rate=args.lr,
                              total_steps=args.steps,
                              warmup_steps=args.warmup,
                              clip_norm=args.clip,
                              position_weight=args.fine_pos_weight,
                              nll_all_positives=args.fine_nll_all,
                              aniso_labels=args.fine_aniso, **mb_kw)
        zero = jnp.zeros((H, W, 3))
        coarse_vars = jax.jit(trainer.coarse.init)(key, zero, zero)
        coarse_vars = _maybe_overlay(coarse_vars, args.init_coarse)
        state = trainer.init(key, coarse_vars, zero, zero)
        if args.init_fine:
            got = _maybe_overlay({"params": state.params,
                                  "batch_stats": state.batch_stats},
                                 args.init_fine)
            state = state._replace(params=got["params"],
                                   batch_stats=got["batch_stats"])
    else:
        from pats_tpu.train.refine_trainer import RefineTrainer

        mb_kw = ({"microbatch": args.microbatch}
                 if args.microbatch is not None else {})
        trainer = RefineTrainer(cfg, mesh, learning_rate=args.lr,
                                total_steps=args.steps,
                                warmup_steps=args.warmup,
                                clip_norm=args.clip, **mb_kw)
        zero = jnp.zeros((H, W, 3))
        coarse_vars = jax.jit(trainer.front.coarse.init)(key, zero, zero)
        coarse_vars = _maybe_overlay(coarse_vars, args.init_coarse)
        fine_state = trainer.front.init(key, coarse_vars, zero, zero)
        fine_vars = _maybe_overlay(
            {"params": fine_state.params,
             "batch_stats": fine_state.batch_stats}, args.init_fine)
        state = trainer.init(key, coarse_vars, fine_vars, zero, zero)
        if args.init_refine:
            got = _maybe_overlay({"params": state.params,
                                  "batch_stats": state.batch_stats},
                                 args.init_refine)
            state = state._replace(params=got["params"],
                                   batch_stats=got["batch_stats"])

    rng = np.random.default_rng(0)
    hold_rng = np.random.default_rng(999)
    warp_kw = dict(max_rotation=0.1, max_scale=0.1, max_translation=0.05)
    if args.data == "plane":
        from pats_tpu.data.synthetic_pairs import (plane_batches,
                                                   plane_pair_example)

        hold_pairs = [plane_pair_example(
            hold_rng, args.size, level, args.baseline_deg, args.texture,
            fx_scale=(float(hold_rng.uniform(*args.fx_jitter))
                      if args.fx_jitter else 1.0))
                      for _ in range(args.eval_pairs)]
    else:
        train_imgs = textured_images(rng, args.train_images, H, W)
        hold_imgs = textured_images(hold_rng, args.eval_pairs, H, W)
        hold_pairs = [warp_pair(im, hold_rng, level=level, **warp_kw)
                      for im in hold_imgs]
    if args.level in ("fine", "refine"):
        lkey = "labels8" if args.level == "fine" else "labels2"
        hold_batch = {
            "left": np.stack([p["left"] for p in hold_pairs]),
            "right": np.stack([p["right"] for p in hold_pairs]),
            lkey: np.stack([p["labels_raw"] for p in hold_pairs]),
        }

    if args.data == "plane":
        it = plane_batches(args.batch, args.size, level=level, seed=7,
                           baseline_deg=args.baseline_deg,
                           texture=args.texture,
                           fx_jitter=args.fx_jitter)
    else:
        it = synthetic_batches(train_imgs, batch_size=args.batch,
                               level=level, seed=7, **warp_kw)
    fh = open(args.out, "w")
    t0 = time.time()
    best_prec = -1.0
    # liveness stamps for the heartbeat monitor (parallel/fault.py);
    # a beat per logged step proves *progress*, not just existence
    from pats_tpu.parallel.fault import Heartbeat

    hb = Heartbeat(os.path.join(os.path.dirname(args.out) or ".",
                                "heartbeats"))
    for step, batch in enumerate(it):
        if step >= args.steps:
            break
        if args.level == "coarse":
            batch = {k: batch[k] for k in ("left", "right", "gt_pos",
                                           "gt_class")}
            state, m = trainer.step(state, jax.random.fold_in(key, step),
                                    batch)
        else:
            lkey = "labels8" if args.level == "fine" else "labels2"
            batch = {"left": batch["left"], "right": batch["right"],
                     lkey: batch["labels_raw"]}
            state, m = trainer.step(state, batch)
        hb.beat(step)
        if step % args.eval_every == 0 or step == args.steps - 1:
            loss = float(np.asarray(m["loss"]))      # sync point
            gnorm = float(np.asarray(m["grad_norm"]))
            diag = {}
            if args.level == "coarse":
                prec, n_alive, diag = coarse_precision(
                    trainer.model, state.params, state.batch_stats,
                    hold_pairs, jax.random.PRNGKey(1))
            else:
                em = trainer.eval_metrics(state, hold_batch)
                prec = float(np.asarray(em["precision"]))
                n_alive = int(np.asarray(em["n_positive"]))
                for k in ("argmax_near", "dustbin_frac"):
                    if k in em:
                        diag[k] = round(float(np.asarray(em[k])), 4)
            # abort before optax.apply_if_finite gives up and applies a
            # NaN update (see pats_tpu/train/optim.py notfinite_count)
            from pats_tpu.train.optim import notfinite_count

            nf = int(np.asarray(notfinite_count(state.opt_state)))
            if nf >= 50:
                raise RuntimeError(
                    f"{nf} consecutive non-finite updates at step {step}; "
                    "aborting before apply_if_finite poisons the params")
            # metric-key semantics differ per level: coarse counts alive
            # cells (n_alive, precision = <16 image px); fine/refine count
            # GT-positive sub-cells (n_positive, precision = <1 target
            # grid cell, i.e. 8*crop_scale px fine / 2 px refine)
            count_key = "n_alive" if args.level == "coarse" else "n_positive"
            rec = {"step": step, "loss": round(loss, 4),
                   "grad_norm": round(gnorm, 2),
                   "precision": round(prec, 4), count_key: n_alive,
                   "t_s": round(time.time() - t0, 1), **diag}
            if nf:
                rec["notfinite_count"] = nf
            print(json.dumps(rec), flush=True)
            fh.write(json.dumps(rec) + "\n")
            fh.flush()
            if args.save and prec > best_prec:
                # keep the BEST held-out checkpoint, not the last one:
                # the curve can degrade late (round-2 anneal collapse)
                best_prec = prec
                from pats_tpu.io.checkpoint import save_checkpoint

                save_checkpoint(args.save,
                                {"params": state.params,
                                 "batch_stats": state.batch_stats})
                print(f"saved best (prec {prec:.4f}) to {args.save}",
                      flush=True)
    fh.close()
    if args.save and args.save_final:
        from pats_tpu.io.checkpoint import save_checkpoint

        save_checkpoint(args.save, {"params": state.params,
                                    "batch_stats": state.batch_stats})
        print(f"saved final state to {args.save}", flush=True)


if __name__ == "__main__":
    main()
