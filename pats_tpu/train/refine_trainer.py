"""Level-3 trainer: sub-pixel refiner supervised through frozen levels 1+2.

Runs the frozen coarse + subdivision + frozen fine matcher to produce
crops, level-2 tokens and compacted points, then trains the
SubpixelRefiner: the 2-px GT labels are mapped into each point's 8x8
target window and supervise the window transport plan (matching NLL +
dustbin terms) plus an L2 position loss on the refined sub-pixel output.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pats_tpu.config import PATSConfig
from pats_tpu.train.optim import make_optimizer
from pats_tpu.models.refine import SubpixelRefiner
from pats_tpu.train.fine_trainer import FineTrainer
from pats_tpu.train.trainer import TrainState


class RefineTrainer:
    """Shares the frozen front-end machinery with FineTrainer."""

    def __init__(self, cfg: PATSConfig, mesh: Mesh,
                 learning_rate: float = 1e-4, outdoor: bool = True,
                 total_steps: int = None, warmup_steps: int = 0,
                 clip_norm: float = 1.0, microbatch: int = 1):
        # microbatch 1 (not 2, the fine trainer's default): one pair's
        # refine backward carries ~10 bf16[2,K3=16G,65,128] GNN remat
        # boundaries PLUS the frozen coarse+fine front-end — two pairs
        # exceed a 16G v5e at 256px (measured 17.40G/15.75G OOM, r4)
        self.cfg = cfg
        self.outdoor = outdoor
        self.microbatch = microbatch
        self.front = FineTrainer(cfg, mesh, outdoor=outdoor)
        r = cfg.model.refine
        self.refine = SubpixelRefiner(
            descriptor_dim=r.descriptor_dim, gnn_layers=r.gnn_layers,
            sinkhorn_iterations=r.sinkhorn_iterations,
            window=r.window, padded_map=r.padded_map,
            neighborhood=r.neighborhood,
            use_running_average=False)
        self.tx = make_optimizer(learning_rate, total_steps=total_steps,
                                 warmup_steps=warmup_steps,
                                 clip_norm=clip_norm)
        self.batch_sharding = NamedSharding(mesh, P(cfg.runtime.data_axis))
        self.replicated = NamedSharding(mesh, P())

    def _points(self, coarse_vars, fine_vars, left, right):
        """Frozen front-end -> refiner inputs + crop geometry."""
        gh, gw = left.shape[0] // 32, left.shape[1] // 32
        G = gh * gw
        crops, desc, alive, crop_scale, center, _boxes = self.front._front(
            coarse_vars, left, right)
        out, _ = self.front.fine.apply(
            fine_vars, crops[0], crops[1], desc, alive, gh, gw,
            self.outdoor, True, mutable=["batch_stats"])
        out = jax.lax.stop_gradient(out)
        K3 = 16 * G
        flat_alive = out["cell_alive"].reshape(G * 144)
        order = jnp.argsort(jnp.logical_not(flat_alive).astype(jnp.int32),
                            stable=True)[:K3]
        pid = (order // 144).astype(jnp.int32)
        cell = (order % 144).astype(jnp.int32)
        tgt = out["pts"].reshape(G * 144, 2)[order]
        valid = flat_alive[order]
        return (crops, out["tokens0"], out["tokens1"], pid, cell, tgt,
                valid, alive, crop_scale, center)

    def init(self, rng, coarse_vars, fine_vars, left, right,
             resnet34_sd=None) -> TrainState:
        """``resnet34_sd``: optional resnet34-style state dict; overlays
        the pretrained trunk like the reference (third_layer.py:99-103)."""
        self.coarse_vars = jax.device_put(coarse_vars, self.replicated)
        self.fine_vars = jax.device_put(fine_vars, self.replicated)
        crops, t0, t1, pid, cell, tgt, valid, alive, *_ = self._points(
            coarse_vars, fine_vars, left, right)
        variables = self.refine.init(rng, crops[0], crops[1], t0, t1,
                                     pid, cell, tgt, valid, alive)
        if resnet34_sd is not None:
            from pats_tpu.io.pretrained import init_trunk_from_resnet34
            variables = init_trunk_from_resnet34(dict(variables),
                                                 resnet34_sd)
        state = TrainState(variables["params"],
                           variables.get("batch_stats", {}),
                           self.tx.init(variables["params"]),
                           jnp.zeros((), jnp.int32))
        return jax.device_put(state, self.replicated)

    def _pair_stats(self, params, batch_stats, coarse_vars, fine_vars,
                    left, right, labels2):
        """labels2: (H2*W2, 3) raw 2-px labels (x, y px, ratio).

        Returns (pos_loss, rej_loss, d2, positive): the two loss terms
        plus the un-truncated squared crop-px error and positive mask,
        so eval_metrics can score sub-pixel precision from the same
        geometry."""
        gh, gw = left.shape[0] // 32, left.shape[1] // 32
        (crops, t0, t1, pid, cell, tgt, valid, alive, crop_scale,
         center) = self._points(coarse_vars, fine_vars, left, right)
        out, mut = self.refine.apply(
            {"params": params, "batch_stats": batch_stats},
            crops[0], crops[1], t0, t1, pid, cell, tgt, valid, alive,
            mutable=["batch_stats"])
        mk = out["mkpts1"]                              # (K, 16, 2) crop px

        # GT for each of the 16 sub-points: source sub-point position in
        # LEFT-image 2-px cells -> its 2-px label
        W2 = (gw * 32) // 2
        H2 = (gh * 32) // 2
        pr = (pid // gw).astype(jnp.float32)
        pc = (pid % gw).astype(jnp.float32)
        cell_r = (cell // 12).astype(jnp.float32)
        cell_c = (cell % 12).astype(jnp.float32)
        sub = jnp.arange(16, dtype=jnp.float32)
        sub_r, sub_c = sub // 4, sub % 4
        # left pixel of sub-point s: crop origin (patch*32-32) + cell*8 +
        # sub*2 + 1  -> 2-px cell index = pixel // 2
        row_px = (pr[:, None] * 32 - 32 + cell_r[:, None] * 8
                  + sub_r[None] * 2 + 1)
        col_px = (pc[:, None] * 32 - 32 + cell_c[:, None] * 8
                  + sub_c[None] * 2 + 1)
        r2 = jnp.floor(row_px / 2).astype(jnp.int32)
        c2 = jnp.floor(col_px / 2).astype(jnp.int32)
        in_img = (r2 >= 0) & (r2 < H2) & (c2 >= 0) & (c2 < W2)
        idx = jnp.clip(r2 * W2 + c2, 0, H2 * W2 - 1)
        raw = labels2[idx]                               # (K, 16, 3)

        # GT target mapped into crop pixels (x, y)
        origin_row = center[:, 0] - 1.5 * crop_scale * 32.0
        origin_col = center[:, 1] - 1.5 * crop_scale * 32.0
        # dead patches can carry crop_scale 0: clamp so the frame mapping
        # stays finite (their cells are masked out of ``positive`` anyway)
        safe_scale = jnp.maximum(crop_scale[pid][:, None], 1e-6)
        gt_x = (raw[..., 0] - origin_col[pid][:, None]) / safe_scale
        gt_y = (raw[..., 1] - origin_row[pid][:, None]) / safe_scale
        positive = ((raw[..., 0] > -0.5) & in_img & valid[:, None]
                    & (gt_x >= 0) & (gt_x < 96) & (gt_y >= 0) & (gt_y < 96))

        # zero out non-positive entries BEFORE the residual so masked
        # entries contribute constant 0 (jnp.where after the subtraction
        # still backprops 0 * NaN = NaN through masked garbage points)
        gx = jnp.where(positive, gt_x, 0.0)
        gy = jnp.where(positive, gt_y, 0.0)
        mx = jnp.where(positive, mk[..., 0], 0.0)
        my = jnp.where(positive, mk[..., 1], 0.0)
        d2 = jnp.square(mx - gx) + jnp.square(my - gy)
        d2_trunc = jnp.minimum(d2, 64.0)    # truncate gross outliers
        denom = jnp.sum(positive.astype(jnp.float32)) + 1e-6
        pos_loss = jnp.sum(jnp.where(positive, d2_trunc, 0.0)) / denom

        # dustbin supervision via the validity labels: definite negatives
        # should be rejected (valid16 False), positives kept
        negative = (raw[..., 0] < -100) & in_img & valid[:, None]
        v16 = out["valid16"].astype(jnp.float32)
        n_neg = jnp.sum(negative.astype(jnp.float32)) + 1e-6
        rej_loss = (jnp.sum(jnp.where(negative, v16, 0.0)) / n_neg
                    + jnp.sum(jnp.where(positive, 1.0 - v16, 0.0)) / denom)
        return pos_loss, rej_loss, d2, positive, mut["batch_stats"]

    def _pair_loss(self, params, batch_stats, coarse_vars, fine_vars,
                   left, right, labels2):
        pos_loss, rej_loss, _, _, stats = self._pair_stats(
            params, batch_stats, coarse_vars, fine_vars, left, right,
            labels2)
        return pos_loss + rej_loss, stats

    @partial(jax.jit, static_argnums=0)
    def _eval(self, params, batch_stats, cv, fv, batch):
        def one(left, right, labels2):
            pos_loss, rej_loss, d2, positive, _ = self._pair_stats(
                params, batch_stats, cv, fv, left, right, labels2)
            hit = positive & (d2 < 4.0)     # refined point within 2 crop px
            return (pos_loss + rej_loss,
                    jnp.sum(hit.astype(jnp.int32)),
                    jnp.sum(positive.astype(jnp.int32)))

        # lax.map: sequential per-pair eval bounds memory to one pair's
        # activations (see fine_trainer.eval_metrics)
        loss, hits, pos = jax.lax.map(
            lambda t: one(*t),
            (batch["left"], batch["right"], batch["labels2"]))
        return {"loss": jnp.mean(loss),
                "precision": jnp.sum(hits) / jnp.maximum(jnp.sum(pos), 1),
                "n_positive": jnp.sum(pos)}

    def eval_metrics(self, state: TrainState, batch):
        """Held-out metrics: mean loss + sub-pixel precision (fraction of
        GT-positive sub-points refined to within 2 crop px)."""
        batch = {k: jax.device_put(jnp.asarray(v), self.batch_sharding)
                 for k, v in batch.items()}
        return self._eval(state.params, state.batch_stats,
                          self.coarse_vars, self.fine_vars, batch)

    def _loss_fn(self, params, batch_stats, cv, fv, batch):
        losses, stats = jax.vmap(
            self._pair_loss, in_axes=(None, None, None, None, 0, 0, 0))(
            params, batch_stats, cv, fv,
            batch["left"], batch["right"], batch["labels2"])
        # batch-averaged EMA'd running stats (models/norm.py note)
        return jnp.mean(losses), jax.tree.map(lambda s: jnp.mean(s, 0),
                                              stats)

    @partial(jax.jit, static_argnums=0)
    def _step(self, state: TrainState, cv, fv, batch
              ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # gradient micro-batching (see fine_trainer._step): identical
        # accumulated update, activations bounded to `microbatch` pairs
        B = batch["left"].shape[0]
        mb = min(self.microbatch, B)
        if B % mb:   # advisor r3: a silent v[:n*mb] dropped the remainder
            raise ValueError(
                f"batch size {B} must be a multiple of microbatch {mb}")
        n = B // mb
        chunked = {k: v.reshape((n, mb) + v.shape[1:])
                   for k, v in batch.items()}

        def body(carry, chunk):
            gsum, lsum, _ = carry
            (loss, stats), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True)(
                state.params, state.batch_stats, cv, fv, chunk)
            return (jax.tree.map(jnp.add, gsum, grads), lsum + loss,
                    stats), None

        zero = jax.tree.map(jnp.zeros_like, state.params)
        (gsum, lsum, new_stats), _ = jax.lax.scan(
            body, (zero, jnp.float32(0.0), state.batch_stats), chunked)
        grads = jax.tree.map(lambda g: g / n, gsum)
        loss = lsum / n
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        return (TrainState(params, new_stats, opt_state,
                           state.step + 1),
                {"loss": loss, "grad_norm": optax.global_norm(grads)})

    def step(self, state: TrainState, batch):
        """batch: left/right (B, H, W, 3); labels2 (B, H2*W2, 3) raw 2-px
        labels (train/labels.py level 2)."""
        batch = {k: jax.device_put(jnp.asarray(v), self.batch_sharding)
                 for k, v in batch.items()}
        return self._step(state, self.coarse_vars, self.fine_vars, batch)
