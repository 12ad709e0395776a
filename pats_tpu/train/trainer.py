"""Data-parallel trainer for the coarse matcher level.

The reference released per-level checkpoints trained separately with
``nn.DataParallel`` (SURVEY.md par.2.7/3.4) but never shipped a trainer.
This one is TPU-native: image pairs shard over the ``data`` axis of a
``jax.sharding.Mesh``; gradients are averaged by the collectives XLA
inserts for the replicated-parameter / sharded-batch jit.

Usage:
    trainer = CoarseTrainer(config, mesh)
    state = trainer.init(rng, sample_left, sample_right)
    state, metrics = trainer.step(state, batch)   # batch sharded over data
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pats_tpu.config import PATSConfig
from pats_tpu.models.coarse import CoarseMatcher
from pats_tpu.ops.expand import ExpandResult
from pats_tpu.train.losses import (LevelLabels, dustbin_weight_schedule,
                                   scale_anchor_loss, transport_level_loss)
from pats_tpu.train.optim import make_optimizer


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray


def _training_model(cfg: PATSConfig) -> CoarseMatcher:
    c = cfg.model.coarse
    return CoarseMatcher(
        descriptor_dim=c.descriptor_dim, gnn_layers=c.gnn_layers,
        num_heads=c.num_heads, sinkhorn_iterations=c.sinkhorn_iterations,
        score_temperature=c.score_temperature, expand_iters=c.expand_iters,
        expand_lower_bound=c.expand_lower_bound,
        use_running_average=False,        # batch statistics while training
        deterministic=False)              # trunk dropout active


class CoarseTrainer:
    def __init__(self, cfg: PATSConfig, mesh: Mesh,
                 learning_rate: float = 1e-4,
                 total_steps: int = None, warmup_steps: int = 0,
                 clip_norm: float = 1.0,
                 dustbin_final: float = 1.0):
        self.cfg = cfg
        self.mesh = mesh
        self.dustbin_final = dustbin_final
        self.model = _training_model(cfg)
        self.tx = make_optimizer(learning_rate, total_steps=total_steps,
                                 warmup_steps=warmup_steps,
                                 clip_norm=clip_norm)
        data_axis = cfg.runtime.data_axis
        self.batch_sharding = NamedSharding(mesh, P(data_axis))
        self.replicated = NamedSharding(mesh, P())

    def init(self, rng, left, right) -> TrainState:
        variables = self.model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            left, right)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        state = TrainState(params, batch_stats, opt_state,
                           jnp.zeros((), jnp.int32))
        return jax.device_put(state, self.replicated)

    def _pair_loss(self, params, batch_stats, rng, dustbin_w, left, right,
                   gt_pos, gt_class):
        out, mut = self.model.apply(
            {"params": params, "batch_stats": batch_stats}, left, right,
            mutable=["batch_stats"], rngs={"dropout": rng})
        res = ExpandResult(
            whole_cost=out["whole_cost"][None],
            core_cost=out["core_cost"][None],
            average_point=out["pts"][None],
            x_scale=out["x_scale"][None], y_scale=out["y_scale"][None],
            bound=jnp.zeros((1,) + out["pts"].shape[:1] + (4,), jnp.int32),
            if_nomatching=jnp.logical_not(out["alive"])[None])
        labels = LevelLabels(gt_pos[None], gt_class[None])
        h, w = out["grid"]
        loss = (transport_level_loss(out["plan"][None], res, labels, h, w,
                                     dustbin_mismatch_weight=dustbin_w)
                + scale_anchor_loss(out["scales_head"][None], labels, h, w))
        return loss, mut["batch_stats"]

    def _loss_fn(self, params, batch_stats, rng, dustbin_w, batch):
        rngs = jax.random.split(rng, batch["left"].shape[0])
        losses, stats = jax.vmap(
            self._pair_loss, in_axes=(None, None, 0, None, 0, 0, 0, 0))(
            params, batch_stats, rngs, dustbin_w, batch["left"],
            batch["right"], batch["gt_pos"], batch["gt_class"])
        # per-pair EMA'd running stats, averaged across the batch: the
        # carried running statistics must track training (round-3: eval
        # with init stats rejected everything — models/norm.py note)
        return jnp.mean(losses), jax.tree.map(lambda s: jnp.mean(s, 0),
                                              stats)

    @partial(jax.jit, static_argnums=0)
    def _step(self, state: TrainState, rng, batch
              ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        # anneal the anti-collapse dustbin term once collapse danger passes
        # (round-2 curve: precision dipped mid-run while loss kept falling)
        dustbin_w = dustbin_weight_schedule(state.step,
                                            final=self.dustbin_final)
        (loss, new_stats), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(
            state.params, state.batch_stats, rng, dustbin_w, batch)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        new_state = TrainState(params, new_stats, opt_state,
                               state.step + 1)
        gnorm = optax.global_norm(grads)
        # grad_norm is the RAW norm (can be huge at random init); the
        # optimizer clips to clip_norm first, so also report what is
        # actually applied
        return new_state, {"loss": loss, "grad_norm": gnorm,
                           "update_norm": optax.global_norm(updates)}

    def step(self, state: TrainState, rng, batch):
        """batch: dict with left/right (B, H, W, 3) float images and
        gt_pos (B, G, 2) / gt_class (B, G) labels, B divisible by the data
        axis size.  Arrays are placed with the batch sharded over data."""
        batch = {k: jax.device_put(jnp.asarray(v), self.batch_sharding)
                 for k, v in batch.items()}
        return self._step(state, rng, batch)
