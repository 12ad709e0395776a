"""Shared optimizer factory for the three level trainers.

The reference never shipped training code (SURVEY.md par.3.4); its
released checkpoints were trained with Adam.  This factory hardens the
TPU trainers for real runs: global-norm gradient clipping (the round-1
multichip dryrun measured grad_norm ~2.3e6 on random init) and a
warmup + cosine-decay schedule, both standard for matcher training.
"""

from __future__ import annotations

from typing import Optional

import optax


def make_optimizer(learning_rate: float = 1e-4,
                   total_steps: Optional[int] = None,
                   warmup_steps: int = 0,
                   clip_norm: Optional[float] = 1.0,
                   weight_decay: float = 0.0) -> optax.GradientTransformation:
    """Adam(W) with global-norm clipping and optional warmup-cosine decay.

    ``total_steps=None`` keeps a constant learning rate (the smoke-test
    configuration); passing it enables linear warmup over
    ``warmup_steps`` then cosine decay to 1e-2 x peak.  ``clip_norm=None``
    disables clipping.
    """
    if total_steps is not None:
        # optax requires decay_steps > warmup_steps; clamp so tiny smoke
        # runs (total < warmup) don't crash
        warmup_steps = min(warmup_steps, max(total_steps - 1, 0))
        schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else learning_rate,
            peak_value=learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=total_steps,
            end_value=learning_rate * 1e-2)
    else:
        schedule = learning_rate
    opt = (optax.adamw(schedule, weight_decay=weight_decay)
           if weight_decay else optax.adam(schedule))
    if clip_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(clip_norm), opt)
    # skip (don't apply) non-finite updates instead of poisoning the
    # params: fully-degenerate batches (zero alive matches through a cold
    # front-end) can produce NaN gradients via 0/0 VJPs even though the
    # masked loss itself is finite.  NOTE optax semantics: after
    # max_consecutive_errors consecutive non-finite updates apply_if_finite
    # GIVES UP and applies the (NaN) update anyway — it does not raise.
    # Callers must watch ``notfinite_count`` (below) and abort the run
    # before that happens; tools/train_run.py does.
    return optax.apply_if_finite(opt, max_consecutive_errors=100)


def notfinite_count(opt_state) -> int:
    """Consecutive non-finite update count of an apply_if_finite state.

    Returns 0 for optimizer states not wrapped by apply_if_finite (or
    after jax transforms that re-wrap the state), so callers can always
    threshold on it.
    """
    return getattr(opt_state, "notfinite_count", 0)
