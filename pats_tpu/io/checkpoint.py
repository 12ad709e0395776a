"""Orbax checkpointing of the full variable tree.

The reference only ever loads three separate torch files with prefix
munging (models/pats.py:88-109) and cannot save.  Here a single pytree
(params + batch_stats, optionally optimizer state) round-trips through
orbax; ``convert`` (pats_tpu.io.convert) produces the same tree from the
published torch checkpoints once, after which everything is orbax.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def save_checkpoint(path: str, tree: Any) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, tree, force=True)


def load_checkpoint(path: str, like: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if like is not None:
            abstract = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like)
            return ckptr.restore(path, abstract)
        # no target tree: build abstract targets from the checkpoint's own
        # metadata.  A bare restore replays the SAVED shardings, which
        # breaks cross-platform restores (a CPU-assembled checkpoint names
        # TFRT_CPU_0, absent on the TPU) — abstract ShapeDtypeStructs
        # restore to the current default device instead.
        meta = ckptr.metadata(path).item_metadata
        # local_devices()[0]: jax.devices()[0] may be non-addressable in a
        # multi-process run (advisor r3); the bare path is single-host
        # convenience — mesh-aware callers pass `like`
        sharding = jax.sharding.SingleDeviceSharding(jax.local_devices()[0])
        abstract = jax.tree.map(
            lambda m: jax.ShapeDtypeStruct(m.shape, m.dtype,
                                           sharding=sharding), meta.tree)
        return ckptr.restore(path, abstract)


def load_matcher_checkpoint(path: str, variables: dict) -> dict:
    """Overlay a checkpoint onto a matcher's variable tree, level by level.

    Accepts either layout:
      - a full/partial matcher tree ({params,batch_stats} x subset of
        {coarse,fine,refine}, what tools/assemble_ckpt.py writes), or
      - a bare single-level tree (what tools/train_run.py --save writes),
        assumed to be the coarse level.

    Levels present in the checkpoint but absent from ``variables`` (a
    max_level<3 model restoring a full checkpoint) are skipped; levels
    absent from the checkpoint keep the given init.
    """
    import jax.numpy as jnp

    got = load_checkpoint(path)
    levels = ("coarse", "fine", "refine")
    if not set(got["params"]) & set(levels):
        got = {"params": {"coarse": got["params"]},
               "batch_stats": {"coarse": got["batch_stats"]}}
    out = {"params": dict(variables["params"]),
           "batch_stats": dict(variables["batch_stats"])}
    for lv in levels:
        if lv in got["params"] and lv in out["params"]:
            out["params"][lv] = jax.tree.map(jnp.asarray,
                                             got["params"][lv])
            out["batch_stats"][lv] = jax.tree.map(
                jnp.asarray, got["batch_stats"][lv])
    return out
