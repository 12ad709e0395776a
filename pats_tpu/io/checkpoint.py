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
        return ckptr.restore(path)


def load_matcher_checkpoint(path: str, variables: dict) -> dict:
    """Restore a full-cascade checkpoint, or overlay a coarse-only one
    (what tools/train_run.py --save writes) onto the given variables'
    fine/refine levels."""
    try:
        return load_checkpoint(path, like=variables)
    except Exception:                            # noqa: BLE001
        like = {"params": variables["params"]["coarse"],
                "batch_stats": variables["batch_stats"]["coarse"]}
        got = load_checkpoint(path, like=like)
        out = {"params": dict(variables["params"]),
               "batch_stats": dict(variables["batch_stats"])}
        out["params"]["coarse"] = got["params"]
        out["batch_stats"]["coarse"] = got["batch_stats"]
        return out
