"""Patch-sharded levels 2/3: one pair's crop work spread over the mesh.

The reference bounds level-2/3 memory by SERIALIZING patch work into
``split_patches`` cycles on one GPU (utils/utils.py:152-181,
first_layer.py:131-135).  The TPU-native replacement (SURVEY.md par.2.7)
runs the flat fixed-capacity crop batch with its leading axis sharded
over the mesh: each chip holds G/k of the 96x96 crops, their backbone
convs, GNN tokens and transport matrices; XLA/GSPMD inserts the
collectives for the per-pair merge, the level-3 compaction and the
grouped batch statistics.  Combined with ``sp_coarse_forward`` (level-1
token sharding) this scales a SINGLE large pair across chips - the
latency complement to the pair-sharded ``ShardedMatcher`` throughput
path.

The model math is ``PATSCascadeBatched`` with ``patch_sharding`` set;
this module is the convenience entry point + the numerics contract
(tested equal to the dense single-device cascade on the virtual mesh).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pats_tpu.config import ModelConfig
from pats_tpu.models.cascade import PATSCascadeBatched


def patch_sharded_cascade(config: ModelConfig, mesh: Mesh,
                          axis: str = "data", outdoor: bool = True,
                          merge_new: bool = True) -> PATSCascadeBatched:
    """The batched cascade with levels 2/3 sharded over ``mesh[axis]``."""
    return PATSCascadeBatched(
        config=config, outdoor=outdoor, merge_new=merge_new,
        patch_sharding=NamedSharding(mesh, P(axis)))


def match_pair_patch_sharded(variables, left: jnp.ndarray,
                             right: jnp.ndarray, config: ModelConfig,
                             mesh: Mesh, axis: str = "data",
                             outdoor: bool = True, merge_new: bool = True,
                             ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                        jnp.ndarray]:
    """Match ONE (H, W, 3) pair with its patch work sharded over the mesh.

    Returns (matches_l, matches_r, valid) with the fixed PATSCascade
    shapes; compact on host with ``valid``.
    """
    model = patch_sharded_cascade(config, mesh, axis, outdoor, merge_new)

    @jax.jit
    def fwd(v, a, b):
        out, _ = model.apply(v, a[None], b[None], mutable=["batch_stats"])
        return out["matches_l"][0], out["matches_r"][0], out["valid"][0]

    return fwd(variables, left, right)
