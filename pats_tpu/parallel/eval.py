"""Batched, data-parallel matching: B pairs per compiled step.

The matching problem is embarrassingly parallel over image pairs
(SURVEY.md par.2.7): this runner vmaps the cascade over a pair batch and
shards the batch over the mesh's ``data`` axis.  On one chip it still
pays off - batching fills the MXU far better than the reference's
batch-1 loop ever could.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pats_tpu.config import PATSConfig
from pats_tpu.models.cascade import PATSCascadeBatched


class ShardedMatcher:
    """Evaluate pairs in sharded batches of ``batch_size``."""

    def __init__(self, config: PATSConfig, mesh: Mesh, variables,
                 batch_size: Optional[int] = None):
        self.config = config
        self.mesh = mesh
        self.variables = variables
        data = mesh.shape[config.runtime.data_axis]
        self.batch_size = batch_size or data
        assert self.batch_size % data == 0, (self.batch_size, data)
        # natively pair-batched cascade: levels 2/3 run flat over B*G
        # crops (vs jax.vmap(PATSCascade), whose rank-5 activations cost
        # ~15-20% of the step in conv-layout copies)
        self.model = PATSCascadeBatched(config=config.model,
                                        outdoor=config.eval.if_outdoor,
                                        merge_new=config.eval.merge_new)
        self._fns: Dict[Tuple[int, int], object] = {}
        self.batch_sharding = NamedSharding(mesh, P(config.runtime.data_axis))
        self.replicated = NamedSharding(mesh, P())

    def _fn(self, shape):
        if shape not in self._fns:
            def fwd(variables, left, right):
                out, _ = self.model.apply(variables, left, right,
                                          mutable=["batch_stats"])
                return (out["matches_l"], out["matches_r"], out["valid"],
                        out["num_coarse"], out["num_fine"])

            self._fns[shape] = jax.jit(
                fwd,
                in_shardings=(self.replicated, self.batch_sharding,
                              self.batch_sharding),
                out_shardings=self.replicated)
        return self._fns[shape]

    def dispatch_batch(self, images0, images1,
                       batch_size: Optional[int] = None):
        """Asynchronously launch matching for a batch; returns a handle.

        JAX dispatch is async: the returned handle holds device arrays
        whose computation is in flight.  The caller overlaps host work
        (preprocessing the next batch, pose-RANSAC of the previous one)
        with device execution and calls :meth:`collect` to sync.
        """
        B = len(images0)
        data = self.mesh.shape[self.config.runtime.data_axis]
        BS = batch_size or self.batch_size
        BS = -(-max(BS, B) // data) * data
        left = np.zeros((BS,) + np.shape(images0[0]), np.float32)
        right = np.zeros_like(left)
        left[:B] = images0
        right[:B] = images1
        fn = self._fn(left.shape[:3])
        out = fn(self.variables,
                 jax.device_put(left, self.batch_sharding),
                 jax.device_put(right, self.batch_sharding))
        return (out, B)

    def collect(self, handle) -> List[Tuple[np.ndarray, np.ndarray]]:
        """Sync a :meth:`dispatch_batch` handle to host arrays."""
        (ml, mr, valid, n_c, n_f), B = handle
        ml = np.asarray(ml)
        mr = np.asarray(mr)
        valid = np.asarray(valid)
        n_c = np.asarray(n_c)
        n_f = np.asarray(n_f)
        # per-level occupancy of the last batch (observability side
        # channel; consumed by evaluate's JSONL shard records)
        self.last_stats = [
            {"n_coarse": int(n_c[i]), "n_fine": int(n_f[i]),
             "n_matches": int(valid[i].sum())} for i in range(B)]
        return [(ml[i][valid[i]], mr[i][valid[i]]) for i in range(B)]

    def match_batch(self, images0, images1,
                    batch_size: Optional[int] = None
                    ) -> List[Tuple[np.ndarray, np.ndarray]]:
        """images0/images1: (B, H, W, 3) arrays (B <= batch_size; padded
        internally).  ``batch_size`` overrides the construction-time batch
        for this call (rounded up to a multiple of the data-axis size) —
        large-resolution buckets use smaller batches to bound the cascade's
        HBM footprint.  Returns per-pair compacted (ml, mr) host arrays."""
        return self.collect(self.dispatch_batch(images0, images1, batch_size))
