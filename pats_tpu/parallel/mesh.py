"""Device-mesh construction and sharding helpers.

The reference is strictly single-GPU batch-1 (SURVEY.md par.2.7).  Here
scale-out is first-class: image pairs shard over a ``data`` axis (the
embarrassingly-parallel axis of the matching problem) and an optional
``model`` axis is reserved for sharding level-1 attention/Sinkhorn over
very large images.  Collectives ride ICI within a slice; ``psum`` handles
the gradient/metric reductions.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: Optional[int] = None, model: int = 1,
              devices: Optional[Sequence] = None,
              data_axis: str = "data", model_axis: str = "model") -> Mesh:
    """Build a (data, model) mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // model
    assert data * model <= len(devices), (data, model, len(devices))
    grid = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(grid, (data_axis, model_axis))


def data_parallel_sharding(mesh: Mesh, data_axis: str = "data"
                           ) -> NamedSharding:
    """Leading-axis sharding for per-pair batches."""
    return NamedSharding(mesh, P(data_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Bootstrap the jax.distributed runtime on a multi-host pod slice.

    On a real pod slice the arguments come from the environment; for CPU
    simulation tests this is a no-op when jax.distributed is already
    initialized or a single process is detected.
    """
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
