"""PATS-TPU: a TPU-native (JAX/XLA/Pallas) dense local-feature matching framework.

Re-implements the capabilities of zju3dv/pats (CVPR 2023, "Patch Area
Transportation with Subdivision for Local Feature Matching") as a
TPU-first framework:

- three-level coarse->fine->sub-pixel matching cascade
  (reference: models/pats.py, models/{first,second,third}_layer.py)
- patch-area optimal transport with learned per-patch scales
  (reference: models/modules.py:137-196)
- region-growing transport consumer (reference: utils/utils.py:1179-1297)
  re-designed around summed-area tables for O(1) expansion steps
- fixed-capacity masked batching replacing the reference's dynamic
  boolean filtering and host-side work chunking (utils/utils.py:152-181)
- SPMD scale-out via jax.sharding Mesh (the reference is single-GPU)

The package is organized as:
  ops/       pure numeric kernels (Sinkhorn, expansion, sampling, merge, compose)
  models/    flax.linen network modules (backbones, GNN, cascade levels)
  parallel/  mesh construction, sharding specs, multi-host bootstrap
  data/      datasets (MegaDepth / ScanNet / YFCC / video) + host pipeline
  train/     losses, label generation, trainer
  utils/     metrics (pose AUC), geometry, profiling
  io/        checkpointing (orbax) + torch->jax weight conversion
"""

__version__ = "0.1.0"

__all__ = ["Matcher", "PATSConfig", "load_config"]


def __getattr__(name):
    # lazy top-level conveniences: pats_tpu.Matcher / load_config
    if name == "Matcher":
        from pats_tpu.matcher import Matcher

        return Matcher
    if name in ("PATSConfig", "load_config"):
        import pats_tpu.config as _c

        return getattr(_c, name)
    raise AttributeError(name)
