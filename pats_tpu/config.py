"""Typed configuration tree for the PATS-TPU framework.

The reference injects raw YAML keys into an argparse namespace with no schema
(reference: evaluate.py:96-100) and hides per-layer hyperparameters in
hardcoded dicts (first_layer.py:10-17, second_layer.py:11-20) and inline
magic numbers.  Here every knob is a named, typed field with validation.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence, Tuple

import yaml


@dataclass(frozen=True)
class CoarseConfig:
    """Level-1 coarse matcher (32-px patch areas).

    Mirrors reference defaults at first_layer.py:10-17.
    """

    descriptor_dim: int = 448
    keypoint_encoder: Tuple[int, ...] = (32, 64, 128, 256, 512)
    gnn_layers: int = 18              # alternating self/cross, starts with self
    num_heads: int = 4
    sinkhorn_iterations: int = 100
    score_temperature: float = 0.1    # scores are scaled by 0.1 before OT
    patch_size: int = 32
    expand_iters: int = 15            # region-grow iterations (utils.py:1176)
    expand_lower_bound: float = 1e-5


@dataclass(frozen=True)
class FineConfig:
    """Level-2 fine matcher (8-px cells inside 96x96 crops).

    Mirrors reference defaults at second_layer.py:11-20.
    """

    descriptor_dim: int = 264
    gnn_layers: int = 18
    num_heads: int = 4
    sinkhorn_iterations: int = 100
    score_temperature: float = 0.1
    grid_size: int = 12               # 12x12 cells per 96x96 crop
    patch_size: int = 8
    expand_iters: int = 8
    expand_lower_bound: float = 1e-3
    title_dim: int = 8                # coarse-descriptor "title" channels


@dataclass(frozen=True)
class RefineConfig:
    """Level-3 sub-pixel refiner (2-px granularity).

    Mirrors reference constants at third_layer.py:80-110.
    """

    descriptor_dim: int = 128
    gnn_layers: int = 10
    num_heads: int = 4
    sinkhorn_iterations: int = 100
    score_temperature: float = 0.1
    window: int = 8                   # W: unfolded window side
    padded_map: int = 52              # M: 48 + 2*2 zero padding
    neighborhood: int = 5             # T: soft-argmax neighborhood


@dataclass(frozen=True)
class ModelConfig:
    coarse: CoarseConfig = field(default_factory=CoarseConfig)
    fine: FineConfig = field(default_factory=FineConfig)
    refine: RefineConfig = field(default_factory=RefineConfig)
    # Run level-3 BatchNorm with batch statistics at inference.  The reference
    # deliberately keeps ThirdLayer in train() mode when if_local=False
    # (models/pats.py:112-118); reproduce behind a flag.
    refine_batch_stats: bool = True
    # bf16 matmuls on the MXU (weights stay f32; numerics stay f32).
    use_bfloat16: bool = False
    # Pallas fused attention for the short-sequence GNN levels (TPU only).
    use_fused_attention: bool = False
    # Pallas fused Sinkhorn for levels 2/3 (TPU only).
    use_pallas_sinkhorn: bool = False
    # Sinkhorn early exit: stop iterating once the row potential moves
    # < tol (sup-norm).  0 = the reference's exact fixed iteration count;
    # 1e-4 converges 2-3x earlier with plan differences below f32 noise
    # (throughput mode).
    sinkhorn_tol: float = 0.0
    # Capacity-bucketed refine: when > 0, the level-3 point batch gets a
    # second compiled branch at ceil(frac * 16G) capacity and the graph
    # picks it (lax.cond, one executable, no host sync) whenever every
    # pair's surviving cell count fits.  Trained occupancy measures ~47%
    # of the worst-case 16G capacity (docs/perf.md), so 0.5 roughly
    # halves the point-indexed refine work (GNN + OT + unfold) on
    # typical pairs while keeping the exact full-capacity fallback.
    # 0 = off (always full capacity, the reference-parity default).
    refine_bucket: float = 0.0
    # Deepest cascade level to run: 3 = full sub-pixel cascade (the
    # reference's only mode), 2 = stop after the fine level (8-px
    # matches, one per surviving 12x12 cell), 1 = coarse-only (32-px
    # patch matches).  Shallower modes are cheaper and let partially
    # trained checkpoints (e.g. coarse-only) be evaluated without
    # running random downstream levels.
    max_level: int = 3


@dataclass(frozen=True)
class RuntimeConfig:
    """Execution-environment knobs (mesh axis names).

    Levels 2/3 always run as one fixed-capacity batch: chunked execution
    (the reference's split_patches, utils/utils.py:152-181) was measured
    unnecessary on TPU up to 1600-px inputs (905 ms/pair at 1024 px,
    2690 ms/pair at 1600 px on one v5e chip with bf16 + the VMEM-guarded
    Sinkhorn) — see STATUS.md round 1.
    """

    # Mesh axis names; data axis shards image pairs across devices.
    data_axis: str = "data"
    model_axis: str = "model"


@dataclass(frozen=True)
class EvalConfig:
    dataset: str = "MegaDepth"        # MegaDepth | ScanNet | YFCC
    data_path: str = ""
    pairs_path: str = ""
    checkpoint: str = ""              # converted orbax checkpoint dir (all levels)
    seed: int = 18027                 # reference seed (configs/test_*.yaml)
    threshold: float = 0.25           # RANSAC px threshold: 0.25 outdoor / 0.4 indoor
    if_outdoor: bool = True
    merge_new: bool = True            # merge_patches_new vs _old (second_layer.py:119-122)
    scale_factor: float = 1.0


@dataclass(frozen=True)
class PATSConfig:
    model: ModelConfig = field(default_factory=ModelConfig)
    runtime: RuntimeConfig = field(default_factory=RuntimeConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)


def _update(cfg: Any, overrides: dict) -> Any:
    """Recursively apply a nested dict of overrides to a frozen dataclass."""
    changes = {}
    names = {f.name: f for f in dataclasses.fields(cfg)}
    for key, value in overrides.items():
        if key not in names:
            raise KeyError(
                f"unknown config key {key!r} for {type(cfg).__name__}; "
                f"valid keys: {sorted(names)}"
            )
        current = getattr(cfg, key)
        if dataclasses.is_dataclass(current) and isinstance(value, dict):
            changes[key] = _update(current, value)
        else:
            if isinstance(current, tuple) and isinstance(value, (list, tuple)):
                value = tuple(value)
            changes[key] = value
    return dataclasses.replace(cfg, **changes)


def load_config(path: Optional[str] = None, overrides: Optional[dict] = None) -> PATSConfig:
    """Build a PATSConfig from an optional YAML file plus overrides.

    YAML layout mirrors the dataclass tree, e.g.::

        eval:
          dataset: ScanNet
          threshold: 0.4
          if_outdoor: false
    """
    cfg = PATSConfig()
    if path is not None:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        cfg = _update(cfg, data)
    if overrides:
        cfg = _update(cfg, overrides)
    return cfg


def reference_yaml_to_config(path: str) -> PATSConfig:
    """Load a reference-style flat YAML (configs/test_*.yaml keys: dataset,
    data_path, pairs_path, seed, threshold, if_outdoor, merge_new, if_local)
    into the typed tree, for drop-in compatibility."""
    with open(path) as f:
        flat = yaml.safe_load(f) or {}
    eval_keys = {
        "dataset", "data_path", "pairs_path", "seed", "threshold",
        "if_outdoor", "merge_new", "checkpoint",
    }
    eval_over = {k: v for k, v in flat.items() if k in eval_keys}
    model_over = {}
    if "if_local" in flat:
        # if_local=True => ThirdLayer genuinely in eval mode (pats.py:112-118)
        model_over["refine_batch_stats"] = not flat["if_local"]
    return load_config(None, {"eval": eval_over, "model": model_over})
