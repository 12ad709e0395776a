"""High-level matching API: the user-facing equivalent of reference PATS.

    matcher = Matcher(config)                 # random init, or
    matcher = Matcher.from_torch_checkpoints(config, c1, c2, c3)
    ml, mr = matcher.match(image0, image1)    # uint8/float HWC images

Compiled executables are cached per input resolution; images must be
/32-aligned (the data layer guarantees this).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pats_tpu.config import PATSConfig
from pats_tpu.models.cascade import PATSCascade


def _enable_compile_cache():
    """Persistent XLA compilation cache: full-cascade compiles take minutes
    through the TPU tunnel; cache them across processes."""
    import os

    try:
        if jax.config.jax_compilation_cache_dir is None:
            jax.config.update(
                "jax_compilation_cache_dir",
                os.path.expanduser("~/.cache/jax_comp_cache"))
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:      # noqa: BLE001 - cache is an optimization only
        pass


class Matcher:
    def __init__(self, config: PATSConfig, variables: Optional[dict] = None,
                 seed: int = 0):
        _enable_compile_cache()
        self.config = config
        self.model = PATSCascade(config=config.model,
                                 outdoor=config.eval.if_outdoor,
                                 merge_new=config.eval.merge_new)
        self._fns: Dict[Tuple[int, int], object] = {}
        if variables is None:
            left = jnp.zeros((96, 96, 3), jnp.float32)
            variables = jax.jit(self.model.init)(
                jax.random.PRNGKey(seed), left, left)
        self.variables = variables

    @classmethod
    def from_torch_checkpoints(cls, config: PATSConfig, coarse: str,
                               fine: str, refine: str) -> "Matcher":
        from pats_tpu.io.convert import load_reference_checkpoints

        variables = load_reference_checkpoints(coarse, fine, refine)
        variables = jax.tree.map(jnp.asarray, variables)
        return cls(config, variables=variables)

    def _fn(self, shape: Tuple[int, int]):
        if shape not in self._fns:
            def fwd(variables, left, right):
                out, _ = self.model.apply(variables, left, right,
                                          mutable=["batch_stats"])
                return out

            self._fns[shape] = jax.jit(fwd)
        return self._fns[shape]

    def match_raw(self, image0, image1) -> dict:
        """Run the cascade; returns the fixed-capacity device outputs."""
        left = jnp.asarray(image0, jnp.float32)
        right = jnp.asarray(image1, jnp.float32)
        assert left.shape[0] % 32 == 0 and left.shape[1] % 32 == 0, left.shape
        return self._fn(left.shape[:2])(self.variables, left, right)

    def match(self, image0, image1) -> Tuple[np.ndarray, np.ndarray]:
        """Dense correspondences: (N, 2) (row, col) arrays for both images
        (the reference's matches_l / matches_r, models/pats.py:81-85)."""
        out = self.match_raw(image0, image1)
        valid = np.asarray(out["valid"])
        ml = np.asarray(out["matches_l"])[valid]
        mr = np.asarray(out["matches_r"])[valid]
        return ml, mr

    def embed(self, image) -> np.ndarray:
        """Single-image global descriptor for place recognition (loop
        closure): coarse-trunk features, spatially mean-pooled and
        L2-normalized.  Uses only this image (unlike the GNN descriptors,
        which are cross-conditioned on the pair)."""
        from pats_tpu.models.backbone import CoarseTrunk
        from pats_tpu.models.coarse import imagenet_normalize

        shape = ("embed",) + tuple(np.shape(image)[:2])
        if shape not in self._fns:
            trunk = CoarseTrunk()

            def efn(variables, img):
                feats = trunk.apply(
                    {"params": variables["params"]["coarse"]["trunk"],
                     "batch_stats":
                         variables["batch_stats"]["coarse"]["trunk"]},
                    imagenet_normalize(img[None]))
                v = jnp.mean(feats.astype(jnp.float32), axis=(0, 1, 2))
                return v / (jnp.linalg.norm(v) + 1e-8)

            self._fns[shape] = jax.jit(efn)
        return np.asarray(self._fns[shape](
            self.variables, jnp.asarray(image, jnp.float32)))
