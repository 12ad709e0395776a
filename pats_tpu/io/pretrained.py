"""Pretrained trunk initialization for the level-2/3 trainers.

The reference constructs its fine/refine feature trunks (ResNet2,
resnet.py:149-166 = resnet34's stem + layer1 (3 blocks) + layer2
(4 blocks)) and overlays torchvision ``resnet34(pretrained=True)``
weights by key intersection (second_layer.py:26-30,
third_layer.py:99-103).  This environment has no torchvision and no
network egress, so the equivalent here takes a resnet34-style state
dict FILE (``torch.save``d, e.g. torchvision's
``resnet34-b627a593.pth``) and overlays the matching subset onto a
FineMatcher / SubpixelRefiner variable tree through the standard
converter layout transforms (io/convert.py).
"""

from __future__ import annotations

from typing import Dict, Mapping

from pats_tpu.io.convert import Tree, _Mapper

_TRUNK_STAGES = {"layer1": 3, "layer2": 4}


def trunk_variables_from_resnet34(sd: Mapping[str, object]
                                  ) -> Dict[str, Tree]:
    """resnet34 state dict -> {params, batch_stats} for the ``trunk``
    subtree of FineMatcher/SubpixelRefiner (conv1/bn1/layer1/layer2;
    fc/layer3/layer4 keys are ignored, matching the reference's key
    intersection)."""
    keep = {}
    for k, v in sd.items():
        stage = k.split(".", 1)[0]
        if stage in ("conv1", "bn1") or stage in _TRUNK_STAGES:
            keep["r." + k] = v      # _Mapper keys are "<module>.<param>"
    m = _Mapper(keep)
    m.resnet("r", _TRUNK_STAGES, "trunk")
    return m.variables()


def _merge(dst: Tree, src: Tree):
    for k, v in src.items():
        if isinstance(v, dict):
            _merge(dst.setdefault(k, {}), v)
        else:
            dst[k] = v


def init_trunk_from_resnet34(variables: Dict[str, Tree],
                             sd: Mapping[str, object]) -> Dict[str, Tree]:
    """Return a copy of ``variables`` (a FineMatcher or SubpixelRefiner
    variable tree) with its trunk params/batch_stats replaced by the
    resnet34 weights.  Non-trunk entries are untouched."""
    import jax

    out = jax.tree_util.tree_map(lambda x: x, variables)  # shallow copy tree
    trunk = trunk_variables_from_resnet34(sd)
    _merge(out.setdefault("params", {}), trunk["params"])
    _merge(out.setdefault("batch_stats", {}), trunk["batch_stats"])
    return out


def load_resnet34_file(path: str) -> Dict[str, object]:
    """Load a ``torch.save``d resnet34 state dict from disk."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return dict(sd)
