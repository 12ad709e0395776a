"""Load the reference torch implementation (/root/reference) on CPU.

The reference imports several packages that are absent from this
environment (torchvision, kornia, the tensor_resize native op, imagesize,
pydegensac, open3d, plotly).  This harness registers faithful minimal
shims for the pieces that sit on the model forward path and empty stubs
for the rest, then imports the reference modules so parity tests can run
the real reference code with shared random weights.

Shim semantics (verified against the reference sources):

- ``torchvision.transforms.Normalize``: channelwise ``(x - mean) / std``
  on NCHW tensors (first_layer.py:48).
- ``torchvision.transforms.functional.resize``: bilinear,
  ``align_corners=False``, NO antialiasing -> ``F.interpolate``.  The
  reference environment.yaml pins a torchvision generation that predates
  the antialias default flip, so antialias-off is the faithful semantic
  (and what the published checkpoints were trained with).
- ``torchvision.models.resnet34(pretrained=True)``: object whose
  ``state_dict()`` is empty.  SecondLayer/ThirdLayer only use it to seed
  trunk init (second_layer.py:26-30, third_layer.py:99-103); parity tests
  randomize/overwrite those weights anyway.
- ``tensor_resize.tensor_resize``: transcription of the reference C++ op
  (setup/library.cpp:47-66): per-box crop with rows [r0, r1) and cols
  [c0, c1] (r1-exclusive / c1-INCLUSIVE), bilinear align_corners=True
  upsample to 96x96; box row 4 encodes ``sequence`` with image index
  ``sequence // 10000``.
- ``kornia.utils.grid.create_meshgrid(h, w, False)``: (1, h, w, 2) pixel
  grid with last-dim order (x, y) (only the non-normalized form is used,
  third_layer.py:199,209).
- ``torch.Tensor.cuda`` is patched to a no-op so the reference's
  unconditional ``.cuda()`` at models/pats.py:76 runs on CPU.
"""

from __future__ import annotations

import sys
import types
from typing import Optional

import torch
import torch.nn.functional as F

_REFERENCE_ROOT = "/root/reference"
_loaded: Optional[types.SimpleNamespace] = None


def _stub(name: str) -> types.ModuleType:
    mod = types.ModuleType(name)
    sys.modules[name] = mod
    return mod


def _build_torchvision() -> None:
    tv = _stub("torchvision")
    transforms = _stub("torchvision.transforms")
    functional = _stub("torchvision.transforms.functional")
    models = _stub("torchvision.models")
    tv.transforms = transforms
    transforms.functional = functional
    tv.models = models

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(1, -1, 1, 1)
            self.std = torch.tensor(std).view(1, -1, 1, 1)

        def __call__(self, x):
            return (x - self.mean.to(x)) / self.std.to(x)

    def resize(img, size, **kwargs):
        return F.interpolate(img, size=list(size), mode="bilinear",
                             align_corners=False)

    class _EmptyWeights:
        def state_dict(self):
            return {}

    transforms.Normalize = Normalize
    functional.resize = resize
    models.resnet34 = lambda *a, **k: _EmptyWeights()
    models.resnet18 = lambda *a, **k: _EmptyWeights()


def _build_tensor_resize() -> None:
    mod = _stub("tensor_resize")

    def tensor_resize(input_tensor, bound):
        out = torch.zeros(bound.shape[0], input_tensor.shape[1], 96, 96,
                          dtype=torch.float32, device=input_tensor.device)
        for i in range(bound.shape[0]):
            seq = int(bound[i, 4])
            r0, r1 = int(bound[i, 0]), int(bound[i, 1])
            c0, c1 = int(bound[i, 2]), int(bound[i, 3])
            patch = input_tensor[seq // 10000, :, r0:r1, c0:c1 + 1][None]
            out[i] = F.interpolate(patch.float(), size=(96, 96),
                                   mode="bilinear", align_corners=True)[0]
        return out

    mod.tensor_resize = tensor_resize


def _build_kornia() -> None:
    kornia = _stub("kornia")
    utils = _stub("kornia.utils")
    grid = _stub("kornia.utils.grid")
    kornia.utils = utils
    utils.grid = grid

    def create_meshgrid(height, width, normalized_coordinates=True,
                        device=None, dtype=None):
        ys, xs = torch.meshgrid(
            torch.arange(height, device=device, dtype=torch.float32),
            torch.arange(width, device=device, dtype=torch.float32),
            indexing="ij")
        if normalized_coordinates:
            xs = 2.0 * xs / max(width - 1, 1) - 1.0
            ys = 2.0 * ys / max(height - 1, 1) - 1.0
        return torch.stack([xs, ys], dim=-1)[None]

    grid.create_meshgrid = create_meshgrid


def load_reference() -> types.SimpleNamespace:
    """Import the reference modules (cached); returns a namespace with
    ``first_layer``, ``second_layer``, ``third_layer``, ``pats``,
    ``modules``, ``utils`` (= utils.utils)."""
    global _loaded
    if _loaded is not None:
        return _loaded

    for name in ["imagesize", "pydegensac", "open3d", "plotly"]:
        if name not in sys.modules:
            _stub(name)
    # numpy 2.x removed these legacy import paths (utils/utils.py:2-4)
    import numpy as np
    if "numpy.lib.function_base" not in sys.modules:
        _stub("numpy.lib.function_base").average = np.average
    if "numpy.core.numeric" not in sys.modules:
        _stub("numpy.core.numeric").zeros_like = np.zeros_like
    if getattr(np, "ma", None) is None:  # pragma: no cover
        import numpy.ma  # noqa: F401
    if "torchvision" not in sys.modules:
        _build_torchvision()
    if "tensor_resize" not in sys.modules:
        _build_tensor_resize()
    if "kornia" not in sys.modules:
        _build_kornia()

    torch.Tensor.cuda = lambda self, *a, **k: self  # models/pats.py:76

    if _REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, _REFERENCE_ROOT)

    import models.first_layer as first_layer
    import models.second_layer as second_layer
    import models.third_layer as third_layer
    import models.pats as pats
    import models.modules as modules
    import utils.utils as ref_utils

    _loaded = types.SimpleNamespace(
        first_layer=first_layer, second_layer=second_layer,
        third_layer=third_layer, pats=pats, modules=modules,
        utils=ref_utils)
    return _loaded


def randomize_bn_stats(module: torch.nn.Module, seed: int = 0) -> None:
    """Give every BatchNorm non-trivial running stats + affine params so
    parity tests exercise the stats path, not the (0, 1) defaults."""
    gen = torch.Generator().manual_seed(seed)
    for m in module.modules():
        if isinstance(m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d)):
            with torch.no_grad():
                m.running_mean.normal_(0.0, 0.5, generator=gen)
                m.running_var.uniform_(0.5, 2.0, generator=gen)
                m.weight.normal_(1.0, 0.2, generator=gen)
                m.bias.normal_(0.0, 0.2, generator=gen)
