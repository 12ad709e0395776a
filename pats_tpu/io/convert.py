"""torch -> flax weight conversion for the three cascade levels.

The reference ships three separate torch checkpoints with prefix-munging
loaders (models/pats.py:88-109: strip ``module.``; drop ``evaluat*`` keys
for level 2; additionally strip ``matcher.`` for level 3,
third_layer.py:177-181).  This module maps those state dicts onto this
framework's flax variable trees so the published weights run unmodified.

Tensor layout transforms:
  torch Conv2d  (out, in, kh, kw) -> flax Conv kernel (kh, kw, in, out)
  torch Conv1d  (out, in, 1)      -> flax Dense kernel (in, out)
  torch Conv2d 1x1 (out, in, 1, 1)-> flax Dense kernel (in, out) where the
                                     module is applied per-token
  torch BatchNorm weight/bias/running_mean/running_var ->
      params {scale, bias} + batch_stats {mean, var}
"""

from __future__ import annotations

from typing import Dict, Mapping, Tuple

import numpy as np


Tree = Dict[str, object]


def _t(x) -> np.ndarray:
    import torch

    if isinstance(x, torch.Tensor):
        return x.detach().cpu().numpy()
    return np.asarray(x)


def _set(tree: Tree, path: Tuple[str, ...], value: np.ndarray):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


class _Mapper:
    """Accumulates params/batch_stats entries from a torch state dict."""

    def __init__(self, sd: Mapping[str, object]):
        self.sd = dict(sd)
        self.params: Tree = {}
        self.stats: Tree = {}
        self.used = set()

    def get(self, key: str) -> np.ndarray:
        self.used.add(key)
        return _t(self.sd[key])

    def conv2d(self, tkey: str, *path: str, bias: bool = False):
        w = self.get(f"{tkey}.weight")
        _set(self.params, path + ("kernel",), w.transpose(2, 3, 1, 0))
        if bias:
            _set(self.params, path + ("bias",), self.get(f"{tkey}.bias"))

    def dense_from_conv(self, tkey: str, *path: str, bias: bool = True):
        """conv1d (out,in,1) or conv2d 1x1 (out,in,1,1) -> Dense."""
        w = self.get(f"{tkey}.weight")
        w = w.reshape(w.shape[0], w.shape[1])
        _set(self.params, path + ("kernel",), w.T)
        if bias:
            _set(self.params, path + ("bias",), self.get(f"{tkey}.bias"))

    def bn(self, tkey: str, *path: str):
        _set(self.params, path + ("scale",), self.get(f"{tkey}.weight"))
        _set(self.params, path + ("bias",), self.get(f"{tkey}.bias"))
        _set(self.stats, path + ("mean",), self.get(f"{tkey}.running_mean"))
        _set(self.stats, path + ("var",), self.get(f"{tkey}.running_var"))
        self.used.add(f"{tkey}.num_batches_tracked")

    def scalar(self, tkey: str, *path: str):
        _set(self.params, path, _t(self.sd[tkey]).reshape(()))
        self.used.add(tkey)

    # ---- composite modules ----

    def mlp(self, tkey: str, n_layers: int, *path: str):
        """torch MLP() Sequential (conv at 3i, BN at 3i+1) -> MLPStack."""
        for i in range(n_layers):
            self.dense_from_conv(f"{tkey}.{3 * i}", *path, f"dense_{i}")
            if i < n_layers - 1:
                self.bn(f"{tkey}.{3 * i + 1}", *path, f"bn_{i}")

    def basic_block(self, tkey: str, *path: str):
        self.conv2d(f"{tkey}.conv1", *path, "conv1")
        self.bn(f"{tkey}.bn1", *path, "bn1")
        self.conv2d(f"{tkey}.conv2", *path, "conv2")
        self.bn(f"{tkey}.bn2", *path, "bn2")
        if f"{tkey}.downsample.0.weight" in self.sd:
            self.conv2d(f"{tkey}.downsample.0", *path, "down_conv")
            self.bn(f"{tkey}.downsample.1", *path, "down_bn")

    def resnet(self, tkey: str, stages: Mapping[str, int], *path: str):
        self.conv2d(f"{tkey}.conv1", *path, "conv1")
        self.bn(f"{tkey}.bn1", *path, "bn1")
        for stage, blocks in stages.items():
            for b in range(blocks):
                self.basic_block(f"{tkey}.{stage}.{b}", *path, stage,
                                 f"block_{b}")

    def kenc(self, tkey: str, n_layers: int, *path: str):
        self.mlp(f"{tkey}.encoder", n_layers, *path, "encoder")

    def gnn(self, tkey: str, n_layers: int, *path: str, num_heads: int = 4):
        """GNN layers with the head-split permutation folded into weights.

        The reference splits attention channels head-MINOR (channel
        c -> (dim c // H, head c % H), modules.py:102); the runtime uses
        the MXU-friendly head-MAJOR split (c -> (head c // dh, dim c % dh)).
        Permuting the projection output channels (and the merge input
        channels) by old_channel = d * H + h for new channel h * dh + d
        makes the two bit-equivalent.
        """
        # probe one projection to get d_model
        w0 = _t(self.sd[f"{tkey}.layers.0.attn.proj.0.weight"])
        d_model = w0.shape[0]
        dh = d_model // num_heads
        # perm[new] = old: new = h * dh + d  <-  old = d * H + h
        new_idx = np.arange(d_model)
        h, d = new_idx // dh, new_idx % dh
        perm = d * num_heads + h
        for i in range(n_layers):
            lp = path + (f"layer_{i}",)
            for j, name in enumerate(["proj_q", "proj_k", "proj_v"]):
                tk = f"{tkey}.layers.{i}.attn.proj.{j}"
                w = self.get(f"{tk}.weight")
                w = w.reshape(w.shape[0], w.shape[1]).T    # (in, out)
                _set(self.params, lp + ("attn", name, "kernel"), w[:, perm])
                _set(self.params, lp + ("attn", name, "bias"),
                     self.get(f"{tk}.bias")[perm])
            mk = f"{tkey}.layers.{i}.attn.merge"
            w = self.get(f"{mk}.weight")
            w = w.reshape(w.shape[0], w.shape[1]).T        # (in, out)
            _set(self.params, lp + ("attn", "merge", "kernel"), w[perm, :])
            _set(self.params, lp + ("attn", "merge", "bias"),
                 self.get(f"{mk}.bias"))
            self.mlp(f"{tkey}.layers.{i}.mlp", 2, *lp, "mlp")

    def variables(self) -> Dict[str, Tree]:
        return {"params": self.params, "batch_stats": self.stats}


def strip_prefix(sd: Mapping[str, object], prefix: str = "module."
                 ) -> Dict[str, object]:
    out = {}
    for k, v in sd.items():
        out[k[len(prefix):] if k.startswith(prefix) else k] = v
    return out


def convert_coarse(sd: Mapping[str, object]) -> Dict[str, Tree]:
    """FirstLayer state dict (prefix-stripped) -> CoarseMatcher variables."""
    m = _Mapper(sd)
    m.resnet("descriptor_extract",
             {"layer1": 2, "layer2": 2, "layer3": 2, "layer4": 2}, "trunk")
    m.kenc("kenc", 6, "kenc")                       # [2,32,64,128,256,512,448]
    m.gnn("gnn", 18, "gnn")
    m.dense_from_conv("final_proj", "final_proj")
    m.conv2d("scalex_proj", "scalex_proj", bias=True)
    m.dense_from_conv("compress_0", "compress_0")
    m.dense_from_conv("compress_1", "compress_1")
    m.dense_from_conv("compress_2", "compress_2")
    m.scalar("bin_score", "bin_score")
    return m.variables()


def convert_fine(sd: Mapping[str, object]) -> Dict[str, Tree]:
    """SecondLayer state dict -> FineMatcher variables (``evaluat*`` keys
    must already be dropped, models/pats.py:96-102)."""
    m = _Mapper(sd)
    m.resnet("descriptor_extract", {"layer1": 3, "layer2": 4}, "trunk")
    m.mlp("compress_1", 6, "compress_1")    # [448,256,128,64,32,16,8]
    m.mlp("compress_2", 3, "compress_2")    # [448,448,448,264]
    m.gnn("gnn", 18, "gnn")
    m.dense_from_conv("final_proj", "final_proj")
    m.conv2d("scalex_proj", "scalex_proj", bias=True)
    m.conv2d("scaley_proj", "scaley_proj", bias=True)
    return m.variables()


def convert_refine(sd: Mapping[str, object]) -> Dict[str, Tree]:
    """ThirdLayer state dict (module./matcher. stripped) -> SubpixelRefiner
    variables."""
    m = _Mapper(sd)
    m.resnet("descriptor_extract", {"layer1": 3, "layer2": 4}, "trunk")
    for i, (mid, out) in enumerate([(264, 264), (264, 192), (192, 128)]):
        lvl = 3 - i
        m.conv2d(f"backbone.layer{lvl}_outconv", "backbone",
                 f"layer{lvl}_outconv")
        m.conv2d(f"backbone.layer{lvl}_outconv2.0", "backbone",
                 f"layer{lvl}_outconv2_conv1")
        m.bn(f"backbone.layer{lvl}_outconv2.1", "backbone",
             f"layer{lvl}_outconv2_bn")
        m.conv2d(f"backbone.layer{lvl}_outconv2.3", "backbone",
                 f"layer{lvl}_outconv2_conv2")
    m.mlp("compress", 3, "compress")        # [264,264,264,128]
    m.gnn("gnn", 10, "gnn")
    m.kenc("kenc", 6, "kenc")               # [2,32,64,128,256,512,128]
    m.conv2d("scale_proj", "scale_proj", bias=True)
    return m.variables()


def load_reference_checkpoints(coarse_path: str, fine_path: str,
                               refine_path: str) -> Dict[str, Tree]:
    """Load the reference's three .pt/.pth files into one PATSCascade
    variable tree (sub-module names coarse/fine/refine)."""
    import torch

    def load(p):
        return torch.load(p, map_location="cpu", weights_only=True)

    coarse_sd = strip_prefix(load(coarse_path))
    fine_sd = {k: v for k, v in strip_prefix(load(fine_path)).items()
               if not k.startswith("evaluat")}
    refine_sd = strip_prefix(strip_prefix(load(refine_path)), "matcher.")

    c = convert_coarse(coarse_sd)
    f = convert_fine(fine_sd)
    r = convert_refine(refine_sd)
    return {
        "params": {"coarse": c["params"], "fine": f["params"],
                   "refine": r["params"]},
        "batch_stats": {"coarse": c["batch_stats"], "fine": f["batch_stats"],
                        "refine": r["batch_stats"]},
    }
