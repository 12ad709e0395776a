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

    def dense_from_conv(self, tkey: str, *path: str, bias: bool = True,
                        ndim: int = 3):
        """conv1d (out,in,1) or conv2d 1x1 (out,in,1,1) -> Dense.

        ``ndim`` is the torch weight rank (3 = Conv1d, 4 = 1x1 Conv2d);
        ignored on import, used by the mirrored exporter to emit exactly
        the shape the reference's load_state_dict expects."""
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


class _Exporter:
    """Mirror of _Mapper: reads a flax variables tree, emits a torch-layout
    state dict whose key names AND tensor shapes exactly match the
    reference's (so the reference's own load_state_dict accepts it,
    models/pats.py:88-109).  Drives the same schema functions as _Mapper,
    making import/export structurally impossible to drift apart."""

    def __init__(self, variables: Mapping[str, Tree]):
        self.params = variables["params"]
        self.stats = variables.get("batch_stats", {})
        self.sd: Dict[str, np.ndarray] = {}

    @staticmethod
    def _walk(tree: Tree, path: Tuple[str, ...]) -> np.ndarray:
        node = tree
        for p in path:
            node = node[p]
        return np.asarray(node)

    def conv2d(self, tkey: str, *path: str, bias: bool = False):
        k = self._walk(self.params, path + ("kernel",))
        self.sd[f"{tkey}.weight"] = k.transpose(3, 2, 0, 1)
        if bias:
            self.sd[f"{tkey}.bias"] = self._walk(self.params,
                                                 path + ("bias",))

    def dense_from_conv(self, tkey: str, *path: str, bias: bool = True,
                        ndim: int = 3):
        k = self._walk(self.params, path + ("kernel",))       # (in, out)
        w = k.T.reshape(k.shape[1], k.shape[0], *([1] * (ndim - 2)))
        self.sd[f"{tkey}.weight"] = w
        if bias:
            self.sd[f"{tkey}.bias"] = self._walk(self.params,
                                                 path + ("bias",))

    def bn(self, tkey: str, *path: str):
        self.sd[f"{tkey}.weight"] = self._walk(self.params,
                                               path + ("scale",))
        self.sd[f"{tkey}.bias"] = self._walk(self.params, path + ("bias",))
        self.sd[f"{tkey}.running_mean"] = self._walk(self.stats,
                                                     path + ("mean",))
        self.sd[f"{tkey}.running_var"] = self._walk(self.stats,
                                                    path + ("var",))
        self.sd[f"{tkey}.num_batches_tracked"] = np.asarray(0,
                                                            dtype=np.int64)

    def scalar(self, tkey: str, *path: str):
        self.sd[tkey] = self._walk(self.params, path).reshape(())

    # ---- composite modules (inverse of _Mapper's) ----

    def mlp(self, tkey: str, n_layers: int, *path: str):
        for i in range(n_layers):
            self.dense_from_conv(f"{tkey}.{3 * i}", *path, f"dense_{i}")
            if i < n_layers - 1:
                self.bn(f"{tkey}.{3 * i + 1}", *path, f"bn_{i}")

    def basic_block(self, tkey: str, *path: str):
        self.conv2d(f"{tkey}.conv1", *path, "conv1")
        self.bn(f"{tkey}.bn1", *path, "bn1")
        self.conv2d(f"{tkey}.conv2", *path, "conv2")
        self.bn(f"{tkey}.bn2", *path, "bn2")
        sub = self.params
        for p in path:
            sub = sub[p]
        if "down_conv" in sub:
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
        """Inverse of _Mapper.gnn: un-folds the head-major permutation."""
        k0 = self._walk(self.params,
                        path + ("layer_0", "attn", "proj_q", "kernel"))
        d_model = k0.shape[1]
        dh = d_model // num_heads
        new_idx = np.arange(d_model)
        h, d = new_idx // dh, new_idx % dh
        perm = d * num_heads + h
        inv = np.argsort(perm)
        for i in range(n_layers):
            lp = path + (f"layer_{i}",)
            for name, tname in (("proj_q", 0), ("proj_k", 1), ("proj_v", 2)):
                k = self._walk(self.params, lp + ("attn", name, "kernel"))
                b = self._walk(self.params, lp + ("attn", name, "bias"))
                tk = f"{tkey}.layers.{i}.attn.proj.{tname}"
                w = k[:, inv].T                                # (out, in)
                self.sd[f"{tk}.weight"] = w.reshape(*w.shape, 1)
                self.sd[f"{tk}.bias"] = b[inv]
            k = self._walk(self.params, lp + ("attn", "merge", "kernel"))
            b = self._walk(self.params, lp + ("attn", "merge", "bias"))
            w = k[inv, :].T                                    # (out, in)
            self.sd[f"{tkey}.layers.{i}.attn.merge.weight"] = w.reshape(
                *w.shape, 1)
            self.sd[f"{tkey}.layers.{i}.attn.merge.bias"] = b
            self.mlp(f"{tkey}.layers.{i}.mlp", 2, *lp, "mlp")

    def state_dict(self, torch_tensors: bool = True):
        if not torch_tensors:
            return dict(self.sd)
        import torch

        # np.array (not ascontiguousarray: it promotes 0-d scalars like
        # bin_score to 1-d, which the strict torch load rejects)
        return {k: torch.from_numpy(np.array(
            v, np.float32 if v.dtype != np.int64 else np.int64, copy=True))
            for k, v in self.sd.items()}


def _coarse_schema(m):
    m.resnet("descriptor_extract",
             {"layer1": 2, "layer2": 2, "layer3": 2, "layer4": 2}, "trunk")
    m.kenc("kenc", 6, "kenc")                       # [2,32,64,128,256,512,448]
    m.gnn("gnn", 18, "gnn")
    m.dense_from_conv("final_proj", "final_proj")
    m.conv2d("scalex_proj", "scalex_proj", bias=True)
    m.dense_from_conv("compress_0", "compress_0", ndim=4)
    m.dense_from_conv("compress_1", "compress_1", ndim=4)
    m.dense_from_conv("compress_2", "compress_2", ndim=4)
    m.scalar("bin_score", "bin_score")


def _fine_schema(m):
    m.resnet("descriptor_extract", {"layer1": 3, "layer2": 4}, "trunk")
    m.mlp("compress_1", 6, "compress_1")    # [448,256,128,64,32,16,8]
    m.mlp("compress_2", 3, "compress_2")    # [448,448,448,264]
    m.gnn("gnn", 18, "gnn")
    m.dense_from_conv("final_proj", "final_proj")
    m.conv2d("scalex_proj", "scalex_proj", bias=True)
    m.conv2d("scaley_proj", "scaley_proj", bias=True)


def _refine_schema(m):
    m.resnet("descriptor_extract", {"layer1": 3, "layer2": 4}, "trunk")
    for lvl in (3, 2, 1):
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


def export_coarse(variables: Mapping[str, Tree], torch_tensors: bool = True):
    """CoarseMatcher variables -> reference FirstLayer state dict."""
    e = _Exporter(variables)
    _coarse_schema(e)
    return e.state_dict(torch_tensors)


def export_fine(variables: Mapping[str, Tree], torch_tensors: bool = True):
    """FineMatcher variables -> reference SecondLayer state dict (without
    the reference's dead ``evaluat*`` keys; its loader drops them anyway,
    models/pats.py:96-102 — use strict=False or delete them from the
    target model before loading)."""
    e = _Exporter(variables)
    _fine_schema(e)
    return e.state_dict(torch_tensors)


def export_refine(variables: Mapping[str, Tree], torch_tensors: bool = True):
    """SubpixelRefiner variables -> reference ThirdLayer state dict."""
    e = _Exporter(variables)
    _refine_schema(e)
    return e.state_dict(torch_tensors)


def save_reference_checkpoints(variables: Mapping[str, Tree],
                               coarse_path: str, fine_path: str,
                               refine_path: str) -> None:
    """Export a full cascade tree to the reference's three .pt files,
    with the ``module.`` prefixes its loaders strip (pats.py:88-109)."""
    import torch

    def sub(name):
        return {"params": variables["params"][name],
                "batch_stats": variables["batch_stats"][name]}

    for path, sd in ((coarse_path, export_coarse(sub("coarse"))),
                     (fine_path, export_fine(sub("fine"))),
                     (refine_path, export_refine(sub("refine")))):
        torch.save({f"module.{k}": v for k, v in sd.items()}, path)


def strip_prefix(sd: Mapping[str, object], prefix: str = "module."
                 ) -> Dict[str, object]:
    out = {}
    for k, v in sd.items():
        out[k[len(prefix):] if k.startswith(prefix) else k] = v
    return out


def convert_coarse(sd: Mapping[str, object]) -> Dict[str, Tree]:
    """FirstLayer state dict (prefix-stripped) -> CoarseMatcher variables."""
    m = _Mapper(sd)
    _coarse_schema(m)
    return m.variables()


def convert_fine(sd: Mapping[str, object]) -> Dict[str, Tree]:
    """SecondLayer state dict -> FineMatcher variables (``evaluat*`` keys
    must already be dropped, models/pats.py:96-102)."""
    m = _Mapper(sd)
    _fine_schema(m)
    return m.variables()


def convert_refine(sd: Mapping[str, object]) -> Dict[str, Tree]:
    """ThirdLayer state dict (module./matcher. stripped) -> SubpixelRefiner
    variables."""
    m = _Mapper(sd)
    _refine_schema(m)
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
