"""Full-model conversion completeness: synthesized reference-shaped state
dicts must convert into variable trees STRUCTURALLY IDENTICAL to the flax
module init - every name and shape.  This is the gate that real
checkpoints (weights/{indoor,outdoor}_{coarse,fine,third}.pt) load
without retraining."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pats_tpu.io.convert import convert_coarse, convert_fine, convert_refine
from pats_tpu.models.coarse import CoarseMatcher
from pats_tpu.models.fine import FineMatcher
from pats_tpu.models.refine import SubpixelRefiner


def _conv(sd, name, cout, cin, k):
    sd[f"{name}.weight"] = np.zeros((cout, cin, k, k), np.float32)


def _convb(sd, name, cout, cin, k):
    _conv(sd, name, cout, cin, k)
    sd[f"{name}.bias"] = np.zeros((cout,), np.float32)


def _conv1d(sd, name, cout, cin):
    sd[f"{name}.weight"] = np.zeros((cout, cin, 1), np.float32)
    sd[f"{name}.bias"] = np.zeros((cout,), np.float32)


def _bn(sd, name, c):
    sd[f"{name}.weight"] = np.ones((c,), np.float32)
    sd[f"{name}.bias"] = np.zeros((c,), np.float32)
    sd[f"{name}.running_mean"] = np.zeros((c,), np.float32)
    sd[f"{name}.running_var"] = np.ones((c,), np.float32)
    sd[f"{name}.num_batches_tracked"] = np.zeros((), np.int64)


def _block(sd, name, cin, cout, downsample):
    _conv(sd, f"{name}.conv1", cout, cin, 3)
    _bn(sd, f"{name}.bn1", cout)
    _conv(sd, f"{name}.conv2", cout, cout, 3)
    _bn(sd, f"{name}.bn2", cout)
    if downsample:
        _conv(sd, f"{name}.downsample.0", cout, cin, 1)
        _bn(sd, f"{name}.downsample.1", cout)


def _resnet(sd, prefix, stages):
    _conv(sd, f"{prefix}.conv1", 64, 3, 7)
    _bn(sd, f"{prefix}.bn1", 64)
    cin = 64
    for stage, (blocks, cout, stride) in stages.items():
        for b in range(blocks):
            down = b == 0 and (stride != 1 or cin != cout)
            _block(sd, f"{prefix}.{stage}.{b}", cin if b == 0 else cout,
                   cout, down)
        cin = cout


def _mlp(sd, prefix, dims):
    for i in range(1, len(dims)):
        _conv1d(sd, f"{prefix}.{3 * (i - 1)}", dims[i], dims[i - 1])
        if i < len(dims) - 1:
            _bn(sd, f"{prefix}.{3 * (i - 1) + 1}", dims[i])


def _gnn(sd, prefix, layers, d):
    for i in range(layers):
        for j in range(3):
            _conv1d(sd, f"{prefix}.layers.{i}.attn.proj.{j}", d, d)
        _conv1d(sd, f"{prefix}.layers.{i}.attn.merge", d, d)
        _mlp(sd, f"{prefix}.layers.{i}.mlp", [2 * d, 2 * d, d])


def synth_coarse():
    sd = {}
    _resnet(sd, "descriptor_extract",
            {"layer1": (2, 64, 1), "layer2": (2, 128, 2),
             "layer3": (2, 256, 2), "layer4": (2, 512, 2)})
    _mlp(sd, "kenc.encoder", [2, 32, 64, 128, 256, 512, 448])
    _gnn(sd, "gnn", 18, 448)
    _conv1d(sd, "final_proj", 448, 448)
    _convb(sd, "scalex_proj", 1, 448, 3)
    for name, cout in [("compress_0", 256), ("compress_1", 128),
                       ("compress_2", 64)]:
        sd[f"{name}.weight"] = np.zeros((cout, 512, 1, 1), np.float32)
        sd[f"{name}.bias"] = np.zeros((cout,), np.float32)
    sd["bin_score"] = np.zeros((), np.float32)
    return sd


def synth_fine():
    sd = {}
    _resnet(sd, "descriptor_extract",
            {"layer1": (3, 64, 1), "layer2": (4, 128, 2)})
    _mlp(sd, "compress_1", [448, 256, 128, 64, 32, 16, 8])
    _mlp(sd, "compress_2", [448, 448, 448, 264])
    _gnn(sd, "gnn", 18, 264)
    _conv1d(sd, "final_proj", 264, 264)
    _convb(sd, "scalex_proj", 1, 264, 3)
    _convb(sd, "scaley_proj", 1, 264, 3)
    return sd


def synth_refine():
    sd = {}
    _resnet(sd, "descriptor_extract",
            {"layer1": (3, 64, 1), "layer2": (4, 128, 2)})
    _conv(sd, "backbone.layer3_outconv", 264, 128, 1)
    _conv(sd, "backbone.layer3_outconv2.0", 264, 264, 3)
    _bn(sd, "backbone.layer3_outconv2.1", 264)
    _conv(sd, "backbone.layer3_outconv2.3", 264, 264, 3)
    _conv(sd, "backbone.layer2_outconv", 264, 64, 1)
    _conv(sd, "backbone.layer2_outconv2.0", 264, 264, 3)
    _bn(sd, "backbone.layer2_outconv2.1", 264)
    _conv(sd, "backbone.layer2_outconv2.3", 192, 264, 3)
    _conv(sd, "backbone.layer1_outconv", 192, 64, 1)
    _conv(sd, "backbone.layer1_outconv2.0", 192, 192, 3)
    _bn(sd, "backbone.layer1_outconv2.1", 192)
    _conv(sd, "backbone.layer1_outconv2.3", 128, 192, 3)
    _mlp(sd, "compress", [264, 264, 264, 128])
    _gnn(sd, "gnn", 10, 128)
    _mlp(sd, "kenc.encoder", [2, 32, 64, 128, 256, 512, 128])
    _convb(sd, "scale_proj", 1, 128, 3)
    return sd


def _tree_shapes(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        path = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_tree_shapes(v, path))
        else:
            out[path] = tuple(np.shape(v))
    return out


def _assert_same_tree(converted, initialized, what):
    cs = _tree_shapes(converted)
    xs = _tree_shapes(initialized)
    missing = sorted(set(xs) - set(cs))
    extra = sorted(set(cs) - set(xs))
    assert not missing, f"{what}: converter missing {missing[:8]}"
    assert not extra, f"{what}: converter extra {extra[:8]}"
    for k in xs:
        assert cs[k] == xs[k], f"{what}: {k} shape {cs[k]} != {xs[k]}"


def test_coarse_conversion_complete():
    v = convert_coarse(synth_coarse())
    model = CoarseMatcher()
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((96, 96, 3)), jnp.zeros((96, 96, 3)))
    _assert_same_tree(v["params"], init["params"], "coarse params")
    _assert_same_tree(v["batch_stats"], init.get("batch_stats", {}),
                      "coarse batch_stats")


def test_fine_conversion_complete():
    v = convert_fine(synth_fine())
    model = FineMatcher()
    G = 6
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((G, 96, 96, 3)), jnp.zeros((G, 96, 96, 3)),
                      jnp.zeros((G, 448)), jnp.ones((G,), bool),
                      2, 3, True, True)
    _assert_same_tree(v["params"], init["params"], "fine params")
    _assert_same_tree(v["batch_stats"], init.get("batch_stats", {}),
                      "fine batch_stats")


def test_refine_conversion_complete():
    v = convert_refine(synth_refine())
    model = SubpixelRefiner(use_running_average=True)
    G, K = 6, 96
    init = model.init(jax.random.PRNGKey(0),
                      jnp.zeros((G, 96, 96, 3)), jnp.zeros((G, 96, 96, 3)),
                      jnp.zeros((G, 145, 264)), jnp.zeros((G, 145, 264)),
                      jnp.zeros((K,), jnp.int32), jnp.zeros((K,), jnp.int32),
                      jnp.ones((K, 2)), jnp.ones((K,), bool),
                      jnp.ones((G,), bool))
    _assert_same_tree(v["params"], init["params"], "refine params")
    _assert_same_tree(v["batch_stats"], init.get("batch_stats", {}),
                      "refine batch_stats")
