"""Pretrained resnet34 trunk overlay (reference second_layer.py:26-30)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pats_tpu.io.pretrained import (init_trunk_from_resnet34,
                                    trunk_variables_from_resnet34)
from pats_tpu.models.backbone import FineTrunk


def _fake_resnet34_sd(rng):
    """numpy state dict with resnet34 key names/shapes for the stem +
    layer1 + layer2 (plus decoys that must be ignored)."""
    sd = {}

    def conv(k, co, ci, s):
        sd[k + ".weight"] = rng.normal(size=(co, ci, s, s)).astype(np.float32)

    def bn(k, c):
        sd[k + ".weight"] = rng.normal(size=c).astype(np.float32)
        sd[k + ".bias"] = rng.normal(size=c).astype(np.float32)
        sd[k + ".running_mean"] = rng.normal(size=c).astype(np.float32)
        sd[k + ".running_var"] = np.abs(rng.normal(size=c)).astype(np.float32)
        sd[k + ".num_batches_tracked"] = np.int64(1)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    for b in range(3):
        conv(f"layer1.{b}.conv1", 64, 64, 3)
        bn(f"layer1.{b}.bn1", 64)
        conv(f"layer1.{b}.conv2", 64, 64, 3)
        bn(f"layer1.{b}.bn2", 64)
    for b in range(4):
        ci = 64 if b == 0 else 128
        conv(f"layer2.{b}.conv1", 128, ci, 3)
        bn(f"layer2.{b}.bn1", 128)
        conv(f"layer2.{b}.conv2", 128, 128, 3)
        bn(f"layer2.{b}.bn2", 128)
    conv("layer2.0.downsample.0", 128, 64, 1)
    bn("layer2.0.downsample.1", 128)
    # decoys: deeper stages + fc must be dropped (key intersection)
    conv("layer3.0.conv1", 256, 128, 3)
    sd["fc.weight"] = rng.normal(size=(1000, 512)).astype(np.float32)
    sd["fc.bias"] = rng.normal(size=1000).astype(np.float32)
    return sd


def test_overlay_matches_fine_trunk_shapes(rng):
    sd = _fake_resnet34_sd(rng)
    model = FineTrunk()
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 96, 96, 3)))
    wrapped = {"params": {"trunk": variables["params"],
                          "head": {"kernel": jnp.ones((4, 4))}},
               "batch_stats": {"trunk": variables["batch_stats"]}}
    out = init_trunk_from_resnet34(wrapped, sd)

    # every overlaid leaf keeps the flax shape
    ref_shapes = jax.tree_util.tree_map(jnp.shape, wrapped)
    new_shapes = jax.tree_util.tree_map(jnp.shape, out)
    assert ref_shapes == new_shapes
    # conv1 kernel equals the transposed torch weight
    np.testing.assert_array_equal(
        np.asarray(out["params"]["trunk"]["conv1"]["kernel"]),
        sd["conv1.weight"].transpose(2, 3, 1, 0))
    # downsample mapped
    np.testing.assert_array_equal(
        np.asarray(out["params"]["trunk"]["layer2"]["block_0"]["down_conv"]
                   ["kernel"]),
        sd["layer2.0.downsample.0.weight"].transpose(2, 3, 1, 0))
    # bn running stats land in batch_stats
    np.testing.assert_array_equal(
        np.asarray(out["batch_stats"]["trunk"]["bn1"]["mean"]),
        sd["bn1.running_mean"])
    # non-trunk params untouched
    np.testing.assert_array_equal(np.asarray(out["params"]["head"]["kernel"]),
                                  np.ones((4, 4)))


def test_trunk_forward_with_pretrained(rng):
    """Overlaid trunk actually runs (shapes consistent end-to-end)."""
    sd = _fake_resnet34_sd(rng)
    trunk = trunk_variables_from_resnet34(sd)
    model = FineTrunk()
    x0, x1, x2 = model.apply(
        {"params": trunk["params"]["trunk"],
         "batch_stats": trunk["batch_stats"]["trunk"]},
        jnp.ones((2, 96, 96, 3)))
    assert x0.shape == (2, 48, 48, 64)
    assert x1.shape == (2, 24, 24, 64)
    assert x2.shape == (2, 12, 12, 128)
    assert np.isfinite(np.asarray(x2)).all()
