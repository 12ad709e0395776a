"""End-to-end cascade smoke + structural tests (random weights).

Without the trained reference checkpoints, these validate the pipeline's
shape discipline, mask propagation and numeric sanity; accuracy parity is
checked by the converted-checkpoint AUC harness (pats_tpu/evaluate.py).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pats_tpu.config import ModelConfig, CoarseConfig, FineConfig, RefineConfig
from pats_tpu.models.cascade import PATSCascade


def tiny_config(**kw):
    # shrink iteration-heavy knobs so the CPU test stays fast
    return ModelConfig(
        coarse=CoarseConfig(gnn_layers=2, sinkhorn_iterations=10,
                            expand_iters=4),
        fine=FineConfig(gnn_layers=2, sinkhorn_iterations=10, expand_iters=4),
        refine=RefineConfig(gnn_layers=2, sinkhorn_iterations=10),
        **kw,
    )


@pytest.mark.parametrize("outdoor", [True, False])
def test_cascade_forward(rng, outdoor):
    H, W = 96, 128
    cfg = tiny_config()
    model = PATSCascade(config=cfg, outdoor=outdoor, merge_new=outdoor)
    left = jnp.asarray(rng.uniform(0, 255, (H, W, 3)), jnp.float32)
    right = jnp.asarray(rng.uniform(0, 255, (H, W, 3)), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), left, right)
    out, _ = model.apply(variables, left, right, mutable=["batch_stats"])
    G = (H // 32) * (W // 32)
    assert out["matches_l"].shape == (G * 2304, 2)
    assert out["matches_r"].shape == (G * 2304, 2)
    assert out["valid"].shape == (G * 2304,)
    ml = np.asarray(out["matches_l"])
    mr = np.asarray(out["matches_r"])
    v = np.asarray(out["valid"])
    assert np.all(np.isfinite(ml)) and np.all(np.isfinite(mr[v]))
    if v.any():
        # left points of valid matches must lie in the crop's 3x3 extent
        assert ml[v, 0].min() >= -32 and ml[v, 0].max() < H + 32


def test_cascade_jit_compiles(rng):
    H, W = 96, 96
    cfg = tiny_config()
    model = PATSCascade(config=cfg, outdoor=True, merge_new=True)
    left = jnp.asarray(rng.uniform(0, 255, (H, W, 3)), jnp.float32)
    right = left
    variables = model.init(jax.random.PRNGKey(0), left, right)

    @jax.jit
    def fwd(v, a, b):
        return model.apply(v, a, b, mutable=["batch_stats"])[0]

    out = fwd(variables, left, right)
    out2 = fwd(variables, left, right)
    np.testing.assert_array_equal(np.asarray(out["valid"]),
                                  np.asarray(out2["valid"]))


def test_batched_cascade_matches_vmapped_single(rng):
    """PATSCascadeBatched (flat levels 2/3, grouped batch-stats BNs) ==
    per-pair PATSCascade, including the refine_batch_stats mode whose
    statistics are per pair."""
    from pats_tpu.models.cascade import PATSCascadeBatched

    H, W = 96, 128
    B = 3
    cfg = tiny_config(refine_batch_stats=True)
    single = PATSCascade(config=cfg, outdoor=True, merge_new=True)
    batched = PATSCascadeBatched(config=cfg, outdoor=True, merge_new=True)

    left = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32)
    right = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32)
    variables = single.init(jax.random.PRNGKey(0), left[0], right[0])

    # identical parameter trees: batched init must produce the same shapes
    vb = batched.init(jax.random.PRNGKey(0), left[:1], right[:1])
    assert (jax.tree.map(jnp.shape, vb["params"])
            == jax.tree.map(jnp.shape, variables["params"]))

    outs = [single.apply(variables, left[i], right[i],
                         mutable=["batch_stats"])[0] for i in range(B)]
    outb, _ = batched.apply(variables, left, right,
                            mutable=["batch_stats"])
    for i in range(B):
        np.testing.assert_array_equal(np.asarray(outb["valid"][i]),
                                      np.asarray(outs[i]["valid"]))
        v = np.asarray(outs[i]["valid"])
        np.testing.assert_allclose(np.asarray(outb["matches_r"][i])[v],
                                   np.asarray(outs[i]["matches_r"])[v],
                                   atol=2e-2)
        np.testing.assert_array_equal(np.asarray(outb["num_fine"][i]),
                                      np.asarray(outs[i]["num_fine"]))


@pytest.mark.parametrize("max_level", [1, 2])
def test_cascade_max_level(rng, max_level):
    """max_level=1/2 emit coarse/fine-granularity matches; the batched
    cascade agrees with the single-pair one in both modes."""
    from pats_tpu.models.cascade import PATSCascadeBatched

    H, W = 96, 128
    B = 2
    G = (H // 32) * (W // 32)
    cfg = tiny_config(max_level=max_level)
    single = PATSCascade(config=cfg, outdoor=True, merge_new=True)
    batched = PATSCascadeBatched(config=cfg, outdoor=True, merge_new=True)

    left = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32)
    right = jnp.asarray(rng.uniform(0, 255, (B, H, W, 3)), jnp.float32)
    variables = single.init(jax.random.PRNGKey(0), left[0], right[0])
    # shallower modes must not create downstream-level params
    assert ("refine" in variables["params"]) == False
    assert ("fine" in variables["params"]) == (max_level == 2)

    n = G if max_level == 1 else G * 144
    outs = [single.apply(variables, left[i], right[i],
                         mutable=["batch_stats"])[0] for i in range(B)]
    outb, _ = batched.apply(variables, left, right, mutable=["batch_stats"])
    assert outb["matches_l"].shape == (B, n, 2)
    for i in range(B):
        assert outs[i]["matches_l"].shape == (n, 2)
        np.testing.assert_array_equal(np.asarray(outb["valid"][i]),
                                      np.asarray(outs[i]["valid"]))
        v = np.asarray(outs[i]["valid"])
        np.testing.assert_allclose(np.asarray(outb["matches_r"][i])[v],
                                   np.asarray(outs[i]["matches_r"])[v],
                                   atol=2e-2)
        # valid left keypoints stay inside the (padded) image extent
        ml = np.asarray(outs[i]["matches_l"])[v]
        if ml.size:
            assert ml[:, 0].min() >= -32 and ml[:, 0].max() < H + 32
