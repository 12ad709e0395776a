"""Sequence-parallel GNN == single-device flax GNN (same weights)."""

import numpy as np
import jax
import jax.numpy as jnp
from functools import partial
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pats_tpu.models.gnn import AttentionalGNN
from pats_tpu.parallel.sp_coarse import sp_gnn_forward


def test_sp_gnn_matches_flax(rng):
    N, D, L = 64, 32, 4
    gnn = AttentionalGNN(D, L, num_heads=4, use_running_average=True)
    t0 = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    t1 = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    variables = gnn.init(jax.random.PRNGKey(3), t0, t1)
    # randomize BN running stats so eval-mode normalization is non-trivial
    variables = jax.tree.map(
        lambda x: x + 0.1 * jnp.arange(x.size, dtype=x.dtype).reshape(x.shape)
        / x.size, variables)
    want0, want1 = gnn.apply(variables, t0, t1)

    mesh = Mesh(np.array(jax.devices()[:8]), ("seq",))
    fn = shard_map(
        partial(sp_gnn_forward, variables["params"],
                variables["batch_stats"], num_layers=L, heads=4,
                axis_name="seq"),
        mesh=mesh, in_specs=(P("seq"), P("seq")),
        out_specs=(P("seq"), P("seq")))
    got0, got1 = fn(t0, t1)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(want0),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got1), np.asarray(want1),
                               rtol=1e-3, atol=1e-4)
