"""Sequence-parallel exactness: ring attention and row-sharded Sinkhorn
vs their dense equivalents on the virtual 8-device mesh."""

import numpy as np
import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from pats_tpu.ops.sinkhorn import log_sinkhorn
from pats_tpu.parallel.seqpar import ring_attention, sharded_log_sinkhorn


def _mesh():
    return Mesh(np.array(jax.devices()[:8]), ("seq",))


def test_ring_attention_exact(rng):
    N, D = 256, 64
    q = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(N, D)), jnp.float32)
    scale = 1.0 / np.sqrt(D)

    s = (q @ k.T) * scale
    p = jax.nn.softmax(s, axis=-1)
    want = np.asarray(p @ v)

    fn = shard_map(
        lambda q, k, v: ring_attention(q, k, v, "seq", float(scale)),
        mesh=_mesh(), in_specs=(P("seq"), P("seq"), P("seq")),
        out_specs=P("seq"))
    got = np.asarray(fn(q, k, v))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sharded_sinkhorn_exact(rng):
    M, N = 64, 48
    Z = jnp.asarray(rng.normal(size=(M, N)), jnp.float32)
    mu = jnp.asarray(np.log(rng.uniform(0.5, 2, M)), jnp.float32)
    nu = jnp.asarray(np.log(rng.uniform(0.5, 2, N)), jnp.float32)

    want = np.asarray(log_sinkhorn(Z[None], mu[None], nu[None], 25)[0])

    fn = shard_map(
        lambda z, m, n: sharded_log_sinkhorn(z, m, n, 25, "seq"),
        mesh=_mesh(), in_specs=(P("seq"), P("seq"), P()),
        out_specs=P("seq"))
    got = np.asarray(fn(Z, mu, nu))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
