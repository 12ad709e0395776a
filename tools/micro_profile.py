"""Micro-profile of cascade internals with dependency-chained execution.

The TPU tunnel has a large, variable (~30-135 ms) round-trip latency per
host sync, so per-call timings are garbage.  Each op is timed by chaining
ITERS executions through a scalar data dependency (output scalar perturbs
the next input) and fetching only the final scalar - one round trip,
amortized over the chain.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pats_tpu.ops.expand import expand_transport
from pats_tpu.ops.sinkhorn import ot_inline_dustbin, log_sinkhorn
from pats_tpu.models.backbone import FineTrunk
from pats_tpu.models.gnn import AttentionalGNN

G = 300
K3 = 4800
ITERS = 10


def timeit(name, fn, *args):
    """fn(p, *args) -> scalar; p is the chained perturbation scalar."""
    f = jax.jit(fn)
    p = jnp.float32(0.0)
    np.asarray(f(p, *args))               # compile + warm
    # measure one chained run
    t0 = time.time()
    p = jnp.float32(0.0)
    for _ in range(ITERS):
        p = f(p, *args) * 1e-30
    np.asarray(p)
    dt = (time.time() - t0) / ITERS * 1000
    print(f"{name:42s} {dt:8.1f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    # --- sinkhorn ---
    s3 = jnp.asarray(rng.normal(size=(K3, 65, 65)) * 0.1, jnp.float32)
    n3 = jnp.asarray(rng.uniform(0.5, 2, (K3, 64)), jnp.float32)
    timeit("sinkhorn L3 (4800,65,65) 100it",
           lambda p, s, n: ot_inline_dustbin(s + p, n, 100).sum(), s3, n3)

    try:
        from pats_tpu.ops.pallas import fused_log_sinkhorn

        mu3 = jnp.zeros((K3, 65), jnp.float32)
        timeit("pallas sinkhorn L3 100it",
               lambda p, s, m: fused_log_sinkhorn(s + p, m, m, 100).sum(),
               s3, mu3)
    except Exception as e:       # noqa: BLE001
        print("pallas sinkhorn failed:", repr(e))

    s2 = jnp.asarray(rng.normal(size=(G, 145, 145)) * 0.1, jnp.float32)
    n2 = jnp.asarray(rng.uniform(0.5, 2, (G, 144)), jnp.float32)
    timeit("sinkhorn L2 (300,145,145) 100it",
           lambda p, s, n: ot_inline_dustbin(s + p, n, 100).sum(), s2, n2)

    s1 = jnp.asarray(rng.normal(size=(1, 301, 301)) * 0.1, jnp.float32)
    mu = jnp.zeros((1, 301))
    timeit("sinkhorn L1 (1,301,301) 100it",
           lambda p, s, m: log_sinkhorn(s + p, m, m, 100).sum(), s1, mu)

    # --- expansion ---
    p2 = jnp.exp(s2)
    timeit("expand L2 (300,144,12x12) 8it",
           lambda p, pl_, a: expand_transport(pl_ + p, a, a, 12, 12, 8,
                                              1e-3)[0].sum(), p2, n2)
    p1 = jnp.exp(s1)
    n1 = jnp.asarray(rng.uniform(0.5, 2, (1, 300)), jnp.float32)
    timeit("expand L1 (1,300,15x20) 15it",
           lambda p, pl_, a: expand_transport(pl_ + p, a, a, 15, 20, 15,
                                              1e-5)[0].sum(), p1, n1)

    # --- fine trunk on 600 crops ---
    crops = jnp.asarray(rng.uniform(0, 255, (2 * G, 96, 96, 3)), jnp.float32)
    trunk = FineTrunk()
    tv = jax.jit(trunk.init)(key, crops[:2])
    timeit("fine trunk (600,96,96)",
           lambda p, v, x: sum(t.sum() for t in trunk.apply(v, x + p)),
           tv, crops)

    # --- GNN levels (f32 and bf16) ---
    t2 = jnp.asarray(rng.normal(size=(G, 145, 264)), jnp.float32)
    t3 = jnp.asarray(rng.normal(size=(K3, 65, 128)), jnp.float32)
    t1 = jnp.asarray(rng.normal(size=(300, 448)), jnp.float32)
    for dty, tag in [(None, "f32"), (jnp.bfloat16, "bf16")]:
        gnn2 = AttentionalGNN(264, 18, dtype=dty)
        gv2 = jax.jit(gnn2.init)(key, t2[:2], t2[:2])
        timeit(f"GNN L2 18 layers (300,145,264) {tag}",
               lambda p, v, a, b: sum(
                   t.sum().astype(jnp.float32)
                   for t in gnn2.apply(v, a + p, b)), gv2, t2, t2)

        gnn3 = AttentionalGNN(128, 10, dtype=dty)
        gv3 = jax.jit(gnn3.init)(key, t3[:2], t3[:2])
        timeit(f"GNN L3 10 layers (4800,65,128) {tag}",
               lambda p, v, a, b: sum(
                   t.sum().astype(jnp.float32)
                   for t in gnn3.apply(v, a + p, b)), gv3, t3, t3)

        gnn1 = AttentionalGNN(448, 18, dtype=dty)
        gv1 = jax.jit(gnn1.init)(key, t1, t1)
        timeit(f"GNN L1 18 layers (300,448) {tag}",
               lambda p, v, a, b: sum(
                   t.sum().astype(jnp.float32)
                   for t in gnn1.apply(v, a + p, b)), gv1, t1, t1)

    # --- unfold gather (refine window extraction) ---
    feat = jnp.asarray(rng.normal(size=(G * 52 * 52, 128)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, G * 52 * 52, (K3, 64)), jnp.int32)
    timeit("unfold gather (4800x64 from 300x52x52)",
           lambda p, f, i: jnp.take(f + p, i.reshape(-1), axis=0).sum(),
           feat, idx)

    # --- crop resize batch ---
    from pats_tpu.ops.resize import crop_resize_batch
    img = jnp.asarray(rng.uniform(0, 255, (736, 896, 3)), jnp.float32)
    boxes = jnp.asarray(
        np.stack([rng.integers(0, 300, G), rng.integers(300, 700, G),
                  rng.integers(0, 300, G), rng.integers(300, 800, G)], -1),
        jnp.int32)
    timeit("crop_resize_batch (300 boxes -> 96)",
           lambda p, im, b: crop_resize_batch(im + p, b).sum(), img, boxes)


if __name__ == "__main__":
    main()
