"""Stage-by-stage TPU timing of the cascade at 640x480.

Times each level (and its major internal pieces) as separately-jitted
functions with representative shapes to locate the wall-clock budget.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pats_tpu.config import PATSConfig
from pats_tpu.models.coarse import CoarseMatcher
from pats_tpu.models.fine import FineMatcher
from pats_tpu.models.refine import SubpixelRefiner
from pats_tpu.ops.expand import expand_transport
from pats_tpu.ops.sinkhorn import ot_inline_dustbin

H, W = 480, 640
GH, GW = H // 32, W // 32
G = GH * GW
K3 = 16 * G


def _sync(out):
    # on the tunneled TPU platform block_until_ready is unreliable; a
    # device->host transfer is the only trustworthy sync
    leaf = jax.tree.leaves(out)[0]
    np.asarray(leaf)


def timeit(name, fn, *args, iters=5):
    out = fn(*args)
    _sync(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
        _sync(out)
    dt = (time.time() - t0) / iters * 1000
    print(f"{name:34s} {dt:8.1f} ms")
    return out


def main():
    cfg = PATSConfig().model
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    left = jnp.asarray(rng.uniform(0, 255, (H, W, 3)), jnp.float32)
    right = jnp.asarray(rng.uniform(0, 255, (H, W, 3)), jnp.float32)

    c = cfg.coarse
    coarse = CoarseMatcher(
        descriptor_dim=c.descriptor_dim, gnn_layers=c.gnn_layers,
        sinkhorn_iterations=c.sinkhorn_iterations,
        expand_iters=c.expand_iters, expand_lower_bound=c.expand_lower_bound)
    cv = jax.jit(coarse.init)(key, left, right)
    coarse_fn = jax.jit(lambda v, a, b: coarse.apply(
        v, a, b, mutable=["batch_stats"])[0])
    r1 = timeit("coarse total", coarse_fn, cv, left, right)

    crops = jnp.asarray(rng.uniform(0, 255, (G, 96, 96, 3)), jnp.float32)
    desc = jnp.asarray(rng.normal(size=(G, 448)), jnp.float32)
    alive = jnp.ones((G,), bool)

    f = cfg.fine
    fine = FineMatcher(
        descriptor_dim=f.descriptor_dim, gnn_layers=f.gnn_layers,
        sinkhorn_iterations=f.sinkhorn_iterations,
        expand_iters=f.expand_iters, expand_lower_bound=f.expand_lower_bound)
    fv = jax.jit(fine.init, static_argnums=(5, 6, 7, 8))(
        key, crops, crops, desc, alive, GH, GW, True, True)
    fine_fn = jax.jit(lambda v, a, b, d, al: fine.apply(
        v, a, b, d, al, GH, GW, True, True, mutable=["batch_stats"])[0])
    r2 = timeit("fine total", fine_fn, fv, crops, crops, desc, alive)

    tokens = jnp.asarray(rng.normal(size=(G, 145, 264)), jnp.float32)
    pid = jnp.asarray(rng.integers(0, G, K3), jnp.int32)
    cell = jnp.asarray(rng.integers(0, 144, K3), jnp.int32)
    tgt = jnp.asarray(rng.uniform(1, 11, (K3, 2)), jnp.float32)
    pvalid = jnp.ones((K3,), bool)

    rcfg = cfg.refine
    refine = SubpixelRefiner(
        descriptor_dim=rcfg.descriptor_dim, gnn_layers=rcfg.gnn_layers,
        sinkhorn_iterations=rcfg.sinkhorn_iterations,
        use_running_average=not cfg.refine_batch_stats)
    rv = jax.jit(refine.init)(key, crops, crops, tokens, tokens, pid, cell,
                              tgt, pvalid, alive)
    refine_fn = jax.jit(lambda v, a, b, t0, t1, p, ce, tg, pv, al:
                        refine.apply(v, a, b, t0, t1, p, ce, tg, pv, al,
                                     mutable=["batch_stats"])[0])
    r3 = timeit("refine total", refine_fn, rv, crops, crops, tokens, tokens,
                pid, cell, tgt, pvalid, alive)

    # micro: sinkhorn at refine scale
    scores = jnp.asarray(rng.normal(size=(K3, 65, 65)), jnp.float32)
    ns = jnp.asarray(rng.uniform(0.5, 2, (K3, 64)), jnp.float32)
    ot_fn = jax.jit(lambda s, n: ot_inline_dustbin(s, n, 100))
    timeit("  sinkhorn (4800,65,65) 100it", ot_fn, scores, ns)

    scores2 = jnp.asarray(rng.normal(size=(G, 145, 145)), jnp.float32)
    ns2 = jnp.asarray(rng.uniform(0.5, 2, (G, 144)), jnp.float32)
    ot2_fn = jax.jit(lambda s, n: ot_inline_dustbin(s, n, 100))
    timeit("  sinkhorn (300,145,145) 100it", ot2_fn, scores2, ns2)

    plan2 = jnp.exp(jnp.asarray(rng.normal(size=(G, 145, 145)) * 0.1,
                                jnp.float32))
    sx = jnp.asarray(rng.uniform(0.5, 2, (G, 144)), jnp.float32)
    exp_fn = jax.jit(lambda p, a, b: expand_transport(p, a, b, 12, 12, 8,
                                                      1e-3))
    timeit("  expand (300,144) 8it", exp_fn, plan2, sx, sx)

    plan1 = jnp.exp(jnp.asarray(rng.normal(size=(1, G + 1, G + 1)) * 0.1,
                                jnp.float32))
    s1 = jnp.asarray(rng.uniform(0.5, 2, (1, G)), jnp.float32)
    exp1_fn = jax.jit(lambda p, a, b: expand_transport(p, a, b, GH, GW, 15,
                                                       1e-5))
    timeit("  expand (1,300) 15it", exp1_fn, plan1, s1, s1)


if __name__ == "__main__":
    main()
