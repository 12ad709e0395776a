"""Is the refine GNN bound on masked-batch-stats BN or on matmuls?

The real refine level runs BatchNorm in batch-statistics mode (the
reference's train-at-eval quirk, models/pats.py:112-118); the earlier
profile measured running-average mode.  Times the 10-layer GNN and a
bare MLPStack in both modes, plus per-piece matmuls, to pick the next
optimization target.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))

import jax.numpy as jnp

from pats_tpu.models.gnn import AttentionalGNN, MLPStack

K3 = 4800
D = 128
ITERS = 8
BF16 = jnp.bfloat16


def timeit(name, fn, *args):
    f = jax.jit(fn)
    p = jnp.float32(0.0)
    np.asarray(f(p, *args))
    t0 = time.time()
    p = jnp.float32(0.0)
    for _ in range(ITERS):
        p = f(p, *args) * 1e-30
    np.asarray(p)
    dt = (time.time() - t0) / ITERS * 1000
    print(f"{name:46s} {dt:8.1f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    t0 = jnp.asarray(rng.normal(size=(K3, 65, D)), jnp.float32)
    t1 = jnp.asarray(rng.normal(size=(K3, 65, D)), jnp.float32)
    valid = jnp.ones((K3,), bool)

    for ura in (True, False):
        gnn = AttentionalGNN(D, 10, 4, fused=True, use_running_average=ura,
                             dtype=BF16)
        gv = gnn.init(key, t0[:32], t1[:32], valid[:32])
        timeit(f"GNN 10L fused ura={ura}",
               lambda p, v, a, b, va: jnp.sum(
                   gnn.apply(v, a + p, b, va)[0].astype(jnp.float32)),
               gv, t0, t1, valid)

    x = jnp.asarray(rng.normal(size=(2, K3, 65, 2 * D)), jnp.float32)
    mask = jnp.ones((2, K3), bool)
    for ura in (True, False):
        mlp = MLPStack((2 * D, D), use_running_average=ura, dtype=BF16)
        mv = mlp.init(key, x[:, :32], mask[:, :32], (0,))
        timeit(f"MLP (2,4800,65,256->128) ura={ura}",
               lambda p, v, a, m: jnp.sum(
                   mlp.apply(v, a + p, m, (0,)).astype(jnp.float32)),
               mv, x, mask)

    w = jnp.asarray(rng.normal(size=(2 * D, 2 * D)), BF16)
    timeit("bare matmul (624k,256)x(256,256) bf16",
           lambda p, a, w: jnp.sum((
               (a.astype(BF16) + p.astype(BF16)).reshape(-1, 2 * D) @ w)
               .astype(jnp.float32)), x[0], w)


if __name__ == "__main__":
    main()
