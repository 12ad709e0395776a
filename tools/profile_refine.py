"""Piece-by-piece timing of the refine level under the bench config.

Refine is the step's dominant level (572 ms of 731 ms/pair at f32
batch 1); this locates the budget within it: trunk on 2G crops, FPN,
window unfold, 10-layer GNN over (2, K, 65, D), scores+Sinkhorn,
compute_result.  Bench config: bf16 matmuls, fused attention, Pallas
Sinkhorn.  Chained-scalar timing (tunnel: block_until_ready broken).
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

from pats_tpu.models.backbone import FineTrunk
from pats_tpu.models.gnn import AttentionalGNN
from pats_tpu.models.refine import FPN82
from pats_tpu.ops.sinkhorn import ot_inline_dustbin

G = 300
K3 = 16 * G
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
    print(f"{name:44s} {dt:8.1f} ms", flush=True)


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    crops = jnp.asarray(rng.uniform(0, 255, (2 * G, 96, 96, 3)), jnp.float32)
    alive = jnp.ones((2 * G,), bool)

    trunk = FineTrunk(dtype=BF16)
    tv = trunk.init(key, crops[:2])
    timeit("trunk (600,96,96,3) bf16",
           lambda p, v, c: jnp.sum(trunk.apply(v, c + p)[2]
                                   .astype(jnp.float32)), tv, crops)

    grid = jnp.asarray(rng.normal(size=(2 * G, 12, 12, 264)), jnp.float32)
    skips = (jnp.asarray(rng.normal(size=(2 * G, 48, 48, 64)), jnp.float32),
             jnp.asarray(rng.normal(size=(2 * G, 24, 24, 64)), jnp.float32),
             jnp.asarray(rng.normal(size=(2 * G, 12, 12, 128)), jnp.float32))
    fpn = FPN82(dtype=BF16)
    fv = fpn.init(key, grid[:2], tuple(s[:2] for s in skips))
    timeit("FPN (600) bf16",
           lambda p, v, g, s: jnp.sum(fpn.apply(v, g + p, s)
                                      .astype(jnp.float32)), fv, grid, skips)

    # window unfold: gather of (K,64) windows from (G,52,52,128) maps
    feat = jnp.asarray(rng.normal(size=(G, 52, 52, D)), jnp.float32)
    pid = jnp.asarray(rng.integers(0, G, K3), jnp.int32)
    xs = jnp.asarray(rng.integers(2, 40, (K3, 8)), jnp.int32)
    ys = jnp.asarray(rng.integers(2, 40, (K3, 8)), jnp.int32)

    def unfold(p, fm, pid, xs, ys):
        flat = (pid[:, None, None] * 52 * 52 + ys[:, :, None] * 52
                + xs[:, None, :])
        out = jnp.take(fm.reshape(G * 52 * 52, D) + p, flat.reshape(-1),
                       axis=0)
        return jnp.sum(out)

    timeit("unfold 2x (4800,8,8) gathers",
           lambda p, fm, pi, x, y: unfold(p, fm, pi, x, y)
           + unfold(p, fm, pi, y, x), feat, pid, xs, ys)

    t0 = jnp.asarray(rng.normal(size=(K3, 65, D)), jnp.float32)
    t1 = jnp.asarray(rng.normal(size=(K3, 65, D)), jnp.float32)
    valid = jnp.ones((K3,), bool)

    for fused in (False, True):
        gnn = AttentionalGNN(D, 10, 4, fused=fused, dtype=BF16)
        gv = gnn.init(key, t0[:32], t1[:32], valid[:32])
        timeit(f"GNN 10L (2,4800,65,128) fused={fused}",
               lambda p, v, a, b, va: jnp.sum(
                   gnn.apply(v, a + p, b, va)[0].astype(jnp.float32)),
               gv, t0, t1, valid)

    scores = jnp.asarray(rng.normal(size=(K3, 65, 65)) * 0.1, jnp.float32)
    ns = jnp.asarray(rng.uniform(0.5, 2, (K3, 64)), jnp.float32)
    timeit("scores einsum (4800,65,128)^2 bf16",
           lambda p, a, b: jnp.sum(jnp.einsum(
               "knd,kmd->knm", (a + p).astype(BF16), b.astype(BF16))
               .astype(jnp.float32)), t0, t1)
    timeit("sinkhorn L3 pallas 100it all-alive",
           lambda p, s, n, v: jnp.sum(ot_inline_dustbin(
               s + p, n, 100, use_pallas=True, valid=v)), scores, ns, valid)
    half = jnp.arange(K3) < K3 // 3
    timeit("sinkhorn L3 pallas 100it 1/3-alive",
           lambda p, s, n, v: jnp.sum(ot_inline_dustbin(
               s + p, n, 100, use_pallas=True, valid=v)), scores, ns, half)


if __name__ == "__main__":
    main()
