"""Pallas kernel for the region-growing expansion loop.

The growth loop is inherently sequential (8/15 iterations); the XLA
version re-reads the summed-area tables from HBM for every strip query of
every iteration.  This kernel keeps each block's SAT rows resident in
VMEM and runs all iterations in registers: per row the carry is the
rectangle bounds + accumulated mass, and every strip query is a one-hot
lane select over the row's SAT (elementwise only - no batched dots, which
are pathological in Pallas on this toolchain).

Scope: ONLY the loop (utils/utils.py:1213-1243 semantics).  SAT
construction and the post-loop soft-argmax/cost math stay in XLA where
they are already cheap and fused.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(sat_s_ref, sat_nm_ref, init_ref, out_ref, *, height: int,
            width: int, iters: int, lower_bound: float):
    sat_s = sat_s_ref[:]              # (TB, L) lane-padded SAT rows
    sat_nm = sat_nm_ref[:]
    init = init_ref[:]                # (TB, 8): seed_r, seed_c, sum0, nm0
    TB, L = sat_s.shape
    w1 = width + 1
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)

    def lookup(sat, r, c):
        idx = (jnp.clip(r, 0, height) * w1
               + jnp.clip(c, 0, width))            # (TB,)
        sel = idx[:, None] == lane
        return jnp.sum(jnp.where(sel, sat, 0.0), axis=1)

    def rect(sat, r0, r1, c0, c1):
        return (lookup(sat, r1 + 1, c1 + 1) - lookup(sat, r0, c1 + 1)
                - lookup(sat, r1 + 1, c0) + lookup(sat, r0, c0))

    def strips(sat, r0, r1, c0, c1):
        up = jnp.where(r0 > 0, rect(sat, r0 - 1, r0 - 1, c0, c1), 0.0)
        down = jnp.where(r1 < height - 1,
                         rect(sat, r1 + 1, r1 + 1, c0, c1), 0.0)
        left = jnp.where(c0 > 0, rect(sat, r0, r1, c0 - 1, c0 - 1), 0.0)
        right = jnp.where(c1 < width - 1,
                          rect(sat, r0, r1, c1 + 1, c1 + 1), 0.0)
        return jnp.stack([up, down, left, right], axis=1)  # (TB, 4)

    seed_r = init[:, 0].astype(jnp.int32)
    seed_c = init[:, 1].astype(jnp.int32)

    def body(_, carry):
        r0, r1, c0, c1, last_sum, last_nm = carry
        mass = strips(sat_s, r0, r1, c0, c1)
        best = jnp.argmax(mass, axis=1)
        best_mass = jnp.max(mass, axis=1)
        grow = best_mass > lower_bound
        nm = strips(sat_nm, r0, r1, c0, c1)
        dir4 = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
        best_nm = jnp.sum(jnp.where(best[:, None] == dir4, nm, 0.0),
                          axis=1)
        r0 = jnp.where(grow & (best == 0), r0 - 1, r0)
        r1 = jnp.where(grow & (best == 1), r1 + 1, r1)
        c0 = jnp.where(grow & (best == 2), c0 - 1, c0)
        c1 = jnp.where(grow & (best == 3), c1 + 1, c1)
        last_sum = last_sum + jnp.where(grow, best_mass, 0.0)
        last_nm = last_nm + jnp.where(grow, best_nm, 0.0)
        return r0, r1, c0, c1, last_sum, last_nm

    r0, r1, c0, c1, last_sum, last_nm = jax.lax.fori_loop(
        0, iters, body,
        (seed_r, seed_r, seed_c, seed_c, init[:, 2], init[:, 3]))
    out_ref[:] = jnp.stack(
        [r0.astype(jnp.float32), r1.astype(jnp.float32),
         c0.astype(jnp.float32), c1.astype(jnp.float32),
         last_sum, last_nm,
         jnp.zeros_like(last_sum), jnp.zeros_like(last_sum)], axis=1)


@functools.partial(jax.jit, static_argnames=("height", "width", "iters",
                                             "lower_bound", "interpret"))
def fused_expand_loop(sat_s: jnp.ndarray, sat_nm: jnp.ndarray,
                      seed_r: jnp.ndarray, seed_c: jnp.ndarray,
                      sum0: jnp.ndarray, nm0: jnp.ndarray,
                      height: int, width: int, iters: int,
                      lower_bound: float, interpret: bool = False):
    """Run the growth loop for R rows.

    sat_s/sat_nm: (R, (height+1)*(width+1)) flattened SATs.
    seed_r/seed_c: (R,) int seeds; sum0/nm0: (R,) accumulator seeds.
    Returns (r0, r1, c0, c1, last_sum, last_nm) arrays of (R,).
    """
    R, hw = sat_s.shape
    L = _round_up(hw, 128)
    block = max(8, min(512, int(1.5e6 / (L * 4)) // 8 * 8))
    if R <= block:
        block = R
    Rp = _round_up(R, block)

    def pad(x):
        return jnp.pad(x.astype(jnp.float32), ((0, Rp - R), (0, L - hw)))

    init = jnp.stack([seed_r.astype(jnp.float32),
                      seed_c.astype(jnp.float32),
                      sum0.astype(jnp.float32), nm0.astype(jnp.float32)]
                     + [jnp.zeros_like(sum0, jnp.float32)] * 4, axis=1)
    init = jnp.pad(init, ((0, Rp - R), (0, 0)))

    spec_sat = pl.BlockSpec((block, L), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    spec8 = pl.BlockSpec((block, 8), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, height=height, width=width, iters=iters,
                          lower_bound=lower_bound),
        grid=(Rp // block,),
        in_specs=[spec_sat, spec_sat, spec8],
        out_specs=spec8,
        out_shape=jax.ShapeDtypeStruct((Rp, 8), jnp.float32),
        interpret=interpret,
    )(pad(sat_s), pad(sat_nm), init)
    out = out[:R]
    return (out[:, 0].astype(jnp.int32), out[:, 1].astype(jnp.int32),
            out[:, 2].astype(jnp.int32), out[:, 3].astype(jnp.int32),
            out[:, 4], out[:, 5])
