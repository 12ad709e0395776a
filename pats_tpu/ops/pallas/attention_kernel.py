"""Fused small-N attention Pallas kernel.

The cascade's fine/refine GNNs run attention over SHORT token sequences
(145 / 65) with HUGE batch (patches x heads): XLA materializes the
(B, N, N) probability tensor in HBM between the two matmuls, making the
levels memory-bound (~5 GB/layer at level 3).  This kernel computes
scores -> softmax -> weighted sum entirely in VMEM per batch tile,
reducing HBM traffic to the q/k/v reads and the output write.

Layout: q, k, v are (B, N, dh) with heads already folded into B.  N and dh
are padded to tile-friendly sizes; padded key columns are masked with -1e30
before the softmax.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(q_ref, k_ref, v_ref, o_ref, *, n_real: int, scale: float):
    q = q_ref[:].astype(jnp.float32)          # (TB, Np, Dp)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale      # (TB, Np, Np)
    np_ = s.shape[-1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, np_), 2)
    s = jnp.where(col < n_real, s, -1e30)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)              # (TB, Np, Dp)
    o_ref[:] = o.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "block_b", "interpret"))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, block_b: int = 16,
                    interpret: bool = False) -> jnp.ndarray:
    """softmax(q k^T * scale) v for (B, N, dh) inputs, fused in VMEM."""
    B, N, D = q.shape
    Np = _round_up(N, 8)
    Dp = _round_up(D, 128)
    Bp = _round_up(B, block_b)

    def pad(x):
        return jnp.pad(x, ((0, Bp - B), (0, Np - N), (0, Dp - D)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    grid = (Bp // block_b,)
    spec = pl.BlockSpec((block_b, Np, Dp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, n_real=N, scale=scale),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((Bp, Np, Dp), q.dtype),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:B, :N, :D]
