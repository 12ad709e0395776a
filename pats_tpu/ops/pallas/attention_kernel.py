"""Fused small-N multi-head attention Pallas kernels.

The cascade's GNNs (reference models/modules.py:84-105) run attention over
SHORT token sequences (65 / 145) with HUGE batch (patches x 2 images):
XLA materializes the (B, H, N, N) probability tensor in HBM between the
two matmuls and splits every layer into per-head ops, making levels 2/3
memory-bound.  These kernels keep scores -> softmax -> weighted sum in
VMEM per batch tile so HBM traffic is just the q/k/v reads + output write.

Mosaic quirk on this platform: a BATCHED ``lax.dot_general`` inside a
kernel executes pathologically slowly (~70 s for a trivial case), so the
kernels below use ONLY 2-D dots.  Per batch item, all H heads are computed
with a single 2-D dot pair via a ROW-stacked head expansion ("qexp"): the
query matrix (N, D) is replicated per head and masked so head h keeps only
its own channel block [h*dh, (h+1)*dh).  Then

    scores = qexp (H*N, D) @ k^T (D, N)    # [h*N+i, j] = q_h[i] . k_h[j]
    probs  = plain per-ROW softmax (f32)   # each row is one (head, query)
    o2     = probs (H*N, N) @ v (N, D)     # o2[h*N+i, :] = head-h mix, all ch
    out    = sum_h o2[h*N:(h+1)*N] * (chan // dh == h)   # head-select

Row-stacking beats the earlier column-stacked ("kexp") variant because
the N axis only needs SUBLANE alignment (16 for bf16) instead of the
128-lane alignment per-head column slices required: at the fine level
(N=145) the scores matrix shrinks from 256x1024 to 640x160 — a ~2x cut
in padded MXU work — and the softmax needs no per-head column slicing.

Dead-item skip: levels 2/3 run at fixed capacity with alive items sorted
first (models/cascade.py); given the per-item ``alive`` mask the kernel
skips both dots for dead items and writes zeros, so attention cost scales
with occupancy, not capacity.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pick_block(n: int, d: int, nheads: int, dtype, layer: bool):
    """Largest batch-tile size whose kernel fits scoped VMEM, or None.

    Analytic model of the row-stacked ("qexp") kernels, validated on v5e
    against Mosaic's scoped-vmem limit (16 MB): per item the kernel holds
    qexp (H*Np, Dp) + two f32 score buffers (H*Np, lane-padded Np) + the
    f32 o2 (H*Np, Dp); the layer variant adds resident weights and the
    flat q/k/v projections.  f32 runs with extra f32 dot copies, so it
    gets a smaller budget (the old column-stacked f32 fine-level layer
    kernel measured 1.55x its model).  Returns None when even tb=1 does
    not fit (callers fall back to the attention-only kernel or XLA).
    """
    is_ = 2 if dtype in (jnp.bfloat16, jnp.float16) else 4
    np_ = _round_up(n, 16 if is_ == 2 else 8)
    npl = _round_up(np_, 128)                   # lane pad of score cols
    dp = _round_up(d, 128)
    per_item = (nheads * np_ * dp * (is_ + 4)   # qexp + f32 o2
                + 2 * nheads * np_ * npl * 4)   # scores + probs (f32)
    if layer:
        tile_arrays = 9      # x,src in (x2 dbl-buf), out (x2), scratch
        fixed = 4 * dp * dp * is_               # resident weights
        per_item += 3 * np_ * dp * (is_ + 4)    # q/k/v rows + f32 temps
    else:
        tile_arrays = 8      # q,k,v,out tiles x2 double-buffering
        fixed = 0
    budget = (14 << 20) if is_ == 2 else (11 << 20)
    for tb in (32, 16, 8, 4, 2, 1):
        if fixed + tb * (per_item + tile_arrays * np_ * dp * is_) <= budget:
            return tb
    return None


def _expand_heads(x, nheads: int, dh: int):
    """(Np, D) -> (H*Np, D) where row h*Np+i keeps only channels of head h."""
    np_, d = x.shape
    x4 = jnp.broadcast_to(x[None], (nheads, np_, d))
    head = jax.lax.broadcasted_iota(jnp.int32, (nheads, np_, d), 0)
    chan = jax.lax.broadcasted_iota(jnp.int32, (nheads, np_, d), 2)
    x4 = jnp.where(chan // dh == head, x4, 0)
    return x4.reshape(nheads * np_, d)


def _attend_one(q, k, v, key_pad, nheads: int, dh: int, scale: float):
    """Row-stacked multi-head attention for ONE item, 2-D dots only.

    q/k/v: (Np, D) with head h in channels [h*dh, (h+1)*dh); key_pad:
    (1, Np) bool marking padded key tokens.  Returns (Np, D) f32 in the
    concat-heads layout."""
    np_, d = q.shape
    qexp = _expand_heads(q, nheads, dh)                       # (H*Np, D)
    s = jax.lax.dot_general(
        qexp, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale           # (H*Np, Np)
    s = jnp.where(key_pad, -1e30, s)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o2 = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                   # (H*Np, D)
    # head-select: out[i, c] = o2[(c // dh) * Np + i, c]
    chan = jax.lax.broadcasted_iota(jnp.int32, (np_, d), 1)
    out = jnp.zeros((np_, d), jnp.float32)
    for h in range(nheads):
        out = out + jnp.where(chan // dh == h,
                              o2[h * np_:(h + 1) * np_, :], 0.0)
    return out


def _kernel(alive_ref, q_ref, k_ref, v_ref, o_ref, *, tb: int, n_real: int,
            nheads: int, dh: int, scale: float):
    # alive_ref: scalar-prefetched (n_tiles,) any-item-alive flags.
    # Tile granularity keeps Mosaic's predication cost to ONE branch per
    # grid step (per-item @pl.when made compiles pathologically slow);
    # alive-first compaction means at most one mixed tile per call.
    np_ = q_ref.shape[1]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
    key_pad = col >= n_real                       # padded key tokens
    tile_alive = alive_ref[pl.program_id(0)]

    @pl.when(tile_alive == 0)
    def _dead():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(tile_alive != 0)
    def _compute():
        for t in range(tb):                       # unrolled: 2-D dots only
            o = _attend_one(q_ref[t], k_ref[t], v_ref[t], key_pad,
                            nheads, dh, scale)
            o_ref[t] = o.astype(o_ref.dtype)


def _fold_vmap_rule(core, n_tensors: int):
    """custom_vmap rule: fold the mapped axis into the kernel batch dim.

    Without this, vmap of the scalar-prefetch pallas_call lowers to a
    SERIAL while loop over the mapped axis with dynamic-slice/copy glue
    (measured ~750 ms/step of pure data movement at bench batch 4).  The
    first ``n_tensors`` args are (B, ...) per-item tensors (tokens +
    alive); the rest are weights shared across the map (never batched in
    the GNN use).  Mapped tensors fold (V, B, ...) -> (V*B, ...); the
    one kernel call then sees 4x the items and tiles them on its grid.
    """

    def rule(axis_size, in_batched, *args):
        assert not any(in_batched[n_tensors:]), \
            "fused attention: batched weights unsupported"
        folded = []
        for i in range(n_tensors):
            a = args[i]
            if not in_batched[i]:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            folded.append(a.reshape((axis_size * a.shape[1],) + a.shape[2:]))
        out = core(*folded, *args[n_tensors:])
        return out.reshape((axis_size, -1) + out.shape[1:]), True

    return rule


@functools.lru_cache(maxsize=None)
def _attention_core(nheads: int, scale: float, block_b, interpret: bool):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def core(q, k, v, alive):
        B, N, D = q.shape
        dh = D // nheads
        # the head-select masks map channel c to head c // dh, so a D
        # that does not split exactly would silently zero the trailing
        # D % nheads channels — guard unconditionally
        assert D == nheads * dh, (D, nheads)
        sub = 16 if q.dtype == jnp.bfloat16 else 8
        Np = _round_up(N, sub)
        Dp = _round_up(D, 128)
        bb = block_b
        if bb is None:
            bb = pick_block(N, D, nheads, q.dtype, layer=False)
            assert bb is not None, "caller must gate on pick_block"
        Bp = _round_up(B, bb)
        if Dp != D:      # kexp masking assumes real channels only
            q = jnp.pad(q, ((0, 0), (0, 0), (0, Dp - D)))
            k = jnp.pad(k, ((0, 0), (0, 0), (0, Dp - D)))
            v = jnp.pad(v, ((0, 0), (0, 0), (0, Dp - D)))
            # padded channels belong to no head (chan // dh >= nheads
            # there, guaranteed by the exact-split assert above)

        alive_i = jnp.pad(alive.astype(jnp.int32), (0, Bp - B))
        alive_i = alive_i.reshape(Bp // bb, bb).max(axis=1)

        def pad(x):
            return jnp.pad(x, ((0, Bp - B), (0, Np - N), (0, 0)))

        spec = pl.BlockSpec((bb, Np, Dp), lambda i, a: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_kernel, tb=bb, n_real=N, nheads=nheads,
                              dh=dh, scale=scale),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(Bp // bb,),
                in_specs=[spec, spec, spec],
                out_specs=spec),
            out_shape=jax.ShapeDtypeStruct((Bp, Np, Dp), q.dtype),
            interpret=interpret,
        )(alive_i, pad(q), pad(k), pad(v))
        return out[:B, :N, :D]

    core.def_vmap(_fold_vmap_rule(core, 4))
    return core


@functools.partial(jax.jit, static_argnames=("nheads", "scale", "block_b",
                                             "interpret"))
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    scale: float, nheads: int = 4, block_b: int = None,
                    alive: jnp.ndarray = None,
                    interpret: bool = False) -> jnp.ndarray:
    """Multi-head softmax(q k^T * scale) v for (B, N, D) inputs.

    Heads split the channel dim contiguously (head-major layout, dh = D /
    nheads); the output is the concat-heads layout ready for the merge
    projection.  All compute per batch tile stays in VMEM.  ``block_b``
    defaults to a VMEM-budgeted tile (measured: tb=16 at the L3 shape is
    2x tb=8; tb=16 at the L2 shape exceeds VMEM).

    ``alive``: optional (B,) bool/int mask; tiles whose items are all
    dead skip both matmuls and output zeros (their tokens are masked
    downstream anyway).  With the cascade's alive-first compaction the
    cost scales with occupancy, not capacity.

    vmap folds the mapped axis into B (one bigger kernel call) instead of
    XLA's serial per-item while loop.
    """
    if alive is None:
        alive = jnp.ones((q.shape[0],), jnp.int32)
    return _attention_core(nheads, scale, block_b, interpret)(q, k, v, alive)


def _layer_kernel(alive_ref, x_ref, s_ref, wq_ref, wk_ref, wv_ref, wm_ref,
                  bq_ref, bk_ref, bv_ref, bm_ref, o_ref, o_scr, *, tb: int,
                  n_real: int, nheads: int, dh: int, scale: float):
    """One GNN attention message per tile: q/k/v projections + multi-head
    softmax attention + merge projection, all in VMEM.

    Dot-count discipline: Mosaic's per-dot overhead dominates at these
    sizes, so the projections and the merge run as FOUR large
    (tb*Np, D) @ (D, D) dots per grid step (the tile folded into rows);
    only the two attention dots remain per item (2-D only — batched dots
    are pathological on this Mosaic), with per-item attention outputs
    accumulated in a scratch and merged in one dot."""
    np_ = x_ref.shape[1]
    d = x_ref.shape[2]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, np_), 1)
    key_pad = col >= n_real
    tile_alive = alive_ref[pl.program_id(0)]

    @pl.when(tile_alive == 0)
    def _dead():
        o_ref[:] = jnp.zeros_like(o_ref)

    @pl.when(tile_alive != 0)
    def _compute():
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        xf = x_ref[:].reshape(tb * np_, d)
        sf = s_ref[:].reshape(tb * np_, d)
        q_all = (dot(xf, wq_ref[:]) + bq_ref[:]).astype(xf.dtype)
        k_all = (dot(sf, wk_ref[:]) + bk_ref[:]).astype(xf.dtype)
        v_all = (dot(sf, wv_ref[:]) + bv_ref[:]).astype(xf.dtype)
        for t in range(tb):                       # unrolled: 2-D dots only
            o = _attend_one(q_all[t * np_:(t + 1) * np_],
                            k_all[t * np_:(t + 1) * np_],
                            v_all[t * np_:(t + 1) * np_],
                            key_pad, nheads, dh, scale)
            o_scr[t * np_:(t + 1) * np_, :] = o.astype(o_scr.dtype)
        msg = dot(o_scr[:], wm_ref[:]) + bm_ref[:]            # (tb*Np, D)
        o_ref[:] = msg.reshape(tb, np_, d).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _layer_core(nheads: int, scale: float, block_b, interpret: bool):
    from jax.custom_batching import custom_vmap

    @custom_vmap
    def core(x, source, alive, wq, bq, wk, bk, wv, bv, wm, bm):
        B, N, D = x.shape
        dh = D // nheads
        assert D == nheads * dh
        Np = _round_up(N, 16 if x.dtype == jnp.bfloat16 else 8)
        Dp = _round_up(D, 128)
        bb = block_b
        if bb is None:
            bb = pick_block(N, D, nheads, x.dtype, layer=True)
            assert bb is not None, "caller must gate on pick_block"
        Bp = _round_up(B, bb)

        def padw(w):
            return jnp.pad(w.astype(x.dtype),
                           ((0, Dp - D), (0, Dp - D)))

        def padb(b):
            # biases as (1, Dp) rows (TPU wants >=2-D operands)
            return jnp.pad(b.astype(jnp.float32), (0, Dp - D))[None]

        def padx(a):
            return jnp.pad(a, ((0, Bp - B), (0, Np - N), (0, Dp - D)))

        alive_i = jnp.pad(alive.astype(jnp.int32), (0, Bp - B))
        alive_i = alive_i.reshape(Bp // bb, bb).max(axis=1)

        spec = pl.BlockSpec((bb, Np, Dp), lambda i, a: (i, 0, 0),
                            memory_space=pltpu.VMEM)
        wspec = pl.BlockSpec((Dp, Dp), lambda i, a: (0, 0),
                             memory_space=pltpu.VMEM)
        bspec = pl.BlockSpec((1, Dp), lambda i, a: (0, 0),
                             memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            functools.partial(_layer_kernel, tb=bb, n_real=N,
                              nheads=nheads, dh=dh, scale=scale),
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(Bp // bb,),
                in_specs=[spec, spec, wspec, wspec, wspec, wspec,
                          bspec, bspec, bspec, bspec],
                out_specs=spec,
                scratch_shapes=[pltpu.VMEM((bb * Np, Dp), x.dtype)]),
            out_shape=jax.ShapeDtypeStruct((Bp, Np, Dp), x.dtype),
            interpret=interpret,
        )(alive_i, padx(x), padx(source), padw(wq), padw(wk), padw(wv),
          padw(wm), padb(bq), padb(bk), padb(bv), padb(bm))
        return out[:B, :N, :D]

    core.def_vmap(_fold_vmap_rule(core, 3))
    return core


@functools.partial(jax.jit, static_argnames=("nheads", "scale", "block_b",
                                             "interpret"))
def fused_attention_layer(x: jnp.ndarray, source: jnp.ndarray,
                          wq, bq, wk, bk, wv, bv, wm, bm,
                          scale: float, nheads: int = 4,
                          block_b: int = None,
                          alive: jnp.ndarray = None,
                          interpret: bool = False) -> jnp.ndarray:
    """Full attention message for (B, N, D) token sets in one kernel.

    Equivalent to ``merge(attention(x Wq, src Wk, src Wv))`` with bias
    terms — one HBM read of x/source and one write of the message instead
    of materializing q, k, v, probs and the attention output between
    XLA ops.  Weights are (D, D), biases (D,).  ``alive`` as in
    ``fused_attention``.

    vmap folds the mapped axis into B (one bigger kernel call) instead of
    XLA's serial per-item while loop.
    """
    if alive is None:
        alive = jnp.ones((x.shape[0],), jnp.int32)
    return _layer_core(nheads, scale, block_b, interpret)(
        x, source, alive, wq, bq, wk, bk, wv, bv, wm, bm)
