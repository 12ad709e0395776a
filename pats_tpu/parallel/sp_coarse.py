"""Sequence-parallel execution of the coarse GNN with converted weights.

Runs the level-1 AttentionalGNN's exact math with the token axis sharded
over a mesh axis: projections are local matmuls, attention uses
ring_attention (K/V rotating over ICI), and the eval-mode BatchNorms are
per-channel affine maps (running statistics), so the whole 18-layer stack
executes with O(N/k) tokens per device.  This is the scale-out path for
very large images whose level-1 token count exceeds one device
(SURVEY.md par.7.5); results are bit-close to the single-device module.

Usage (params = the flax CoarseMatcher 'gnn' subtree + batch_stats):

    fn = shard_map(partial(sp_gnn_forward, params, num_layers=18, heads=4),
                   mesh=mesh, in_specs=(P("seq"), P("seq")),
                   out_specs=(P("seq"), P("seq")))
    out0, out1 = fn(tokens0, tokens1)      # tokens (N, D) sharded on N
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from pats_tpu.parallel.seqpar import ring_attention


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def _bn_eval(params, stats, x):
    scale = params["scale"] / jnp.sqrt(stats["var"] + 1e-5)
    return x * scale + (params["bias"] - stats["mean"] * scale)


def _mlp(p, s, x):
    x = _dense(p["dense_0"], x)
    x = _bn_eval(p["bn_0"], s["bn_0"], x)
    x = jnp.maximum(x, 0.0)
    return _dense(p["dense_1"], x)


def _attention(p, x, src, heads: int, axis_name: str):
    d = x.shape[-1]
    dh = d // heads
    q = _dense(p["proj_q"], x)
    k = _dense(p["proj_k"], src)
    v = _dense(p["proj_v"], src)
    outs = []
    for h in range(heads):
        sl = slice(h * dh, (h + 1) * dh)
        outs.append(ring_attention(q[:, sl], k[:, sl], v[:, sl],
                                   axis_name, 1.0 / float(dh) ** 0.5))
    return _dense(p["merge"], jnp.concatenate(outs, axis=-1))


def sp_gnn_forward(params: dict, batch_stats: dict,
                   tokens0: jnp.ndarray, tokens1: jnp.ndarray,
                   num_layers: int = 18, heads: int = 4,
                   axis_name: str = "seq"
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact AttentionalGNN forward, token-sharded.  tokens (n_loc, D)."""
    x0, x1 = tokens0, tokens1
    for i in range(num_layers):
        lp = params[f"layer_{i}"]
        ls = batch_stats[f"layer_{i}"]
        src0, src1 = (x1, x0) if i % 2 == 1 else (x0, x1)
        m0 = _attention(lp["attn"], x0, src0, heads, axis_name)
        m1 = _attention(lp["attn"], x1, src1, heads, axis_name)
        d0 = _mlp(lp["mlp"], ls["mlp"], jnp.concatenate([x0, m0], -1))
        d1 = _mlp(lp["mlp"], ls["mlp"], jnp.concatenate([x1, m1], -1))
        x0 = x0 + d0
        x1 = x1 + d1
    return x0, x1
