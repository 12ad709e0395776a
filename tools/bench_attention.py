"""Microbench: attention formulations at cascade L2/L3 shapes on the TPU.

Chained-execution timing (see tools/micro_profile.py docstring for why).
Variants given projected q, k, v (B, N, D), 4 contiguous channel heads:

  slice  - per-head channel slices, 4 einsum pairs (round-1 production path)
  bmm    - one batched einsum over head-major (B*H, N, dh)
  kexp   - block-column expansion: one einsum pair per layer, probs (B,N,H*N)
  pallas - fused VMEM kernel (ops/pallas/attention_kernel.py)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax as _jax_cfg
import os as _os
_jax_cfg.config.update("jax_compilation_cache_dir", _os.path.expanduser("~/.cache/jax_comp_cache"))
_jax_cfg.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

from pats_tpu.ops.pallas.attention_kernel import fused_attention

H = 4


def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    p = jnp.float32(0.0)
    np.asarray(f(p, *args))
    t0 = time.time()
    p = jnp.float32(0.0)
    for _ in range(iters):
        p = f(p, *args) * 1e-30
    np.asarray(p)
    dt = (time.time() - t0) / iters * 1000
    print(f"  {name:28s} {dt:8.2f} ms", flush=True)
    return dt


def attn_slice(q, k, v, scale):
    dh = q.shape[-1] // H
    outs = []
    for h in range(H):
        sl = slice(h * dh, (h + 1) * dh)
        s = jnp.einsum("bnd,bmd->bnm", q[..., sl], k[..., sl]) * scale
        p = nn.softmax(s, axis=-1)
        outs.append(jnp.einsum("bnm,bmd->bnd", p, v[..., sl]))
    return jnp.concatenate(outs, axis=-1)


def attn_bmm(q, k, v, scale):
    b, n, d = q.shape
    dh = d // H

    def to_bh(x):
        return x.reshape(b, n, H, dh).transpose(0, 2, 1, 3).reshape(-1, n, dh)

    s = jnp.einsum("bnd,bmd->bnm", to_bh(q), to_bh(k)) * scale
    p = nn.softmax(s, axis=-1)
    o = jnp.einsum("bnm,bmd->bnd", p, to_bh(v))
    return o.reshape(b, H, n, dh).transpose(0, 2, 1, 3).reshape(b, n, d)


def attn_kexp(q, k, v, scale):
    b, n, d = q.shape
    dh = d // H

    def expand(x):
        x4 = jnp.broadcast_to(x[:, None], (b, H, n, d))
        head = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1, d), 1)
        chan = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1, d), 3)
        return jnp.where(chan // dh == head, x4, 0).reshape(b, H * n, d)

    s = jnp.einsum("bnd,bmd->bnm", q, expand(k)) * scale   # (b, n, H*n)
    p = nn.softmax(s.reshape(b, n, H, n), axis=-1).reshape(b, n, H * n)
    return jnp.einsum("bnm,bmd->bnd", p, expand(v))


def run(tag, b, n, d, dtype):
    print(f"{tag}: B={b} N={n} D={d} {np.dtype(dtype).name}")
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, n, d)) * 0.3, dtype)
    k = jnp.asarray(rng.normal(size=(b, n, d)) * 0.3, dtype)
    v = jnp.asarray(rng.normal(size=(b, n, d)) * 0.3, dtype)
    scale = float(1.0 / np.sqrt(d // H))

    timeit("slice (round-1 prod)", lambda p, a, b_, c: attn_slice(
        a + p.astype(a.dtype), b_, c, scale).astype(jnp.float32).sum(),
        q, k, v)
    timeit("bmm head-major", lambda p, a, b_, c: attn_bmm(
        a + p.astype(a.dtype), b_, c, scale).astype(jnp.float32).sum(),
        q, k, v)
    timeit("kexp block-col", lambda p, a, b_, c: attn_kexp(
        a + p.astype(a.dtype), b_, c, scale).astype(jnp.float32).sum(),
        q, k, v)
    for bb in (4, 8, 16):
        try:
            timeit(f"pallas fused tb={bb}",
                   lambda p, a, b_, c, bb=bb: fused_attention(
                       a + p.astype(a.dtype), b_, c, scale, nheads=H,
                       block_b=bb).astype(jnp.float32).sum(), q, k, v)
        except Exception as e:  # noqa: BLE001
            print(f"  pallas tb={bb} failed: {repr(e)[:120]}")
    # HBM floor: read q,k,v + write one output-sized array
    timeit("elementwise floor", lambda p, a, b_, c: (
        a + b_ + c + p.astype(a.dtype)).astype(jnp.float32).sum(), q, k, v)


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    # level 3, batch 4 pairs: 2 images * 16*G(=4800) * 4 pairs
    run("L3", 38400, 65, 128, jnp.bfloat16)
    # level 2, batch 4 pairs: 2 images * G(=300) * 4 pairs
    run("L2", 2400, 145, 264, jnp.bfloat16)
    # level 1, batch 4 pairs: 2 images * 4 pairs, N = G = 300 tokens
    run("L1", 8, 300, 448, jnp.bfloat16)
