"""Pallas fused-attention timings at cascade shapes (chained timing)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import numpy as np
import jax.numpy as jnp

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
    print(f"  {name:28s} {(time.time()-t0)/iters*1000:8.2f} ms", flush=True)


def run(tag, b, n, d, dtype, blocks):
    print(f"{tag}: B={b} N={n} D={d} {np.dtype(dtype).name}")
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(b, n, d)) * 0.3, dtype)
    k = jnp.asarray(rng.normal(size=(b, n, d)) * 0.3, dtype)
    v = jnp.asarray(rng.normal(size=(b, n, d)) * 0.3, dtype)
    scale = float(1.0 / np.sqrt(d // H))
    for bb in blocks:
        try:
            timeit(f"pallas fused tb={bb}",
                   lambda p, a, b_, c, bb=bb: fused_attention(
                       a + p.astype(a.dtype), b_, c, scale, nheads=H,
                       block_b=bb).astype(jnp.float32).sum(), q, k, v)
        except Exception as e:  # noqa: BLE001
            print(f"  pallas tb={bb} failed: {repr(e)[:200]}")


if __name__ == "__main__":
    print("platform:", jax.devices()[0].platform, flush=True)
    run("L3", 38400, 65, 128, jnp.bfloat16, (8, 16, 32))
    run("L2", 2400, 145, 264, jnp.bfloat16, (4, 8, 16))
