"""Benchmark: matched image pairs per second on one TPU chip.

Runs the full three-level cascade forward at the reference's standard eval
resolution (640x480, the MegaDepth/ScanNet protocol) and reports
throughput.  The reference publishes no speed numbers (BASELINE.md), so
``vs_baseline`` is reported against the first recorded value of this
framework (stored in bench_baseline.json on first run).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

H, W = 480, 640
WARMUP = 2
ITERS = 10
BASELINE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "bench_baseline.json")


def main():
    from pats_tpu.config import PATSConfig
    from pats_tpu.models.cascade import PATSCascade

    cfg = PATSConfig()
    model = PATSCascade(config=cfg.model, outdoor=True, merge_new=True)

    rng = np.random.default_rng(18027)
    left = jnp.asarray(rng.uniform(0, 255, (H, W, 3)), jnp.float32)
    right = jnp.asarray(rng.uniform(0, 255, (H, W, 3)), jnp.float32)

    t0 = time.time()
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), left, right)
    init_s = time.time() - t0

    @jax.jit
    def fwd(variables, left, right, perturb):
        out, _ = model.apply(variables, left, right + perturb,
                             mutable=["batch_stats"])
        return out["matches_l"], out["matches_r"], out["valid"]

    t0 = time.time()
    np.asarray(fwd(variables, left, right, jnp.float32(0.0))[2])
    compile_s = time.time() - t0

    # dependency-chained executions with ONE final host fetch: the TPU
    # tunnel has large variable round-trip latency, so per-call syncs
    # overstate latency while un-chained async dispatch understates it
    def chained(iters):
        p = jnp.float32(0.0)
        t0 = time.time()
        for _ in range(iters):
            ml, mr, valid = fwd(variables, left, right, p)
            p = mr[0, 0] * 1e-30
        np.asarray(p)
        return time.time() - t0

    chained(WARMUP)
    elapsed = chained(ITERS)
    pairs_per_s = ITERS / elapsed

    if os.path.exists(BASELINE_FILE):
        with open(BASELINE_FILE) as f:
            base = json.load(f)["value"]
    else:
        base = pairs_per_s
        with open(BASELINE_FILE, "w") as f:
            json.dump({"metric": "pairs_per_s_640x480",
                       "value": pairs_per_s,
                       "device": str(jax.devices()[0])}, f)

    result = {
        "metric": "pairs_per_s_640x480",
        "value": round(pairs_per_s, 4),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_s / base, 4),
        "step_ms": round(1000 * elapsed / ITERS, 2),
        "compile_s": round(compile_s, 1),
        "init_s": round(init_s, 1),
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
