"""Capture a device trace of the bench-config cascade step and summarize.

Parses the xprof trace.json.gz directly (no tensorboard plugin needed):
groups device-side complete events by a coarse op-name bucket and prints
total ms per bucket, descending.
"""

import glob
import gzip
import json
import os
import re
import sys
import time
import dataclasses

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

H, W = 480, 640
BATCH = 4
TRACE_DIR = "/tmp/pats_trace_r2"


def main():
    from pats_tpu.config import ModelConfig
    from pats_tpu.models.cascade import PATSCascade, PATSCascadeBatched

    mc = dataclasses.replace(ModelConfig(), use_bfloat16=True,
                             use_pallas_sinkhorn=True,
                             use_fused_attention=True)
    model = PATSCascade(config=mc, outdoor=True, merge_new=True)
    bmodel = PATSCascadeBatched(config=mc, outdoor=True, merge_new=True)

    rng = np.random.default_rng(18027)
    left1 = jnp.asarray(rng.uniform(0, 255, (H, W, 3)), jnp.float32)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), left1, left1)
    left = jnp.asarray(rng.uniform(0, 255, (BATCH, H, W, 3)), jnp.float32)
    right = jnp.asarray(rng.uniform(0, 255, (BATCH, H, W, 3)), jnp.float32)

    @jax.jit
    def fwd(variables, left, right, perturb):
        out, _ = bmodel.apply(variables, left, right + perturb,
                              mutable=["batch_stats"])
        return out["matches_r"][0, 0, 0], out["valid"].sum()

    s, _ = fwd(variables, left, right, jnp.float32(0.0))
    np.asarray(s)
    print("compiled; tracing...", flush=True)

    os.system(f"rm -rf {TRACE_DIR}")
    jax.profiler.start_trace(TRACE_DIR)
    p = jnp.float32(0.0)
    for _ in range(3):
        s, _ = fwd(variables, left, right, p)
        p = s * 1e-30
    np.asarray(p)
    jax.profiler.stop_trace()

    time.sleep(2)
    paths = glob.glob(f"{TRACE_DIR}/**/*.trace.json.gz", recursive=True)
    assert paths, "no trace file"
    with gzip.open(paths[0]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # device pids: metadata names containing TPU/device core
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in pid_name.items()
                if "TPU" in n or "/device" in n.lower() or "Axon" in n}
    print("processes:", pid_name)

    buckets = {}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1000.0  # us -> ms
        # bucket: strip numeric suffixes / fusion ids
        b = re.sub(r"[.\d]+$", "", name)
        b = re.sub(r"\d+", "#", b)
        buckets[b] = buckets.get(b, 0.0) + dur
        total += dur
    print(f"\ntotal device time over 3 steps: {total:.1f} ms "
          f"({total / 3:.1f} ms/step)\n")
    for b, ms in sorted(buckets.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{ms / 3:9.2f} ms/step  {b}")


if __name__ == "__main__":
    main()
