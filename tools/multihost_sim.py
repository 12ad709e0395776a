"""Two-process distributed simulation (round-3 verdict item 6).

Everything distributed previously ran in ONE process on the 8-device
virtual mesh; this drives the actual multi-host code path —
``jax.distributed`` bootstrap via ``initialize_multihost``, a global mesh
spanning two processes, data-parallel training steps whose gradient psum
crosses the process boundary, and the cross-process heartbeat channel —
with 2 local CPU processes of 4 virtual devices each (the standard way
JAX projects fake pods; real multi-chip is unavailable in this
environment).

Launcher mode (spawns the two workers, checks both outputs agree):
    python tools/multihost_sim.py
Worker mode (used by the launcher):
    python tools/multihost_sim.py --process-id K --num-processes 2 \
        --coordinator localhost:PORT --heartbeat-dir DIR
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

LOCAL_DEVICES = 4


def worker(args) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", LOCAL_DEVICES)

    from pats_tpu.parallel.mesh import initialize_multihost

    initialize_multihost(coordinator=args.coordinator,
                         num_processes=args.num_processes,
                         process_id=args.process_id)
    assert jax.process_count() == args.num_processes
    assert jax.device_count() == args.num_processes * LOCAL_DEVICES
    assert len(jax.local_devices()) == LOCAL_DEVICES

    import numpy as np
    import jax.numpy as jnp

    from pats_tpu.config import (CoarseConfig, FineConfig, ModelConfig,
                                 PATSConfig, RefineConfig)
    from pats_tpu.parallel.fault import Heartbeat, stale_processes
    from pats_tpu.parallel.mesh import make_mesh
    from pats_tpu.train.trainer import CoarseTrainer

    cfg = PATSConfig(model=ModelConfig(
        coarse=CoarseConfig(gnn_layers=2, sinkhorn_iterations=5,
                            expand_iters=2),
        fine=FineConfig(gnn_layers=2, sinkhorn_iterations=5, expand_iters=2),
        refine=RefineConfig(gnn_layers=2, sinkhorn_iterations=5)))
    mesh = make_mesh(data=jax.device_count(), model=1)   # global mesh
    trainer = CoarseTrainer(cfg, mesh)

    H = W = 64
    G = (H // 32) * (W // 32)
    rng = jax.random.PRNGKey(0)                # same seed -> same params
    left = jnp.zeros((H, W, 3), jnp.float32)
    state = trainer.init(rng, left, left)      # replicated across processes

    hb = Heartbeat(args.heartbeat_dir)
    B_local = LOCAL_DEVICES
    npr = np.random.default_rng(args.process_id)

    def global_batch():
        local = {
            "left": npr.uniform(0, 255, (B_local, H, W, 3)).astype(
                np.float32),
            "right": npr.uniform(0, 255, (B_local, H, W, 3)).astype(
                np.float32),
            "gt_pos": npr.uniform(0, 2, (B_local, G, 2)).astype(np.float32),
            "gt_class": npr.integers(-1, 2, (B_local, G)).astype(np.int32),
        }
        return {k: jax.make_array_from_process_local_data(
            trainer.batch_sharding, v) for k, v in local.items()}

    losses = []
    for step in range(3):
        state, metrics = trainer._step(state, jax.random.fold_in(rng, step),
                                       global_batch())
        # loss is fully replicated -> every process can read it; its value
        # depends on BOTH processes' shards through the mean reduction
        losses.append(float(np.asarray(metrics["loss"])))
        hb.beat(step)

    # cross-process heartbeat channel: both processes must be visible and
    # fresh from this process's point of view
    deadline = time.time() + 30
    while time.time() < deadline:
        seen = set()
        for name in os.listdir(args.heartbeat_dir):
            seen.add(name)
        if len(seen) >= args.num_processes:
            break
        time.sleep(0.5)
    stale = stale_processes(args.heartbeat_dir, timeout_s=60.0)
    assert not stale, f"stale peers: {stale}"
    assert len(os.listdir(args.heartbeat_dir)) >= args.num_processes

    print(json.dumps({"process": args.process_id,
                      "processes": jax.process_count(),
                      "devices": jax.device_count(),
                      "losses": [round(v, 6) for v in losses]}), flush=True)


def launch() -> None:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    hb_dir = tempfile.mkdtemp(prefix="pats_hb_")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("JAX_NUM_CPU_DEVICES", None)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__),
         "--process-id", str(i), "--num-processes", "2",
         "--coordinator", f"localhost:{port}",
         "--heartbeat-dir", hb_dir],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    ok = True
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=600)
        if p.returncode != 0:
            ok = False
            print(f"worker {i} rc={p.returncode}\n{err[-3000:]}",
                  file=sys.stderr)
        else:
            outs.append(json.loads(out.strip().splitlines()[-1]))
    if not ok:
        sys.exit(1)
    # SPMD invariant: the replicated loss must be IDENTICAL on both
    # processes (it mixes both processes' batch shards via the psum)
    assert outs[0]["losses"] == outs[1]["losses"], outs
    assert all(o["processes"] == 2 and o["devices"] == 8 for o in outs)
    print(json.dumps({"ok": True, "workers": outs}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--process-id", type=int, default=None)
    ap.add_argument("--num-processes", type=int, default=2)
    ap.add_argument("--coordinator", default=None)
    ap.add_argument("--heartbeat-dir", default=None)
    args = ap.parse_args()
    if args.process_id is None:
        launch()
    else:
        worker(args)


if __name__ == "__main__":
    main()
