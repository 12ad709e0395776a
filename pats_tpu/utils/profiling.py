"""Tracing and profiling helpers.

The reference has no profiling at all (SURVEY.md par.5); here per-level
trace annotations and xprof-compatible dumps are first-class.

Usage:
    with trace_region("coarse"):
        ...
    with device_trace("/tmp/pats-trace"):   # xprof/tensorboard dump
        matcher.match(a, b)
    t = StageTimer(); t.tick("coarse"); ...; print(t.report())
"""

from __future__ import annotations

import contextlib
import json
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace_region(name: str):
    """Annotate a host-side region in the device trace."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture an xprof trace of everything inside the context."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Optional[dict]:
    """Live/peak device memory, when the backend exposes it."""
    try:
        stats = jax.devices()[0].memory_stats()
        return {k: v for k, v in stats.items()
                if "bytes" in k} if stats else None
    except Exception:      # noqa: BLE001
        return None


class StageTimer:
    """Wall-clock stage timer with JSONL export.

    NOTE: through the tunneled TPU transport only device->host transfers
    are reliable sync points; callers should fetch a small output between
    ticks when timing device work.
    """

    def __init__(self):
        self._last = time.time()
        self.stages: List[Dict[str, float]] = []

    def tick(self, name: str):
        now = time.time()
        self.stages.append({"stage": name, "ms": (now - self._last) * 1000})
        self._last = now

    def report(self) -> str:
        return "\n".join(f"{s['stage']:24s} {s['ms']:8.1f} ms"
                         for s in self.stages)

    def jsonl(self) -> str:
        return "\n".join(json.dumps(s) for s in self.stages)


class MetricsLogger:
    """Structured JSONL metrics sink (stdout or file)."""

    def __init__(self, path: Optional[str] = None):
        self._fh = open(path, "a") if path else None

    def log(self, **fields):
        line = json.dumps({"time": time.time(), **fields})
        if self._fh:
            self._fh.write(line + "\n")
            self._fh.flush()
        else:
            print(line, flush=True)

    def close(self):
        if self._fh:
            self._fh.close()


def stage_timings(matcher, image0, image1, iters: int = 3) -> Dict[str, float]:
    """Per-level device time (ms) of the cascade on a real pair.

    Runs the three levels as separately-jitted functions with the
    matcher's actual variables (occupancy-dependent costs are real, unlike
    tools/profile_stages.py's random-weight microbench) and times each
    with a device->host fetch as the sync point (the tunneled TPU's
    block_until_ready is unreliable).  The sum exceeds the fused
    whole-cascade step (per-level dispatch overhead + lost inter-level
    fusion), so treat the values as a BREAKDOWN, not a latency claim.
    """
    import numpy as np
    import jax.numpy as jnp

    from pats_tpu.models.cascade import compact_cells, prepare_crops
    from pats_tpu.models.coarse import CoarseMatcher
    from pats_tpu.models.fine import FineMatcher
    from pats_tpu.models.refine import SubpixelRefiner

    cfg = matcher.config.model
    dtype = jnp.bfloat16 if cfg.use_bfloat16 else None
    v = matcher.variables

    def sub(name):
        return {"params": v["params"][name],
                "batch_stats": v["batch_stats"][name]}

    left = jnp.asarray(image0, jnp.float32)
    right = jnp.asarray(image1, jnp.float32)
    H, W = left.shape[:2]
    gh, gw = H // 32, W // 32
    G = gh * gw

    c = cfg.coarse
    coarse = CoarseMatcher(
        descriptor_dim=c.descriptor_dim, gnn_layers=c.gnn_layers,
        num_heads=c.num_heads, sinkhorn_iterations=c.sinkhorn_iterations,
        score_temperature=c.score_temperature, expand_iters=c.expand_iters,
        expand_lower_bound=c.expand_lower_bound,
        fused_attention=cfg.use_fused_attention,
        pallas_sinkhorn=cfg.use_pallas_sinkhorn,
        sinkhorn_tol=cfg.sinkhorn_tol, dtype=dtype)
    f = cfg.fine
    fine = FineMatcher(
        descriptor_dim=f.descriptor_dim, title_dim=f.title_dim,
        gnn_layers=f.gnn_layers, num_heads=f.num_heads,
        sinkhorn_iterations=f.sinkhorn_iterations,
        score_temperature=f.score_temperature, expand_iters=f.expand_iters,
        expand_lower_bound=f.expand_lower_bound,
        fused_attention=cfg.use_fused_attention,
        pallas_sinkhorn=cfg.use_pallas_sinkhorn,
        sinkhorn_tol=cfg.sinkhorn_tol, dtype=dtype)
    r = cfg.refine
    refine = SubpixelRefiner(
        descriptor_dim=r.descriptor_dim, gnn_layers=r.gnn_layers,
        num_heads=r.num_heads, sinkhorn_iterations=r.sinkhorn_iterations,
        score_temperature=r.score_temperature, window=r.window,
        padded_map=r.padded_map, neighborhood=r.neighborhood,
        fused_attention=cfg.use_fused_attention,
        pallas_sinkhorn=cfg.use_pallas_sinkhorn,
        sinkhorn_tol=cfg.sinkhorn_tol,
        use_running_average=not cfg.refine_batch_stats, dtype=dtype)

    coarse_fn = jax.jit(lambda sv, a, b: coarse.apply(
        sv, a, b, mutable=["batch_stats"])[0])
    fine_fn = jax.jit(lambda sv, a, b, d, al: fine.apply(
        sv, a, b, d, al, gh, gw, True, True, mutable=["batch_stats"])[0])
    refine_fn = jax.jit(
        lambda sv, a, b, t0_, t1_, p, ce, tg, pv, al: refine.apply(
            sv, a, b, t0_, t1_, p, ce, tg, pv, al,
            mutable=["batch_stats"])[0])

    def timed(fn, *args):
        out = fn(*args)                                 # compile + warm
        np.asarray(jax.tree.leaves(out)[0])
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
            np.asarray(jax.tree.leaves(out)[0])
        return (time.time() - t0) / iters * 1000, out

    ms1, r1 = timed(coarse_fn, sub("coarse"), left, right)
    lc, rc, _cs, _ctr = prepare_crops(left, right, r1["pts"],
                                      r1["x_scale"], r1["y_scale"])
    ms2, r2 = timed(fine_fn, sub("fine"), lc, rc, r1["desc0"], r1["alive"])
    _, pid, cell, tgt, pvalid = compact_cells(r2["cell_alive"], r2["pts"], G)
    kept = r1["alive"] & jnp.any(r2["cell_alive"], axis=-1)
    ms3, _ = timed(refine_fn, sub("refine"), lc, rc, r2["tokens0"],
                   r2["tokens1"], pid, cell, tgt, pvalid, kept)
    return {"coarse_ms": round(ms1, 1), "fine_ms": round(ms2, 1),
            "refine_ms": round(ms3, 1)}
