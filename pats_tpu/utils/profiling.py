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
