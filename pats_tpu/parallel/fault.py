"""Failure detection, fault injection, and elastic recovery.

The reference has no fault tolerance at all: a crashed eval restarts
from scratch and the only sentinels are ``pair == -1`` skips in
Compute_accuracy (reference utils/utils.py:493-510) and the inf pose
error on <15 matches (reference utils/metrics.py:23-24).  This module
supplies the three subsystems SURVEY.md par.5 plans for a production
multi-host deployment:

- ``FaultInjector`` / ``fault_point``: named injection sites in the
  comm/eval/train layers.  Tests (and chaos drills) arm a site to
  raise, hang, or NaN-poison after N passes; unarmed sites cost one
  dict lookup.  Armed via ``PATS_FAULT=site:kind[:after[:arg]]`` or
  programmatically.
- ``Heartbeat`` / ``HeartbeatMonitor``: per-process liveness stamps on
  a shared filesystem (the practical channel on a pod slice, where
  every worker already mounts the checkpoint dir) + a monitor that
  flags processes whose stamp goes stale.  ``probe_collectives`` is the
  complementary in-band check: a tiny psum under a watchdog thread
  detects a *hung* collective (a peer that is alive but stuck), which
  no filesystem stamp can see.
- ``run_with_recovery``: restart-with-backoff driver used by the eval
  CLI (crash-resumable JSONL shards make restarts cheap) and usable
  around any checkpoint-resume training loop.
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional


class FaultInjected(RuntimeError):
    """Raised by an armed ``raise``-kind fault site."""


@dataclass
class _Site:
    kind: str                  # "raise" | "hang" | "nan"
    after: int = 0             # fire on the (after+1)-th pass...
    count: int = 1             # ...for this many passes (0 = forever)
    arg: float = 1e9           # hang seconds
    hits: int = 0
    fired: int = 0


class FaultInjector:
    """Registry of named fault sites.

    ``checkpoint(site, payload)`` is called at instrumented points; it
    returns ``payload`` unchanged unless the site is armed, in which
    case it raises (``raise``), sleeps (``hang``), or returns a
    NaN-poisoned copy of the payload (``nan``, arrays only).
    """

    def __init__(self):
        self._sites: Dict[str, _Site] = {}
        self._lock = threading.Lock()
        env = os.environ.get("PATS_FAULT", "")
        for spec in filter(None, env.split(",")):
            parts = spec.split(":")
            self.arm(parts[0], parts[1] if len(parts) > 1 else "raise",
                     after=int(parts[2]) if len(parts) > 2 else 0,
                     arg=float(parts[3]) if len(parts) > 3 else 1e9)

    def arm(self, site: str, kind: str = "raise", after: int = 0,
            count: int = 1, arg: float = 1e9) -> None:
        assert kind in ("raise", "hang", "nan"), kind
        with self._lock:
            self._sites[site] = _Site(kind, after, count, arg)

    def disarm(self, site: Optional[str] = None) -> None:
        with self._lock:
            if site is None:
                self._sites.clear()
            else:
                self._sites.pop(site, None)

    def checkpoint(self, site: str, payload=None):
        s = self._sites.get(site)
        if s is None:
            return payload
        with self._lock:
            s.hits += 1
            live = (s.hits > s.after
                    and (s.count == 0 or s.fired < s.count))
            if live:
                s.fired += 1
        if not live:
            return payload
        if s.kind == "raise":
            raise FaultInjected(f"injected fault at site {site!r} "
                                f"(hit {s.hits})")
        if s.kind == "hang":
            time.sleep(s.arg)
            return payload
        # nan: poison array payloads (simulates silent data corruption)
        import numpy as np

        def _poison(x):
            if hasattr(x, "dtype") and np.issubdtype(
                    np.asarray(x).dtype, np.floating):
                y = np.array(x, copy=True)
                y.reshape(-1)[0] = np.nan
                return y
            return x

        if isinstance(payload, (tuple, list)):
            return type(payload)(_poison(p) for p in payload)
        return _poison(payload)


#: process-global injector; ``fault_point`` is the one-liner call sites use
INJECTOR = FaultInjector()


def fault_point(site: str, payload=None):
    return INJECTOR.checkpoint(site, payload)


# ---------------------------------------------------------------------------
# liveness


class Heartbeat:
    """Periodic liveness stamp for one process.

    Writes ``{dir}/hb_{process_id}.json`` with wall time + a
    user-advanced step counter.  The write is atomic (tmp + rename) so
    monitors never read a torn stamp.  Start as a daemon thread or call
    ``beat()`` manually from the step loop (a beat from the loop proves
    *progress*, not just process existence).
    """

    def __init__(self, directory: str, process_id: Optional[int] = None,
                 interval_s: float = 5.0):
        import jax

        self.dir = directory
        self.pid = (process_id if process_id is not None
                    else jax.process_index())
        self.interval_s = interval_s
        self.step = 0
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        os.makedirs(directory, exist_ok=True)

    @property
    def path(self) -> str:
        return os.path.join(self.dir, f"hb_{self.pid}.json")

    def beat(self, step: Optional[int] = None) -> None:
        if step is not None:
            self.step = step
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"pid": self.pid, "t": time.time(),
                       "step": self.step}, f)
        os.replace(tmp, self.path)

    def start(self) -> "Heartbeat":
        def _loop():
            while not self._stop.wait(self.interval_s):
                self.beat()

        self.beat()
        self._thread = threading.Thread(target=_loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.interval_s + 1)


def stale_processes(directory: str, timeout_s: float,
                    expected: Optional[int] = None) -> List[int]:
    """Process ids whose stamp is older than ``timeout_s`` (or missing,
    when ``expected`` process count is given)."""
    now = time.time()
    seen = {}
    if os.path.isdir(directory):
        for name in os.listdir(directory):
            if name.startswith("hb_") and name.endswith(".json"):
                try:
                    with open(os.path.join(directory, name)) as f:
                        rec = json.load(f)
                    seen[int(rec["pid"])] = float(rec["t"])
                except (ValueError, KeyError, OSError):
                    continue
    stale = [pid for pid, t in seen.items() if now - t > timeout_s]
    if expected is not None:
        stale += [p for p in range(expected) if p not in seen]
    return sorted(stale)


class HeartbeatMonitor:
    """Daemon thread that polls ``stale_processes`` and fires a callback
    once per newly-stale process (e.g. abort the run, trigger elastic
    re-mesh, or page)."""

    def __init__(self, directory: str, timeout_s: float,
                 on_stale: Callable[[List[int]], None],
                 expected: Optional[int] = None, poll_s: float = 1.0):
        self.args = (directory, timeout_s, expected)
        self.on_stale = on_stale
        self.poll_s = poll_s
        self._stop = threading.Event()
        self._reported: set = set()
        self._thread: Optional[threading.Thread] = None

    def start(self) -> "HeartbeatMonitor":
        def _loop():
            while not self._stop.wait(self.poll_s):
                stale = [p for p in stale_processes(*self.args)
                         if p not in self._reported]
                if stale:
                    self._reported.update(stale)
                    self.on_stale(stale)

        self._thread = threading.Thread(target=_loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.poll_s + 1)


def probe_collectives(mesh, timeout_s: float = 30.0) -> float:
    """Round-trip a tiny psum over every mesh axis under a watchdog.

    Returns the measured latency.  Raises ``TimeoutError`` if the
    collective does not complete in ``timeout_s`` — the signature of a
    peer that is alive (heartbeat still fresh) but stuck, which only an
    in-band probe can detect.  The probe itself is a fault-injection
    site (``collective_probe``) so chaos tests can simulate the hang.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    axes = tuple(mesh.axis_names)

    def _probe():
        x = jax.device_put(
            jnp.ones((np.prod([mesh.shape[a] for a in axes]),),
                     jnp.float32),
            NamedSharding(mesh, P(axes)))

        def f(v):
            return jax.lax.psum(v, axes)

        y = jax.jit(
            jax.shard_map(f, mesh=mesh, in_specs=P(axes), out_specs=P()),
        )(x)
        fault_point("collective_probe")
        return float(np.asarray(y)[0])

    result: dict = {}

    def _run():
        try:
            result["v"] = _probe()
        except BaseException as e:            # surfaced to the caller
            result["e"] = e

    t0 = time.time()
    th = threading.Thread(target=_run, daemon=True)
    th.start()
    th.join(timeout=timeout_s)
    if th.is_alive():
        raise TimeoutError(
            f"collective probe did not complete in {timeout_s}s - "
            "suspect a hung peer or deadlocked collective")
    if "e" in result:
        raise result["e"]
    return time.time() - t0


# ---------------------------------------------------------------------------
# elastic recovery


def run_with_recovery(fn: Callable[[], object], max_restarts: int = 2,
                      retriable=(Exception,), backoff_s: float = 0.0,
                      on_restart: Optional[Callable[[int, BaseException],
                                                    None]] = None):
    """Run ``fn``, restarting it up to ``max_restarts`` times on failure.

    ``fn`` must be resumable-idempotent: it re-derives remaining work
    from durable state on entry (the eval loop's JSONL resume shards,
    a trainer's orbax checkpoint).  KeyboardInterrupt is never caught.
    """
    attempt = 0
    while True:
        try:
            return fn()
        except KeyboardInterrupt:
            raise
        except retriable as e:
            attempt += 1
            if attempt > max_restarts:
                raise
            if on_restart is not None:
                on_restart(attempt, e)
            if backoff_s:
                time.sleep(backoff_s * attempt)
