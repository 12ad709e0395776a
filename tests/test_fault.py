"""Failure detection / fault injection / elastic recovery
(parallel/fault.py; SURVEY.md par.5 — the reference has none of this).

All CPU-fast: the chaos sites are exercised through the real eval loop
with the stub matcher from test_evaluate_buckets."""

import json
import time

import numpy as np
import pytest

from pats_tpu.parallel import fault
from pats_tpu.parallel.fault import (FaultInjected, FaultInjector, Heartbeat,
                                     HeartbeatMonitor, probe_collectives,
                                     run_with_recovery, stale_processes)


@pytest.fixture(autouse=True)
def _clean_injector():
    fault.INJECTOR.disarm()
    yield
    fault.INJECTOR.disarm()


def test_injector_raise_after_n():
    inj = FaultInjector()
    inj.arm("x", "raise", after=2)
    inj.checkpoint("x")
    inj.checkpoint("x")
    with pytest.raises(FaultInjected):
        inj.checkpoint("x")
    # count=1 -> fires once, then passes again
    inj.checkpoint("x")


def test_injector_nan_poison():
    inj = FaultInjector()
    inj.arm("y", "nan")
    a = np.ones((3, 2), np.float32)
    b = np.arange(4)                        # int: untouched
    pa, pb = inj.checkpoint("y", (a, b))
    assert np.isnan(pa).any() and not np.isnan(a).any()
    assert (pb == b).all()


def test_injector_env_spec(monkeypatch):
    monkeypatch.setenv("PATS_FAULT", "site_a:raise:1,site_b:nan")
    inj = FaultInjector()
    inj.checkpoint("site_a")                # first pass ok
    with pytest.raises(FaultInjected):
        inj.checkpoint("site_a")
    assert np.isnan(inj.checkpoint("site_b",
                                   np.ones(2, np.float32))).any()


def test_heartbeat_and_stale_detection(tmp_path):
    d = str(tmp_path / "hb")
    hb0 = Heartbeat(d, process_id=0)
    hb1 = Heartbeat(d, process_id=1)
    hb0.beat(step=5)
    hb1.beat(step=5)
    assert stale_processes(d, timeout_s=10.0) == []
    # expected-count detection: a process that never stamped
    assert stale_processes(d, timeout_s=10.0, expected=3) == [2]
    # age out process 1 by rewriting its stamp in the past
    rec = json.load(open(hb1.path))
    rec["t"] -= 100.0
    json.dump(rec, open(hb1.path, "w"))
    assert stale_processes(d, timeout_s=10.0) == [1]


def test_heartbeat_monitor_fires_once(tmp_path):
    d = str(tmp_path / "hb")
    hb = Heartbeat(d, process_id=0, interval_s=0.05).start()
    events = []
    mon = HeartbeatMonitor(d, timeout_s=0.5,
                           on_stale=lambda s: events.append(s),
                           poll_s=0.05).start()
    time.sleep(0.3)
    assert events == []                     # alive while beating
    hb.stop()
    deadline = time.time() + 5.0
    while not events and time.time() < deadline:
        time.sleep(0.05)
    mon.stop()
    assert events and events[0] == [0]
    assert len(events) == 1                 # reported once, not re-fired


def test_probe_collectives_roundtrip_and_hang():
    import jax

    from pats_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(model=1, devices=jax.devices()[:4])
    dt = probe_collectives(mesh, timeout_s=60.0)
    assert dt < 60.0
    fault.INJECTOR.arm("collective_probe", "hang", arg=30.0)
    with pytest.raises(TimeoutError):
        probe_collectives(mesh, timeout_s=0.5)


def test_run_with_recovery():
    calls = []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("boom")
        return "ok"

    restarts = []
    out = run_with_recovery(flaky, max_restarts=3,
                            on_restart=lambda n, e: restarts.append(n))
    assert out == "ok" and len(calls) == 3 and restarts == [1, 2]

    with pytest.raises(RuntimeError):
        run_with_recovery(lambda: (_ for _ in ()).throw(RuntimeError("x")),
                          max_restarts=1)


def test_eval_loop_crash_resume_recovery(tmp_path):
    """End-to-end elastic drill: inject a crash mid-eval, restart with
    the same resume shards, and verify no pair is matched twice."""
    from test_evaluate_buckets import _StubMatcher, _dataset

    from pats_tpu import evaluate as ev

    ds = _dataset([(64, 64)] * 5)
    resume = str(tmp_path / "shard.jsonl")
    fault.INJECTOR.arm("eval_flush", "raise", after=3)

    m = _StubMatcher()

    def _run():
        return ev.evaluate(m, ds, 1.0, 0.25, progress=False,
                           resume_path=resume, batch_size=1)

    restarts = []
    out = run_with_recovery(_run, max_restarts=2,
                            on_restart=lambda n, e: restarts.append(repr(e)))
    assert restarts and "eval_flush" in restarts[0]
    # every pair recorded exactly once across the crash boundary
    recs = [json.loads(x) for x in open(resume)]
    assert sorted(r["i"] for r in recs) == [0, 1, 2, 3, 4]
    # 3 matched before the crash, 2 after: no duplicated work
    assert len(m.shapes) == 5
    assert set(out) >= {"auc@5", "auc@10", "auc@20"}
