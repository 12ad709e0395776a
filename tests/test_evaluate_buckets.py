"""Bucketed batched evaluation loop: orchestration-level tests.

The heavy paths (real cascade under vmap/sharding) are covered by
test_sharded_eval.py; these tests pin the NEW eval-loop mechanics with a
stub matcher: /64 resolution bucketing, pad-margin match filtering,
batch flushing, JSONL crash-resume, and result ordering.
(Reference protocol: /root/reference/evaluate.py:21-39.)
"""

import json

import numpy as np

from pats_tpu import evaluate as ev


def test_bucket_hw():
    # default quantum 32 keeps the fixed reference protocols exact
    assert ev._bucket_hw(480, 640) == (480, 640)
    assert ev._bucket_hw(481, 641) == (512, 672)
    assert ev._bucket_hw(480, 640, quantum=64) == (512, 640)
    assert ev._bucket_hw(512, 640, quantum=64) == (512, 640)
    assert ev._bucket_hw(481, 641, quantum=64) == (512, 704)
    assert ev._bucket_hw(96, 64, quantum=32) == (96, 64)


def test_crop_pad_matches():
    ml = np.array([[10, 10], [100, 10], [10, 100]], np.float32)
    mr = np.array([[10, 10], [10, 10], [10, 10]], np.float32)
    kl, kr = ev._crop_pad_matches(ml, mr, (64, 64), (64, 64))
    assert kl.shape == (1, 2) and kr.shape == (1, 2)
    kl, kr = ev._crop_pad_matches(mr, ml, (64, 64), (64, 64))
    assert kl.shape == (1, 2)
    # each side bounded by ITS OWN image extent
    ml2 = np.array([[10, 10], [10, 10]], np.float32)
    mr2 = np.array([[10, 10], [50, 10]], np.float32)
    kl, kr = ev._crop_pad_matches(ml2, mr2, (64, 64), (32, 64))
    assert kl.shape == (1, 2) and float(kr[0, 0]) == 10.0


class _StubMatcher:
    """Returns one perfect correspondence grid regardless of input; counts
    calls and the shapes it saw."""

    def __init__(self):
        self.shapes = []

        class _Cfg:
            class runtime:
                data_axis = "data"

            class model:
                use_bfloat16 = False

        self.config = _Cfg()
        self.variables = {}

    def match(self, im0, im1):
        self.shapes.append(im0.shape[:2])
        g = np.stack(np.meshgrid(np.arange(8, 48, 8), np.arange(8, 48, 8),
                                 indexing="ij"), -1).reshape(-1, 2)
        return g.astype(np.float32), g.astype(np.float32)


def _dataset(shapes):
    data = []
    for h, w in shapes:
        data.append({
            "image0": np.zeros((h, w, 3), np.float32),
            "image1": np.zeros((h, w, 3), np.float32),
            "K0": np.array([[100, 0, 32], [0, 100, 32], [0, 0, 1]],
                           np.float32),
            "K1": np.array([[100, 0, 32], [0, 100, 32], [0, 0, 1]],
                           np.float32),
            "T0": np.eye(4, dtype=np.float32),
            "T1": np.eye(4, dtype=np.float32),
        })
    return data


def test_bucketed_loop_single(tmp_path):
    shapes = [(64, 64), (96, 64), (64, 64), (60, 60)]
    ds = _dataset(shapes)
    m = _StubMatcher()
    resume = str(tmp_path / "shard.jsonl")
    out = ev.evaluate(m, ds, 1.0, 0.25, progress=False,
                      resume_path=resume, batch_size=1, bucket_quantum=64)
    assert len(m.shapes) == 4
    # (60,60) and (64,64) share the 64x64 bucket; (96,64) is its own
    assert sorted(set(m.shapes)) == [(64, 64), (128, 64)]
    assert set(out) >= {"auc@5", "auc@10", "auc@20"}
    # resume: all four pairs recorded with timing + bucket fields
    recs = [json.loads(x) for x in open(resume)]
    assert sorted(r["i"] for r in recs) == [0, 1, 2, 3]
    assert all("t_match_s" in r and "bucket" in r for r in recs)

    # second run skips all completed pairs (no new matcher calls)
    m2 = _StubMatcher()
    out2 = ev.evaluate(m2, ds, 1.0, 0.25, progress=False,
                       resume_path=resume, batch_size=1)
    assert m2.shapes == []
    assert out2 == out


def test_pipelined_dispatch_overlap(monkeypatch):
    """Async depth-1 pipeline: the host finalizes chunk k only AFTER
    dispatching chunk k+1, so pose math overlaps device execution."""
    events = []
    g = np.stack(np.meshgrid(np.arange(8, 48, 8), np.arange(8, 48, 8),
                             indexing="ij"), -1).reshape(-1, 2)
    g = g.astype(np.float32)

    class _AsyncSharded:
        def __init__(self, config, mesh, variables, batch_size):
            self.batch_size = batch_size
            self._n = 0

        def dispatch_batch(self, ims0, ims1, batch_size=None):
            h = self._n
            self._n += 1
            events.append(("dispatch", h))
            return (h, len(ims0))

        def collect(self, handle):
            h, n = handle
            events.append(("collect", h))
            self.last_stats = [{} for _ in range(n)]
            return [(g, g) for _ in range(n)]

    import pats_tpu.parallel.eval as pe
    import pats_tpu.parallel.mesh as pm

    monkeypatch.setattr(pe, "ShardedMatcher", _AsyncSharded)

    class _FakeMesh:
        shape = {"data": 1}

    monkeypatch.setattr(pm, "make_mesh", lambda model=1: _FakeMesh())
    shapes = [(64, 64)] * 6
    out = ev.evaluate(_StubMatcher(), _dataset(shapes), 1.0, 0.25,
                      progress=False, batch_size=2, bucket_quantum=64)
    # 3 chunks; chunk k is collected after chunk k+1 is dispatched
    assert events == [("dispatch", 0), ("dispatch", 1), ("collect", 0),
                      ("dispatch", 2), ("collect", 1), ("collect", 2)]
    assert set(out) >= {"auc@5", "auc@10", "auc@20"}


def test_bucketed_loop_batched(monkeypatch):
    """batch_size>1 flushes full buckets through the batched runner."""
    calls = []

    class _FakeSharded:
        def __init__(self, config, mesh, variables, batch_size):
            self.batch_size = batch_size

        def match_batch(self, ims0, ims1, batch_size=None):
            calls.append([im.shape[:2] for im in ims0])
            g = np.stack(np.meshgrid(np.arange(8, 48, 8),
                                     np.arange(8, 48, 8),
                                     indexing="ij"), -1).reshape(-1, 2)
            g = g.astype(np.float32)
            return [(g, g) for _ in ims0]

    import pats_tpu.parallel.eval as pe
    import pats_tpu.parallel.mesh as pm

    monkeypatch.setattr(pe, "ShardedMatcher", _FakeSharded)

    class _FakeMesh:
        shape = {"data": 1}

    monkeypatch.setattr(pm, "make_mesh", lambda model=1: _FakeMesh())
    shapes = [(64, 64)] * 3 + [(96, 64)] * 2 + [(64, 60)]
    out = ev.evaluate(_StubMatcher(), _dataset(shapes), 1.0, 0.25,
                      progress=False, batch_size=2, bucket_quantum=64)
    # 64x64 bucket: 4 members -> two flushes of 2; 128x64: one flush of 2
    sizes = sorted(len(c) for c in calls)
    assert sizes == [2, 2, 2]
    flat = [s for c in calls for s in c]
    assert flat.count((64, 64)) == 4 and flat.count((128, 64)) == 2
    assert set(out) >= {"auc@5", "auc@10", "auc@20"}
