"""Serving layer: dynamic micro-batching + HTTP protocol round-trip."""

import io
import threading

import numpy as np

from pats_tpu.serve import Batcher, make_server


class _StubMatcher:
    """Records batch sizes; returns a fixed grid per pair."""

    def __init__(self):
        self.batches = []

    def match_batch(self, ims0, ims1, batch_size=None):
        self.batches.append(len(ims0))
        g = np.stack(np.meshgrid(np.arange(8, 48, 8), np.arange(8, 48, 8),
                                 indexing="ij"), -1).reshape(-1, 2)
        g = g.astype(np.float32)
        return [(g, g) for _ in ims0]


def test_batcher_groups_same_bucket():
    stub = _StubMatcher()
    b = Batcher(stub, max_batch=2, max_wait_ms=200.0)
    try:
        img = np.zeros((64, 64, 3), np.uint8)
        out = [None, None]

        def call(i):
            out[i] = b.match(img, img, timeout=30)

        ts = [threading.Thread(target=call, args=(i,)) for i in range(2)]
        for t in ts:
            t.start()
        for t in ts:
            t.join(30)
        assert all(o is not None for o in out)
        # both requests ran as ONE device batch
        assert stub.batches == [2]
        np.testing.assert_array_equal(out[0][0], out[1][0])
    finally:
        b.close()


def test_batcher_flushes_on_deadline():
    stub = _StubMatcher()
    b = Batcher(stub, max_batch=8, max_wait_ms=20.0)
    try:
        img = np.zeros((64, 64, 3), np.uint8)
        ml, mr = b.match(img, img, timeout=30)   # alone: deadline flush
        assert ml.shape[1] == 2 and stub.batches == [1]
    finally:
        b.close()


def test_pad_matches_cropped_per_image():
    stub = _StubMatcher()
    b = Batcher(stub, max_batch=1, max_wait_ms=1.0)
    try:
        # image1 smaller than image0: right-side points beyond image1's
        # 32-px extent must be dropped (grid goes to 40)
        ml, mr = b.match(np.zeros((64, 64, 3), np.uint8),
                         np.zeros((32, 64, 3), np.uint8), timeout=30)
        assert mr[:, 0].max() < 32
    finally:
        b.close()


def test_http_roundtrip():
    import http.client

    stub = _StubMatcher()
    b = Batcher(stub, max_batch=1, max_wait_ms=1.0)
    server = make_server(b, "127.0.0.1", 0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        buf = io.BytesIO()
        np.savez(buf, image0=np.zeros((64, 64, 3), np.uint8),
                 image1=np.zeros((64, 64, 3), np.uint8))
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("POST", "/match", body=buf.getvalue())
        resp = conn.getresponse()
        assert resp.status == 200
        out = np.load(io.BytesIO(resp.read()))
        assert out["matches_l"].shape == out["matches_r"].shape
        assert out["matches_l"].shape[1] == 2

        conn.request("GET", "/healthz")
        resp = conn.getresponse()
        assert resp.status == 200
        import json

        info = json.loads(resp.read())
        assert info["queue_depth"] == 0 and info["buckets"] == [[64, 64]]
    finally:
        server.shutdown()
        b.close()
