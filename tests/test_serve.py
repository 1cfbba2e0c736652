"""Serving daemon: queue/batching worker logic + HTTP surface, driven by a fake
pipeline (no TPU, no network egress — the HTTP server binds localhost only)."""

import base64
import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from minsdtf_tpu.tools import serve as serve_mod


class FakeHandle:
    """Device-array stand-in: materializes via np.asarray after a tiny 'compute'."""

    def __init__(self, seed, delay=0.0):
        self.seed = seed
        self.delay = delay

    def __array__(self, dtype=None, copy=None):
        if self.delay:
            time.sleep(self.delay)
        rs = np.random.RandomState(self.seed or 0)
        return rs.randint(0, 255, (1, 8, 8, 3)).astype(np.uint8)


class FakePipe:
    def __init__(self, delay=0.0):
        self.delay = delay
        self.dispatched = []
        self.lock = threading.Lock()

    def encode_text(self, prompt):
        return np.zeros((77, 768), np.float32) + (len(prompt) % 7)

    def generate_image(self, ctx, _defer_fetch=False, seed=None, **kw):
        assert _defer_fetch
        with self.lock:
            self.dispatched.append((seed, kw.get("num_steps")))
        return FakeHandle(seed, self.delay)


def test_worker_serves_and_pipelines():
    pipe = FakePipe()
    worker = serve_mod.BatchingWorker(pipe, pipeline_depth=2).start()
    try:
        outs = [worker.submit({"prompt": "a cat", "seed": i, "steps": 4})
                for i in range(5)]
        assert all(o.shape == (1, 8, 8, 3) for o in outs)
        assert worker.served == 5
        assert [s for s, _ in pipe.dispatched] == [0, 1, 2, 3, 4]
        assert all(n == 4 for _, n in pipe.dispatched)
    finally:
        worker.stop()


def test_worker_propagates_errors():
    class BadPipe(FakePipe):
        def generate_image(self, *a, **kw):
            raise ValueError("boom")

    worker = serve_mod.BatchingWorker(BadPipe(), pipeline_depth=2).start()
    try:
        with pytest.raises(RuntimeError, match="boom"):
            worker.submit({"prompt": "x"})
    finally:
        worker.stop()


def test_context_payload_bypasses_tokenizer():
    pipe = FakePipe()
    worker = serve_mod.BatchingWorker(pipe, pipeline_depth=1).start()
    try:
        ctx = np.random.RandomState(0).randn(77, 768).astype(np.float32)
        out = worker.submit({"context": base64.b64encode(ctx.tobytes()).decode(),
                             "seed": 9})
        assert out.shape == (1, 8, 8, 3)
    finally:
        worker.stop()


@pytest.fixture()
def http_server():
    pipe = FakePipe()
    server, worker = serve_mod.serve(pipe, host="127.0.0.1", port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield server, worker, pipe
    server.shutdown()
    worker.stop()


def _post(port, path, obj):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}", data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:  # non-2xx still carries a JSON body
        return e.code, json.loads(e.read())


def test_http_generate_and_stats(http_server):
    server, worker, pipe = http_server
    port = server.server_address[1]
    status, out = _post(port, "/generate", {"prompt": "a dog", "seed": 3})
    assert status == 200 and out["format"] in ("png", "npy")
    img_bytes = base64.b64decode(out["image"])
    assert len(img_bytes) > 0 and out["shape"] == [8, 8, 3]

    with urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
        assert json.loads(r.read())["ok"] is True
    with urllib.request.urlopen(f"http://127.0.0.1:{port}/stats", timeout=10) as r:
        stats = json.loads(r.read())
    assert stats["served"] == 1 and stats["avg_latency_s"] > 0


def test_http_rejects_bad_request(http_server):
    server, _, _ = http_server
    port = server.server_address[1]
    status, out = _post(port, "/generate", {"no_prompt": 1})
    assert status == 400


def test_concurrent_http_requests_pipeline(http_server):
    """Multiple concurrent clients: all served, dispatch overlap preserved."""
    server, worker, pipe = http_server
    port = server.server_address[1]
    pipe.delay = 0.02
    results = []

    def client(i):
        results.append(_post(port, "/generate", {"prompt": f"p{i}", "seed": i})[0])

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert results == [200] * 6
    assert worker.served == 6
