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


def test_negative_prompt_without_tokenizer_fails_loud():
    """A context-only deployment (no BPE vocabulary) must reject a
    negative_prompt AT ENQUEUE with a clear error, not die later inside the
    worker's tokenizer construction (VERDICT r4 robustness nit)."""
    pipe = FakePipe()
    pipe.bpe_path = None  # mirrors StableDiffusion(bpe_path=None)
    worker = serve_mod.BatchingWorker(pipe, pipeline_depth=1).start()
    try:
        ctx = base64.b64encode(np.zeros((77, 768), np.float32).tobytes()).decode()
        with pytest.raises(ValueError, match="negative_prompt requires"):
            worker.submit({"context": ctx, "negative_prompt": "blurry"})
        # without negative_prompt the same request is fine
        assert worker.submit({"context": ctx}).shape == (1, 8, 8, 3)
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


class BatchFakeHandle:
    def __init__(self, n, delay=0.0):
        self.n = n
        self.delay = delay

    def __array__(self, dtype=None, copy=None):
        if self.delay:
            time.sleep(self.delay)
        out = np.zeros((self.n, 8, 8, 3), np.uint8)
        out += np.arange(self.n, dtype=np.uint8)[:, None, None, None]
        return out


class BatchFakePipe(FakePipe):
    """Batch-capable fake: exposes img_height/img_width so the worker merges."""

    img_height = img_width = 64

    def generate_image(self, ctx, _defer_fetch=False, batch_size=1,
                       diffusion_noise=None, seed=None, **kw):
        assert _defer_fetch
        with self.lock:
            self.dispatched.append(
                (np.shape(ctx)[0] if np.ndim(ctx) == 3 else 1, batch_size,
                 None if diffusion_noise is None else np.shape(diffusion_noise)))
        return BatchFakeHandle(batch_size, self.delay)


def test_worker_merges_compatible_requests():
    """Concurrently queued same-config requests run as ONE batched program and
    each caller gets its own image row; a different-steps request is NOT merged."""
    pipe = BatchFakePipe(delay=0.05)
    worker = serve_mod.BatchingWorker(pipe, pipeline_depth=1, max_batch=8)
    results = {}

    def client(i, steps):
        results[i] = worker.submit({"prompt": f"p{i}", "seed": i, "steps": steps})

    threads = [threading.Thread(target=client, args=(i, 4 if i < 3 else 9))
               for i in range(4)]
    for t in threads:
        t.start()
    time.sleep(0.3)  # let all four enqueue before the worker starts
    worker.start()
    for t in threads:
        t.join(timeout=30)
    try:
        assert worker.served == 4
        assert worker.merged_batches == 1
        # batch sizes quantize to powers of two: the steps=4 trio dispatches as
        # one batch-2 + one solo; the steps=9 request dispatches solo.
        sizes = sorted(b for _, b, _ in pipe.dispatched)
        assert sizes == [1, 1, 2]
        merged = next(d for d in pipe.dispatched if d[1] == 2)
        assert merged[0] == 2                      # stacked contexts
        assert merged[2] == (2, 8, 8, 4)           # per-seed noise rows
        assert all(results[i].shape == (1, 8, 8, 3) for i in range(4))
        rows = sorted(int(results[i][0, 0, 0, 0]) for i in range(3))
        assert rows == [0, 0, 1]                   # merged callers got own rows
    finally:
        worker.stop()


def test_merge_seed_noise_rows_match_batch1(tmp_path):
    """The merged path's per-request noise rows are bit-identical to the noise
    each request would draw alone (pipeline.py's stateless_normal seed path)."""
    from minsdtf_tpu import rng as rng_lib

    captured = {}

    class CapturePipe(BatchFakePipe):
        def generate_image(self, ctx, diffusion_noise=None, batch_size=1, **kw):
            captured["noise"] = np.asarray(diffusion_noise)
            return BatchFakeHandle(batch_size)

    worker = serve_mod.BatchingWorker(CapturePipe(), pipeline_depth=1, max_batch=4)
    threads = [threading.Thread(
        target=lambda i=i: worker.submit({"prompt": "x", "seed": 100 + i}))
        for i in range(2)]
    for t in threads:
        t.start()
    time.sleep(0.2)
    worker.start()
    for t in threads:
        t.join(timeout=30)
    worker.stop()
    noise = captured["noise"]
    assert noise.shape == (2, 8, 8, 4)
    for i, seed in enumerate((100, 101)):
        want = np.asarray(rng_lib.stateless_normal((1, 8, 8, 4), seed), np.float32)
        np.testing.assert_array_equal(noise[i:i + 1], want)
