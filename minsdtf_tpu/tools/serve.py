"""Batching HTTP serving daemon over the queued-dispatch pipeline.

The reference's only "serving" is a single-user Streamlit/Gradio loop
(``app.py:57-92``) — one synchronous generation at a time, host round-trips
between every step. This daemon is the capability it never had: a request queue
feeding the TPU through ``_defer_fetch`` dispatch so the host prep + image D2H of
request *i* overlap device compute of request *i+1* (the mechanism measured in
ROADMAP r2: 0.523 s/img pipelined vs 0.593 sequential on one chip).

Design (one chip = one worker; stdlib only — no server frameworks in this env):

  - ``ThreadingHTTPServer`` accepts requests and puts them on a ``queue.Queue``;
    each handler blocks on its own ``Future``-like response slot.
  - a single worker thread pulls requests, dispatches ``generate_image(...,
    _defer_fetch=True)`` (device arrays stay on device), and keeps a depth-
    ``pipeline_depth`` deque of in-flight handles; fetching request *i*'s image
    happens while *i+1* computes.
  - concurrently queued requests with matching (steps, guidance, negative) MERGE
    into ONE batched program up to ``max_batch``: contexts stack on the sampler's
    batch axis, per-request seeds become per-row initial noise (bit-identical to
    each request's own batch-1 noise) — batch-8 measures 0.36 s/img where batch-1
    is 0.43 (ROADMAP r4), so merging raises throughput under load without
    changing anyone's pixels.
  - requests carry either a ``prompt`` (tokenized through the pipeline's BPE) or a
    precomputed ``context`` (base64 fp32 — lets zero-vocab environments serve).

Endpoints:
  POST /generate  {"prompt": str | "context": b64, "negative_prompt"?, "steps"?,
                   "seed"?, "guidance_scale"?, "guidance_rescale"?}
                  -> {"image": base64 PNG (or raw npy if PIL absent), "shape": ...}
  GET  /healthz   -> {"ok": true, "queue_depth": n}
  GET  /stats     -> {"served": n, "avg_s_per_img": ...}

Run: ``python -m minsdtf_tpu.tools.serve --port 8000 [--bpe PATH] [--int8]``.
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np


class _Request:
    __slots__ = ("payload", "event", "result", "error", "t_enqueue")

    def __init__(self, payload: dict):
        self.payload = payload
        self.event = threading.Event()
        self.result = None
        self.error: Optional[str] = None
        self.t_enqueue = time.perf_counter()


class BatchingWorker:
    """Pulls requests off a queue, keeps ``pipeline_depth`` generations in flight,
    and MERGES concurrently queued compatible requests into one batched program
    (VERDICT r3 #3: batch-8 runs 0.36 s/img vs 0.44 at batch 1 — contexts stack on
    the sampler's batch axis, per-request seeds become stacked initial-noise rows
    bit-identical to each request's own batch-1 noise, so merging changes wall
    time, not pixels, for the deterministic samplers).

    ``pipe`` needs the ``generate_image``/``encode_text`` surface of
    :class:`minsdtf_tpu.pipeline.StableDiffusion`; tests inject a fake. Merging
    additionally needs ``img_height``/``img_width`` (per-seed noise rows) — a pipe
    without them (minimal fakes) serves strictly per-request."""

    #: payload fields that must match for two requests to share one program
    _MERGE_FIELDS = ("steps", "guidance_scale", "guidance_rescale", "negative_prompt")

    def __init__(self, pipe, pipeline_depth: int = 2, max_queue: int = 64,
                 max_batch: int = 8, merge_window_s: float = 0.05):
        self.pipe = pipe
        self.depth = max(1, int(pipeline_depth))
        self.max_batch = max(1, int(max_batch))
        # Dynamic-batching accumulation window: near-simultaneous HTTP arrivals
        # land 1-20 ms apart (thread scheduling), so an instantaneous queue drain
        # fragments a burst into batch-1/2 programs. Waiting up to 50 ms to close
        # a batch is ~2% of a 3 s generation and routinely upgrades a burst to
        # the batch-8 program (0.36 s/img vs 0.43 at batch 1, ROADMAP r4).
        self.merge_window_s = float(merge_window_s)
        self.can_merge = (
            self.max_batch > 1
            and getattr(pipe, "img_height", None) is not None
            and getattr(pipe, "img_width", None) is not None
        )
        self.requests: "queue.Queue[_Request]" = queue.Queue(maxsize=max_queue)
        self.inflight: deque = deque()
        self._pending: deque = deque()  # requests deferred by merge incompatibility
        self.served = 0
        self.merged_batches = 0
        self.total_latency = 0.0
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def start(self):
        self._thread.start()
        return self

    def stop(self):
        self._stop.set()
        self._thread.join(timeout=30)

    def submit(self, payload: dict, timeout: float = 300.0):
        # Fail-loud at enqueue (VERDICT r4 nit): a negative_prompt is a STRING
        # that must be tokenized, but context-only deployments (clients post
        # precomputed context tensors) may run without a BPE vocabulary — that
        # request would otherwise die deep in the worker with a confusing
        # tokenizer-construction error after queueing.
        if payload.get("negative_prompt") and hasattr(self.pipe, "bpe_path") \
                and not getattr(self.pipe, "bpe_path"):
            raise ValueError(
                "negative_prompt requires a tokenizer, but this server's "
                "pipeline has no BPE vocabulary (bpe_path unset) — supply "
                "bpe_path at server start or omit negative_prompt")
        req = _Request(payload)
        self.requests.put(req, timeout=5.0)
        if not req.event.wait(timeout):
            raise TimeoutError("generation timed out")
        if req.error:
            raise RuntimeError(req.error)
        return req.result

    # ---- worker internals --------------------------------------------------------

    def _context_of(self, p: dict) -> np.ndarray:
        if "context" in p:
            return np.frombuffer(
                base64.b64decode(p["context"]), dtype=np.float32
            ).reshape(p.get("context_shape", (77, 768)))
        # device-resident encode (one dispatch, no D2H) when the pipeline has
        # the fused path; fakes in tests only implement encode_text
        enc = getattr(self.pipe, "_encode_text_dev", self.pipe.encode_text)
        return enc(p["prompt"])

    def _dispatch(self, req: _Request):
        p = req.payload
        return self.pipe.generate_image(
            self._context_of(p),
            negative_prompt=p.get("negative_prompt"),
            num_steps=int(p.get("steps", 25)),
            unconditional_guidance_scale=float(p.get("guidance_scale", 7.5)),
            guidance_rescale=float(p.get("guidance_rescale", 0.7)),
            seed=p.get("seed"),
            _defer_fetch=True,
        )

    def _dispatch_merged(self, reqs):
        """One batched program for ``len(reqs)`` compatible requests: contexts
        stack on the batch axis; each request's seed generates its OWN initial-
        noise row through the TF-Philox host generator — bit-identical to the
        noise that request's batch-1 run would draw (``pipeline.py`` seed path),
        so merging is pixel-invariant for the deterministic samplers. Contexts of
        different LPW chunk counts (seq lengths) dispatch as separate sub-groups
        — one program per (batch, seq) shape."""
        from minsdtf_tpu import rng as rng_lib  # lazy: keeps fake-pipe tests jax-free

        p0 = reqs[0].payload
        ctxs = [np.asarray(self._context_of(r.payload), np.float32) for r in reqs]
        ctxs = [c[None] if c.ndim == 2 else c for c in ctxs]
        groups: dict = {}
        for r, c in zip(reqs, ctxs):
            groups.setdefault(c.shape[1], []).append((r, c))
        h8 = self.pipe.img_height // 8
        w8 = self.pipe.img_width // 8
        out = []
        for _, pairs in groups.items():
            grp = [r for r, _ in pairs]
            ctx = np.concatenate([c for _, c in pairs], axis=0)
            noise = np.concatenate(
                [
                    np.asarray(
                        rng_lib.stateless_normal(
                            (1, h8, w8, 4),
                            r.payload.get("seed")
                            if r.payload.get("seed") is not None
                            else int(np.random.randint(0, 2**31 - 1)),
                        ),
                        np.float32,
                    )
                    for r in grp
                ],
                axis=0,
            )
            handle = self.pipe.generate_image(
                ctx,
                batch_size=len(grp),
                diffusion_noise=noise,
                negative_prompt=p0.get("negative_prompt"),
                num_steps=int(p0.get("steps", 25)),
                unconditional_guidance_scale=float(p0.get("guidance_scale", 7.5)),
                guidance_rescale=float(p0.get("guidance_rescale", 0.7)),
                _defer_fetch=True,
            )
            if len(grp) > 1:
                self.merged_batches += 1
            out.append((grp, handle))
        return out

    def _finish(self, reqs, handle):
        try:
            arr = np.asarray(handle)  # D2H — overlaps the next dispatch
            now = time.perf_counter()
            for i, req in enumerate(reqs):
                req.result = arr[i : i + 1] if len(reqs) > 1 else arr
                self.served += 1
                self.total_latency += now - req.t_enqueue
        except Exception as e:  # pragma: no cover - device failure path
            for req in reqs:
                req.error = f"{type(e).__name__}: {e}"
        finally:
            for req in reqs:
                req.event.set()

    def _merge_key(self, p: dict):
        return tuple(p.get(k) for k in self._MERGE_FIELDS)

    def _next_batch(self):
        """Pop the oldest request plus every queued request compatible with it
        (up to ``max_batch``); incompatible ones stay pending in arrival order."""
        try:
            self._pending.append(self.requests.get(timeout=0.1))
            while True:
                self._pending.append(self.requests.get_nowait())
        except queue.Empty:
            pass
        if not self._pending:
            return []
        if self.can_merge and len(self._pending) < self.max_batch:
            # accumulation window: a burst's stragglers arrive ms after its head
            deadline = time.perf_counter() + self.merge_window_s
            while len(self._pending) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    self._pending.append(self.requests.get(timeout=remaining))
                except queue.Empty:
                    break
        first = self._pending.popleft()
        if not self.can_merge:
            return [first]
        batch, keep = [first], deque()
        key = self._merge_key(first.payload)
        while self._pending and len(batch) < self.max_batch:
            r = self._pending.popleft()
            (batch if self._merge_key(r.payload) == key else keep).append(r)
        keep.extend(self._pending)
        self._pending = keep
        # Quantize to a power of two: every distinct batch size is its own XLA
        # program (minutes of compile through this backend) — {1,2,4,8} bounds
        # the program set. Overflow requests go back to the FRONT of pending in
        # order; they lead the next batch.
        take = 1 << (len(batch).bit_length() - 1)
        if take < len(batch):
            for r in reversed(batch[take:]):
                self._pending.appendleft(r)
            batch = batch[:take]
        return batch

    def _run(self):
        while not self._stop.is_set():
            batch = self._next_batch()
            if not batch:
                # drain in-flight work while idle
                while self.inflight:
                    self._finish(*self.inflight.popleft())
                continue
            try:
                if len(batch) > 1:
                    dispatched = self._dispatch_merged(batch)
                else:
                    dispatched = [([batch[0]], self._dispatch(batch[0]))]
            except Exception as e:
                for req in batch:
                    req.error = f"{type(e).__name__}: {e}"
                    req.event.set()
                continue
            self.inflight.extend(dispatched)
            while len(self.inflight) >= self.depth:
                self._finish(*self.inflight.popleft())
        while self.inflight:
            self._finish(*self.inflight.popleft())


def _encode_image(arr: np.ndarray) -> dict:
    """PNG via PIL when available, else raw .npy bytes — both base64."""
    arr = np.asarray(arr)
    if arr.ndim == 4 and arr.shape[0] == 1:
        arr = arr[0]
    try:
        from PIL import Image

        buf = io.BytesIO()
        # compress_level=1: zlib's fastest setting. PNG encode runs on the host
        # CPU in the response path of every request. On high-entropy outputs the
        # levels tie (~40 ms for 512x512 on this 1-core box — zlib finds nothing
        # to match either way), but on real photographic outputs level 6 costs
        # several times more host CPU for a marginal size win a serving daemon
        # doesn't want to buy.
        Image.fromarray(arr).save(buf, format="PNG", compress_level=1)
        return {"image": base64.b64encode(buf.getvalue()).decode(), "format": "png",
                "shape": list(arr.shape)}
    except Exception:
        buf = io.BytesIO()
        np.save(buf, arr)
        return {"image": base64.b64encode(buf.getvalue()).decode(), "format": "npy",
                "shape": list(arr.shape)}


def make_handler(worker: BatchingWorker):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True, "queue_depth": worker.requests.qsize()})
            elif self.path == "/stats":
                avg = worker.total_latency / worker.served if worker.served else None
                self._reply(200, {"served": worker.served, "avg_latency_s": avg,
                                  "merged_batches": worker.merged_batches})
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            if self.path != "/generate":
                self._reply(404, {"error": "not found"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
                if "prompt" not in payload and "context" not in payload:
                    self._reply(400, {"error": "need `prompt` or `context`"})
                    return
                img = worker.submit(payload)
                self._reply(200, _encode_image(img))
            except ValueError as e:  # request-shaped errors are the client's
                self._reply(400, {"error": str(e)})
            except Exception as e:
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(pipe, host: str = "127.0.0.1", port: int = 8000, pipeline_depth: int = 2,
          max_batch: int = 8, merge_window_s: float = 0.05):
    """Start worker + HTTP server; returns (server, worker) — caller loops."""
    worker = BatchingWorker(pipe, pipeline_depth=pipeline_depth,
                            max_batch=max_batch,
                            merge_window_s=merge_window_s).start()
    server = ThreadingHTTPServer((host, port), make_handler(worker))
    return server, worker


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--max-batch", type=int, default=8,
                    help="merge up to N concurrently queued compatible requests "
                         "into one batched program (1 disables)")
    ap.add_argument("--bpe", default=None, help="CLIP merges file (for `prompt` requests)")
    ap.add_argument("--int8", action="store_true", help="serve with W8A8 weights")
    ap.add_argument("--int8-hybrid", default=None, metavar="SCALES_NPZ",
                    help="serve with stable-site-only int8 (weights/quantize.\n"
                         "hybridize_params); pass the calibrated act-scale .npz "
                         "from StableDiffusion.calibrate_int8(save_path=...)")
    ap.add_argument("--scheduler", default=None,
                    choices=["ddim", "euler", "euler_a", "tcd", "lcm", "dpm", "dpm_karras"],
                    help="sampler (dpm = DPM-Solver++(2M), ~15 steps for "
                         "DDIM-25 quality)")
    ap.add_argument("--unet", default=None)
    ap.add_argument("--text-encoder", default=None)
    ap.add_argument("--vae", default=None)
    args = ap.parse_args(argv)

    from minsdtf_tpu.pipeline import StableDiffusion

    pipe = StableDiffusion(
        img_height=args.size, img_width=args.size, bpe_path=args.bpe,
        unet_ckpt=args.unet, text_encoder_ckpt=args.text_encoder, vae_ckpt=args.vae,
        weight_dtype="int8_hybrid" if args.int8_hybrid else ("int8" if args.int8 else None),
        int8_act_scales=args.int8_hybrid,
        scheduler_type=args.scheduler,
    )
    if args.bpe:
        pipe.warm_text()  # compile the fused text traces before the first request
    server, worker = serve(pipe, args.host, args.port, args.depth,
                           max_batch=args.max_batch)
    print(f"serving on http://{args.host}:{args.port} (depth {worker.depth})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        worker.stop()


if __name__ == "__main__":
    main()
