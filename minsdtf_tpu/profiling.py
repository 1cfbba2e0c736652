"""Profiling & utilization reporting.

The reference's only observability is a Keras progress bar
(``stable_diffusion.py:424,479``). Here: a ``jax.profiler`` trace wrapper (view in
TensorBoard/XProf) and an analytic FLOP-utilization report against the chip's peak —
the BASELINE.md "speed-of-light" north star.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

# Analytic workload model (BASELINE.md): SD1.5 UNet ~340 GFLOP per 512x512 forward,
# VAE decode ~1.2 TFLOP at 512x512; both scale linearly with pixel count.
UNET_GFLOP_512 = 340.0
DECODE_GFLOP_512 = 1200.0

# bf16 per-chip peaks. NOTE: v5e is 197 TF/s bf16 (394 is its int8 peak; r1/r2
# used 394 here by mistake — corrected r3 after a 4096^3 bf16 matmul measured
# 194.8 TF/s device time = 99% of the true spec).
PEAK_BF16 = {
    "v4": 275e12,
    "v5 lite": 197e12,
    "v5litepod": 197e12,
    "v5e": 197e12,
    "v5p": 459e12,
    "v6": 918e12,
}
PEAK_INT8 = {"v5 lite": 394e12, "v5litepod": 394e12, "v5e": 394e12}


def chip_peak_flops(device=None) -> float:
    device = device or jax.devices()[0]
    kind = device.device_kind.lower()
    for key, val in PEAK_BF16.items():
        if key in kind:
            return val
    return 394e12


def generation_flops(height: int, width: int, steps: int, batch: int = 1, cfg: bool = True) -> float:
    scale = (height * width) / (512.0 * 512.0)
    unet = UNET_GFLOP_512 * 1e9 * scale * steps * (2 if cfg else 1)
    return (unet + DECODE_GFLOP_512 * 1e9 * scale) * batch


def utilization_report(
    sec_per_batch: float, height: int, width: int, steps: int, batch: int = 1,
    cfg: bool = True, device=None,
) -> dict:
    flops = generation_flops(height, width, steps, batch, cfg)
    achieved = flops / sec_per_batch
    peak = chip_peak_flops(device)
    return {
        "sec_per_image": sec_per_batch / batch,
        "achieved_tflops": achieved / 1e12,
        "peak_tflops": peak / 1e12,
        "mxu_utilization": achieved / peak,
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/minsdtf-trace"):
    """Capture an XProf trace of everything inside the context."""
    with jax.profiler.trace(log_dir):
        yield
    print(f"profile written to {log_dir} (view with tensorboard/xprof)")


def op_report(trace_dir: str = "/tmp/minsdtf-trace", top: int = 25, by: str = "source"):
    """Aggregate a captured trace's device ops into a utilization table.

    Parses the Chrome-trace JSON xprof writes (no TensorBoard needed — device-side
    timestamps, immune to host contention), bucketing per-op device time by HLO
    category or repo ``source`` line, with achieved TF/s from the recorded
    ``model_flops``. This is the measurement of record for kernel work on this
    platform: host-side microbenches are unusable whenever anything else runs on the
    (single) host core (see ROADMAP "measurement pitfalls").
    """
    import glob
    import gzip
    import json
    from collections import defaultdict

    paths = glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    if not paths:
        raise FileNotFoundError(f"no trace json under {trace_dir}")
    data = json.loads(gzip.open(sorted(paths)[-1]).read())
    pids = {e["pid"]: e["args"].get("name", "") for e in data["traceEvents"]
            if e.get("ph") == "M" and e.get("name") == "process_name"}

    buckets = defaultdict(lambda: [0.0, 0.0, 0.0, 0])  # time s, flops, bytes, count
    total = 0.0
    for ev in data["traceEvents"]:
        if ev.get("ph") != "X" or "TPU" not in pids.get(ev.get("pid"), ""):
            continue
        args = ev.get("args") or {}
        dur = float(args.get("device_duration_ps", 0)) / 1e12
        if dur <= 0 or "hlo_category" not in args:
            continue
        if by == "source":
            key = f'{args.get("source", "?")} [{args.get("hlo_category", "?")}]'
        else:
            key = args.get("hlo_category", "?")
        b = buckets[key]
        b[0] += dur
        b[1] += float(args.get("model_flops", 0))
        b[2] += float(args.get("raw_bytes_accessed", 0))
        b[3] += 1
        total += dur
    rows = sorted(buckets.items(), key=lambda kv: -kv[1][0])[:top]
    print(f"device op time total: {total:.3f}s  ({by} buckets)")
    for key, (t, fl, byts, n) in rows:
        tf = fl / t / 1e12 if t else 0.0
        gbs = byts / t / 1e9 if t else 0.0
        print(f"  {t*1e3:9.2f} ms  {tf:6.1f} TF/s  {gbs:6.0f} GB/s  n={n:5d}  {key[:95]}")
    return dict(rows)


@contextlib.contextmanager
def timed(label: str = "block", sync: Optional[jax.Array] = None):
    t0 = time.perf_counter()
    out = {}
    yield out
    if sync is not None:
        jax.block_until_ready(sync)
    out["seconds"] = time.perf_counter() - t0
    print(f"[{label}] {out['seconds']:.3f}s")
