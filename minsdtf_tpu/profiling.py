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

PEAK_BF16 = {
    "v4": 275e12,
    "v5 lite": 394e12,
    "v5litepod": 394e12,
    "v5e": 394e12,
    "v5p": 459e12,
    "v6": 918e12,
}


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


@contextlib.contextmanager
def timed(label: str = "block", sync: Optional[jax.Array] = None):
    t0 = time.perf_counter()
    out = {}
    yield out
    if sync is not None:
        jax.block_until_ready(sync)
    out["seconds"] = time.perf_counter() - t0
    print(f"[{label}] {out['seconds']:.3f}s")
