"""Produce the int8-hybrid calibration fixture (v2: per-channel stats).

Runs pipeline.calibrate_int8 on the real chip with the SAME seeded-random
context the bench/dossier use (RandomState(0) normal (77,768)), 2 seeds x 25
instrumented DDIM steps at 512px, and saves the npz with the v2 per-channel
amax/mean/msq + output-power stats (weights/calibrate.save_scales) that
equalization/bias-correction/site-budgeting consume.

Env: CALIB_OUT (default fixtures/hybrid_scales_random512_v2.npz), BENCH_SIZE.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    size = int(os.environ.get("BENCH_SIZE", 512))
    out = os.environ.get(
        "CALIB_OUT", os.path.join(REPO, "fixtures", "hybrid_scales_random512_v2.npz"))

    from minsdtf_tpu.pipeline import StableDiffusion

    enc = np.random.RandomState(0).normal(0, 1, (77, 768)).astype(np.float32)
    pipe = StableDiffusion(img_height=size, img_width=size,
                           weight_dtype="int8_hybrid")
    t0 = time.perf_counter()
    stats = pipe.calibrate_int8(encoded_text=enc, save_path=out)
    dt = time.perf_counter() - t0
    n_ch = sum(1 for v in stats.values() if isinstance(v, dict) and "ch_amax" in v)
    print(f"[calib] {len(stats)} sites ({n_ch} with ch stats) in {dt:.0f}s -> {out}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
