"""Manual space-to-batch block-count sweep under the int8_hybrid headline config.

MINSDTF_INT8_BLOCKS folds the int8 conv sites, MINSDTF_FLOAT_BLOCKS the bf16
ones (ops/basic._blocked_conv). Both default 16 (the value that won the r3
A/Bs); the conv bucket ran 150.7 of the 194.8 measured bf16 peak at 16, so
~22% scheduling headroom remained when the sweep was queued. Each point runs
in a SUBPROCESS (the knobs are module constants read at import) with the
committed calibration fixture, timed per the ROADMAP discipline: compile,
one staging rep, median of 3.

Env: SWEEP_POINTS="16:16,8:16,32:16,16:8,16:32" (int8:float), BENCH_BATCH.
"""

import os
import subprocess
import sys

POINTS = os.environ.get("SWEEP_POINTS", "16:16,8:16,32:16,16:8,16:32")
BATCH = os.environ.get("BENCH_BATCH", "1")

CHILD = r"""
import time
import numpy as np
from minsdtf_tpu.pipeline import StableDiffusion

batch = int(%(batch)r)
rng = np.random.RandomState(0)
encoded = rng.normal(0, 1, (77, 768)).astype(np.float32)
pipe = StableDiffusion(img_height=512, img_width=512,
                       weight_dtype="int8_hybrid",
                       int8_act_scales="fixtures/hybrid_scales_random512.npz")

def gen(seed):
    return pipe.generate_image(
        encoded, batch_size=batch, num_steps=25,
        unconditional_guidance_scale=7.5, guidance_rescale=0.7, seed=seed)

t0 = time.perf_counter()
gen(1)
print(f"  compile+first {time.perf_counter()-t0:.1f}s", flush=True)
gen(2)  # staging rep
ts = []
for s in (3, 4, 5):
    t0 = time.perf_counter()
    gen(s)
    ts.append((time.perf_counter() - t0) / batch)
print(f"RESULT wall median {np.median(ts):.4f} s/img  {sorted(np.round(ts,4))}",
      flush=True)
"""


def main():
    for point in POINTS.split(","):
        i8, fb = point.split(":")
        env = dict(os.environ, MINSDTF_INT8_BLOCKS=i8, MINSDTF_FLOAT_BLOCKS=fb)
        print(f"== INT8_BLOCKS={i8} FLOAT_BLOCKS={fb} batch={BATCH} ==", flush=True)
        subprocess.run(
            [sys.executable, "-c", CHILD % {"batch": BATCH}], env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            check=False, timeout=1800,
        )


if __name__ == "__main__":
    main()
