"""Per-resolution conv fold-count sweep (bf16, 512px batch 1).

The r3/r4 global block sweeps closed at 16 blocks for every conv, but the UNet
runs its convs at four output heights (64/32/16/8) with very different channel
counts (320..1280) — one global fold count need not fit all. The conv bucket
sits at ~150 TF/s of the 194.8 measured bf16 peak (~22% scheduling headroom,
ROADMAP r3); this sweep varies ONE height at a time against the 16-everywhere
default via the ``MINSDTF_FLOAT_BLOCKS`` map syntax (ops/basic._resolve_blocks,
e.g. "64:32,*:16").

Each point runs in a SUBPROCESS (the knob is a module constant read at import
and the sampler jit would not retrace on a global mutation); wall medians of 3
reps after a compile + one discarded staging rep. Run on an IDLE box only.
"""

import os
import subprocess
import sys

CONFIGS = os.environ.get("SWEEP_CONFIGS", ";".join([
    "*:16",            # default (control)
    "64:32,*:16",
    "64:8,*:16",
    "32:32,*:16",
    "32:8,*:16",
    "16:8,*:16",
    "16:32,*:16",
    "8:8,*:16",
    "8:4,*:16",
])).split(";")

CHILD = r"""
import time
import numpy as np
from minsdtf_tpu.pipeline import StableDiffusion

rng = np.random.RandomState(0)
encoded = rng.normal(0, 1, (77, 768)).astype(np.float32)
pipe = StableDiffusion(img_height=512, img_width=512)

def gen(seed):
    return pipe.generate_image(
        encoded, num_steps=25,
        unconditional_guidance_scale=7.5, guidance_rescale=0.7, seed=seed)

t0 = time.perf_counter()
gen(1)
print(f"  compile+first {time.perf_counter()-t0:.1f}s", flush=True)
gen(2)  # staging rep
ts = []
for s in (3, 4, 5):
    t0 = time.perf_counter()
    gen(s)
    ts.append(time.perf_counter() - t0)
print(f"RESULT wall median {np.median(ts):.4f} s/img  {sorted(np.round(ts,4))}",
      flush=True)
"""


def main():
    for cfg in CONFIGS:
        env = dict(os.environ, MINSDTF_FLOAT_BLOCKS=cfg)
        print(f"== FLOAT_BLOCKS={cfg} ==", flush=True)
        subprocess.run(
            [sys.executable, "-c", CHILD], env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            check=False, timeout=1800,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
