"""bf16 e2e timing + trace report under current env knobs (e.g.
MINSDTF_FLOAT_BLOCKS for the manual space-to-batch A/B on float convs).

bf16 e2e convs run 146 TF/s while the isolated 3x3 probe reaches 171
(experiments/int8_probe.py) — is XLA's own space-to-batch pass leaving ~15% on
the table that the manual 16-block folding (which took int8 convs from 37 to
238 TF/s e2e) can reclaim for bf16 too?"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    size = int(os.environ.get("BENCH_SIZE", 512))
    steps = int(os.environ.get("BENCH_STEPS", 25))

    from minsdtf_tpu import profiling
    from minsdtf_tpu.pipeline import StableDiffusion

    rng = np.random.RandomState(0)
    encoded = rng.normal(0, 1, (77, 768)).astype(np.float32)
    pipe = StableDiffusion(img_height=size, img_width=size)

    def gen(seed):
        return pipe.generate_image(
            encoded, num_steps=steps, unconditional_guidance_scale=7.5,
            guidance_rescale=0.7, seed=seed)

    t0 = time.perf_counter()
    gen(1)
    print(f"compile+first {time.perf_counter()-t0:.1f}s "
          f"(FLOAT_BLOCKS={os.environ.get('MINSDTF_FLOAT_BLOCKS', '0')})", flush=True)
    gen(2)  # staging rep
    ts = []
    for s in (3, 4, 5):
        t0 = time.perf_counter()
        gen(s)
        ts.append(time.perf_counter() - t0)
    print(f"wall median {np.median(ts):.4f}  {sorted(ts)}", flush=True)
    with profiling.trace("/tmp/bf16-e2e"):
        gen(6)
    profiling.op_report("/tmp/bf16-e2e", top=10, by="category")


if __name__ == "__main__":
    main()
