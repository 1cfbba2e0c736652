"""Prewarm the persistent XLA compile cache for the serving daemon's merged-batch
programs (tools/serve.py quantizes merges to {1,2,4,8}; each size+noise-injection
signature is its own executable). Run once per cache lifetime on the target chip;
afterwards the daemon's first merged request compiles from cache in seconds.

Covers, for the int8-hybrid 512px serving config:
  - batch {2,4,8} with injected diffusion_noise (the merged-request trace)
  - batch 1 with seed (the solo trace; usually already warm from bench)

Run: python -u experiments/prewarm_serving.py   [BENCH_SIZE / BENCH_STEPS override]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    size = int(os.environ.get("BENCH_SIZE", 512))
    steps = int(os.environ.get("BENCH_STEPS", 25))
    from minsdtf_tpu import rng as rng_lib
    from minsdtf_tpu.pipeline import StableDiffusion

    # mirror bench.py's headline decision (quality dossier gates int8-hybrid)
    import bench
    scales = os.path.join(REPO, "fixtures", "hybrid_scales_random512.npz")
    wd = bench.headline_weight_dtype(REPO)
    use_hybrid = wd == "int8_hybrid" and size == 512 and os.path.exists(scales)
    pipe = StableDiffusion(
        img_height=size, img_width=size,
        weight_dtype="int8_hybrid" if use_hybrid else None,
        int8_act_scales=scales if use_hybrid else None)
    enc = np.random.RandomState(0).normal(0, 1, (77, 768)).astype(np.float32)
    h8 = size // 8
    for b in (1, 2, 4, 8):
        t0 = time.time()
        if b == 1:
            img = pipe.generate_image(enc, num_steps=steps, seed=1)
        else:
            noise = np.concatenate(
                [np.asarray(rng_lib.stateless_normal((1, h8, h8, 4), s), np.float32)
                 for s in range(b)], axis=0)
            img = pipe.generate_image(
                np.repeat(enc[None], b, axis=0), batch_size=b,
                diffusion_noise=noise, num_steps=steps)
        print(f"batch {b}: {img.shape} compiled+ran in {time.time() - t0:.1f}s",
              flush=True)
    print("prewarm done")


if __name__ == "__main__":
    main()
