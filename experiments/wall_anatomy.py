"""Where do the ~140 ms of wall-vs-device go on the default generate_image path?

Phases timed separately on the real chip (compile cache warm):
  prep     host work up to the sampler.generate dispatch (schedule/noise/context)
  dispatch sampler.generate returning DEVICE handles (_defer_fetch) — async cost
  device   tiny-sync (1-element D2H) after dispatch = device compute + queue
  fetch    np.asarray(image_u8) for the 786 KB uint8 image
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    size = int(os.environ.get("BENCH_SIZE", 512))
    steps = int(os.environ.get("BENCH_STEPS", 25))
    wd = os.environ.get("BENCH_WD") or None

    from minsdtf_tpu.pipeline import StableDiffusion

    pipe = StableDiffusion(img_height=size, img_width=size, weight_dtype=wd)
    rng = np.random.RandomState(0)
    encoded = rng.normal(0, 1, (77, 768)).astype(np.float32)

    def gen(seed):
        return pipe.generate_image(
            encoded, num_steps=steps, unconditional_guidance_scale=7.5,
            guidance_rescale=0.7, seed=seed, return_latent=True,
            _defer_fetch=True)

    gen(1)  # compile
    gen(2)  # staging rep
    for seed in (3, 4, 5):
        t0 = time.perf_counter()
        img_dev, lat_dev = gen(seed)
        t1 = time.perf_counter()
        _ = np.asarray(lat_dev[0, 0, 0, 0])  # tiny sync: device done
        t2 = time.perf_counter()
        img = np.asarray(img_dev)
        t3 = time.perf_counter()
        print(
            f"seed {seed}: dispatch {t1-t0:.4f}  device-wait {t2-t1:.4f}  "
            f"img-fetch {t3-t2:.4f}  total {t3-t0:.4f}  ({img.nbytes/1e6:.2f} MB)",
            flush=True)


if __name__ == "__main__":
    main()
