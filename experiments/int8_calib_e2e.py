"""Calibrated-static-scales int8 e2e on the real chip: measure what killing the
dynamic amax reduces (~54 ms) + round pass (~14 ms) buys.

Phases: calibrate (2 seeds x 25 steps, instrumented UNet), then time the static
pipe exactly like experiments/int8_e2e.py (discard staging rep, median of 3,
xprof category report)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    size = int(os.environ.get("BENCH_SIZE", 512))
    steps = int(os.environ.get("BENCH_STEPS", 25))
    include_dense = os.environ.get("BENCH_CALIB_DENSE", "0") == "1"

    from minsdtf_tpu import profiling
    from minsdtf_tpu.pipeline import StableDiffusion

    rng = np.random.RandomState(0)
    encoded = rng.normal(0, 1, (77, 768)).astype(np.float32)

    pipe = StableDiffusion(img_height=size, img_width=size, weight_dtype="int8")
    t0 = time.perf_counter()
    amax = pipe.calibrate_int8(
        encoded, num_steps=steps, seeds=(11, 12), include_dense=include_dense,
        save_path="/tmp/int8_scales.npz")
    baked = sum("act_scale" in m for m in pipe.unet_params.values())
    print(f"calibration: {time.perf_counter()-t0:.1f}s, {len(amax)} sites, "
          f"{baked} baked static (stability-gated, include_dense={include_dense})",
          flush=True)

    def gen(seed, ret=False):
        return pipe.generate_image(
            encoded, num_steps=steps, unconditional_guidance_scale=7.5,
            guidance_rescale=0.7, seed=seed, return_latent=ret)

    t0 = time.perf_counter()
    img, lat = gen(1, ret=True)
    print(f"static-int8: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    gen(2)  # staging rep
    ts = []
    for s in (3, 4, 5):
        t0 = time.perf_counter()
        gen(s)
        ts.append(time.perf_counter() - t0)
    print(f"static-int8: wall median {np.median(ts):.4f}  {sorted(ts)}", flush=True)
    with profiling.trace("/tmp/int8e2e-calib"):
        gen(6)
    profiling.op_report("/tmp/int8e2e-calib", top=10, by="category")

    # quality tie-back: same seed as experiments/int8_e2e.py's quality pass
    # (seed 1 latent/image saved there were vs bf16; here just record PSNR vs the
    # DYNAMIC int8 pipe to isolate the static-scale effect)
    dyn_pipe = StableDiffusion(img_height=size, img_width=size, weight_dtype="int8")
    img_d, lat_d = dyn_pipe.generate_image(
        encoded, num_steps=steps, unconditional_guidance_scale=7.5,
        guidance_rescale=0.7, seed=1, return_latent=True)
    mse = float(np.mean((np.asarray(lat, np.float64) - np.asarray(lat_d, np.float64)) ** 2))
    img_mse = np.mean((np.asarray(img, np.float64) - np.asarray(img_d, np.float64)) ** 2)
    psnr = 10 * np.log10(255.0**2 / max(img_mse, 1e-12))
    print(f"static-vs-dynamic int8 same-seed: latent MSE {mse:.4e}, "
          f"image PSNR {psnr:.1f} dB", flush=True)


if __name__ == "__main__":
    main()
