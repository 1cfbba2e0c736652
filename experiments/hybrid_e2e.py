"""int8_hybrid e2e on the real chip: stable-conv-site-only int8 (static scales,
zero dynamic amax reduces) with bf16-blocked convs everywhere else.

The r3 measurements this targets (ROADMAP): full-int8's conv bucket is 142 ms vs
227 bf16-blocked, but full-int8 pays ~54 ms amax reduces + ~14 ms rounding +
~28 ms int8 formatting back — a net LOSS vs the 0.484 bf16-blocked wall. The
stable GN+SiLU-fed conv sites can take the int8 rate at ZERO dynamic overhead
(one fused clipped round); dense + unstable sites keep bf16. If the stable sites
carry most of the conv FLOPs this should land between 0.44-0.47.

Phases: calibrate (2 seeds x 25 steps), time (discard staging rep, median of 3),
xprof category report, same-seed quality vs the bf16 pipe.
"""

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

    pipe = StableDiffusion(img_height=size, img_width=size,
                           weight_dtype="int8_hybrid")
    t0 = time.perf_counter()
    amax = pipe.calibrate_int8(encoded, num_steps=steps, seeds=(11, 12),
                               save_path="/tmp/hybrid_scales.npz")
    n_q = sum("kernel_q" in m for m in pipe.unet_params.values())
    n_conv = sum(
        "kernel" in m and np.asarray(m["kernel"]).ndim == 4
        for m in pipe.unet_params.values())
    print(f"calibration: {time.perf_counter()-t0:.1f}s, {len(amax)} conv sites "
          f"measured, {n_q} quantized static, {n_conv} convs stay bf16", flush=True)

    def gen(p, seed, ret=False):
        return p.generate_image(
            encoded, num_steps=steps, unconditional_guidance_scale=7.5,
            guidance_rescale=0.7, seed=seed, return_latent=ret)

    t0 = time.perf_counter()
    img, lat = gen(pipe, 1, ret=True)
    print(f"hybrid: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
    gen(pipe, 2)  # staging rep
    ts = []
    for s in (3, 4, 5):
        t0 = time.perf_counter()
        gen(pipe, s)
        ts.append(time.perf_counter() - t0)
    print(f"hybrid: wall median {np.median(ts):.4f}  {sorted(ts)}", flush=True)
    with profiling.trace("/tmp/hybrid-e2e"):
        gen(pipe, 6)
    profiling.op_report("/tmp/hybrid-e2e", top=10, by="category")

    # same-seed quality vs the bf16 default (chaos caveat applies: 25 iterated
    # CFG steps amplify per-op quantization noise into trajectory divergence;
    # the per-op error is what tests/test_quantize.py bounds)
    bf16_pipe = StableDiffusion(img_height=size, img_width=size)
    img_f, lat_f = gen(bf16_pipe, 1, ret=True)
    mse = float(np.mean((np.asarray(lat, np.float64) - np.asarray(lat_f, np.float64)) ** 2))
    img_mse = np.mean((np.asarray(img, np.float64) - np.asarray(img_f, np.float64)) ** 2)
    psnr = 10 * np.log10(255.0**2 / max(img_mse, 1e-12))
    print(f"hybrid-vs-bf16 same-seed: latent MSE {mse:.4e}, image PSNR {psnr:.1f} dB",
          flush=True)


if __name__ == "__main__":
    main()
