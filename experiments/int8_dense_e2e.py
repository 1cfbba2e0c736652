"""int8_hybrid + dynamic-W8A8 dense A/B on the real chip.

The r3 hybrid mode (weights/quantize.hybridize_params) quantizes only the
calibration-stable CONV sites; dense stays bf16 because a static per-tensor
activation scale measured ~16% rel err. But dense doesn't need a static scale:
its dynamic amax is a per-token row reduce over the contraction axis (cheap,
fuses with the producer), unlike the conv sites' global (H, W, C) reduce that
cost full-int8 its 54 ms. The isolated probe (experiments/int8_probe.py)
measured W8A8 dense INCLUDING dynamic quant + rescale at 258 TF/s-equiv vs the
167 TF/s bf16 dense bucket (r2 xprof) — if that transfers e2e, the ~69 ms dense
bucket drops to ~45 ms.

Runs both configs in-process (the MINSDTF_HYBRID_DENSE knob is read at pipeline
construction): baseline hybrid (cached compile), then hybrid+dense. Timing per
the ROADMAP discipline (staging rep discarded, median of 3, idle box). Then an
xprof category report of the dense variant and a same-seed quality row vs the
hybrid baseline (chaos caveat: 25 iterated CFG steps amplify per-op noise —
the per-op error bound is what tests/test_quantize.py pins).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCALES = "fixtures/hybrid_scales_random512.npz"


def main():
    size = int(os.environ.get("BENCH_SIZE", 512))
    steps = int(os.environ.get("BENCH_STEPS", 25))

    from minsdtf_tpu import profiling
    from minsdtf_tpu.pipeline import StableDiffusion

    rng = np.random.RandomState(0)
    encoded = rng.normal(0, 1, (77, 768)).astype(np.float32)

    def gen(p, seed, ret=False):
        return p.generate_image(
            encoded, num_steps=steps, unconditional_guidance_scale=7.5,
            guidance_rescale=0.7, seed=seed, return_latent=ret)

    def measure(tag, p):
        t0 = time.perf_counter()
        img, lat = gen(p, 1, ret=True)
        print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
        gen(p, 2)  # staging rep
        ts = []
        for s in (3, 4, 5):
            t0 = time.perf_counter()
            gen(p, s)
            ts.append(time.perf_counter() - t0)
        print(f"{tag}: wall median {np.median(ts):.4f}  {sorted(np.round(ts, 4))}",
              flush=True)
        return img, lat

    os.environ["MINSDTF_HYBRID_DENSE"] = "0"
    base = StableDiffusion(img_height=size, img_width=size,
                           weight_dtype="int8_hybrid", int8_act_scales=SCALES)
    img_b, lat_b = measure("hybrid", base)
    del base

    os.environ["MINSDTF_HYBRID_DENSE"] = "1"
    densep = StableDiffusion(img_height=size, img_width=size,
                             weight_dtype="int8_hybrid", int8_act_scales=SCALES)
    n_qd = sum("kernel_q" in m and m["kernel_q"].ndim == 2
               for m in densep.unet_params.values())
    print(f"dense variant: {n_qd} dense sites W8A8-dynamic", flush=True)
    img_d, lat_d = measure("hybrid+dense", densep)

    with profiling.trace("/tmp/int8-dense-e2e"):
        gen(densep, 6)
    profiling.op_report("/tmp/int8-dense-e2e", top=10, by="category")

    mse = float(np.mean((np.asarray(lat_d, np.float64) - np.asarray(lat_b, np.float64)) ** 2))
    img_mse = np.mean((np.asarray(img_d, np.float64) - np.asarray(img_b, np.float64)) ** 2)
    psnr = 10 * np.log10(255.0**2 / max(img_mse, 1e-12))
    print(f"dense-vs-hybrid same-seed: latent MSE {mse:.4e}, image PSNR {psnr:.1f} dB",
          flush=True)


if __name__ == "__main__":
    main()
