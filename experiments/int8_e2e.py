"""int8 A/B on the real chip: bf16 vs W8A8 sampler — speed (xprof device time +
wall) and quality (latent MSE / image PSNR on the same seed).

The quality comparison uses seeded random weights through the same pipeline both
times (zero-egress env; no real checkpoints) — the compute graph, shapes and
quantization error mechanics are identical to real weights; the MSE threshold is
the BASELINE latent gate (1e-2)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    size = int(os.environ.get("BENCH_SIZE", 512))
    steps = int(os.environ.get("BENCH_STEPS", 25))
    import jax

    from minsdtf_tpu import profiling
    from minsdtf_tpu.pipeline import StableDiffusion

    rng = np.random.RandomState(0)
    encoded = rng.normal(0, 1, (77, 768)).astype(np.float32)

    results = {}
    for tag, wd in (("bf16", None), ("int8", "int8")):
        pipe = StableDiffusion(img_height=size, img_width=size, weight_dtype=wd)

        def gen(seed, ret=False):
            return pipe.generate_image(
                encoded, num_steps=steps, unconditional_guidance_scale=7.5,
                guidance_rescale=0.7, seed=seed, return_latent=ret)

        t0 = time.perf_counter()
        img, lat = gen(1, ret=True)  # compile
        print(f"{tag}: compile+first {time.perf_counter()-t0:.1f}s", flush=True)
        gen(2)  # staging rep
        ts = []
        for s in (3, 4, 5):
            t0 = time.perf_counter()
            gen(s)
            ts.append(time.perf_counter() - t0)
        trace_dir = f"/tmp/int8e2e-{tag}"
        with profiling.trace(trace_dir):
            gen(6)
        print(f"{tag}: wall median {np.median(ts):.4f}  {sorted(ts)}", flush=True)
        report = profiling.op_report(trace_dir, top=10, by="category")
        results[tag] = {"wall": float(np.median(ts)), "img": np.asarray(img),
                        "lat": np.asarray(lat)}

    # quality: same seed, bf16 vs int8
    lat_b, lat_i = results["bf16"]["lat"], results["int8"]["lat"]
    mse = float(np.mean((lat_b - lat_i) ** 2))
    img_b = results["bf16"]["img"].astype(np.float64)
    img_i = results["int8"]["img"].astype(np.float64)
    img_mse = np.mean((img_b - img_i) ** 2)
    psnr = 10 * np.log10(255.0**2 / max(img_mse, 1e-12))
    print(f"\nint8-vs-bf16 same-seed: latent MSE {mse:.4e} (gate 1e-2), "
          f"image PSNR {psnr:.1f} dB")
    print(f"wall: bf16 {results['bf16']['wall']:.4f} -> int8 {results['int8']['wall']:.4f} "
          f"({results['bf16']['wall']/results['int8']['wall']:.2f}x)")


if __name__ == "__main__":
    main()
