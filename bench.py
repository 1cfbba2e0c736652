"""Headline benchmark: SD1.5 512x512, 25-step txt2img, CFG 7.5, one chip.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": sec/image, "unit": "s/img", "vs_baseline": utilization}

The reference publishes no speed numbers (BASELINE.md), so ``vs_baseline`` reports
achieved fraction of the analytic speed-of-light for this workload on the local chip
(BASELINE.md's utilization north star): higher is better, 1.0 = ideal.

Weights are seeded-random (zero-egress env) — identical compute graph & cost to real
weights. Env overrides: BENCH_STEPS, BENCH_SIZE, BENCH_BATCH, BENCH_REPEATS.
"""

import contextlib
import io
import json
import os
import sys
import time

import numpy as np


def flops_per_image(height, width, steps, batch, cfg=True):
    """Analytic FLOP count: SD1.5 UNet ~= 340 GFLOP per 512x512 forward at batch 1
    (scales with latent area), x2 for CFG, + VAE decode ~1.2 TFLOP (BASELINE.md)."""
    scale = (height * width) / (512 * 512)
    unet = 340e9 * scale * steps * (2 if cfg else 1)
    decode = 1.2e12 * scale
    return (unet + decode) * batch


def peak_flops():
    """Per-chip bf16 peak; v5e ~= 394 TFLOP/s."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {"v5 lite": 394e12, "v5litepod": 394e12, "v4": 275e12, "v5p": 459e12, "v6": 918e12}
    for key, val in table.items():
        if key in kind:
            return val
    return 394e12


def main():
    steps = int(os.environ.get("BENCH_STEPS", 25))
    size = int(os.environ.get("BENCH_SIZE", 512))
    batch = int(os.environ.get("BENCH_BATCH", 1))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
    tcd = os.environ.get("BENCH_TCD") == "1"  # few-step distilled-sampler config

    import jax

    with contextlib.redirect_stdout(sys.stderr):
        from minsdtf_tpu.pipeline import StableDiffusion

        pipe = StableDiffusion(img_height=size, img_width=size, active_tcd=tcd)
        rng = np.random.RandomState(0)
        encoded = rng.normal(0, 1, (77, 768)).astype(np.float32)

        def run(seed):
            img = pipe.generate_image(
                encoded,
                batch_size=batch,
                num_steps=steps,
                unconditional_guidance_scale=7.5,
                guidance_rescale=0.7,
                seed=seed,
            )
            return img

        run(1)  # compile
        times = []
        for i in range(repeats):
            t0 = time.perf_counter()
            img = run(i + 2)
            jax.block_until_ready(img)
            times.append(time.perf_counter() - t0)
        # best-of-repeats: robust to transient tunnel/host jitter (measured ±5%)
        elapsed = min(times)

    sec_per_image = elapsed / batch
    ideal = flops_per_image(size, size, steps, 1) / peak_flops()
    kind = "TCD txt2img" if tcd else "txt2img"
    result = {
        "metric": f"SD1.5 {size}x{size} {steps}-step {kind} (CFG 7.5, bf16, 1 chip)",
        "value": round(sec_per_image, 4),
        "unit": "s/img",
        "vs_baseline": round(ideal / sec_per_image, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
