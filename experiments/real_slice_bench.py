"""Multi-chip scaling bench — ready to run the day a real TPU slice exists.

Everything multi-chip in this repo is verified on virtual CPU meshes (tests,
__graft_entry__.dryrun_multichip); no real-ICI number has ever been measured
(single tunneled chip only). This script is the one-command measurement for a
real slice:

    python experiments/real_slice_bench.py            # all modes
    python experiments/real_slice_bench.py dp tp sp   # subset

Measures, per mode, median s/img over >=3 reps (first rep discarded):
  - dp:  images/s vs chips — batch N on a (data=N) mesh, weights replicated;
  - tp:  batch-1 latency on a (model=N) mesh — Megatron sharding of attn/FF;
  - sp:  2048px batch-1 on a (model=N) mesh — ring attention + spatially
         partitioned convs/norms (sequence parallel end-to-end);
  - single-chip baseline for the same configs.

Prints one JSON line per measurement (same contract as bench.py).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed_runs(fn, reps=4):
    ts = []
    for i in range(reps):
        t0 = time.perf_counter()
        fn(i)
        ts.append(time.perf_counter() - t0)
    return ts[1:]  # discard the staging rep


def measure(tag, pipe, batch, steps, size, reps=4):
    import jax

    rng = np.random.RandomState(0)
    encoded = rng.normal(0, 1, (77, 768)).astype(np.float32)

    def run(i):
        img = pipe.generate_image(
            encoded, batch_size=batch, num_steps=steps,
            unconditional_guidance_scale=7.5, guidance_rescale=0.7, seed=100 + i)
        jax.block_until_ready(img)

    run(99)  # compile
    ts = timed_runs(run, reps)
    s_img = float(np.median(ts)) / batch
    print(json.dumps({
        "metric": tag, "value": round(s_img, 4), "unit": "s/img",
        "batch": batch, "steps": steps, "size": size,
        "min": round(min(ts) / batch, 4), "max": round(max(ts) / batch, 4),
        "n_devices": len(jax.devices()),
    }), flush=True)
    return s_img


def main():
    modes = [m for m in sys.argv[1:] if not m.startswith("-")] or ["dp", "tp", "sp"]
    import jax

    from minsdtf_tpu.parallel import mesh as mesh_lib
    from minsdtf_tpu.pipeline import StableDiffusion

    n = len(jax.devices())
    steps = int(os.environ.get("BENCH_STEPS", 25))
    print(f"# {n} devices: {jax.devices()[0].device_kind}", file=sys.stderr)

    if n > 1 and "dp" in modes:
        mesh = mesh_lib.make_mesh(data=n, model=1)
        pipe = StableDiffusion(img_height=512, img_width=512, mesh=mesh)
        measure(f"DP{n} 512px batch={n}", pipe, n, steps, 512)
        measure(f"DP{n} 512px batch={4 * n}", pipe, 4 * n, steps, 512)

    if n > 1 and "tp" in modes:
        mesh = mesh_lib.make_mesh(data=1, model=n)
        pipe = StableDiffusion(img_height=512, img_width=512, mesh=mesh)
        measure(f"TP{n} 512px batch=1 (latency)", pipe, 1, steps, 512)

    if n > 1 and "sp" in modes:
        mesh = mesh_lib.make_mesh(data=1, model=n)
        pipe = StableDiffusion(img_height=2048, img_width=2048, mesh=mesh,
                               sequence_parallel=True)
        measure(f"SP{n} 2048px batch=1 (ring + spatial partition)", pipe, 1,
                min(steps, 8), 2048)

    # single-chip baselines for the scaling denominator
    pipe1 = StableDiffusion(img_height=512, img_width=512)
    measure("1-chip 512px batch=1", pipe1, 1, steps, 512)
    if "sp" in modes:
        pipe1b = StableDiffusion(img_height=2048, img_width=2048)
        measure("1-chip 2048px batch=1", pipe1b, 1, min(steps, 8), 2048)


if __name__ == "__main__":
    main()
