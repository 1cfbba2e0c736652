"""First on-chip ControlNet generation (VERDICT r4 #6).

ControlNet/HintNet have CPU parity tests (tests/test_model_parity_controlnet.py)
but had never executed on the real chip; in the reference, controls roughly
double per-step UNet compute (stable_diffusion.py:446-452 — control_net runs
once per denoise step on the doubled CFG batch, its 13 residuals feed the
UNet). This measures a 512px 25-step controls-ON generation: s/img wall +
xprof device bucket table, so any Pallas/VMEM surprise at the controls widths
surfaces now, not when a user hits it.

Zero-egress: ControlNet weights are seeded-random via the same init the
pipeline's properties use (the public ctor requires a checkpoint path for
controls — random init is injected directly at the param slot), and the hint
is a random RGB "scribble" image. Graph and cost are identical to real weights.

Run (idle box): python -u experiments/controlnet_onchip.py
Env: BENCH_SIZE, BENCH_STEPS, CN_TRACE=0 to skip the xprof pass.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    size = int(os.environ.get("BENCH_SIZE", 512))
    steps = int(os.environ.get("BENCH_STEPS", 25))

    import jax

    if os.environ.get("BENCH_PLATFORM"):  # CPU validation (env var alone is
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])  # pinned by sitecustomize)

    from minsdtf_tpu import profiling
    from minsdtf_tpu.models import controlnet as controlnet_lib
    from minsdtf_tpu.pipeline import StableDiffusion

    rng = np.random.RandomState(0)
    encoded = rng.normal(0, 1, (77, 768)).astype(np.float32)
    # a random scribble hint — uint8 RGB like a canvas export
    hint = (rng.rand(size, size, 3) > 0.97).astype(np.uint8) * 255

    pipe = StableDiffusion(img_height=size, img_width=size)
    # seeded-random ControlNet params at the exact slot controlnet_params
    # would fill from a checkpoint (pipeline.py:371-383; seed 3 matches the
    # _load_or_init seed assignment for the controlnet slot)
    pipe._controlnet_params = pipe._shard(pipe._cast(
        controlnet_lib.init_params(jax.random.PRNGKey(3))))

    def gen(seed):
        return pipe.generate_image(
            encoded, num_steps=steps, unconditional_guidance_scale=7.5,
            guidance_rescale=0.7, seed=seed, control_net_image=hint)

    t0 = time.perf_counter()
    gen(1)
    print(f"compile+first {time.perf_counter() - t0:.1f}s", flush=True)
    gen(2)  # staging rep (discard)
    ts = []
    for s in (3, 4, 5):
        t0 = time.perf_counter()
        gen(s)
        ts.append(time.perf_counter() - t0)
    print(f"controls-ON wall median {np.median(ts):.4f} s/img  "
          f"{sorted(np.round(ts, 4).tolist())}", flush=True)
    if os.environ.get("CN_TRACE", "1") == "1":
        with profiling.trace("/tmp/cn-e2e"):
            gen(6)
        profiling.op_report("/tmp/cn-e2e", top=12, by="category")
    return 0


if __name__ == "__main__":
    sys.exit(main())
