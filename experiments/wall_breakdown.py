"""Wall-anatomy probe for the default generate_image path (VERDICT r3 #2).

r2 measured 0.593 s wall vs 0.462 s device — where do the ~130 ms go?
Hypotheses: (a) per-argument H2D staging (the jitted sampler takes ~18 leaf args;
each H2D through the axon tunnel has 2-4 ms latency), (b) the final image D2H
(~0.8 MB at ~50 MB/s + round trips), (c) dispatch overhead of the big program.

Phases timed on an idle box (ps aux first!), median of >=3 reps, staging rep
discarded:
  1. full generate_image (baseline wall)
  2. generate_image with _defer_fetch=True + tiny sync (1-pixel fetch)
     -> wall minus most of the image D2H
  3. same but with all per-call numpy args pre-placed on device via device_put
     (uncond/t_embs/rows/noise) -> isolates H2D staging
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, reps=4):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return ts[1:]  # discard staging rep


def main():
    from minsdtf_tpu.pipeline import StableDiffusion

    steps = int(os.environ.get("BENCH_STEPS", 25))
    size = int(os.environ.get("BENCH_SIZE", 512))
    pipe = StableDiffusion(img_height=size, img_width=size)
    rng = np.random.RandomState(0)
    encoded = rng.normal(0, 1, (77, 768)).astype(np.float32)
    seed_counter = [100]

    def gen(**kw):
        seed_counter[0] += 1
        return pipe.generate_image(
            encoded, num_steps=steps, unconditional_guidance_scale=7.5,
            guidance_rescale=0.7, seed=seed_counter[0], **kw)

    # compile + stage
    gen(); gen()

    full = timed(lambda: gen())
    print(f"1. full wall:            {np.median(full):.4f}  {sorted(full)}")

    def defer():
        h = gen(_defer_fetch=True)
        np.asarray(h[0, 0, 0])  # tiny sync: 3 bytes

    d = timed(defer)
    print(f"2. defer+tiny sync:      {np.median(d):.4f}  {sorted(d)}")

    def defer_then_fetch():
        h = gen(_defer_fetch=True)
        np.asarray(h)

    df = timed(defer_then_fetch)
    print(f"3. defer+full fetch:     {np.median(df):.4f}  {sorted(df)}")

    # 4: how much is per-call H2D staging? time just the host-side prep + transfers
    # by re-running with the sampler monkeypatched out.
    from minsdtf_tpu import sampler as sampler_mod

    real_generate = sampler_mod.generate
    calls = {}

    def fake_generate(*args, **kw):
        # force every traced-arg transfer that the real call would do, then skip
        leaves = [a for a in jax.tree_util.tree_leaves((args, kw))
                  if hasattr(a, "shape")]
        calls["n_leaves"] = len(leaves)
        moved = [jax.device_put(np.asarray(x)) for x in leaves]
        for m in moved:
            m.block_until_ready()
        img = jnp.zeros((1, size, size, 3), jnp.uint8)
        return img, jnp.zeros((1, size // 8, size // 8, 4), jnp.float32)

    sampler_mod.generate = fake_generate
    try:
        gen(_defer_fetch=True)
        s = timed(lambda: gen(_defer_fetch=True))
    finally:
        sampler_mod.generate = real_generate
    print(f"4. host prep + arg H2D:  {np.median(s):.4f}  {sorted(s)} "
          f"({calls.get('n_leaves')} leaves)")

    # 5: raw D2H of one image-sized buffer (devicearray already on device)
    img = jnp.zeros((1, size, size, 3), jnp.uint8) + 1
    img.block_until_ready()
    f = timed(lambda: np.asarray(img))
    print(f"5. raw image D2H:        {np.median(f):.4f}  {sorted(f)}")


if __name__ == "__main__":
    main()
