"""Sweep int8-hybrid v2 quality configs against the dossier criteria, cheaply.

The quality dossier's bf16/fp32/ulp reference legs are independent of the
quantization config (experiments/quality_dossier.py caches them under /tmp), so
evaluating a hybridize_params configuration — equalization alpha, ACIQ clip,
bias correction, per-site error budget — costs ONE 25-step hybrid trajectory
(~3 s device + a compile when the quantized-site set changes; same-site-set
configs hit the persistent XLA cache: the params are jit arguments).

For each config this prints the dossier verdicts (step1_class / envelope /
growth_rate), the step-1 and final divergence, the quantized-site count, and a
2-rep wall time — enough to pick the fastest configuration that passes, which
then becomes the pipeline's default and gets the full dossier run (serving rows
+ fixture write).

Configs come from the CONFIGS env var as semicolon-separated
``alpha,clip,biascorr,max_err`` rows (``none`` allowed), e.g.
``CONFIGS="0.5,none,1,none;0.5,none,1,3e-5"``. Default sweeps alpha and the
error budget.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = os.environ.get(
    "DOSSIER_SCALES", os.path.join(REPO, "fixtures", "hybrid_scales_random512.npz"))


def main():
    size = int(os.environ.get("BENCH_SIZE", 512))
    steps = int(os.environ.get("BENCH_STEPS", 25))

    from experiments.quality_dossier import evaluate

    from minsdtf_tpu import rng as rng_lib

    enc = np.random.RandomState(0).normal(0, 1, (77, 768)).astype(np.float32)
    h8 = size // 8
    noise = np.asarray(rng_lib.stateless_normal((1, h8, h8, 4), 123), np.float32)

    cache = f"/tmp/dossier_refs_{size}_{steps}.npz"
    if not os.path.exists(cache):
        print(f"[sweep] no reference cache at {cache}; run "
              f"DOSSIER_SERVING=0 DOSSIER_NO_WRITE=1 quality_dossier.py once",
              file=sys.stderr)
        return 2
    z = np.load(cache)
    bf16_traj = z["bf16_traj"]
    fp_curve = (np.mean((bf16_traj - z["fp32_traj"]) ** 2, axis=(1, 2, 3, 4))
                / np.mean(bf16_traj**2, axis=(1, 2, 3, 4)))

    spec = os.environ.get(
        "CONFIGS",
        "0.5,none,1,none;0.75,none,1,none;0.5,5.0,1,none;0.5,none,0,none")
    rows = [r.split(",") for r in spec.split(";") if r.strip()]

    from minsdtf_tpu.pipeline import StableDiffusion
    from minsdtf_tpu.weights import calibrate, quantize

    results = []
    for alpha, clip, bc, max_err in rows:
        os.environ["MINSDTF_HYBRID_ALPHA"] = alpha
        os.environ["MINSDTF_HYBRID_CLIP"] = clip
        os.environ["MINSDTF_HYBRID_BIASCORR"] = bc
        os.environ["MINSDTF_HYBRID_MAX_ERR"] = max_err
        tag = f"alpha={alpha} clip={clip} bc={bc} max_err={max_err}"
        print(f"\n[sweep] {tag}", flush=True)
        pipe = StableDiffusion(img_height=size, img_width=size,
                               weight_dtype="int8_hybrid",
                               int8_act_scales=SCALES)
        n_q = sum("kernel_q" in m for m in pipe.unet_params.values())
        t0 = time.perf_counter()
        img, traj = pipe.generate_image(
            enc, num_steps=steps, batch_size=1,
            unconditional_guidance_scale=7.5, guidance_rescale=0.7,
            diffusion_noise=noise, return_trajectory=True)
        compile_s = time.perf_counter() - t0
        traj = np.asarray(traj, np.float64)
        hy = (np.mean((traj - bf16_traj) ** 2, axis=(1, 2, 3, 4))
              / np.mean(bf16_traj**2, axis=(1, 2, 3, 4)))
        verdicts = evaluate(
            {"hybrid_vs_bf16": hy, "bf16_vs_fp32": fp_curve}, steps)
        walls = []
        for s in (101, 102, 103):
            t0 = time.perf_counter()
            pipe.generate_image(enc, num_steps=steps, batch_size=1,
                                unconditional_guidance_scale=7.5,
                                guidance_rescale=0.7, seed=s)
            walls.append(time.perf_counter() - t0)
        wall = float(np.median(walls[1:]))  # first rep = executable staging
        row = {
            "config": tag, "n_quantized": int(n_q),
            "step1": float(hy[0]), "final": float(hy[-1]),
            "wall": round(wall, 4), "compile_s": round(compile_s, 1),
            "verdicts": {k: v for k, v in verdicts.items()},
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    print("\n[sweep] summary (fp32 envelope: step1"
          f" {fp_curve[0]:.3e}, final {fp_curve[-1]:.3e}):")
    for r in results:
        v = r["verdicts"]
        print(f"  {r['config']:>44}: sites={r['n_quantized']:3d} "
              f"step1={r['step1']:.3e} final={r['final']:.3e} "
              f"wall={r['wall']:.4f} env={v['envelope']} "
              f"s1={v['step1_class']} gr={v['growth_rate']}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
