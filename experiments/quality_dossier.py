"""int8-hybrid quality dossier: per-step prefix-divergence protocol (VERDICT r3 #1).

The r3 headline re-labeled the bench config "int8-hybrid" on a chaos argument:
same-seed 25-step latent MSE vs bf16 is 2.71 (PSNR 28.3 dB), but so is every other
numeric perturbation on an un-contractive random-weight UNet (bf16-vs-fp32, one
bf16-ulp of initial noise). That argument was never demonstrated as a *per-step
prefix* equivalence. This experiment does exactly that:

  Four same-noise 25-step 512px trajectories on the real chip, capturing the
  latent after EVERY step (sampler trace_latents):
    fp32    — compute_dtype=float32 (the reference-parity dtype)
    bf16    — production dtype (the non-quantized headline candidate)
    ulp     — bf16 with ONE element of the initial noise bumped one bf16 ulp
              (pure chaos probe: same program, same dtype)
    hybrid  — int8-hybrid (stable-conv-site W8A8, committed calibration fixture)

  Reported at every step k: MSE(hybrid_k, bf16_k), MSE(bf16_k, fp32_k),
  MSE(ulp_k, bf16_k), each normalized by E[bf16_k^2] (latent scale drifts over
  the schedule). Plus final-image PSNR/SSIM for each pair, and PSNR rows for the
  other int8-hybrid serving configs (batch-8 row 0; DPM-Solver++ 15-step).

PASS criteria (the headline keeps the int8-hybrid label iff ALL hold; otherwise
bench.py's default reverts to bf16):
  1. step-1 normalized divergence of hybrid-vs-bf16 is in the per-op error class
     (< 2e-3 — per-op rel err ~1.5% => MSE ~2e-4; one decade of headroom);
  2. envelope: at every step k, hybrid-vs-bf16 MSE <= the bf16-vs-fp32 curve
     evaluated LEAD steps later (LEAD <= 3): the quantization kick is allowed to
     be a constant head start on the SAME chaotic growth, never a faster rate;
  3. growth rate: log10-MSE slope of hybrid over the pre-saturation window is
     within 25% of the bf16-vs-fp32 slope;
  4. final-image PSNR(hybrid, bf16) within 2 dB of PSNR(bf16, fp32).

Writes fixtures/quality_dossier.json (curves + verdicts);
tests/test_quality_dossier.py re-validates the committed fixture's criteria.

Run: python -u experiments/quality_dossier.py          (~30-45 min incl. compiles)
     BENCH_SIZE=256 BENCH_STEPS=8 ... for a faster smoke pass.
     DOSSIER_FAST_ONLY=1 — skip the main protocol and only (re)compute the
     fast-config quality anchors (VERDICT r4 #5), appending a "fast_configs"
     section to the existing committed fixture: same-noise bf16-vs-fp32
     divergence curves + final PSNR/SSIM for the published fast speed fields
     (dpm15, tcd4_b8), so every bench speed field carries a quality anchor of
     the same protocol class as the headline's (tests/test_quality_dossier.py
     pins the coverage).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALES = os.path.join(REPO, "fixtures", "hybrid_scales_random512.npz")


def ssim(a, b):
    """Global-window grayscale SSIM on uint8 images (sufficient for a divergence
    dossier; no skimage in this env). Uses 8x8 uniform local stats via cumsum."""
    a = np.asarray(a, np.float64).mean(axis=-1)  # luma
    b = np.asarray(b, np.float64).mean(axis=-1)
    if a.ndim == 3:
        a, b = a[0], b[0]

    def box(x, k=8):
        c = np.cumsum(np.cumsum(x, 0), 1)
        c = np.pad(c, ((1, 0), (1, 0)))
        s = c[k:, k:] - c[:-k, k:] - c[k:, :-k] + c[:-k, :-k]
        return s / (k * k)

    mu_a, mu_b = box(a), box(b)
    va = box(a * a) - mu_a**2
    vb = box(b * b) - mu_b**2
    cov = box(a * b) - mu_a * mu_b
    c1, c2 = (0.01 * 255) ** 2, (0.03 * 255) ** 2
    s = ((2 * mu_a * mu_b + c1) * (2 * cov + c2)) / (
        (mu_a**2 + mu_b**2 + c1) * (va + vb + c2))
    return float(np.mean(s))


def psnr(a, b):
    mse = np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2)
    return float(10 * np.log10(255.0**2 / max(mse, 1e-12)))


def evaluate(curves, n_steps):
    """Apply the four PASS criteria to normalized divergence curves."""
    hy = np.asarray(curves["hybrid_vs_bf16"])
    fp = np.asarray(curves["bf16_vs_fp32"])
    verdicts = {}
    verdicts["step1_class"] = bool(hy[0] < 2e-3)
    lead_ok = None
    for lead in range(0, 4):
        shifted = fp[min(lead, n_steps - 1):]
        shifted = np.concatenate([shifted, np.repeat(shifted[-1], n_steps - len(shifted))])
        if np.all(hy <= shifted * 1.10):  # 10% measurement slack
            lead_ok = lead
            break
    verdicts["envelope_lead"] = lead_ok
    verdicts["envelope"] = lead_ok is not None
    # pre-saturation window: steps where bf16-vs-fp32 is still growing
    # (below 10% of its final value), at least 4 points. FIRST crossing via
    # argmax over a boolean — np.searchsorted assumes a sorted curve and would
    # silently mis-window the slope fit on a noisy (non-monotone) divergence
    # curve (VERDICT r4 robustness nit).
    above = fp >= fp[-1] * 0.1
    cut = max(4, int(np.argmax(above)) if above.any() else len(fp))
    k = np.arange(1, cut + 1)
    slope_h = np.polyfit(k, np.log10(hy[:cut] + 1e-12), 1)[0]
    slope_f = np.polyfit(k, np.log10(fp[:cut] + 1e-12), 1)[0]
    verdicts["slope_hybrid"] = float(slope_h)
    verdicts["slope_fp32"] = float(slope_f)
    verdicts["growth_rate"] = bool(abs(slope_h - slope_f) <= 0.25 * abs(slope_f))
    return verdicts


def fast_config_anchors(size):
    """Quality anchors for the published fast bench fields (VERDICT r4 #5): the
    headline's dossier proves bf16's divergence class vs fp32 for DDIM-25, but
    ``dpm15`` and ``tcd4_b8`` publish speed with no equivalent same-noise anchor.
    For each config, run a bf16 and an fp32 leg from IDENTICAL noise and record
    the per-step normalized divergence curve + final PSNR/SSIM — the same
    protocol class as the main dossier's bf16_vs_fp32 envelope row."""
    import jax.numpy as jnp

    from minsdtf_tpu import rng as rng_lib
    from minsdtf_tpu.pipeline import StableDiffusion

    enc = np.random.RandomState(0).normal(0, 1, (77, 768)).astype(np.float32)
    h8 = size // 8

    def run_pair(tag, n_steps, batch, **pipe_kw):
        noise = np.asarray(
            rng_lib.stateless_normal((batch, h8, h8, 4), 123), np.float32)
        legs = {}
        for dname, dtype in (("bf16", None), ("fp32", jnp.float32)):
            print(f"[dossier:fast] {tag} {dname} ({n_steps} steps, b{batch})...",
                  flush=True)
            pipe = StableDiffusion(img_height=size, img_width=size,
                                   compute_dtype=dtype, **pipe_kw)
            img, traj = pipe.generate_image(
                enc, num_steps=n_steps, batch_size=batch,
                unconditional_guidance_scale=7.5, guidance_rescale=0.7,
                diffusion_noise=noise, return_trajectory=True)
            legs[dname] = (np.asarray(img, np.float64), np.asarray(traj, np.float64))
        norm = np.mean(legs["bf16"][1] ** 2, axis=tuple(range(1, legs["bf16"][1].ndim)))
        mse = np.mean((legs["bf16"][1] - legs["fp32"][1]) ** 2,
                      axis=tuple(range(1, legs["bf16"][1].ndim)))
        return {
            "steps": n_steps, "batch": batch,
            "bf16_vs_fp32": (mse / norm).tolist(),
            "psnr_bf16_fp32": psnr(legs["bf16"][0], legs["fp32"][0]),
            "ssim_bf16_fp32": ssim(legs["bf16"][0], legs["fp32"][0]),
        }

    anchors = {
        "dpm15": run_pair("dpm15", 15, 1, scheduler_type="dpm"),
        "tcd4_b8": run_pair("tcd4_b8", 4, 8, active_tcd=True),
    }
    for tag, row in anchors.items():
        print(f"[dossier:fast] {tag}: PSNR(bf16,fp32) {row['psnr_bf16_fp32']:.1f} dB"
              f"  SSIM {row['ssim_bf16_fp32']:.3f}  step-divergence "
              f"{row['bf16_vs_fp32'][0]:.2e} -> {row['bf16_vs_fp32'][-1]:.2e}",
              flush=True)
    return anchors


def main():
    size = int(os.environ.get("BENCH_SIZE", 512))
    steps = int(os.environ.get("BENCH_STEPS", 25))

    if os.environ.get("DOSSIER_FAST_ONLY") == "1":
        # append/refresh the fast-config anchors on the committed fixture
        # without re-running the (expensive) main protocol
        path = os.environ.get(
            "DOSSIER_OUT", os.path.join(REPO, "fixtures", "quality_dossier.json"))
        with open(path) as f:
            out = json.load(f)
        out["fast_configs"] = fast_config_anchors(size)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[dossier] wrote fast_configs to {path}")
        return 0

    import jax.numpy as jnp

    from minsdtf_tpu import rng as rng_lib
    from minsdtf_tpu.pipeline import StableDiffusion

    enc = np.random.RandomState(0).normal(0, 1, (77, 768)).astype(np.float32)
    h8 = size // 8
    noise = np.asarray(rng_lib.stateless_normal((1, h8, h8, 4), 123), np.float32)
    noise_ulp = noise.copy()
    v = jnp.bfloat16(noise_ulp[0, 0, 0, 0])
    noise_ulp[0, 0, 0, 0] = float(jnp.nextafter(v, jnp.bfloat16(9.0)))

    def gen(pipe, nz, n=steps, batch=1):
        img, traj = pipe.generate_image(
            enc, num_steps=n, batch_size=batch, unconditional_guidance_scale=7.5,
            guidance_rescale=0.7, diffusion_noise=nz, return_trajectory=True)
        return np.asarray(img, np.float64), np.asarray(traj, np.float64)

    scales = os.environ.get("DOSSIER_SCALES", SCALES)
    pipes = {
        "hybrid": StableDiffusion(img_height=size, img_width=size,
                                  weight_dtype="int8_hybrid",
                                  int8_act_scales=scales),
    }
    # The bf16/fp32/ulp reference legs are INDEPENDENT of the quantization
    # config — cache them so hybridize-config sweeps (equalization alpha, clip,
    # site budget) only pay for the hybrid leg (one 25-step trajectory each).
    cache = f"/tmp/dossier_refs_{size}_{steps}.npz"
    runs = {}
    if os.path.exists(cache) and os.environ.get("DOSSIER_CACHE", "1") == "1":
        z = np.load(cache)
        for name in ("bf16", "fp32", "ulp"):
            runs[name] = (z[name + "_img"], z[name + "_traj"])
        print(f"[dossier] loaded reference legs from {cache}", flush=True)
    else:
        pipes["bf16"] = StableDiffusion(img_height=size, img_width=size)
        pipes["fp32"] = StableDiffusion(img_height=size, img_width=size,
                                        compute_dtype=jnp.float32)
        for name in ("bf16", "fp32"):
            print(f"[dossier] running {name} ({size}px, {steps} steps)...",
                  flush=True)
            runs[name] = gen(pipes[name], noise)
        print("[dossier] running ulp...", flush=True)
        runs["ulp"] = gen(pipes["bf16"], noise_ulp)
        np.savez(cache, **{name + "_img": runs[name][0] for name in runs},
                 **{name + "_traj": runs[name][1] for name in runs})
        print(f"[dossier] cached reference legs to {cache}", flush=True)
    print(f"[dossier] running hybrid ({size}px, {steps} steps)...", flush=True)
    runs["hybrid"] = gen(pipes["hybrid"], noise)

    norm = np.mean(runs["bf16"][1] ** 2, axis=(1, 2, 3, 4))  # E[bf16_k^2] per step
    curves = {}
    for tag, (a, b) in {
        "hybrid_vs_bf16": ("hybrid", "bf16"),
        "bf16_vs_fp32": ("bf16", "fp32"),
        "ulp_vs_bf16": ("ulp", "bf16"),
    }.items():
        mse = np.mean((runs[a][1] - runs[b][1]) ** 2, axis=(1, 2, 3, 4))
        curves[tag] = (mse / norm).tolist()

    print(f"\n  step | {'hybrid/bf16':>12} | {'bf16/fp32':>12} | {'ulp/bf16':>12}")
    for k in range(steps):
        print(f"  {k + 1:4d} | {curves['hybrid_vs_bf16'][k]:12.4e} |"
              f" {curves['bf16_vs_fp32'][k]:12.4e} | {curves['ulp_vs_bf16'][k]:12.4e}")

    images = {
        "psnr_hybrid_bf16": psnr(runs["hybrid"][0], runs["bf16"][0]),
        "psnr_bf16_fp32": psnr(runs["bf16"][0], runs["fp32"][0]),
        "psnr_ulp_bf16": psnr(runs["ulp"][0], runs["bf16"][0]),
        "ssim_hybrid_bf16": ssim(runs["hybrid"][0], runs["bf16"][0]),
        "ssim_bf16_fp32": ssim(runs["bf16"][0], runs["fp32"][0]),
        "ssim_ulp_bf16": ssim(runs["ulp"][0], runs["bf16"][0]),
    }

    verdicts = evaluate(curves, steps)
    verdicts["final_psnr"] = bool(
        images["psnr_hybrid_bf16"] >= images["psnr_bf16_fp32"] - 2.0)
    verdicts["all_pass"] = all(
        verdicts[k] for k in ("step1_class", "envelope", "growth_rate", "final_psnr"))

    # serving configs (both int8-hybrid-capable via serve.py --int8-hybrid):
    # batch-8 (throughput_b8 config: unfolded convs — different accumulation
    # grouping) and DPM-Solver++ 15-step. tcd4_b8 publishes bf16 only — the
    # committed scales fixture is calibrated on DDIM-25 trajectories and the TCD
    # schedule's activation ranges are out of its calibration set.
    serving = {}
    if os.environ.get("DOSSIER_SERVING", "1") == "1":
        try:
            print("[dossier] serving configs (b8, dpm15)...", flush=True)
            bf16_pipe = pipes.get("bf16") or StableDiffusion(
                img_height=size, img_width=size)
            nz8 = np.repeat(noise, 8, axis=0)
            img8h, _ = gen(pipes["hybrid"], nz8, batch=8)
            img8b, _ = gen(bf16_pipe, nz8, batch=8)
            serving["psnr_b8_hybrid_bf16"] = psnr(img8h[0], img8b[0])
            serving["ssim_b8_hybrid_bf16"] = ssim(img8h[0], img8b[0])
            dpm_h = StableDiffusion(img_height=size, img_width=size,
                                    scheduler_type="dpm",
                                    weight_dtype="int8_hybrid",
                                    int8_act_scales=scales)
            dpm_b = StableDiffusion(img_height=size, img_width=size,
                                    scheduler_type="dpm")
            di_h, _ = gen(dpm_h, noise, n=15)
            di_b, _ = gen(dpm_b, noise, n=15)
            serving["psnr_dpm15_hybrid_bf16"] = psnr(di_h, di_b)
            serving["ssim_dpm15_hybrid_bf16"] = ssim(di_h, di_b)
        except Exception as e:  # serving rows are best-effort extras
            serving["error"] = f"{type(e).__name__}: {e}"[:200]

    out = {
        "config": {"size": size, "steps": steps, "weights": "seeded-random",
                   "protocol": "same-noise prefix divergence, normalized latent MSE"},
        "curves": curves,
        "images": images,
        "serving": serving,
        "verdicts": verdicts,
    }
    print(json.dumps({"images": images, "serving": serving, "verdicts": verdicts},
                     indent=2))
    if size == 512 and steps == 25 and os.environ.get("DOSSIER_NO_WRITE") != "1":
        # DOSSIER_OUT redirects the fixture (e.g. to commit a failed variant's
        # evidence without touching the headline-deciding file).
        path = os.environ.get(
            "DOSSIER_OUT", os.path.join(REPO, "fixtures", "quality_dossier.json"))
        if os.path.exists(path):
            # a main-protocol rerun must not silently drop the committed
            # fast-config anchors (they are produced by DOSSIER_FAST_ONLY=1)
            try:
                with open(path) as f:
                    prev = json.load(f)
                if "fast_configs" in prev:
                    out["fast_configs"] = prev["fast_configs"]
            except Exception:
                pass
        import fnmatch
        if not fnmatch.fnmatch(os.path.basename(path), "quality_dossier*.json"):
            # ADVICE r4: a variant written outside this glob silently escapes
            # the honesty-invariant tests (tests/test_quality_dossier.py
            # parametrizes over fixtures/quality_dossier*.json).
            print(f"[dossier] WARNING: {os.path.basename(path)} does not match "
                  "quality_dossier*.json — if committed, the honesty tests will "
                  "NOT cover it", flush=True)
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"[dossier] wrote {path}")
    print("[dossier] ALL PASS" if verdicts["all_pass"] else "[dossier] FAILED")
    return 0 if verdicts["all_pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
