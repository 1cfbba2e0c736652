"""Headline benchmark: SD1.5 512x512, 25-step txt2img, CFG 7.5, one chip.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": sec/image, "unit": "s/img", "vs_baseline": utilization,
   "min": ..., "max": ..., "throughput_b8": ..., "tcd4_b8": ..., "e2e_prompt"?}

The reference publishes no speed numbers (BASELINE.md), so ``vs_baseline`` reports
achieved fraction of the analytic speed-of-light for this workload on the local chip
(BASELINE.md's utilization north star): higher is better, 1.0 = ideal. The headline
``value`` is the MEDIAN of repeats (typical throughput); min/max expose the measured
±5% tunnel jitter. Extra fields published every run (VERDICT r1 #8):

  - ``bf16`` / ``int8_hybrid``: the OTHER dtype configuration's s/img, alongside
    the headline. The headline dtype is decided by the committed quality dossier
    (fixtures/quality_dossier_r4.json): int8-hybrid (stable-site W8A8, baked
    static scales) headlines only if its per-step prefix-divergence verdict
    passed; otherwise bf16 headlines. BENCH_WEIGHT_DTYPE overrides;
  - ``e2e_prompt``: full prompt -> image seconds (tokenize + LPW + CLIP + sampler),
    vs the headline which times ``generate_image`` from a precomputed context;
  - ``throughput_b8``: batch-8 s/img, the serving-throughput configuration;
  - ``tcd4_b8``: TCD 4-step batch-8 s/img, the few-step distilled-serving config;
  - ``dpm15``: DPM-Solver++(2M) 15-step batch-1 s/img (DDIM-25 quality class);
  - ``pipelined``: s/img through queued dispatch (``generate_images``);
  - ``served_qps``: sustained images/s through the live HTTP serving daemon
    (``tools/serve.py``) with concurrent clients (the daemon merges compatible
    queued requests into batched programs), incl. JSON/base64/PNG work;
  - ``hires1024``: 1024x1024 25-step batch-1 s/img (bf16) — the long-context
    config the reference's O(S^2) attention cannot run on one device.

A compiled-kernel parity selfcheck (Pallas vs XLA on THIS chip) runs first;
MINSDTF_SELFCHECK=0 skips. Weights are seeded-random (zero-egress env) — identical
compute graph & cost to real weights. Env overrides: BENCH_STEPS, BENCH_SIZE,
BENCH_BATCH, BENCH_REPEATS, BENCH_TCD=1 (headline in TCD mode),
BENCH_EXTRAS=0 (skip the extra-field measurements).
"""

import contextlib
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
    """Per-chip bf16 peak; v5e = 197 TFLOP/s (394 is its INT8 peak — r1/r2 used
    that by mistake, halving every published vs_baseline; r3 probe measured a
    4096^3 bf16 matmul at 194.8 TF/s device time = 99% of the corrected spec)."""
    import jax

    kind = jax.devices()[0].device_kind.lower()
    table = {"v5 lite": 197e12, "v5litepod": 197e12, "v4": 275e12, "v5p": 459e12, "v6": 918e12}
    for key, val in table.items():
        if key in kind:
            return val
    return 197e12


def _time_runs(jax, fn, repeats, warm_args, timed_args):
    """Compile on ``warm_args``, then run ``repeats + 1`` reps with DISTINCT args
    (the axon server dedupes identical (program, args) executions) and DISCARD the
    first: the first post-compile execution pays 3-4x executable staging (ROADMAP
    measurement discipline). Returns the remaining ``repeats`` timings, so min/max
    over them capture genuine tunnel jitter, not the staging rep."""
    fn(*warm_args)  # compile
    times = []
    for args in timed_args[: repeats + 1]:
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return times[1:]


def headline_weight_dtype(repo_dir=None):
    """The headline dtype is a MEASURED decision, not a preference: int8-hybrid
    headlines only if the committed prefix-divergence quality dossier
    (fixtures/quality_dossier_r4.json, experiments/quality_dossier.py) passed
    all four criteria; otherwise exact bf16 headlines and the hybrid time is
    published alongside. BENCH_WEIGHT_DTYPE overrides either way."""
    here = repo_dir or os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "fixtures", "quality_dossier_r4.json")) as f:
            ok = bool(json.load(f)["verdicts"]["all_pass"])
    except Exception:
        ok = False  # unproven quality never headlines
    return os.environ.get("BENCH_WEIGHT_DTYPE", "int8_hybrid" if ok else "bf16")


def _synthetic_merges():
    """Write a tiny CLIP-format merges file (version header + ranked merges) to a
    temp dir, mirroring tests/test_prompt_weighting.py — lets the e2e_prompt field
    (full tokenize -> image wall time) be measured in the zero-egress env where the
    real 16e6 vocabulary cannot be downloaded."""
    import gzip
    import tempfile

    merges = [
        "h e", "l l", "he ll", "o</w> w", "hell o</w>", "w o", "wo r", "wor l",
        "worl d</w>", "t h", "th e</w>", "a</w> b", "c a", "ca t</w>", "d o",
        "do g</w>", "s t", "st a", "sta r</w>", "1 2", "* *",
    ]
    path = os.path.join(tempfile.mkdtemp(prefix="minsdtf-bench-"), "merges.txt.gz")
    with gzip.open(path, "wt") as f:
        f.write("#version: synthetic\n")
        f.write("\n".join(merges) + "\n")
    return path


def main():
    steps = int(os.environ.get("BENCH_STEPS", 25))
    size = int(os.environ.get("BENCH_SIZE", 512))
    batch = int(os.environ.get("BENCH_BATCH", 1))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))
    tcd = os.environ.get("BENCH_TCD") == "1"  # headline in few-step TCD mode
    extras = os.environ.get("BENCH_EXTRAS", "1") == "1" and size == 512 and not tcd

    import jax

    result_extra = {}
    with contextlib.redirect_stdout(sys.stderr):
        # Opt-out preamble: verify the COMPILED Pallas kernels against XLA on this
        # chip at the production shapes before timing anything (a Mosaic miscompile
        # would otherwise ship silently — bench checks speed, not values).
        if os.environ.get("MINSDTF_SELFCHECK", "1") == "1":
            from minsdtf_tpu.tools import selfcheck

            selfcheck.check_flash_attention()

        from minsdtf_tpu.pipeline import StableDiffusion

        # Headline config: decided by the committed quality dossier
        # (fixtures/quality_dossier_r4.json, experiments/quality_dossier.py —
        # the per-step prefix-divergence protocol of VERDICT r3 #1). int8_hybrid
        # (stable-conv-site-only W8A8, baked static scales; 0.43 vs 0.48 s/img
        # bf16) keeps the headline ONLY if the dossier's all_pass verdict holds;
        # otherwise the headline is exact bf16 and the hybrid time is published
        # alongside as the `int8_hybrid` field. BENCH_WEIGHT_DTYPE overrides.
        # Non-512 sizes and TCD mode stay bf16 (the scales fixture's trajectory
        # amax values are resolution- and schedule-specific).
        here = os.path.dirname(os.path.abspath(__file__))
        scales_fixture = os.path.join(here, "fixtures", "hybrid_scales_random512.npz")
        wd = headline_weight_dtype(here)
        use_hybrid = (wd == "int8_hybrid" and size == 512 and not tcd
                      and os.path.exists(scales_fixture))
        pipe = StableDiffusion(
            img_height=size, img_width=size, active_tcd=tcd,
            weight_dtype="int8_hybrid" if use_hybrid else None,
            int8_act_scales=scales_fixture if use_hybrid else None)
        dtype_label = "int8-hybrid" if use_hybrid else "bf16"
        rng = np.random.RandomState(0)
        encoded = rng.normal(0, 1, (77, 768)).astype(np.float32)

        def run(seed, b=batch, n=steps, p=pipe):
            return p.generate_image(
                encoded, batch_size=b, num_steps=n,
                unconditional_guidance_scale=7.5, guidance_rescale=0.7, seed=seed,
            )

        times = _time_runs(jax, run, repeats, (1,), [(i + 2,) for i in range(repeats + 1)])
        # headline = median (typical); min/max expose the ±5% tunnel jitter.
        elapsed = float(np.median(times))

        if extras:  # noqa: C901 — each extra is best-effort; see the guard below
          try:  # an extras failure must never cost the headline JSON line
            if use_hybrid:
                # exact-bf16 reference configuration alongside the int8 headline
                bf16_pipe = StableDiffusion(img_height=size, img_width=size)
                tb = _time_runs(jax, lambda s: run(s, p=bf16_pipe), 3, (1,),
                                [(2,), (3,), (4,), (5,)])
                result_extra["bf16"] = round(float(np.median(tb)), 4)
            elif os.path.exists(scales_fixture):
                # the hybrid config alongside the bf16 headline: faster but its
                # quality dossier did not pass, so it is opt-in serving only
                hy_pipe = StableDiffusion(
                    img_height=size, img_width=size, weight_dtype="int8_hybrid",
                    int8_act_scales=scales_fixture)
                thy = _time_runs(jax, lambda s: run(s, p=hy_pipe), 3, (1,),
                                 [(2,), (3,), (4,), (5,)])
                result_extra["int8_hybrid"] = round(float(np.median(thy)), 4)
            # batch-8 serving throughput (same program, batched); 3 kept reps
            t8 = _time_runs(jax, lambda s: run(s, b=8), 3, (1,), [(2,), (3,), (4,), (5,)])
            result_extra["throughput_b8"] = round(float(np.median(t8)) / 8, 4)
            # TCD 4-step batch-8: the few-step distilled-serving config
            tcd_pipe = StableDiffusion(img_height=size, img_width=size, active_tcd=True)
            tt = _time_runs(
                jax, lambda s: run(s, b=8, n=4, p=tcd_pipe), 3, (1,),
                [(2,), (3,), (4,), (5,)]
            )
            result_extra["tcd4_b8"] = round(float(np.median(tt)) / 8, 4)
            # DPM-Solver++(2M) at 15 steps — the quality-equivalent fast config
            # (first+second-order multistep matches DDIM-25 at ~15 steps)
            dpm_pipe = StableDiffusion(img_height=size, img_width=size,
                                       scheduler_type="dpm")
            td = _time_runs(
                jax, lambda s: run(s, n=15, p=dpm_pipe), 3, (1,),
                [(2,), (3,), (4,), (5,)]
            )
            result_extra["dpm15"] = round(float(np.median(td)), 4)
            # queued-dispatch serving throughput: generate_images dispatches all
            # requests before fetching, hiding host+D2H behind device compute.
            # (The batch-1 program is compiled AND staged by the headline runs
            # above, so the warm run here only covers the new seeds; median of 2.)
            reqs = [encoded] * 4

            def run_queue(s0):
                return pipe.generate_images(
                    reqs, seeds=[s0, s0 + 1, s0 + 2, s0 + 3], num_steps=steps,
                    unconditional_guidance_scale=7.5, guidance_rescale=0.7)

            run_queue(21)
            tq = []
            for s0 in (31, 41):
                t0 = time.perf_counter()
                run_queue(s0)
                tq.append(time.perf_counter() - t0)
            result_extra["pipelined"] = round(float(np.median(tq)) / 4, 4)
            # sustained serving throughput through the real HTTP daemon
            # (tools/serve.py): concurrent clients posting context payloads to a
            # live server; counts JSON/base64/PNG overhead as serving work.
            import base64
            import threading
            import urllib.request

            from minsdtf_tpu.tools import serve as serve_mod

            server, worker = serve_mod.serve(pipe, port=0)  # ephemeral port
            port = server.server_address[1]
            srv_thread = threading.Thread(target=server.serve_forever, daemon=True)
            srv_thread.start()
            payload_base = {
                "context": base64.b64encode(encoded.tobytes()).decode(),
                "steps": steps, "guidance_scale": 7.5, "guidance_rescale": 0.7,
            }

            def post(seed):
                body = json.dumps({**payload_base, "seed": seed}).encode()
                req = urllib.request.Request(
                    f"http://127.0.0.1:{port}/generate", data=body,
                    headers={"Content-Type": "application/json"})
                with urllib.request.urlopen(req, timeout=300) as resp:
                    resp.read()

            def client(seeds):
                for s in seeds:
                    post(s)

            post(51)  # warm the daemon path (program already compiled+staged)
            # 8-wide client bursts: the worker's 50 ms merge window assembles each
            # wave into one batch-8 program (0.36 s/img vs 0.43 solo); two waves
            # so wave-2 dispatch pipelines behind wave-1 fetch.
            n_req, n_cli = 16, 8
            threads = [
                threading.Thread(target=client,
                                 args=([61 + c + n_cli * i for i in range(n_req // n_cli)],))
                for c in range(n_cli)
            ]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            for t in threads:
                t.join()
            result_extra["served_qps"] = round(n_req / (time.perf_counter() - t0), 4)
            server.shutdown()
            worker.stop()
            # full prompt -> image wall time (tokenize + LPW + CLIP + sampler).
            # MINSDTF_BPE selects the real CLIP merges file when present; otherwise
            # a synthetic merges vocabulary is generated — token *timing* does not
            # need the real vocab (same tokenize/LPW/encode path and shapes).
            bpe = os.environ.get("MINSDTF_BPE")
            if not (bpe and os.path.exists(bpe)):
                bpe = _synthetic_merges()
            pipe.bpe_path = bpe
            pipe._tokenizer = None
            pipe.text_to_image("a photograph of an astronaut", num_steps=steps,
                               seed=1)  # compile text stack
            t0 = time.perf_counter()
            img = pipe.text_to_image("a photograph of an astronaut riding a horse",
                                     num_steps=steps, seed=9)
            jax.block_until_ready(img)
            result_extra["e2e_prompt"] = round(time.perf_counter() - t0, 4)
            # 1024px 25-step batch-1 (bf16, last so a failure costs nothing else):
            # the long-context differentiator — the reference's materialized
            # O(S^2) softmax cannot run 16k-token self-attention on one device;
            # the online flash kernel can (SURVEY §5; diffusion_model.py:123-126).
            # Hybrid scales are 512px-calibrated, so this config publishes bf16.
            hi_pipe = StableDiffusion(img_height=1024, img_width=1024)
            th = _time_runs(jax, lambda s: run(s, p=hi_pipe), 2, (1,),
                            [(2,), (3,), (4,)])
            result_extra["hires1024"] = round(float(np.median(th)), 4)
          except Exception as e:
            # partial extras stay in result_extra; the error is published so a
            # missing field is diagnosable from BENCH_r*.json alone
            result_extra["extras_error"] = f"{type(e).__name__}: {e}"[:200]

    sec_per_image = elapsed / batch
    ideal = flops_per_image(size, size, steps, 1) / peak_flops()
    kind = "TCD txt2img" if tcd else "txt2img"
    result = {
        "metric": f"SD1.5 {size}x{size} {steps}-step {kind} (CFG 7.5, {dtype_label}, 1 chip)",
        "value": round(sec_per_image, 4),
        "unit": "s/img",
        "vs_baseline": round(ideal / sec_per_image, 4),
        "min": round(min(times) / batch, 4),
        "max": round(max(times) / batch, 4),
        **result_extra,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
