"""Headline benchmark: SD1.5 512x512, 25-step txt2img, CFG 7.5, one chip.

Prints exactly ONE JSON line on stdout:
  {"metric": ..., "value": sec/image, "unit": "s/img", "vs_baseline": utilization,
   "min": ..., "max": ..., "throughput_b8": ..., "tcd4_b8": ..., "skipped": [...]}

The reference publishes no speed numbers (BASELINE.md), so ``vs_baseline`` reports
achieved fraction of the analytic speed-of-light for this workload on the local chip
(BASELINE.md's utilization north star): higher is better, 1.0 = ideal. The headline
``value`` is the MEDIAN of repeats (typical throughput); min/max expose the measured
±5% tunnel jitter.

TIMEOUT-PROOFING (VERDICT r4 #1 — BENCH_r04 was lost to a driver wall-clock kill):
  - the JSON line is emitted by a single ``_emit()`` that SIGTERM/SIGINT/SIGALRM
    handlers also call, so an external kill publishes whatever has been measured
    (the headline runs first, so the line is never empty);
  - a self-imposed wall budget (``BENCH_BUDGET_S``, default 1150 s) is
    enforced BEFORE starting each extra with a conservative cold-cache cost
    estimate; what doesn't fit is published in ``"skipped"`` instead of risking
    the whole line;
  - a watchdog THREAD emits at ``BENCH_BUDGET_S + 45`` (with ``signal.alarm`` as a
    second backstop): Python defers signal handlers during long native calls, so
    only a thread can get the JSON out from inside a hung multi-minute XLA compile
    (native compiles release the GIL);
  - extras run cheapest-value-first (``pipelined`` / ``e2e_prompt`` reuse the
    headline program; pipeline-constructing extras follow) and each extra is
    individually try/except-guarded, so one failure costs one field, not the rest.

Extra fields (VERDICT r1 #8; each skippable under budget pressure):
  - ``pipelined``: s/img through queued dispatch (``generate_images``);
  - ``e2e_prompt``: full prompt -> image seconds (tokenize + LPW + CLIP + sampler),
    vs the headline which times ``generate_image`` from a precomputed context;
  - ``bf16`` / ``int8_hybrid``: the OTHER dtype configuration's s/img, alongside
    the headline. The headline dtype is decided by the committed quality dossier
    (fixtures/quality_dossier.json): int8-hybrid (stable-site W8A8, baked
    static scales) headlines only if its per-step prefix-divergence verdict
    passed; otherwise bf16 headlines. BENCH_WEIGHT_DTYPE overrides;
  - ``throughput_b8``: batch-8 s/img, the serving-throughput configuration;
  - ``served_qps``: sustained images/s through the live HTTP serving daemon
    (``tools/serve.py``) with concurrent clients (the daemon merges compatible
    queued requests into batched programs — ``served_merged`` counts the merges
    observed via /stats during the measurement), incl. JSON/base64/PNG work;
  - ``dpm15``: DPM-Solver++(2M) 15-step batch-1 s/img (DDIM-25 quality class);
  - ``tcd4_b8``: TCD 4-step batch-8 s/img, the few-step distilled-serving config;
  - ``hires1024``: 1024x1024 25-step batch-1 s/img (bf16) — the long-context
    config the reference's O(S^2) attention cannot run on one device.

A compiled-kernel parity selfcheck (Pallas vs XLA on THIS chip) runs first;
MINSDTF_SELFCHECK=0 skips. Weights are seeded-random (zero-egress env) — identical
compute graph & cost to real weights. Env overrides: BENCH_STEPS, BENCH_SIZE,
BENCH_BATCH, BENCH_REPEATS, BENCH_TCD=1 (headline in TCD mode),
BENCH_EXTRAS=0 (skip the extra-field measurements), BENCH_BUDGET_S.
"""

import contextlib
import json
import os
import signal
import sys
import time

import numpy as np

_STDOUT = sys.stdout  # measurement runs under redirect_stdout(stderr); emit here
_T0 = time.monotonic()
_RESULT = {}
_EMITTED = False


def _emit():
    """Print the single JSON result line exactly once (normal exit AND signal
    paths both land here). Missing headline fields mean we were killed before
    the first measurement finished — still emit a parseable line."""
    global _EMITTED
    if _EMITTED:
        return
    _EMITTED = True
    if "value" not in _RESULT:
        _RESULT.setdefault("metric", "SD1.5 txt2img (killed before headline)")
        _RESULT.setdefault("value", None)
        _RESULT.setdefault("unit", "s/img")
        _RESULT.setdefault("vs_baseline", None)
        _RESULT["incomplete"] = True
    _RESULT["bench_s"] = round(time.monotonic() - _T0, 1)
    _STDOUT.write(json.dumps(_RESULT) + "\n")
    _STDOUT.flush()


def _on_signal(signum, frame):
    _RESULT["killed_by_signal"] = signum  # diagnosable from BENCH_r*.json alone
    _emit()
    os._exit(0)


def _log(msg):
    """Per-phase wall timing to stderr (lands in the driver's captured tail —
    the per-program compile/staging record VERDICT r4 #2 asked for)."""
    sys.stderr.write(f"[bench +{time.monotonic() - _T0:7.1f}s] {msg}\n")
    sys.stderr.flush()


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
    (fixtures/quality_dossier.json, experiments/quality_dossier.py) passed
    all four criteria; otherwise exact bf16 headlines and the hybrid time is
    published alongside. BENCH_WEIGHT_DTYPE overrides either way."""
    here = repo_dir or os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "fixtures", "quality_dossier.json")) as f:
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
    # Default budget: a fully warm-cache full run measured 1367 s in r5 before
    # the packed-weight/fused-selfcheck startup fixes (~-400 s estimated); the
    # SIGTERM handler + watchdog guarantee the JSON line even if an external
    # kill lands first (timeout(1) sends TERM before KILL), so a budget past
    # the driver's unknown limit risks an rc, not the result line.
    budget = float(os.environ.get("BENCH_BUDGET_S", 1150))
    tcd = os.environ.get("BENCH_TCD") == "1"  # headline in few-step TCD mode
    extras = os.environ.get("BENCH_EXTRAS", "1") == "1" and size == 512 and not tcd

    for sig in (signal.SIGTERM, signal.SIGINT, signal.SIGALRM):
        signal.signal(sig, _on_signal)
    signal.alarm(int(budget) + 60)  # backstop past the soft budget
    # Python delivers signals only between bytecodes — a SIGTERM/SIGALRM landing
    # mid-XLA-compile (minutes of native code) would be deferred past the
    # driver's kill grace. A watchdog THREAD runs during native calls (they
    # release the GIL), so the JSON line gets out even from inside a compile.
    import threading

    def _watchdog():
        deadline = _T0 + budget + 45
        while not _EMITTED:
            if time.monotonic() >= deadline:
                _RESULT["killed_by_signal"] = "watchdog"
                _emit()
                os._exit(0)
            time.sleep(1.0)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    # BENCH_PLATFORM=cpu: validation runs on the host (the axon sitecustomize
    # pins the platform via jax.config at register time, so the JAX_PLATFORMS
    # env var alone cannot redirect a bench process to CPU).
    if os.environ.get("BENCH_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["BENCH_PLATFORM"])

    # BENCH_LOG_COMPILES=1: per-program compile + persistent-cache hit/miss
    # lines on stderr (the VERDICT r4 #2 compile-storm diagnosis — r4 died
    # recompiling every program after the dtype-flip invalidated the cache).
    if os.environ.get("BENCH_LOG_COMPILES") == "1":
        import logging

        jax.config.update("jax_log_compiles", True)
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter("[%(name)s] %(message)s"))
        for name in ("jax._src.compilation_cache", "jax._src.compiler",
                     "jax._src.dispatch"):
            lg = logging.getLogger(name)
            lg.setLevel(logging.DEBUG)
            lg.addHandler(handler)

    with contextlib.redirect_stdout(sys.stderr):
        # Opt-out preamble: verify the COMPILED Pallas kernels against XLA on this
        # chip at the production shapes before timing anything (a Mosaic miscompile
        # would otherwise ship silently — bench checks speed, not values).
        # Import the pipeline FIRST: its import enables the persistent XLA
        # compile cache (pipeline.py:61-70). The selfcheck kernels compile
        # before any pipeline object exists, and without this ordering their
        # ~3 min of cold Mosaic compiles re-ran on every bench invocation
        # (observed r5: selfcheck alone ate 180 s of a cold-cache budget).
        from minsdtf_tpu.pipeline import StableDiffusion

        if os.environ.get("MINSDTF_SELFCHECK", "1") != "0":
            from minsdtf_tpu.tools import selfcheck

            # marker-cached: a full re-verify costs ~500 s of server-side
            # compile through the tunnel and can only change when the kernel
            # source / jax / device kind change (MINSDTF_SELFCHECK=always
            # forces the full run)
            selfcheck.check_flash_attention_cached()
            _log("selfcheck done")

        # Headline config: decided by the committed quality dossier
        # (fixtures/quality_dossier.json, experiments/quality_dossier.py —
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

        _log("headline: compile+measure start")
        times = _time_runs(jax, run, repeats, (1,), [(i + 2,) for i in range(repeats + 1)])
        # headline = median (typical); min/max expose the ±5% tunnel jitter.
        elapsed = float(np.median(times))
        sec_per_image = elapsed / batch
        ideal = flops_per_image(size, size, steps, 1) / peak_flops()
        kind = "TCD txt2img" if tcd else "txt2img"
        _RESULT.update({
            "metric": f"SD1.5 {size}x{size} {steps}-step {kind} (CFG 7.5, {dtype_label}, 1 chip)",
            "value": round(sec_per_image, 4),
            "unit": "s/img",
            "vs_baseline": round(ideal / sec_per_image, 4),
            "min": round(min(times) / batch, 4),
            "max": round(max(times) / batch, 4),
        })
        _log(f"headline done: {sec_per_image:.4f} s/img")

        if extras:
            _run_extras(jax, StableDiffusion, pipe, run, encoded, steps, size,
                        budget, use_hybrid, scales_fixture)
    _emit()


def _run_extras(jax, StableDiffusion, pipe, run, encoded, steps, size, budget,
                use_hybrid, scales_fixture):
    """Each extra: (name(s), conservative cold-cache cost estimate in seconds,
    thunk). Ordered value-per-second — program-reusing measurements first, fresh
    pipeline constructions after, the 1024px compile last. An extra only STARTS
    if its estimate fits the remaining budget; skipped ones are published in
    "skipped" so a missing field is diagnosable from the JSON alone."""
    skipped = []
    errors = {}

    def share_weights(dst):
        """Reuse the headline pipeline's device-resident param pytrees on a
        fresh same-dtype pipeline (params are resolution- and scheduler-
        independent): skips a full re-init + cast dispatched through the
        tunnel per extra — several of the r4 compile-storm seconds. Only valid
        when dst's weight config matches the source's (plain bf16 here)."""
        if use_hybrid:
            return dst  # headline params are quantized; let dst init its own
        dst._unet_params = pipe.unet_params
        dst._text_params = pipe.text_params
        dst._vae_params = pipe.vae_params
        return dst

    def fits(name, est):
        remaining = budget - (time.monotonic() - _T0)
        if remaining < est:
            _log(f"extra {name}: SKIP (needs ~{est:.0f}s, {remaining:.0f}s left)")
            skipped.append(name)
            return False
        return True

    # -- pipelined: queued dispatch through the ALREADY-COMPILED headline program
    def x_pipelined():
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
        _RESULT["pipelined"] = round(float(np.median(tq)) / 4, 4)

    # -- e2e_prompt: tokenize + LPW + CLIP + sampler. warm_text() compiles the
    # fused text traces WITHOUT building any new sampler program (VERDICT r4 #1c:
    # the old warm ran a full 25-step generation); the timed run then hits the
    # compiled text program + the headline's sampler program.
    def x_e2e_prompt():
        bpe = os.environ.get("MINSDTF_BPE")
        if not (bpe and os.path.exists(bpe)):
            bpe = _synthetic_merges()
        pipe.bpe_path = bpe
        pipe._tokenizer = None
        pipe.warm_text()
        # Distinct prompts per rep (the axon server dedupes identical
        # (program, args) executions) and the first rep is DISCARDED: it pays
        # executable staging for the fused text program (the single-rep r5
        # measurement read 0.695 s; the steady-state median is what the field
        # claims — full prompt -> image wall).
        times = []
        for i, prompt in enumerate(["a photograph of an astronaut riding a horse",
                                    "a watercolor cat wearing a hat",
                                    "a dog on a star", "hello world the cat"]):
            t0 = time.perf_counter()
            img = pipe.text_to_image(prompt, num_steps=steps, seed=9 + i)
            jax.block_until_ready(img)
            times.append(time.perf_counter() - t0)
        _RESULT["e2e_prompt"] = round(float(np.median(times[1:])), 4)

    # -- the OTHER dtype config alongside the headline (fresh pipeline + compile)
    def x_alt_dtype():
        if use_hybrid:
            alt_pipe = StableDiffusion(img_height=size, img_width=size)
            field = "bf16"
        else:
            alt_pipe = StableDiffusion(
                img_height=size, img_width=size, weight_dtype="int8_hybrid",
                int8_act_scales=scales_fixture)
            field = "int8_hybrid"
        ta = _time_runs(jax, lambda s: run(s, p=alt_pipe), 3, (1,),
                        [(2,), (3,), (4,), (5,)])
        _RESULT[field] = round(float(np.median(ta)), 4)

    # -- batch-8 serving throughput (same pipeline, batched program)
    def x_throughput_b8():
        t8 = _time_runs(jax, lambda s: run(s, b=8), 3, (1,), [(2,), (3,), (4,), (5,)])
        _RESULT["throughput_b8"] = round(float(np.median(t8)) / 8, 4)

    # -- sustained serving qps through the live HTTP daemon (merged batching)
    def x_served_qps():
        import base64
        import threading
        import urllib.request

        from minsdtf_tpu.tools import serve as serve_mod

        server, worker = serve_mod.serve(pipe, port=0)  # ephemeral port
        try:
            port = server.server_address[1]
            threading.Thread(target=server.serve_forever, daemon=True).start()
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

            post(51)  # warm the batch-1 daemon path (injected-noise program)
            # warm WAVE: the merge worker upgrades concurrent bursts to a
            # batch-8 injected-noise program that nothing else compiles — an
            # unwarmed first wave would pay that multi-minute compile inside
            # the measured window (one of the r4 budget-blowout contributors)
            warm_threads = [threading.Thread(target=post, args=(52 + i,))
                            for i in range(8)]
            for t in warm_threads:
                t.start()
            for t in warm_threads:
                t.join()
            merged_before = worker.merged_batches
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
            _RESULT["served_qps"] = round(n_req / (time.perf_counter() - t0), 4)
            # merging must have been ACTIVE during the measurement (VERDICT r4 #4)
            _RESULT["served_merged"] = worker.merged_batches - merged_before
        finally:
            server.shutdown()
            worker.stop()

    # -- DPM-Solver++(2M) 15 steps: the quality-equivalent fast config
    def x_dpm15():
        dpm_pipe = share_weights(StableDiffusion(
            img_height=size, img_width=size, scheduler_type="dpm"))
        td = _time_runs(jax, lambda s: run(s, n=15, p=dpm_pipe), 3, (1,),
                        [(2,), (3,), (4,), (5,)])
        _RESULT["dpm15"] = round(float(np.median(td)), 4)

    # -- TCD 4-step batch-8: the few-step distilled-serving config
    def x_tcd4_b8():
        tcd_pipe = share_weights(StableDiffusion(
            img_height=size, img_width=size, active_tcd=True))
        tt = _time_runs(jax, lambda s: run(s, b=8, n=4, p=tcd_pipe), 3, (1,),
                        [(2,), (3,), (4,), (5,)])
        _RESULT["tcd4_b8"] = round(float(np.median(tt)) / 8, 4)

    # -- 1024px 25-step batch-1 (bf16, LAST: biggest fresh compile): the
    # long-context differentiator — the reference's materialized O(S^2) softmax
    # cannot run 16k-token self-attention on one device; the online flash kernel
    # can (SURVEY §5; diffusion_model.py:123-126). Hybrid scales are
    # 512px-calibrated, so this config publishes bf16.
    def x_hires1024():
        hi_pipe = share_weights(StableDiffusion(img_height=1024, img_width=1024))
        th = _time_runs(jax, lambda s: run(s, p=hi_pipe), 2, (1,), [(2,), (3,), (4,)])
        _RESULT["hires1024"] = round(float(np.median(th)), 4)

    # Cold-cache cost estimates (seconds) from the r3/r4 runs: a fresh 512px
    # sampler compile through the tunnel is ~3-4 min cold / seconds warm; the
    # estimates gate STARTING an extra, actual fast (cache-warm) runs leave the
    # budget high so later extras still fit.
    plan = [
        ("pipelined", 45, x_pipelined),
        ("e2e_prompt", 120, x_e2e_prompt),
        ("throughput_b8", 200, x_throughput_b8),
        ("dpm15", 240, x_dpm15),
        ("tcd4_b8", 200, x_tcd4_b8),
        ("served_qps", 240, x_served_qps),
        ("int8_hybrid" if not use_hybrid else "bf16", 240, x_alt_dtype),
        ("hires1024", 300, x_hires1024),
    ]
    for name, est, thunk in plan:
        if not fits(name, est):
            continue
        t0 = time.monotonic()
        try:
            thunk()
            _log(f"extra {name}: ok in {time.monotonic() - t0:.1f}s")
        except Exception as e:  # one extra's failure must not cost the rest
            errors[name] = f"{type(e).__name__}: {e}"[:160]
            _log(f"extra {name}: FAILED ({errors[name]})")
    if skipped:
        _RESULT["skipped"] = skipped
    if errors:
        _RESULT["extras_error"] = errors


if __name__ == "__main__":
    main()
