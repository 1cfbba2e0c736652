"""Scheduler parity vs the reference implementation (pure numpy oracle)."""

import numpy as np
import pytest

from conftest import load_reference_module
from minsdtf_tpu import scheduler as sch

ref_scheduler = load_reference_module("scheduler")


def test_alphas_cumprod_tables_match():
    ours = sch.Scheduler(active_tcd=False)
    ref = ref_scheduler.Scheduler(active_tcd=False)
    np.testing.assert_allclose(ours.alphas_cumprod, ref.alphas_cumprod, rtol=1e-12)
    np.testing.assert_allclose(ours.signal_rates, ref.signal_rates, rtol=1e-12)
    np.testing.assert_allclose(ours.noise_rates, ref.noise_rates, rtol=1e-12)


@pytest.mark.parametrize("n", [1, 4, 25, 50, 999])
def test_ddim_timesteps_match(n):
    ours = sch.Scheduler(active_tcd=False)
    ref = ref_scheduler.Scheduler(active_tcd=False)
    ours.set_timesteps(n)
    ref.set_timesteps(n)
    np.testing.assert_array_equal(ours.timesteps, ref.timesteps)


@pytest.mark.parametrize("n,orig,strength", [(4, 50, 1.0), (8, 50, 1.0), (2, 4, 1.0), (4, 50, 0.6)])
def test_tcd_timesteps_match(n, orig, strength):
    ours = sch.Scheduler(active_tcd=True, original_inference_steps=orig)
    ref = ref_scheduler.Scheduler(active_tcd=True, original_inference_steps=orig)
    ours.set_timesteps(n, strength=strength)
    ref.set_timesteps(n, strength=strength)
    np.testing.assert_array_equal(ours.timesteps, ref.timesteps)


@pytest.mark.parametrize("n,orig", [(4, 40), (10, 100)])
def test_tcd_explicit_original_steps_arbitrary_grid(n, orig):
    """Explicitly passing original_inference_steps selects the reference's
    arbitrary-timestep origin grid (scheduler.py:152-154)."""
    ours = sch.Scheduler(active_tcd=True)
    ref = ref_scheduler.Scheduler(active_tcd=True)
    ours.set_timesteps(n, original_inference_steps=orig)
    ref.set_timesteps(n, original_inference_steps=orig)
    np.testing.assert_array_equal(ours.timesteps, ref.timesteps)


def _run_loop(scheduler_obj, timesteps_desc, eps_seq, x0, eta):
    """Replicates the reference pipeline hot loop ordering (stable_diffusion.py:442-468)."""
    latent = x0
    for i, t in enumerate(timesteps_desc):
        latent_prev = latent
        latent = eps_seq[i]  # stand-in for the model output
        latent = scheduler_obj.step(latent, int(t), latent_prev, eta=eta)
    return latent


@pytest.mark.parametrize("tcd,eta", [(False, 0.0), (True, 0.0)])
def test_step_loop_parity_deterministic(tcd, eta):
    rng = np.random.RandomState(0)
    n = 6
    shape = (1, 4, 4, 4)
    eps_seq = [rng.randn(*shape).astype(np.float32) for _ in range(n)]
    x0 = rng.randn(*shape).astype(np.float32)

    ours = sch.Scheduler(active_tcd=tcd)
    ref = ref_scheduler.Scheduler(active_tcd=tcd)
    ours.set_timesteps(n)
    ref.set_timesteps(n)
    ts = ref.timesteps  # descending

    out_ours = _run_loop(ours, ts, eps_seq, x0, eta)
    out_ref = _run_loop(ref, ts, eps_seq, x0, eta)
    np.testing.assert_allclose(out_ours, out_ref, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("tcd,eta", [(False, 0.0), (True, 0.0), (True, 0.3)])
def test_denoise_schedule_matches_host_step(tcd, eta):
    """The stacked DenoiseSchedule coefficients reproduce Scheduler.step exactly
    (TCD eta>0 compared with the noise term zeroed, since realizations differ)."""
    rng = np.random.RandomState(1)
    n = 5
    shape = (2, 4, 4, 4)

    host = sch.Scheduler(active_tcd=tcd)
    dev = sch.build_denoise_schedule(sch.Scheduler(active_tcd=tcd), num_steps=n, eta=eta)
    host.set_timesteps(n)
    np.testing.assert_array_equal(dev.timesteps, host.timesteps)

    latent = rng.randn(*shape).astype(np.float32)
    for i in range(dev.num_steps):
        eps = rng.randn(*shape).astype(np.float32)
        # host step (monkeypatch TCD noise to zero for comparability)
        if tcd and eta > 0.0:
            orig_randn = np.random.randn
            np.random.randn = lambda *s: np.zeros(s)
            try:
                want = host.step(eps, int(dev.timesteps[i]), latent, eta=eta)
            finally:
                np.random.randn = orig_randn
        else:
            want = host.step(eps, int(dev.timesteps[i]), latent, eta=eta)

        # device-form step from stacked rows
        x0 = (latent - dev.nr_t[i] * eps) / dev.sr_t[i]
        if tcd:
            d = dev.sr_s[i] * x0 + dev.nr_s[i] * eps
            if eta > 0.0 and not dev.is_last[i]:
                got = dev.c_denoised[i] * d + dev.c_noise[i] * 0.0
            else:
                got = d
        else:
            if dev.is_last[i]:
                got = x0
            else:
                got = dev.sr_prev[i] * x0 + dev.nr_prev[i] * eps
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        latent = want.astype(np.float32)


def test_img2img_truncated_schedule():
    """img2img runs descending indices [n-k, n) where k = int(n*strength+0.5)
    (reference stable_diffusion.py:410-416)."""
    n, strength = 25, 0.8
    k = int(n * strength + 0.5)
    dev = sch.build_denoise_schedule(
        sch.Scheduler(active_tcd=False), num_steps=n, strength=strength
    )
    full = sch.Scheduler(active_tcd=False)
    full.set_timesteps(n)
    np.testing.assert_array_equal(dev.timesteps, full.timesteps[n - k:])
    assert dev.is_last[-1] == 1.0 and dev.is_last[:-1].sum() == 0.0
    # init noising at ascending[k] == descending[n-k-1] (stable_diffusion.py:414)
    assert dev.init_timestep == full.timesteps[n - k - 1]


def test_lcm_timesteps_use_tcd_grid():
    """LCM shares the distillation grid (k = T//orig, (1..orig)*k - 1 subsampled)."""
    lcm = sch.LCMScheduler()
    tcd = sch.Scheduler(active_tcd=True)
    lcm.set_timesteps(4)
    tcd.set_timesteps(4)
    np.testing.assert_array_equal(lcm.timesteps, tcd.timesteps)


def test_lcm_boundary_scalings():
    """c_skip/c_out: sigma_data=0.5, timestep_scaling=10 (arXiv:2310.04378)."""
    lcm = sch.LCMScheduler()
    for t in (0, 19, 999):
        st = t * 10.0
        c_skip, c_out = lcm.boundary_scalings(t)
        np.testing.assert_allclose(c_skip, 0.25 / (st**2 + 0.25), rtol=1e-12)
        np.testing.assert_allclose(c_out, st / np.sqrt(st**2 + 0.25), rtol=1e-12)
    # consistency boundary: at t=0 the update is the identity map on x0-mixed input
    c_skip, c_out = lcm.boundary_scalings(0)
    assert c_skip == 1.0 and c_out == 0.0


def test_lcm_denoise_schedule_matches_host_step():
    """Stacked LCM rows reproduce LCMScheduler.step (noise zeroed on both sides)."""
    rng = np.random.RandomState(3)
    n = 4
    shape = (1, 4, 4, 4)
    host = sch.LCMScheduler()
    dev = sch.build_denoise_schedule(sch.LCMScheduler(), num_steps=n)
    assert dev.mode == "lcm"
    host.set_timesteps(n)
    np.testing.assert_array_equal(dev.timesteps, host.timesteps)

    latent = rng.randn(*shape).astype(np.float32)
    for i in range(dev.num_steps):
        eps = rng.randn(*shape).astype(np.float32)
        orig_randn = np.random.randn
        np.random.randn = lambda *s: np.zeros(s)
        try:
            want = host.step(eps, int(dev.timesteps[i]), latent)
        finally:
            np.random.randn = orig_randn
        x0 = (latent - dev.nr_t[i] * eps) / dev.sr_t[i]
        d = dev.c_out[i] * x0 + dev.c_skip[i] * latent
        got = d if dev.is_last[i] else dev.sr_prev[i] * d + dev.nr_prev[i] * 0.0
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        latent = want.astype(np.float32)


def test_timestep_embedding_matches_reference_formula():
    # reference stable_diffusion.py:543-553
    def ref_emb(timestep, dim=320, max_period=10000):
        half = dim // 2
        freqs = np.exp(-np.log(max_period) * np.arange(half, dtype=np.float32) / half)
        args = np.asarray([timestep], dtype=np.float32) * freqs
        return np.concatenate([np.cos(args), np.sin(args)], axis=0)

    for t in [0, 1, 40, 999]:
        got = np.asarray(sch.timestep_embedding(np.asarray(t)))
        np.testing.assert_allclose(got, ref_emb(t), rtol=1e-5, atol=1e-6)


# ---- external-oracle golden numbers (VERDICT r2 #7) -----------------------------------
# The LCM update is beyond the reference (its README TODO), so its constants are
# pinned against LITERAL values computed from the published diffusers formulas —
# LCMScheduler.get_scalings_for_boundary_condition_discrete (sigma_data=0.5,
# timestep_scaling=10; arXiv:2310.04378 App. E) and TCDScheduler.step
# (arXiv:2402.19159 §4) — not against this repo's own code.

# (timestep, c_skip, c_out) on the 4-step distillation grid + endpoints
LCM_GOLDEN = [
    (999, 2.5050075037374525e-09, 0.9999999987474963),
    (759, 4.339667493201184e-09, 0.9999999978301662),
    (499, 1.004012021999791e-08, 0.99999999497994),
    (259, 3.726837564778493e-08, 0.999999981365812),
    (19, 6.92515979806234e-06, 0.9999965374141062),
    (0, 1.0, 0.0),
]

# TCD eta=0.3 with scaled-linear betas (0.00085, 0.012, 1000):
# (t, prev_t, t_s, sqrt(a_s), sqrt(1-a_s), sqrt(a_prev/a_s), sqrt(1-a_prev/a_s))
TCD_GOLDEN = [
    (999, 759, 531, 0.4864096436314845, 0.8737308845304098,
     0.46977169803180074, 0.8827879426727115),
    (759, 499, 349, 0.7128512140983307, 0.7013152975363762,
     0.7392057103993616, 0.6734797084641639),
    (499, 259, 181, 0.8846775895128633, 0.46620334899452376,
     0.9175919969103526, 0.3975234926467509),
]


def test_lcm_boundary_scalings_golden():
    lcm = sch.LCMScheduler()
    for t, c_skip_want, c_out_want in LCM_GOLDEN:
        c_skip, c_out = lcm.boundary_scalings(t)
        np.testing.assert_allclose(c_skip, c_skip_want, rtol=1e-10)
        np.testing.assert_allclose(c_out, c_out_want, rtol=1e-10)


def test_lcm_schedule_rows_golden():
    dev = sch.build_denoise_schedule(sch.LCMScheduler(), num_steps=4)
    np.testing.assert_array_equal(dev.timesteps, [999, 759, 499, 259])
    for i, (t, c_skip_want, c_out_want) in enumerate(LCM_GOLDEN[:4]):
        np.testing.assert_allclose(dev.c_skip[i], c_skip_want, rtol=1e-6, atol=1e-12)
        np.testing.assert_allclose(dev.c_out[i], c_out_want, rtol=1e-6)


def test_tcd_schedule_rows_golden():
    """The device-consumed TCD rows equal the diffusers TCDScheduler quantities:
    t_s = floor((1-eta)*prev_t), pred_noised = sqrt(a_s) x0 + sqrt(1-a_s) eps,
    renoise mix sqrt(a_prev/a_s) / sqrt(1-a_prev/a_s)."""
    dev = sch.build_denoise_schedule(
        sch.Scheduler(active_tcd=True), num_steps=4, eta=0.3
    )
    np.testing.assert_array_equal(dev.timesteps, [999, 759, 499, 259])
    for i, (t, prev_t, t_s, sr_s, nr_s, c_den, c_noi) in enumerate(TCD_GOLDEN):
        np.testing.assert_allclose(dev.sr_s[i], sr_s, rtol=1e-6)
        np.testing.assert_allclose(dev.nr_s[i], nr_s, rtol=1e-6)
        np.testing.assert_allclose(dev.c_denoised[i], c_den, rtol=1e-6)
        np.testing.assert_allclose(dev.c_noise[i], c_noi, rtol=1e-6)


def test_tcd_stochastic_mix_statistics():
    """The stochastic re-noise branch has the closed-form marginal
    N(c_denoised * d, c_noise^2): mean/std of a large sample of the sampler-side
    update match (the reference's np.random.randn realization is irreproducible by
    construction, so the DISTRIBUTION is the oracle here)."""
    import jax

    dev = sch.build_denoise_schedule(
        sch.Scheduler(active_tcd=True), num_steps=4, eta=0.3
    )
    d_const = 3.0
    n = 200_000
    z = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (n,), np.float32))
    for i in range(3):  # stochastic rows only (last row emits `denoised`)
        mix = dev.c_denoised[i] * d_const + dev.c_noise[i] * z
        np.testing.assert_allclose(mix.mean(), dev.c_denoised[i] * d_const, atol=6e-3)
        np.testing.assert_allclose(mix.std(), dev.c_noise[i], rtol=2e-2)


# ---- DPM-Solver++(2M) (beyond reference; arXiv:2211.01095) -------------------------


def test_dpm_first_order_equals_ddim():
    """The first-order DPM-Solver++ step is algebraically the DDIM update:
    (nr_p/nr_t) x + sr_p (1 - e^{-h}) x0 == sr_p x0 + nr_p eps when
    x = sr_t x0 + nr_t eps (h = ln(sr_p/nr_p) - ln(sr_t/nr_t)). Checked on real
    schedule coefficients at every adjacent timestep pair of a 12-step run."""
    dpm = sch.DPMSolverScheduler()
    dpm.set_timesteps(12)
    rng = np.random.RandomState(0)
    x0 = rng.randn(8)
    eps = rng.randn(8)
    for i in range(len(dpm.timesteps) - 1):
        t, p = int(dpm.timesteps[i]), int(dpm.timesteps[i + 1])
        sr_t, nr_t = dpm.signal_rates[t], dpm.noise_rates[t]
        sr_p, nr_p = dpm.signal_rates[p], dpm.noise_rates[p]
        x = sr_t * x0 + nr_t * eps
        h = np.log(sr_p / nr_p) - np.log(sr_t / nr_t)
        got = (nr_p / nr_t) * x + sr_p * (1.0 - np.exp(-h)) * x0
        want = sr_p * x0 + nr_p * eps  # DDIM
        np.testing.assert_allclose(got, want, rtol=1e-10)


def test_dpm_denoise_schedule_matches_host_step():
    """Stacked dpm rows (c_x, c_d, w) reproduce DPMSolverScheduler.step including
    the multistep x0 history and the first/last first-order steps."""
    rng = np.random.RandomState(5)
    n = 6
    shape = (1, 4, 4, 4)
    host = sch.DPMSolverScheduler()
    dev = sch.build_denoise_schedule(sch.DPMSolverScheduler(), num_steps=n)
    assert dev.mode == "dpm"
    host.set_timesteps(n)
    np.testing.assert_array_equal(dev.timesteps, host.timesteps)
    assert dev.w[0] == 0.0 and dev.w[-1] == 0.0
    assert dev.c_x[-1] == 0.0 and dev.c_d[-1] == 1.0

    latent = rng.randn(*shape).astype(np.float32)
    x0_prev = np.zeros(shape, np.float32)
    for i in range(dev.num_steps):
        eps = rng.randn(*shape).astype(np.float32)
        want = host.step(eps, int(dev.timesteps[i]), latent)
        x0 = (latent - dev.nr_t[i] * eps) / dev.sr_t[i]
        d = (1.0 + dev.w[i]) * x0 - dev.w[i] * x0_prev
        got = dev.c_x[i] * latent + dev.c_d[i] * d
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        latent = want.astype(np.float32)
        x0_prev = x0


def test_dpm_constant_x0_is_exact():
    """With a model whose x0 prediction is constant, the probability-flow ODE is
    solved EXACTLY by DPM-Solver++ at any step count (the data-prediction
    exponential integrator is exact for constant x0) — the final latent equals x0.
    This pins the c_x/c_d definitions (a sign or exp error breaks it by O(1))."""
    dpm = sch.DPMSolverScheduler()
    for steps in (2, 5, 9):
        dev = sch.build_denoise_schedule(sch.DPMSolverScheduler(), num_steps=steps)
        x0_true = np.full((4,), 1.7)
        eps_noise = np.random.RandomState(1).randn(4)
        t0 = int(dev.timesteps[0])
        x = dpm.signal_rates[t0] * x0_true + dpm.noise_rates[t0] * eps_noise
        x0_prev = np.zeros(4)
        for i in range(dev.num_steps):
            # eps consistent with predicting exactly x0_true from current x
            eps = (x - dev.sr_t[i] * x0_true) / dev.nr_t[i]
            x0 = (x - dev.nr_t[i] * eps) / dev.sr_t[i]
            d = (1.0 + dev.w[i]) * x0 - dev.w[i] * x0_prev
            x = dev.c_x[i] * x + dev.c_d[i] * d
            x0_prev = x0
        np.testing.assert_allclose(x, x0_true, rtol=1e-6)


def test_dpm_rows_golden():
    """Golden coefficient values for a 4-step run, hand-computed from the schedule
    tables (pins h, w = h/(2 h_prev), c_x = nr_p/nr_t, c_d = sr_p (1-e^{-h}))."""
    dev = sch.build_denoise_schedule(sch.DPMSolverScheduler(), num_steps=4)
    acp = sch.make_alphas_cumprod()
    ts = dev.timesteps  # [750, 500, 250, 0]
    np.testing.assert_array_equal(ts, [750, 500, 250, 0])
    lam = lambda t: 0.5 * np.log(acp[t] / (1.0 - acp[t]))
    hs = [lam(ts[i + 1]) - lam(ts[i]) for i in range(3)]
    for i in range(3):
        a_t, a_p = acp[ts[i]], acp[ts[i + 1]]
        np.testing.assert_allclose(
            dev.c_x[i], np.sqrt((1 - a_p) / (1 - a_t)), rtol=1e-6)
        np.testing.assert_allclose(
            dev.c_d[i], np.sqrt(a_p) * (1.0 - np.exp(-hs[i])), rtol=1e-6)
    np.testing.assert_allclose(dev.w[1], hs[1] / (2 * hs[0]), rtol=1e-6)
    np.testing.assert_allclose(dev.w[2], hs[2] / (2 * hs[1]), rtol=1e-6)


def test_karras_timesteps_grid():
    """Karras spacing: strictly descending int grid within [0, 999], endpoints at
    the table extremes (sigma_max -> t=999, sigma_min -> t=0), and denser at the
    low-noise end than uniform spacing (the point of the rho=7 warp)."""
    acp = sch.make_alphas_cumprod()
    for n in (4, 10, 15, 25):
        ts = sch.karras_timesteps(n, acp)
        assert ts.dtype == np.int32 and len(ts) == n
        assert ts[0] == 999 and ts[-1] == 0
        assert np.all(np.diff(ts) < 0)
    ts = sch.karras_timesteps(15, acp)
    # low-noise (tail) gaps much smaller than high-noise (head) gaps
    head_gap = ts[0] - ts[1]
    tail_gap = ts[-2] - ts[-1]
    assert tail_gap * 4 < head_gap, (head_gap, tail_gap)


def test_dpm_karras_schedule_end_to_end():
    """DPM rows built over the Karras grid keep the invariants (w=0 first/last,
    clean final boundary) and the constant-x0 integrator stays exact — the update
    is grid-independent, so this pins the grid plumbing."""
    dev = sch.build_denoise_schedule(
        sch.DPMSolverScheduler(karras_sigmas=True), num_steps=8)
    assert dev.mode == "dpm"
    assert dev.timesteps[0] == 999 and dev.timesteps[-1] == 0
    assert dev.w[0] == 0.0 and dev.w[-1] == 0.0
    assert dev.c_x[-1] == 0.0 and dev.c_d[-1] == 1.0
    x0_true = np.full((4,), -0.9)
    x = np.random.RandomState(2).randn(4)  # any start: exactness is per-step
    sr0, nr0 = dev.sr_t[0], dev.nr_t[0]
    x = sr0 * x0_true + nr0 * x
    x0_prev = np.zeros(4)
    for i in range(dev.num_steps):
        eps = (x - dev.sr_t[i] * x0_true) / dev.nr_t[i]
        x0 = (x - dev.nr_t[i] * eps) / dev.sr_t[i]
        d = (1.0 + dev.w[i]) * x0 - dev.w[i] * x0_prev
        x = dev.c_x[i] * x + dev.c_d[i] * d
        x0_prev = x0
    np.testing.assert_allclose(x, x0_true, rtol=1e-6)


def test_dpm_img2img_truncation_first_order_restart():
    """img2img truncation slices the row range [start, n): the first ITERATED row
    must restart first-order (w=0 — there is no x0 history), and the truncated
    rows must equal the corresponding suffix of the full schedule."""
    full = sch.build_denoise_schedule(sch.DPMSolverScheduler(), num_steps=10)
    trunc = sch.build_denoise_schedule(
        sch.DPMSolverScheduler(), num_steps=10, strength=0.5)
    k = trunc.num_steps
    assert 0 < k < 10
    np.testing.assert_array_equal(trunc.timesteps, full.timesteps[10 - k:])
    assert trunc.w[0] == 0.0
    # subsequent rows keep the full schedule's 2M weights (same adjacent-h ratios)
    np.testing.assert_allclose(trunc.w[1:], full.w[10 - k + 1:], rtol=1e-12)
    np.testing.assert_allclose(trunc.c_x, full.c_x[10 - k:], rtol=1e-12)
    np.testing.assert_allclose(trunc.c_d, full.c_d[10 - k:], rtol=1e-12)


def test_euler_a_variance_identity():
    """Euler-Ancestral rows preserve the VP marginal: for an exact denoiser
    (x = sr_t x0 + nr_t eps), the stepped latent must carry signal sr_prev and
    total noise std nr_prev — i.e. c_x*sr_t == sr_prev and
    (c_x*nr_t + c_d)^2 + c_noise^2 == nr_prev^2 on every non-final row."""
    dev = sch.build_denoise_schedule(sch.EulerAncestralScheduler(), num_steps=8)
    assert dev.mode == "euler_a"
    live = dev.is_last < 1.0
    np.testing.assert_allclose(
        dev.c_x[live] * dev.sr_t[live], dev.sr_prev[live], rtol=1e-5)
    np.testing.assert_allclose(
        (dev.c_x[live] * dev.nr_t[live] + dev.c_d[live]) ** 2
        + dev.c_noise[live] ** 2,
        dev.nr_prev[live] ** 2, rtol=1e-4)
    # sigma_up is strictly positive between steps (it IS the ancestral part)
    assert (dev.c_noise[live] > 0).all()


def test_euler_a_denoise_schedule_matches_host_step():
    """Stacked Euler-a rows reproduce EulerAncestralScheduler.step with the SAME
    noise realization injected on both sides."""
    rng = np.random.RandomState(3)
    n = 6
    shape = (1, 4, 4, 4)
    host = sch.EulerAncestralScheduler()
    dev = sch.build_denoise_schedule(sch.EulerAncestralScheduler(), num_steps=n)
    host.set_timesteps(n)
    np.testing.assert_array_equal(dev.timesteps, host.timesteps)

    latent = rng.randn(*shape).astype(np.float32)
    for i in range(dev.num_steps):
        eps = rng.randn(*shape).astype(np.float32)
        z = rng.randn(*shape).astype(np.float32)
        want = host.step(eps, int(dev.timesteps[i]), latent, noise=z)
        x0 = (latent - dev.nr_t[i] * eps) / dev.sr_t[i]
        if dev.is_last[i]:
            got = x0
        else:
            got = dev.c_x[i] * latent + dev.c_d[i] * eps + dev.c_noise[i] * z
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
        latent = want.astype(np.float32)


def test_euler_alias_is_exact_ddim():
    """scheduler_type="euler" aliases DDIM: on the VP eps parametrization the
    non-ancestral Euler update EQUALS the DDIM update algebraically —
    sr_prev*(sigma_prev - sigma_t) == nr_prev - sr_prev*nr_t/sr_t. Verify the
    identity on real schedule rows (the reason no separate sampler exists)."""
    dev = sch.build_denoise_schedule(sch.Scheduler(active_tcd=False), num_steps=25)
    live = dev.is_last < 1.0
    sig_t = dev.nr_t / dev.sr_t
    sig_p = dev.nr_prev / dev.sr_prev
    euler_eps_coeff = dev.sr_prev * (sig_p - sig_t)
    ddim_eps_coeff = dev.nr_prev - dev.sr_prev * dev.nr_t / dev.sr_t
    np.testing.assert_allclose(
        euler_eps_coeff[live], ddim_eps_coeff[live], rtol=1e-5)
    from minsdtf_tpu.pipeline import StableDiffusion

    pipe = StableDiffusion(scheduler_type="euler")
    assert pipe.scheduler.active_tcd is False
    assert getattr(pipe.scheduler, "mode", "") == ""
