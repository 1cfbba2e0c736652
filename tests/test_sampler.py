"""Sampler correctness: the single-jit lax.scan program must equal an explicit
per-step host loop built from the same UNet + host Scheduler (self-consistency), for
DDIM / TCD / CFG / rescale / inpaint configurations."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minsdtf_tpu import sampler
from minsdtf_tpu import scheduler as sched_lib
from minsdtf_tpu.models import unet as unet_lib

H = W = 8  # latent size (64x64 image)
B = 1
# Scaled-down UNet: same structure/code as SD1.5, 10x narrower — the sampler logic
# under test is width-independent, and the 1-core CI host can't trace the full model
# repeatedly.
SMALL = dict(widths=(32, 64, 128, 128), temb_dim=128)


@pytest.fixture(scope="module")
def unet_params():
    return unet_lib.init_params(jax.random.PRNGKey(0), dtype=jnp.float32, scale=0.04, **SMALL)


@pytest.fixture(scope="module")
def vae_params():
    from minsdtf_tpu.models import vae as vae_lib

    return vae_lib.init_params(jax.random.PRNGKey(1), dtype=jnp.float32, scale=0.04)


def _host_loop(unet_params, schedule, t_embs, latent, context, uncond, scale, rescale,
               inpaint=None):
    """Reference-shaped loop: per-step UNet calls + host scheduler math
    (mirrors stable_diffusion.py:442-479)."""
    apply = jax.jit(unet_lib.apply)
    latent = np.asarray(latent, np.float32)
    for i in range(schedule.num_steps):
        t_emb = np.repeat(t_embs[i][None], B, axis=0)
        if scale > 0:
            e_u = np.asarray(apply(unet_params, latent, t_emb, uncond), np.float32)
            e_c = np.asarray(apply(unet_params, latent, t_emb, context), np.float32)
            eps = e_u + scale * (e_c - e_u)
            if rescale > 0:
                std_t = np.std(e_c, axis=(1, 2, 3), keepdims=True)
                std_c = np.std(eps, axis=(1, 2, 3), keepdims=True) + 1e-5
                eps = rescale * (eps * std_t / std_c) + (1 - rescale) * eps
        else:
            eps = np.asarray(apply(unet_params, latent, t_emb, context), np.float32)
        x0 = (latent - schedule.nr_t[i] * eps) / schedule.sr_t[i]
        if schedule.active_tcd:
            new = schedule.sr_s[i] * x0 + schedule.nr_s[i] * eps
        else:
            new = x0 if schedule.is_last[i] else schedule.sr_prev[i] * x0 + schedule.nr_prev[i] * eps
        if inpaint is not None:
            init_latent, mask, bnoise = inpaint
            origin = schedule.sr_t[i] * init_latent + schedule.nr_t[i] * bnoise
            new = origin * (1 - mask) + new * mask
        latent = new.astype(np.float32)
    return latent


def _run_sampler(unet_params, schedule, t_embs, latent0, context, uncond, scale, rescale,
                 inpaint=None):
    rows = {k: getattr(schedule, k) for k in (
        "sr_t", "nr_t", "sr_prev", "nr_prev", "sr_s", "nr_s",
        "c_denoised", "c_noise", "is_last")}
    init_latent = mask = bnoise = None
    if inpaint is not None:
        init_latent, mask, bnoise = (jnp.asarray(x, jnp.float32) for x in inpaint)
    _, latent = sampler.generate(
        unet_params, None,
        jnp.asarray(latent0, jnp.float32),
        jnp.asarray(context, jnp.float32),
        jnp.asarray(uncond, jnp.float32) if scale > 0 else None,
        jnp.asarray(t_embs, jnp.float32),
        rows,
        jnp.float32(scale), jnp.float32(rescale),
        noise_key=jax.random.PRNGKey(9),
        init_latent=init_latent, latent_mask=mask, blend_noise=bnoise,
        use_cfg=scale > 0,
        active_tcd=schedule.active_tcd,
        stochastic=False,
        use_controls=False,
        use_inpaint=inpaint is not None,
        decode=False,
    )
    return np.asarray(latent, np.float32)


def _setup(tcd, steps=3):
    rng = np.random.RandomState(0)
    sched = sched_lib.Scheduler(active_tcd=tcd)
    schedule = sched_lib.build_denoise_schedule(sched, steps, eta=0.0 if tcd else 0.3)
    t_embs = sched_lib.timestep_embedding(schedule.timesteps, dim=SMALL["widths"][0])
    latent0 = rng.normal(0, 1, (B, H, W, 4)).astype(np.float32)
    context = rng.normal(0, 1, (B, 77, 768)).astype(np.float32)
    uncond = rng.normal(0, 1, (B, 77, 768)).astype(np.float32)
    return schedule, t_embs, latent0, context, uncond


def test_device_noise_matches_host_noise(unet_params):
    """In-jit Philox noise (latent0=None + philox_kc) must reproduce the host
    rng.stateless_normal path for the same integer seed: identical Philox bits,
    float divergence bounded by libm ULPs through the short scan."""
    from minsdtf_tpu import rng as rng_lib

    schedule, t_embs, _, context, uncond = _setup(False)
    seed = 123456
    rows = {k: getattr(schedule, k) for k in (
        "sr_t", "nr_t", "sr_prev", "nr_prev", "sr_s", "nr_s",
        "c_denoised", "c_noise", "is_last")}
    common = dict(
        noise_key=None, use_cfg=True, active_tcd=False, stochastic=False,
        use_controls=False, use_inpaint=False, decode=False,
    )
    latent0 = rng_lib.stateless_normal((B, H, W, 4), seed).astype(np.float32)
    _, want = sampler.generate(
        unet_params, None, jnp.asarray(latent0, jnp.float32),
        jnp.asarray(context, jnp.float32), jnp.asarray(uncond, jnp.float32),
        jnp.asarray(t_embs, jnp.float32), rows,
        jnp.float32(7.5), jnp.float32(0.0), **common)
    _, got = sampler.generate(
        unet_params, None, None,
        jnp.asarray(context, jnp.float32), jnp.asarray(uncond, jnp.float32),
        jnp.asarray(t_embs, jnp.float32), rows,
        jnp.float32(7.5), jnp.float32(0.0),
        philox_kc=jnp.asarray(rng_lib.philox_key_counter(seed)),
        latent_shape=(B, H, W, 4), latent_dtype="float32", **common)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("tcd,scale,rescale", [
    (False, 7.5, 0.0),
    (False, 7.5, 0.7),
    (False, 0.0, 0.0),
    (True, 2.0, 0.0),
])
def test_scan_matches_host_loop(unet_params, tcd, scale, rescale):
    schedule, t_embs, latent0, context, uncond = _setup(tcd)
    want = _host_loop(unet_params, schedule, t_embs, latent0, context, uncond, scale, rescale)
    got = _run_sampler(unet_params, schedule, t_embs, latent0, context, uncond, scale, rescale)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_scan_matches_host_loop_inpaint(unet_params):
    schedule, t_embs, latent0, context, uncond = _setup(False)
    rng = np.random.RandomState(5)
    init_latent = rng.normal(0, 1, (B, H, W, 4)).astype(np.float32)
    mask = (rng.uniform(0, 1, (B, H, W, 1)) > 0.5).astype(np.float32)
    bnoise = rng.normal(0, 1, (B, H, W, 4)).astype(np.float32)
    inpaint = (init_latent, mask, bnoise)
    want = _host_loop(unet_params, schedule, t_embs, latent0, context, uncond, 7.5, 0.7, inpaint)
    got = _run_sampler(unet_params, schedule, t_embs, latent0, context, uncond, 7.5, 0.7, inpaint)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_unequal_context_lengths(unet_params):
    """LPW long prompts: cond context 154 tokens, uncond 77 — two-call CFG path."""
    schedule, t_embs, latent0, _, uncond = _setup(False, steps=2)
    rng = np.random.RandomState(6)
    context = rng.normal(0, 1, (B, 154, 768)).astype(np.float32)
    want = _host_loop(unet_params, schedule, t_embs, latent0, context, uncond, 7.5, 0.0)
    got = _run_sampler(unet_params, schedule, t_embs, latent0, context, uncond, 7.5, 0.0)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_qkv_projections_equal(unet_params):
    """fuse_attention_projections is numerically identical to the unfused model."""
    fused = unet_lib.fuse_attention_projections(unet_params)
    assert any(k.endswith(".to_qkv") for k in fused)
    rng = np.random.RandomState(2)
    latent = rng.normal(0, 1, (B, H, W, 4)).astype(np.float32)
    t_emb = rng.normal(0, 1, (B, SMALL["widths"][0])).astype(np.float32)
    ctx = rng.normal(0, 1, (B, 77, 768)).astype(np.float32)
    want = np.asarray(jax.jit(unet_lib.apply)(unet_params, latent, t_emb, ctx))
    got = np.asarray(jax.jit(unet_lib.apply)(fused, latent, t_emb, ctx))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_scan_with_controlnet(unet_params):
    """use_controls: HintNet+ControlNet residuals inside the scan equal the explicit
    per-step loop (controlnet called per step, hint computed once — reference
    stable_diffusion.py:439-452)."""
    from minsdtf_tpu.models import controlnet as cn_lib

    cn_params = cn_lib.init_params(jax.random.PRNGKey(3), scale=0.04, **SMALL)
    schedule, t_embs, latent0, context, uncond = _setup(False, steps=2)
    rng = np.random.RandomState(7)
    hint = rng.normal(0, 0.5, (B, H, W, SMALL["widths"][0])).astype(np.float32)

    # explicit loop
    apply = jax.jit(unet_lib.apply)
    cn_apply = jax.jit(cn_lib.apply)
    latent = latent0.copy()
    scale = 4.0
    for i in range(schedule.num_steps):
        t_emb = np.repeat(t_embs[i][None], B, axis=0)
        controls_u = cn_apply(cn_params, latent, t_emb, uncond, hint)
        e_u = np.asarray(apply(unet_params, latent, t_emb, uncond, controls=controls_u), np.float32)
        controls_c = cn_apply(cn_params, latent, t_emb, context, hint)
        e_c = np.asarray(apply(unet_params, latent, t_emb, context, controls=controls_c), np.float32)
        eps = e_u + scale * (e_c - e_u)
        x0 = (latent - schedule.nr_t[i] * eps) / schedule.sr_t[i]
        latent = (x0 if schedule.is_last[i] else
                  schedule.sr_prev[i] * x0 + schedule.nr_prev[i] * eps).astype(np.float32)

    rows = {k: getattr(schedule, k) for k in (
        "sr_t", "nr_t", "sr_prev", "nr_prev", "sr_s", "nr_s",
        "c_denoised", "c_noise", "is_last")}
    _, got = sampler.generate(
        unet_params, None,
        jnp.asarray(latent0), jnp.asarray(context), jnp.asarray(uncond),
        jnp.asarray(t_embs), rows,
        jnp.float32(scale), jnp.float32(0.0),
        controlnet_params=cn_params, hint=jnp.asarray(hint),
        use_cfg=True, active_tcd=False, stochastic=False,
        use_controls=True, use_inpaint=False, decode=False,
    )
    np.testing.assert_allclose(np.asarray(got), latent, rtol=2e-4, atol=2e-4)


def test_scan_matches_host_loop_lcm(unet_params):
    """LCM branch: scan equals an explicit loop that replays the SAME fold_in noise
    stream the device draws (so the stochastic re-noise is compared exactly)."""
    rng = np.random.RandomState(0)
    sched = sched_lib.LCMScheduler()
    schedule = sched_lib.build_denoise_schedule(sched, 3)
    t_embs = sched_lib.timestep_embedding(schedule.timesteps, dim=SMALL["widths"][0])
    latent0 = rng.normal(0, 1, (B, H, W, 4)).astype(np.float32)
    context = rng.normal(0, 1, (B, 77, 768)).astype(np.float32)
    uncond = rng.normal(0, 1, (B, 77, 768)).astype(np.float32)
    key = jax.random.PRNGKey(9)
    scale = 2.0

    apply = jax.jit(unet_lib.apply)
    latent = latent0.copy()
    for i in range(schedule.num_steps):
        t_emb = np.repeat(t_embs[i][None], B, axis=0)
        e_u = np.asarray(apply(unet_params, latent, t_emb, uncond), np.float32)
        e_c = np.asarray(apply(unet_params, latent, t_emb, context), np.float32)
        eps = e_u + scale * (e_c - e_u)
        x0 = (latent - schedule.nr_t[i] * eps) / schedule.sr_t[i]
        d = schedule.c_out[i] * x0 + schedule.c_skip[i] * latent
        if schedule.is_last[i]:
            latent = d.astype(np.float32)
        else:
            z = np.asarray(jax.random.normal(
                jax.random.fold_in(key, np.uint32(i)), latent.shape, jnp.float32))
            latent = (schedule.sr_prev[i] * d + schedule.nr_prev[i] * z).astype(np.float32)

    rows = {k: getattr(schedule, k) for k in (
        "sr_t", "nr_t", "sr_prev", "nr_prev", "sr_s", "nr_s",
        "c_denoised", "c_noise", "c_skip", "c_out", "is_last")}
    _, got = sampler.generate(
        unet_params, None,
        jnp.asarray(latent0), jnp.asarray(context), jnp.asarray(uncond),
        jnp.asarray(t_embs), rows,
        jnp.float32(scale), jnp.float32(0.0),
        noise_key=key,
        use_cfg=True, active_tcd=False, stochastic=False, lcm=True,
        use_controls=False, use_inpaint=False, decode=False,
    )
    np.testing.assert_allclose(np.asarray(got), latent, rtol=2e-4, atol=2e-4)


def test_progress_callback(unet_params):
    """with_progress emits one callback per scan step from inside the jit."""
    schedule, t_embs, latent0, context, uncond = _setup(False, steps=3)
    rows = {k: getattr(schedule, k) for k in (
        "sr_t", "nr_t", "sr_prev", "nr_prev", "sr_s", "nr_s",
        "c_denoised", "c_noise", "is_last")}
    seen = []
    sampler.set_progress_callback(seen.append)
    try:
        _, latent = sampler.generate(
            unet_params, None,
            jnp.asarray(latent0), jnp.asarray(context), jnp.asarray(uncond),
            jnp.asarray(t_embs), rows,
            jnp.float32(7.5), jnp.float32(0.0),
            use_cfg=True, active_tcd=False, stochastic=False,
            use_controls=False, use_inpaint=False, decode=False, with_progress=True,
        )
        jax.block_until_ready(latent)
        jax.effects_barrier()
    finally:
        sampler.set_progress_callback(None)
    assert sorted(seen) == [1, 2, 3]
    assert seen == sorted(seen)  # monotone delivery is part of the contract


def test_progress_monotone_guard():
    """ordered=False debug callbacks may arrive out of order; the user callback
    must only ever see increasing step numbers (high-water mark filter)."""
    seen = []
    sampler.set_progress_callback(seen.append)
    try:
        for idx in (0, 2, 1, 3):  # simulated out-of-order arrival (0-based)
            sampler._emit_progress(idx)
    finally:
        sampler.set_progress_callback(None)
    assert seen == [1, 3, 4]


def test_decode_path(unet_params, vae_params):
    """decode=True returns uint8 images of the right shape and the final latent."""
    schedule, t_embs, latent0, context, uncond = _setup(False, steps=2)
    rows = {k: getattr(schedule, k) for k in (
        "sr_t", "nr_t", "sr_prev", "nr_prev", "sr_s", "nr_s",
        "c_denoised", "c_noise", "is_last")}
    img, latent = sampler.generate(
        unet_params, vae_params,
        jnp.asarray(latent0), jnp.asarray(context), jnp.asarray(uncond),
        jnp.asarray(t_embs), rows,
        jnp.float32(7.5), jnp.float32(0.0),
        use_cfg=True, active_tcd=False, stochastic=False,
        use_controls=False, use_inpaint=False, decode=True,
    )
    assert img.shape == (B, H * 8, W * 8, 3) and img.dtype == jnp.uint8
    assert latent.shape == latent0.shape


def test_scan_matches_host_loop_dpm(unet_params):
    """DPM-Solver++(2M) branch: the scan (which threads x0_prev through the carry)
    equals an explicit host loop over DPMSolverScheduler's row coefficients."""
    rng = np.random.RandomState(0)
    schedule = sched_lib.build_denoise_schedule(sched_lib.DPMSolverScheduler(), 4)
    assert schedule.mode == "dpm"
    t_embs = sched_lib.timestep_embedding(schedule.timesteps, dim=SMALL["widths"][0])
    latent0 = rng.normal(0, 1, (B, H, W, 4)).astype(np.float32)
    context = rng.normal(0, 1, (B, 77, 768)).astype(np.float32)
    uncond = rng.normal(0, 1, (B, 77, 768)).astype(np.float32)
    scale = 2.0

    apply = jax.jit(unet_lib.apply)
    latent = latent0.copy()
    x0_prev = np.zeros_like(latent)
    for i in range(schedule.num_steps):
        t_emb = np.repeat(t_embs[i][None], B, axis=0)
        e_u = np.asarray(apply(unet_params, latent, t_emb, uncond), np.float32)
        e_c = np.asarray(apply(unet_params, latent, t_emb, context), np.float32)
        eps = e_u + scale * (e_c - e_u)
        x0 = (latent - schedule.nr_t[i] * eps) / schedule.sr_t[i]
        d = (1.0 + schedule.w[i]) * x0 - schedule.w[i] * x0_prev
        latent = (schedule.c_x[i] * latent + schedule.c_d[i] * d).astype(np.float32)
        x0_prev = x0

    rows = {k: getattr(schedule, k) for k in (
        "sr_t", "nr_t", "sr_prev", "nr_prev", "sr_s", "nr_s",
        "c_denoised", "c_noise", "c_x", "c_d", "w", "is_last")}
    _, got = sampler.generate(
        unet_params, None,
        jnp.asarray(latent0), jnp.asarray(context), jnp.asarray(uncond),
        jnp.asarray(t_embs), rows,
        jnp.float32(scale), jnp.float32(0.0),
        use_cfg=True, active_tcd=False, stochastic=False, dpm=True,
        use_controls=False, use_inpaint=False, decode=False,
    )
    np.testing.assert_allclose(np.asarray(got), latent, rtol=2e-4, atol=2e-4)


def test_v_prediction_equivalent_to_epsilon(unet_params):
    """v-objective support: if a v-model's output satisfies v = sr*eps - nr*x0 for
    the same underlying (x0, eps) an eps-model would imply, the sampled trajectory
    is IDENTICAL. Simulated by wrapping the small UNet: treat its output as eps,
    emit the corresponding v, and check the v_prediction sampler reproduces the
    eps-prediction sampler exactly (per-step algebraic identity, all modes share
    the converted (x0, eps))."""
    schedule, t_embs, latent0, context, uncond = _setup(False)
    rows = {k: getattr(schedule, k) for k in (
        "sr_t", "nr_t", "sr_prev", "nr_prev", "sr_s", "nr_s",
        "c_denoised", "c_noise", "is_last")}

    # host loop in v-space: per step, convert eps->v, then apply the v-pred update
    apply = jax.jit(unet_lib.apply)
    latent = latent0.copy()
    for i in range(schedule.num_steps):
        t_emb = np.repeat(t_embs[i][None], B, axis=0)
        eps = np.asarray(apply(unet_params, latent, t_emb, context), np.float32)
        sr, nr = schedule.sr_t[i], schedule.nr_t[i]
        x0_imp = (latent - nr * eps) / sr
        v = sr * eps - nr * x0_imp
        # v-pred update (what the sampler computes from v)
        x0 = sr * latent - nr * v
        eps2 = nr * latent + sr * v
        np.testing.assert_allclose(x0, x0_imp, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(eps2, eps, rtol=1e-4, atol=1e-5)
        new = x0 if schedule.is_last[i] else schedule.sr_prev[i] * x0 + schedule.nr_prev[i] * eps2
        latent = new.astype(np.float32)

    # device scan-vs-host for the v branch itself: treat the SAME UNet's raw
    # output as v (any net is a valid v-model for equivalence purposes) and
    # replicate its v-pred trajectory on host
    want = latent0.copy().astype(np.float32)
    for i in range(schedule.num_steps):
        t_emb = np.repeat(t_embs[i][None], B, axis=0)
        v = np.asarray(apply(unet_params, want, t_emb, context), np.float32)
        sr, nr = schedule.sr_t[i], schedule.nr_t[i]
        x0 = sr * want - nr * v
        eps2 = nr * want + sr * v
        new = x0 if schedule.is_last[i] else schedule.sr_prev[i] * x0 + schedule.nr_prev[i] * eps2
        want = new.astype(np.float32)
    _, got = sampler.generate(
        unet_params, None,
        jnp.asarray(latent0), jnp.asarray(context), None,
        jnp.asarray(t_embs), rows,
        jnp.float32(0.0), jnp.float32(0.0),
        use_cfg=False, active_tcd=False, stochastic=False, v_prediction=True,
        use_controls=False, use_inpaint=False, decode=False,
    )
    np.testing.assert_allclose(np.asarray(got, np.float32), want,
                               rtol=2e-4, atol=2e-4)


def test_scan_matches_host_loop_euler_a(unet_params):
    """Euler-Ancestral branch: scan equals an explicit loop replaying the SAME
    fold_in noise stream (ancestral sigma_up noise compared exactly)."""
    rng = np.random.RandomState(12)
    sched = sched_lib.EulerAncestralScheduler()
    schedule = sched_lib.build_denoise_schedule(sched, 4)
    t_embs = sched_lib.timestep_embedding(schedule.timesteps, dim=SMALL["widths"][0])
    latent0 = rng.normal(0, 1, (B, H, W, 4)).astype(np.float32)
    context = rng.normal(0, 1, (B, 77, 768)).astype(np.float32)
    uncond = rng.normal(0, 1, (B, 77, 768)).astype(np.float32)
    key = jax.random.PRNGKey(4)
    scale = 2.0

    apply = jax.jit(unet_lib.apply)
    latent = latent0.copy()
    for i in range(schedule.num_steps):
        t_emb = np.repeat(t_embs[i][None], B, axis=0)
        e_u = np.asarray(apply(unet_params, latent, t_emb, uncond), np.float32)
        e_c = np.asarray(apply(unet_params, latent, t_emb, context), np.float32)
        eps = e_u + scale * (e_c - e_u)
        x0 = (latent - schedule.nr_t[i] * eps) / schedule.sr_t[i]
        if schedule.is_last[i]:
            latent = x0.astype(np.float32)
        else:
            z = np.asarray(jax.random.normal(
                jax.random.fold_in(key, np.uint32(i)), latent.shape, jnp.float32))
            latent = (schedule.c_x[i] * latent + schedule.c_d[i] * eps
                      + schedule.c_noise[i] * z).astype(np.float32)

    rows = {k: getattr(schedule, k) for k in (
        "sr_t", "nr_t", "sr_prev", "nr_prev", "sr_s", "nr_s",
        "c_denoised", "c_noise", "c_x", "c_d", "is_last")}
    _, got = sampler.generate(
        unet_params, None,
        jnp.asarray(latent0), jnp.asarray(context), jnp.asarray(uncond),
        jnp.asarray(t_embs), rows,
        jnp.float32(scale), jnp.float32(0.0),
        noise_key=key,
        use_cfg=True, active_tcd=False, stochastic=False, euler_a=True,
        use_controls=False, use_inpaint=False, decode=False,
    )
    np.testing.assert_allclose(np.asarray(got), latent, rtol=2e-4, atol=2e-4)


def test_trace_latents_trajectory(unet_params, vae_params):
    """trace_latents stacks every post-step latent: shape (n, B, h, w, 4) fp32,
    each prefix equal to a shorter-scan run of the SAME schedule rows, and the
    last row equal to the returned final latent. This is the measurement hook
    for the prefix-divergence quality dossier (experiments/quality_dossier.py)."""
    schedule, t_embs, latent0, context, uncond = _setup(False, steps=3)
    rows = {k: getattr(schedule, k) for k in (
        "sr_t", "nr_t", "sr_prev", "nr_prev", "sr_s", "nr_s",
        "c_denoised", "c_noise", "is_last")}
    common = dict(
        noise_key=None, use_cfg=True, active_tcd=False, stochastic=False,
        use_controls=False, use_inpaint=False,
    )
    img, latent, traj = sampler.generate(
        unet_params, vae_params, jnp.asarray(latent0, jnp.float32),
        jnp.asarray(context, jnp.float32), jnp.asarray(uncond, jnp.float32),
        jnp.asarray(t_embs, jnp.float32), rows,
        jnp.float32(7.5), jnp.float32(0.3), trace_latents=True, **common)
    traj = np.asarray(traj, np.float32)
    assert traj.shape == (3, B, H, W, 4)
    assert img.shape[1:] == (H * 8, W * 8, 3)
    np.testing.assert_array_equal(traj[-1], np.asarray(latent, np.float32))
    # prefix check: a 1-step scan over the first schedule row reproduces traj[0]
    rows1 = {k: v[:1] for k, v in rows.items()}
    _, lat1 = sampler.generate(
        unet_params, None, jnp.asarray(latent0, jnp.float32),
        jnp.asarray(context, jnp.float32), jnp.asarray(uncond, jnp.float32),
        jnp.asarray(t_embs[:1], jnp.float32), rows1,
        jnp.float32(7.5), jnp.float32(0.3), decode=False, **common)
    np.testing.assert_allclose(traj[0], np.asarray(lat1, np.float32),
                               rtol=1e-5, atol=1e-5)
