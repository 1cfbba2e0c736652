"""Fast numerical-drift guard: fixed weights + fixed noise -> golden latent.

The oracle suite (vs the Keras reference) is the source of truth but takes ~30 min;
this test pins today's verified numerics into a checked-in golden array so future
refactors get an instant signal. Regenerate (only after re-validating against the
oracle tests!) with:  REGEN_GOLDEN=1 python -m pytest tests/test_golden_regression.py
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from minsdtf_tpu import sampler
from minsdtf_tpu import scheduler as sched_lib
from minsdtf_tpu.models import unet as unet_lib

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "sampler_latent.npz")
SMALL = dict(widths=(32, 64, 128, 128), temb_dim=128)


def _compute():
    params = unet_lib.init_params(jax.random.PRNGKey(0), dtype=jnp.float32, scale=0.04, **SMALL)
    params = unet_lib.fuse_attention_projections(params)
    sched = sched_lib.Scheduler(active_tcd=False)
    schedule = sched_lib.build_denoise_schedule(sched, 3)
    t_embs = sched_lib.timestep_embedding(schedule.timesteps, dim=32)
    rows = {k: getattr(schedule, k) for k in (
        "sr_t", "nr_t", "sr_prev", "nr_prev", "sr_s", "nr_s",
        "c_denoised", "c_noise", "is_last")}
    rng = np.random.RandomState(42)
    latent0 = rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32)
    ctx = rng.normal(0, 1, (1, 77, 768)).astype(np.float32)
    unc = rng.normal(0, 1, (1, 77, 768)).astype(np.float32)
    _, latent = sampler.generate(
        params, None, jnp.asarray(latent0), jnp.asarray(ctx), jnp.asarray(unc),
        jnp.asarray(t_embs), rows, jnp.float32(7.5), jnp.float32(0.7),
        use_cfg=True, active_tcd=False, stochastic=False,
        use_controls=False, use_inpaint=False, decode=False,
    )
    return np.asarray(latent, np.float32)


def test_golden_latent():
    latent = _compute()
    if os.environ.get("REGEN_GOLDEN") == "1" or not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        np.savez(GOLDEN_PATH, latent=latent)
        print(f"golden regenerated at {GOLDEN_PATH}")
    golden = np.load(GOLDEN_PATH)["latent"]
    np.testing.assert_allclose(latent, golden, rtol=5e-5, atol=5e-5)


DPM_GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "golden", "sampler_latent_dpm.npz")


def test_golden_latent_dpm():
    """Same drift guard for the DPM-Solver++(2M) scan branch (x0-history carry)."""
    params = unet_lib.init_params(jax.random.PRNGKey(0), dtype=jnp.float32, scale=0.04, **SMALL)
    params = unet_lib.fuse_attention_projections(params)
    schedule = sched_lib.build_denoise_schedule(sched_lib.DPMSolverScheduler(), 4)
    t_embs = sched_lib.timestep_embedding(schedule.timesteps, dim=32)
    rows = {k: getattr(schedule, k) for k in (
        "sr_t", "nr_t", "sr_prev", "nr_prev", "sr_s", "nr_s",
        "c_denoised", "c_noise", "c_x", "c_d", "w", "is_last")}
    rng = np.random.RandomState(42)
    latent0 = rng.normal(0, 1, (1, 8, 8, 4)).astype(np.float32)
    ctx = rng.normal(0, 1, (1, 77, 768)).astype(np.float32)
    unc = rng.normal(0, 1, (1, 77, 768)).astype(np.float32)
    _, latent = sampler.generate(
        params, None, jnp.asarray(latent0), jnp.asarray(ctx), jnp.asarray(unc),
        jnp.asarray(t_embs), rows, jnp.float32(7.5), jnp.float32(0.7),
        use_cfg=True, active_tcd=False, stochastic=False, dpm=True,
        use_controls=False, use_inpaint=False, decode=False,
    )
    latent = np.asarray(latent, np.float32)
    if os.environ.get("REGEN_GOLDEN") == "1" or not os.path.exists(DPM_GOLDEN_PATH):
        os.makedirs(os.path.dirname(DPM_GOLDEN_PATH), exist_ok=True)
        np.savez(DPM_GOLDEN_PATH, latent=latent)
        print(f"golden regenerated at {DPM_GOLDEN_PATH}")
    golden = np.load(DPM_GOLDEN_PATH)["latent"]
    np.testing.assert_allclose(latent, golden, rtol=5e-5, atol=5e-5)
