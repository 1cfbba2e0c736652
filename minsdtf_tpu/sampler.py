"""The denoising loop as ONE jitted program (lax.scan) — the heart of the redesign.

The reference dispatches >=50 separate ``predict_on_batch`` calls per 25-step CFG
generation with host-side numpy between every one (CFG combine, rescale, scheduler
step, inpaint blend — ``stable_diffusion/stable_diffusion.py:442-479``). Here the
entire VAE-encode -> denoise -> VAE-decode program is traced once:

  - per-step scheduler coefficients and timestep embeddings are precomputed host-side
    (:mod:`minsdtf_tpu.scheduler`) and consumed as ``lax.scan`` inputs;
  - the CFG cond/uncond pair is batched into a single UNet call (batch 2B), replacing
    the reference's two sequential calls (:454-457);
  - CFG combine + rescale (arXiv:2305.08891 §3.4, reference :304-315), the
    DDIM-like/TCD update, the inpaint latent blend (:469-475) and the final decode +
    pixel blend (:482-486) all live inside the same jit — zero host round-trips.

Static flags (``use_cfg``/``active_tcd``/``stochastic``/``use_controls``/
``use_inpaint``) select the traced structure; guidance scale/rescale are traced
scalars so changing them does NOT recompile.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from minsdtf_tpu import rng as rng_lib
from minsdtf_tpu.models import controlnet as controlnet_lib
from minsdtf_tpu.models import unet as unet_lib
from minsdtf_tpu.models import vae as vae_lib


# Progress reporting from inside the jitted scan (reference drives a Progbar +
# user callback per step on the host, stable_diffusion.py:424,477-479). The callback
# is host state, not a traced value: pipeline registers it here and the scan body
# emits step indices through jax.debug.callback when `with_progress` is set.
_progress_callback = None
_progress_high = 0  # high-water mark: ordered=False callbacks may arrive out of
# order; the user callback only ever sees monotonically increasing steps (the
# ordered=True alternative threads a token through the scan and serializes
# dispatch — not worth it for a progress bar).


def set_progress_callback(fn) -> None:
    global _progress_callback, _progress_high
    _progress_callback = fn
    _progress_high = 0


def _emit_progress(idx) -> None:
    global _progress_high
    step = int(idx) + 1
    if _progress_callback is not None and step > _progress_high:
        _progress_high = step
        _progress_callback(step)


def rescale_noise_cfg(noise_cfg, noise_pred_text, guidance_rescale, epsilon=1e-5):
    """Std-matching CFG rescale (reference ``stable_diffusion.py:304-315``).

    With ``guidance_rescale == 0`` this is the identity, so it is applied
    unconditionally and the knob stays a traced scalar."""
    axes = tuple(range(1, noise_cfg.ndim))
    std_text = jnp.std(noise_pred_text.astype(jnp.float32), axis=axes, keepdims=True)
    std_cfg = jnp.std(noise_cfg.astype(jnp.float32), axis=axes, keepdims=True) + epsilon
    rescaled = noise_cfg * (std_text / std_cfg).astype(noise_cfg.dtype)
    return guidance_rescale * rescaled + (1.0 - guidance_rescale) * noise_cfg


# MINSDTF_XLA_OPTS: comma-separated per-compile XLA option overrides for the
# sampler program ("key=value,key=value"; set empty to clear the default),
# forwarded through jit's compiler_options — the axon terminal overrides the
# XLA_FLAGS/LIBTPU_INIT_ARGS env vars server-side, so proto-backed per-compile
# options are the ONLY channel for XLA knobs on this platform (r5).
# Default: 32 MB scoped VMEM. The r5 on-chip sweep at 512px b1 measured
# 0.4623 s/img at 32768 KiB vs 0.4698 at the 16 MB default (bigger conv-fusion
# tiles) and 0.4933 at 65536 (overshoot); batch-8 (0.4073 vs 0.402-0.409
# jitter band) and 1024px (3.662 vs 3.656) are neutral.
_XLA_OPTS = {
    kv.split("=", 1)[0]: kv.split("=", 1)[1]
    for kv in os.environ.get(
        "MINSDTF_XLA_OPTS", "xla_tpu_scoped_vmem_limit_kib=32768"
    ).split(",") if "=" in kv
}

_JIT_KW = dict(
    static_argnames=(
        "use_cfg", "active_tcd", "stochastic", "use_controls", "use_inpaint", "decode",
        "with_progress", "lcm", "dpm", "euler_a", "v_prediction", "sp", "latent_shape",
        "latent_dtype", "trace_latents",
    ),
    donate_argnames=("latent0",),
)
_GENERATE_JIT = None


def generate_jit():
    """The jitted sampler, built lazily on first use: the TPU-only compiler
    options must not reach XLA:CPU (unknown-flag error in the CPU test tier),
    and probing the backend at import time would initialize the device — a
    hang when the tunnel is down. By the first sampler call the caller has
    already materialized weights, so the backend query is free. (AOT users:
    ``generate_jit().lower(...)`` — tests/test_full_width_lowering.py.)"""
    global _GENERATE_JIT
    if _GENERATE_JIT is None:
        opts = _XLA_OPTS if (_XLA_OPTS and jax.devices()[0].platform == "tpu") else None
        _GENERATE_JIT = jax.jit(_generate, compiler_options=opts, **_JIT_KW)
    return _GENERATE_JIT


def generate(*args, **kwargs):
    return generate_jit()(*args, **kwargs)


def _generate(
    unet_params,
    decoder_params,
    latent0: Optional[jax.Array],  # (B, h, w, 4) initial (noised) latent, or None
                                   # when philox_kc drives in-jit noise generation
    context: jax.Array,            # (B, S, 768) conditional text context
    uncond_context: Optional[jax.Array],   # (B, S, 768) when use_cfg
    t_embs: jax.Array,             # (n, 320) host-precomputed timestep embeddings
    rows: dict,                    # per-step scheduler coefficient arrays, each (n,)
    guidance_scale: jax.Array,     # traced scalar
    guidance_rescale: jax.Array,   # traced scalar
    noise_key: Optional[jax.Array] = None,        # PRNG key for TCD stochastic noise
    philox_kc: Optional[jax.Array] = None,        # uint32[4] (rng.philox_key_counter)
    controlnet_params=None,
    hint: Optional[jax.Array] = None,             # (B, h, w, 320) HintNet output
    init_latent: Optional[jax.Array] = None,      # (B, h, w, 4) for inpaint re-noise
    latent_mask: Optional[jax.Array] = None,      # (B, h, w, 1) 1 = generate
    blend_noise: Optional[jax.Array] = None,      # (B, h, w, 4), fixed across steps
    image_for_blend: Optional[jax.Array] = None,  # (B, H, W, 3) in [0, 1]
    pixel_mask: Optional[jax.Array] = None,       # (B, H, W, 1)
    *,
    use_cfg: bool,
    active_tcd: bool,
    stochastic: bool,
    use_controls: bool,
    use_inpaint: bool,
    decode: bool = True,
    with_progress: bool = False,
    lcm: bool = False,
    dpm: bool = False,
    euler_a: bool = False,
    # v-objective checkpoints (arXiv:2202.00512 §2.4: v = alpha*eps - sigma*x0):
    # the model output is converted to (x0, eps) once per step; every scheduler
    # branch below is objective-agnostic after that.
    v_prediction: bool = False,
    # identity of the process-global sequence-parallel config
    # (ops.attention.sequence_parallel_key()). Not read in the body — it exists so
    # traces with different SP settings cannot collide in the jit cache.
    sp=None,
    # in-jit initial noise (pure txt2img): shape/dtype of the latent to draw with
    # the TF-Philox stream seeded by philox_kc. Replaces the 65 KB latent0 H2D
    # (~27 ms fixed tunnel latency per transfer, experiments/tunnel_xfer.py) with
    # a 16-byte key — same bits as rng.stateless_normal, same seed semantics.
    latent_shape=None,
    latent_dtype=None,
    # Observability: stack the post-step latent of every scan iteration as an
    # (n_steps, B, h, w, 4) fp32 output — the measurement hook for the prefix-
    # divergence quality dossier (experiments/quality_dossier.py) and for
    # step-by-step debugging. The reference exposes per-step latents implicitly
    # (its loop lives on the host, stable_diffusion.py:442-479); here they must
    # be captured from inside the jit.
    trace_latents: bool = False,
):
    """Run the full denoise(+decode) program. Returns ``(image_uint8, latent)`` when
    ``decode`` else ``(None, latent)``; with ``trace_latents`` a third element holds
    the full per-step latent trajectory."""
    if latent0 is None:
        compute_dtype = jnp.dtype(latent_dtype)
        latent0 = rng_lib.device_stateless_normal(philox_kc, latent_shape).astype(compute_dtype)
    else:
        compute_dtype = latent0.dtype
    n_steps = t_embs.shape[0]
    batch = latent0.shape[0]

    # Contexts may arrive with a leading dim of 1 and are broadcast to the latent
    # batch INSIDE the jit — the pipeline transfers only the (1, S, 768) array and
    # the broadcast fuses for free on device (saves (B-1) x 236 KB of tunnel H2D
    # per call plus the host-side np.repeat).
    def _to_batch(c):
        if c.shape[0] == 1 and batch > 1:
            return jnp.broadcast_to(c, (batch,) + c.shape[1:])
        return c

    # The CFG pair is batched into one UNet call when cond/uncond context lengths
    # match (the common case). LPW can legitimately produce different lengths
    # (77 vs 154/231/308) — then fall back to two sequential calls, still inside the
    # same jit (the reference always does two calls, :454-457).
    cfg_batched = use_cfg and uncond_context.shape[1] == context.shape[1]
    context = _to_batch(context.astype(compute_dtype))
    if use_cfg:
        uncond_context = _to_batch(uncond_context.astype(compute_dtype))
    if init_latent is not None:
        init_latent = _to_batch(init_latent)
    if use_controls:
        hint = hint.astype(compute_dtype)
    if cfg_batched:
        ctx_pair = jnp.concatenate([uncond_context, context], axis=0)
        hint_pair = jnp.concatenate([hint, hint], axis=0) if use_controls else None
    else:
        ctx_pair = context
        hint_pair = hint

    xs = {
        "t_emb": t_embs.astype(compute_dtype),
        "idx": jnp.arange(n_steps, dtype=jnp.uint32),
        **{k: jnp.asarray(v, jnp.float32) for k, v in rows.items()},
    }

    def one_pass(latent, t_emb, ctx, hint_in):
        controls = None
        if use_controls:
            controls = controlnet_lib.apply(controlnet_params, latent, t_emb, ctx, hint_in)
        return unet_lib.apply(unet_params, latent, t_emb, ctx, controls=controls)

    def unet_eps(latent, t_emb_row):
        t_emb1 = jnp.broadcast_to(t_emb_row[None, :], (batch, t_emb_row.shape[0]))
        if not use_cfg:
            return one_pass(latent, t_emb1, ctx_pair, hint_pair)
        if cfg_batched:
            lat_in = jnp.concatenate([latent, latent], axis=0)
            t_emb2 = jnp.broadcast_to(t_emb_row[None, :], (2 * batch, t_emb_row.shape[0]))
            eps = one_pass(lat_in, t_emb2, ctx_pair, hint_pair)
            uncond, cond = jnp.split(eps, 2, axis=0)
        else:
            uncond = one_pass(latent, t_emb1, uncond_context, hint)
            cond = one_pass(latent, t_emb1, context, hint)
        # reference :458: uncond + scale * (cond - uncond); then rescale :459-461
        merged = uncond + guidance_scale.astype(uncond.dtype) * (cond - uncond)
        return rescale_noise_cfg(merged, cond, guidance_rescale.astype(uncond.dtype))

    def body(carry, step):
        latent = carry[0] if dpm else carry
        out = unet_eps(latent, step["t_emb"]).astype(jnp.float32)
        lat32 = latent.astype(jnp.float32)
        if v_prediction:
            # v = sr*eps - nr*x0  =>  x0 = sr*x - nr*v ; eps = nr*x + sr*v
            # (CFG combine/rescale above acts on raw v, the standard practice)
            x0 = step["sr_t"] * lat32 - step["nr_t"] * out
            eps = step["nr_t"] * lat32 + step["sr_t"] * out
        else:
            eps = out
            x0 = (lat32 - step["nr_t"] * eps) / step["sr_t"]
        if dpm:
            # DPM-Solver++(2M) multistep update (scheduler.DPMSolverScheduler):
            # the carry threads the previous step's x0 prediction; w = 0 on the
            # first step (no history) and the final step (lower-order-final).
            x0_prev = carry[1]
            d = (1.0 + step["w"]) * x0 - step["w"] * x0_prev
            new = step["c_x"] * lat32 + step["c_d"] * d
        elif lcm:
            # LCM consistency update (scheduler.LCMScheduler.step): boundary-scaled
            # denoise, then full re-noise to prev_t with fresh z (except last step).
            denoised = step["c_out"] * x0 + step["c_skip"] * lat32
            z = jax.random.normal(
                jax.random.fold_in(noise_key, step["idx"]), lat32.shape, jnp.float32
            )
            renoised = step["sr_prev"] * denoised + step["nr_prev"] * z
            new = jnp.where(step["is_last"] > 0, denoised, renoised)
        elif euler_a:
            # Euler-Ancestral (scheduler.EulerAncestralScheduler): deterministic
            # part c_x*x + c_d*eps plus the ancestral sigma_up noise; final step
            # returns pred_x0.
            z = jax.random.normal(
                jax.random.fold_in(noise_key, step["idx"]), lat32.shape, jnp.float32
            )
            stepped = step["c_x"] * lat32 + step["c_d"] * eps + step["c_noise"] * z
            new = jnp.where(step["is_last"] > 0, x0, stepped)
        elif active_tcd:
            denoised = step["sr_s"] * x0 + step["nr_s"] * eps
            if stochastic:
                z = jax.random.normal(
                    jax.random.fold_in(noise_key, step["idx"]), lat32.shape, jnp.float32
                )
                renoised = step["c_denoised"] * denoised + step["c_noise"] * z
                new = jnp.where(step["is_last"] > 0, denoised, renoised)
            else:
                new = denoised
        else:
            ddim = step["sr_prev"] * x0 + step["nr_prev"] * eps
            new = jnp.where(step["is_last"] > 0, x0, ddim)
        if use_inpaint:
            # Per-step re-noise of the init latent at the *current* t with the same
            # fixed noise tensor every step (reference :469-475 quirk, preserved).
            origin = step["sr_t"] * init_latent.astype(jnp.float32) + step["nr_t"] * blend_noise.astype(jnp.float32)
            m = latent_mask.astype(jnp.float32)
            new = origin * (1.0 - m) + new * m
        if with_progress:
            jax.debug.callback(_emit_progress, step["idx"], ordered=False)
        new = new.astype(compute_dtype)
        ys = new.astype(jnp.float32) if trace_latents else None
        return ((new, x0) if dpm else new), ys

    unroll = int(os.environ.get("MINSDTF_SCAN_UNROLL", "1"))
    carry0 = (latent0, jnp.zeros(latent0.shape, jnp.float32)) if dpm else latent0
    carry, trajectory = jax.lax.scan(body, carry0, xs, unroll=unroll)
    latent = carry[0] if dpm else carry

    if not decode:
        return (None, latent, trajectory) if trace_latents else (None, latent)

    decoded = vae_lib.decode(decoder_params, latent).astype(jnp.float32)
    image = (decoded + 1.0) * 0.5
    if use_inpaint and image_for_blend is not None:
        pm = pixel_mask.astype(jnp.float32)
        image = image_for_blend.astype(jnp.float32) * (1.0 - pm) + image * pm
    image_u8 = jnp.clip(image * 255.0, 0.0, 255.0).astype(jnp.uint8)
    return (image_u8, latent, trajectory) if trace_latents else (image_u8, latent)
