"""Static activation-scale calibration for the W8A8 int8 path (PTQ).

Dynamic activation quantization (ops/basic._quantize_acts) recomputes the amax of
every conv/dense input at every step — a global reduce that cannot fuse with its
producer. The r3 int8 e2e trace attributes ~54 ms/generation to those reduces
(`convert_reduce_fusion`) plus ~14 ms to the quantize round pass. Calibration
replaces them with baked per-site scales: run the real denoising trajectory once
with dynamic quantization, record each site's worst-case activation amax, and
store ``act_scale = margin * amax / 127`` in the module dict. Quantization then
becomes a single clipped round that fuses into the producing op.

Mechanics (no framework hooks needed — the params are a flat name->module dict):
  1. NAME pass: ``jax.eval_shape`` over a closure that captures the params dict —
     inside the abstract trace each ``params[name]`` lookup yields the ORIGINAL
     module dict object, so ``id(module) -> name`` resolves sites in call order.
     No FLOPs are executed.
  2. VALUE pass: a jitted instrumented step returns the per-site amax scalars
     (appended to a tape during tracing) alongside the epsilon output; the host
     drives the same CFG+DDIM trajectory the sampler runs and folds per-step
     maxima. Call order is deterministic, so names[i] <-> values[i].

No reference analog (the reference is fp32 Keras throughout); this is standard
post-training quantization machinery redesigned for the flat-pytree/jit layout.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from minsdtf_tpu.ops import basic


def _site_names(params: dict, run_abstract) -> list:
    """Record quantized-site module names in call order via an eval_shape pass."""
    tape = {"names": [], "id_to_name": {id(v): k for k, v in params.items()}}
    basic.set_calibration_tape(tape)
    try:
        run_abstract()
    finally:
        basic.set_calibration_tape(None)
    names = tape["names"]
    if any(n is None for n in names):
        raise RuntimeError(
            "calibration name pass lost module identity (params were copied "
            "between the flat dict and the op call)"
        )
    return names


def collect_unet_amax(
    params: dict,
    latent0: np.ndarray,          # (B, h, w, 4) initial noise latent
    context: np.ndarray,          # (B, S, 768)
    uncond_context: np.ndarray,   # (B, S, 768)
    t_embs: np.ndarray,           # (n, 320)
    rows: dict,                   # host DenoiseSchedule coefficient rows, each (n,)
    guidance_scale: float = 7.5,
    guidance_rescale: float = 0.7,
) -> Dict[str, dict]:
    """Run the CFG+DDIM txt2img trajectory (mirrors sampler.generate's body, which
    mirrors reference ``stable_diffusion.py:442-479``) with dynamic int8 quant and
    return per-site stats: ``{"amax": max over steps, "ratio": max/min}`` — the
    ratio is the across-step stability that gates baking (bake_act_scales)."""
    from minsdtf_tpu.models import unet as unet_lib

    b = latent0.shape[0]
    ctx_pair = jnp.concatenate(
        [jnp.asarray(uncond_context, jnp.float32), jnp.asarray(context, jnp.float32)],
        axis=0,
    ).astype(latent0.dtype)

    names = _site_names(
        params,
        lambda: jax.eval_shape(
            lambda lat, te, ctx: unet_lib.apply(params, lat, te, ctx),
            jax.ShapeDtypeStruct((2 * b,) + latent0.shape[1:], latent0.dtype),
            jax.ShapeDtypeStruct((2 * b, t_embs.shape[1]), latent0.dtype),
            jax.ShapeDtypeStruct(ctx_pair.shape, ctx_pair.dtype),
        ),
    )

    @jax.jit
    def step(p, lat, te, ctx):
        tape = {"values": []}
        basic.set_calibration_tape(tape)
        try:
            eps = unet_lib.apply(p, lat, te, ctx)
        finally:
            basic.set_calibration_tape(None)
        vals = tape["values"]
        # pack into 3 flat arrays: every device->host fetch through the axon
        # tunnel pays ~27 ms fixed RTT, so ~4 transfers/step instead of ~360
        scalars = jnp.stack(
            [v["amax"] for v in vals] + [v.get("out_msq", 0.0) for v in vals])
        chcat = jnp.concatenate(
            [v[k] for v in vals for k in ("ch_amax", "ch_mean", "ch_msq")])
        return eps, scalars, chcat

    # per-site input-channel counts (to split the packed ch stats): conv kernels
    # are HWIO (in = axis 2), dense (in, out)
    def _cin(name):
        k = params[name].get("kernel_q", params[name].get("kernel"))
        return int(k.shape[2] if k.ndim == 4 else k.shape[0])

    sizes = [_cin(n) for n in names]
    offsets = np.cumsum([0] + [3 * s for s in sizes])

    latent = np.asarray(latent0, np.float32)
    acc: Optional[list] = None  # per-site running stats across steps
    n_steps = t_embs.shape[0]
    for i in range(n_steps):
        lat_in = jnp.asarray(np.concatenate([latent, latent], axis=0), latent0.dtype)
        te = jnp.broadcast_to(
            jnp.asarray(t_embs[i], latent0.dtype)[None, :], (2 * b, t_embs.shape[1])
        )
        eps_pair, scalars, chcat = step(params, lat_in, te, ctx_pair)
        scalars = np.array(scalars, np.float32)
        chcat = np.array(chcat, np.float32)
        n = len(names)
        vals = []
        for j in range(n):
            s = sizes[j]
            block = chcat[offsets[j]:offsets[j + 1]]
            vals.append({
                "amax": float(scalars[j]),
                "out_msq": float(scalars[n + j]),
                "ch_amax": block[:s].copy(),
                "ch_mean": block[s:2 * s].copy(),
                "ch_msq": block[2 * s:].copy(),
            })
        if acc is None:
            acc = [dict(v, amin=v["amax"]) for v in vals]
        else:
            for cur, v in zip(acc, vals):
                cur["amax"] = max(cur["amax"], v["amax"])
                cur["amin"] = min(cur["amin"], v["amax"])
                np.maximum(cur["ch_amax"], v["ch_amax"], out=cur["ch_amax"])
                cur["ch_mean"] += v["ch_mean"]
                cur["ch_msq"] += v["ch_msq"]
                cur["out_msq"] += v["out_msq"]
        eps_pair = np.asarray(eps_pair, np.float32)
        uncond_eps, cond_eps = eps_pair[:b], eps_pair[b:]
        eps = uncond_eps + guidance_scale * (cond_eps - uncond_eps)
        if guidance_rescale > 0:
            std_t = np.std(cond_eps, axis=(1, 2, 3), keepdims=True)
            std_c = np.std(eps, axis=(1, 2, 3), keepdims=True) + 1e-5
            eps = guidance_rescale * (eps * std_t / std_c) + (1 - guidance_rescale) * eps
        x0 = (latent - rows["nr_t"][i] * eps) / rows["sr_t"][i]
        if rows["is_last"][i]:
            latent = x0.astype(np.float32)
        else:
            latent = (rows["sr_prev"][i] * x0 + rows["nr_prev"][i] * eps).astype(np.float32)

    out: Dict[str, dict] = {}
    for name, site in zip(names, acc):
        cur = out.get(name)
        if cur is None:
            out[name] = {
                "amax": site["amax"],
                "amin": site["amin"],
                "ch_amax": site["ch_amax"].copy(),
                "ch_mean": site["ch_mean"] / n_steps,
                "ch_msq": site["ch_msq"] / n_steps,
                "out_msq": site["out_msq"] / n_steps,
            }
        else:
            # a module called more than once in the trace (none today, but the
            # tape is call-ordered, not name-keyed): fold conservatively
            cur["amax"] = max(cur["amax"], site["amax"])
            cur["amin"] = min(cur["amin"], site["amin"])
            np.maximum(cur["ch_amax"], site["ch_amax"], out=cur["ch_amax"])
            cur["ch_mean"] = (cur["ch_mean"] + site["ch_mean"] / n_steps) / 2.0
            cur["ch_msq"] = (cur["ch_msq"] + site["ch_msq"] / n_steps) / 2.0
            cur["out_msq"] = (cur["out_msq"] + site["out_msq"] / n_steps) / 2.0
    for cur in out.values():
        cur["ratio"] = cur["amax"] / max(cur.pop("amin"), 1e-9)
    return out


def bake_act_scales(
    params: dict,
    amax_by_name: Dict[str, object],
    margin: float = 1.05,
    include_dense: bool = False,
    stability_threshold: float = 1.5,
) -> dict:
    """Return params with ``act_scale`` baked into every calibrated module.

    ``margin`` > 1 leaves headroom above the observed trajectory maxima before
    clipping kicks in on unseen prompts. Static scales apply to CONV sites by
    default: their inputs are GroupNorm+SiLU outputs, so the per-image amax
    barely moves across steps and one static scale loses almost nothing. Dense
    sites keep per-token dynamic scales unless ``include_dense=True`` — replacing
    the per-token grid with one global scale measured ~16% relative error on a
    small-UNet probe (tests/test_quantize.py), and the dense amax is a cheap
    row-reduce anyway.

    Sites whose calibration amax swings more than ``stability_threshold`` across
    steps also stay dynamic: those are the conv_shortcut / downsampler convs fed
    by the UN-normalized residual stream (measured 4-6x swings vs a 1.13 median
    for GN+SiLU-fed convs) — a worst-case static scale would quantize their
    early-step activations 4-6x too coarsely. ``amax_by_name`` accepts plain
    floats (no ratio -> always baked, subject to include_dense) for
    backward-compatible scale files."""
    out = {}
    for name, leaves in params.items():
        stats = amax_by_name.get(name)
        if stats is None or "kernel_q" not in leaves:
            out[name] = leaves
            continue
        if isinstance(stats, dict):
            amax, ratio = stats["amax"], stats.get("ratio", 1.0)
        else:
            amax, ratio = float(stats), 1.0
        if not include_dense and np.asarray(leaves["kernel_q"]).ndim == 2:
            out[name] = leaves
            continue
        if ratio > stability_threshold:
            out[name] = leaves
            continue
        new = dict(leaves)
        new["act_scale"] = np.float32(max(amax, 1e-12) * margin / 127.0)
        out[name] = new
    return out


def merge_stats(into: Dict[str, dict], new: Dict[str, dict]) -> None:
    """Fold a second calibration run (another seed/prompt) into ``into`` in
    place: worst-case maxima, union stability ratio, averaged moments."""
    for k, v in new.items():
        cur = into.get(k)
        if cur is None:
            into[k] = dict(v)
            continue
        amin = min(cur["amax"] / cur.get("ratio", 1.0),
                   v["amax"] / v.get("ratio", 1.0))
        cur["amax"] = max(cur["amax"], v["amax"])
        cur["ratio"] = cur["amax"] / max(amin, 1e-9)
        if "ch_amax" in cur and "ch_amax" in v:
            cur["ch_amax"] = np.maximum(cur["ch_amax"], v["ch_amax"])
            cur["ch_mean"] = (cur["ch_mean"] + v["ch_mean"]) / 2.0
            cur["ch_msq"] = (cur["ch_msq"] + v["ch_msq"]) / 2.0
            cur["out_msq"] = (cur.get("out_msq", 0.0) + v.get("out_msq", 0.0)) / 2.0


def save_scales(path: str, amax_by_name: Dict[str, dict]) -> None:
    """npz: one float32[2] = (amax, ratio) per site (plain floats saved as
    ratio 1); sites with per-channel stats add ``{name}::ch`` — a float32
    (3, C) array of rows (ch_amax, ch_mean, ch_msq) — and ``{name}::out_msq``."""
    arrs = {}
    for k, v in amax_by_name.items():
        if isinstance(v, dict):
            arrs[k] = np.asarray([v["amax"], v.get("ratio", 1.0)], np.float32)
            if "ch_amax" in v:
                arrs[k + "::ch"] = np.stack(
                    [v["ch_amax"], v["ch_mean"], v["ch_msq"]]).astype(np.float32)
                arrs[k + "::out_msq"] = np.float32(v.get("out_msq", 0.0))
        else:
            arrs[k] = np.asarray([float(v), 1.0], np.float32)
    np.savez(path, **arrs)


def load_scales(path: str) -> Dict[str, dict]:
    with np.load(path) as z:
        out = {}
        for k in z.files:
            if "::" in k:
                continue
            a = np.atleast_1d(z[k]).astype(np.float32)
            out[k] = {"amax": float(a[0]),
                      "ratio": float(a[1]) if a.size > 1 else 1.0}
            if k + "::ch" in z.files:
                ch = z[k + "::ch"].astype(np.float32)
                out[k]["ch_amax"], out[k]["ch_mean"], out[k]["ch_msq"] = ch
                out[k]["out_msq"] = float(z[k + "::out_msq"])
        return out
