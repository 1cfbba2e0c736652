"""Post-training int8 weight quantization (W8A8) for conv/dense kernels.

Why: r2 profiling (ROADMAP) showed the UNet's convs and dense matmuls running AT
the measured-achievable bf16 MXU ceiling (~138-167 TF/s) — the remaining headroom
on this workload is arithmetic, not scheduling. The TPU MXU's int8 path doubles
peak throughput; quantizing the conv/dense weights to int8 with per-output-channel
scales and dynamically quantizing activations (per-token for dense, per-image for
conv — the scale must be constant over every axis the contraction sums) keeps the
matmuls on the 2x ceiling while the fp32 rescale fuses into the epilogue.

This has no reference analog (the reference computes fp32 Keras throughout,
``stable_diffusion.py:442-479``); it is a TPU-native serving optimization, opt-in
via ``StableDiffusion(weight_dtype="int8")`` and quality-gated by
``tools/selfcheck.py``/``tools/golden.py --audit``.

Scheme:
  - symmetric, per-output-channel: ``scale_o = max|W[..., o]| / 127``,
    ``Wq = round(W / scale)`` (int8);
  - module dicts keep their names; the ``kernel`` leaf is replaced by
    ``kernel_q`` (int8) + ``kernel_scale`` (float32, per out-channel); ``bias``
    (and norm leaves) are untouched. :mod:`minsdtf_tpu.ops.basic` dispatches on
    the presence of ``kernel_q``.
  - modules whose contraction depth is tiny (< ``min_k``; e.g. the 4-channel
    ``conv_in``) or whose output is quality-critical (``conv_out``) stay in the
    compute dtype: no MXU gain, disproportionate quality risk.
"""

from __future__ import annotations

from typing import Iterable, Optional

import jax.numpy as jnp
import numpy as np

# Modules never quantized: the 4->320 entry conv (K=36), the 320->4 exit conv
# (the latent epsilon itself), and the time embedding MLP (tiny, runs once per
# step at batch B — negligible FLOPs, feeds every ResBlock).
DEFAULT_SKIP_SUFFIXES = (
    "conv_in",
    "conv_out",
    "time_embedding.linear_1",
    "time_embedding.linear_2",
    # the fused subpixel upsample-conv (ops/basic.upsample2x_conv3x3) SUMS kernel
    # taps at trace time — it needs the float kernel
    "upsamplers.0.conv",
)
# Below this contraction depth (K = prod of kernel input dims) the MXU is not the
# bottleneck and int8 only adds quantization error.
DEFAULT_MIN_K = 256


def quantize_kernel(kernel) -> tuple:
    """(int8 values, float32 per-out-channel scales). Kernel layouts: dense
    (in, out) or conv HWIO — the output channel is the LAST axis in both."""
    w = np.asarray(kernel, np.float32)
    reduce_axes = tuple(range(w.ndim - 1))
    amax = np.max(np.abs(w), axis=reduce_axes)
    scale = np.maximum(amax, 1e-12) / 127.0
    q = np.clip(np.round(w / scale), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def _quantize_module(leaves: dict) -> dict:
    """Rewrite a module dict: ``kernel`` -> ``kernel_q`` (int8) + ``kernel_scale``
    (fp32 per-out-channel); every other leaf passes through."""
    q, scale = quantize_kernel(leaves["kernel"])
    new = {k: v for k, v in leaves.items() if k != "kernel"}
    new["kernel_q"] = np.asarray(q)
    new["kernel_scale"] = np.asarray(scale)
    return new


def should_quantize(name: str, leaves: dict, skip_suffixes: Iterable[str],
                    min_k: int) -> bool:
    if "kernel" not in leaves:
        return False
    if any(name.endswith(suf) for suf in skip_suffixes):
        return False
    shape = np.asarray(leaves["kernel"]).shape
    if len(shape) not in (2, 4):
        return False
    k = int(np.prod(shape[:-1]))
    return k >= min_k


def quantize_params(
    params: dict,
    skip_suffixes: Iterable[str] = DEFAULT_SKIP_SUFFIXES,
    min_k: int = DEFAULT_MIN_K,
    conv_only: bool = False,
) -> dict:
    """Quantize every eligible conv/dense module of a flat param dict.
    ``conv_only`` skips dense (2-D) kernels — the calibration pass for the
    "int8_hybrid" mode only needs conv-site statistics."""
    out = {}
    for name, leaves in params.items():
        if conv_only and "kernel" in leaves and np.asarray(leaves["kernel"]).ndim == 2:
            out[name] = leaves
            continue
        if should_quantize(name, leaves, skip_suffixes, min_k):
            out[name] = _quantize_module(leaves)
        else:
            out[name] = leaves
    return out


def dequantize_kernel(leaves: dict) -> np.ndarray:
    """Reconstruct the EFFECTIVE float kernel (tests / debugging): undoes the
    per-out-channel weight scales and, for equalized modules, the per-input-
    channel SmoothQuant factors (recoverable as ``1/(act_qmul * act_scale)``)."""
    w = np.asarray(leaves["kernel_q"], np.float32) * np.asarray(leaves["kernel_scale"])
    if "act_qmul" in leaves:
        d = 1.0 / (np.asarray(leaves["act_qmul"], np.float32)
                   * float(leaves["act_scale"]))
        w = w / d[:, None] if w.ndim == 2 else w / d[None, None, :, None]
    return w


def _equalized_module(
    leaves: dict,
    stats: dict,
    margin: float,
    alpha: float,
    clip_sigmas: Optional[float],
    bias_correct: bool,
) -> tuple:
    """SmoothQuant-style per-input-channel equalized W8A8 conv module.

    Exact-algebra reparametrization: with per-channel factors ``d_j`` the conv
    output ``sum_j x_j W_j == sum_j (x_j/d_j)(d_j W_j)`` is unchanged; only the
    QUANTIZATION GRIDS move. ``d_j = a_j^alpha / w_j^(1-alpha)`` (activation
    per-channel amax vs weight per-input-channel amax, arXiv:2211.10438) aligns
    outlier channels so one int8 grid fits all channels. Runtime cost is zero:
    the activation quantize multiply becomes a broadcast (C,)-vector
    (``act_qmul``) instead of a scalar, the compensation lives in the baked int8
    weights, and the epilogue rescale is still ``act_scale * kernel_scale``.

    Optional extras (both measured on the quality dossier, see ROADMAP r4):
      - ``clip_sigmas``: ACIQ-style clipped grid, ``scale = min(amax',
        clip_sigmas * rms')`` of the equalized activation — trades rare-outlier
        clipping for a uniformly finer grid;
      - ``bias_correct``: folds the SYSTEMATIC weight-rounding error
        ``sum_hwj E[x_j] * (W_dequant - W)`` out of the bias — per-step bias
        compounds coherently across the denoising trajectory, unlike the
        zero-mean rounding noise.

    Returns ``(module, est_rel_mse)`` where the estimate is the analytic
    per-site relative output MSE (uniform-rounding-noise model over the
    calibration moments) used by the ``max_site_rel_mse`` gate."""
    w = np.asarray(leaves["kernel"], np.float64)  # (kh, kw, I, O)
    a = np.asarray(stats["ch_amax"], np.float64)
    m = np.asarray(stats["ch_mean"], np.float64)
    q = np.asarray(stats["ch_msq"], np.float64)
    out_msq = float(stats.get("out_msq", 0.0))

    w_in_amax = np.max(np.abs(w), axis=(0, 1, 3))  # per input channel
    d = np.power(np.maximum(a, 1e-12), alpha) / np.power(
        np.maximum(w_in_amax, 1e-12), 1.0 - alpha)
    d = np.where(a <= 1e-12, 1.0, d)
    d /= np.exp(np.mean(np.log(np.maximum(d, 1e-12))))  # geo-mean 1 (cosmetic)

    a_eq = a / d
    amax_eq = float(np.max(a_eq))
    asc = amax_eq * margin / 127.0
    if clip_sigmas is not None:
        rms_eq = float(np.sqrt(np.mean(q / (d * d))))
        asc = min(asc, clip_sigmas * rms_eq / 127.0)
    asc = max(asc, 1e-12)

    w_eq = w * d[None, None, :, None]
    wsc = np.max(np.abs(w_eq), axis=(0, 1, 2)) / 127.0  # per out channel
    wsc = np.maximum(wsc, 1e-12)
    kq = np.clip(np.round(w_eq / wsc), -127, 127).astype(np.int8)
    w_eff = (kq.astype(np.float64) * wsc) / d[None, None, :, None]

    new = {k: v for k, v in leaves.items() if k != "kernel"}
    new["kernel_q"] = np.asarray(kq)
    new["kernel_scale"] = wsc.astype(np.float32)
    new["act_scale"] = np.float32(asc)
    new["act_qmul"] = (1.0 / (d * asc)).astype(np.float32)

    dw = w_eff - w
    if bias_correct and "bias" in leaves:
        delta = np.einsum("j,hwjo->o", m, dw)
        new["bias"] = (np.asarray(leaves["bias"], np.float64) - delta).astype(np.float32)

    # analytic relative output MSE: activation rounding noise (uniform, var
    # step^2/12 with per-channel step d_j*asc) through the dequantized weights,
    # plus weight rounding error driven by the activation second moment
    var_act = (d * asc) ** 2 / 12.0
    act_mse = float(np.einsum("j,hwjo->", var_act, w_eff**2) / w.shape[-1])
    w_mse = float(np.einsum("j,hwjo->", q, dw**2) / w.shape[-1])
    denom = max(out_msq, 1e-12) if out_msq > 0 else np.inf
    return new, {"rel_mse": (act_mse + w_mse) / denom,
                 "act_rel": act_mse / denom, "w_rel": w_mse / denom}


def hybridize_params(
    params: dict,
    scales: dict,
    margin: float = 1.05,
    stability_threshold: float = 1.5,
    skip_suffixes: Iterable[str] = DEFAULT_SKIP_SUFFIXES,
    min_k: int = DEFAULT_MIN_K,
    dense_dynamic: bool = False,
    equalize_alpha: Optional[float] = 0.5,
    clip_sigmas: Optional[float] = None,
    bias_correct: bool = True,
    max_site_rel_mse: Optional[float] = None,
    report: Optional[dict] = None,
) -> dict:
    """Stable-site-only W8A8 ("int8_hybrid"): quantize ONLY the conv modules whose
    calibrated activation amax is stable across the denoising trajectory.

    Why (r3 measurements, ROADMAP): full int8 wins the conv bucket (142 ms vs 227
    bf16-blocked) but hands the win back in dynamic-quant overhead (~54 ms amax
    reduces + ~14 ms rounding + ~28 ms int8 data formatting). The overhead lives
    almost entirely at the DYNAMIC sites: dense layers need per-token scale grids,
    and the conv_shortcut/downsampler convs see the un-normalized residual stream
    (across-step amax swings 4-6x). GN+SiLU-fed convs swing only ~1.13x — a baked
    static scale costs them nothing. So: those convs run int8 with a fused clipped
    round (zero reduces), everything else keeps the float kernel and the
    bf16-blocked conv path.

    ``scales`` is the {site: {"amax", "ratio"}} dict from
    :func:`minsdtf_tpu.weights.calibrate.collect_unet_amax` (or its .npz via
    ``load_scales``). Sites absent from ``scales``, dense kernels, skip-listed or
    shallow-K modules, and sites with ``ratio > stability_threshold`` all stay
    float.

    ``dense_dynamic=True`` additionally quantizes the eligible DENSE (2-D)
    kernels with per-token dynamic activation scales (no ``act_scale`` leaf —
    ops/basic.dense computes the last-axis amax live). Dense can't take static
    scales (collapsing the per-token grid measured ~16% rel err), but its
    dynamic amax is a cheap row reduce over the contraction axis, unlike the
    conv sites' global (H, W, C) reduce that made full-int8 lose.

    v2 quality controls (require per-channel calibration stats in ``scales``,
    weights/calibrate.py; sites with scalar-only stats fall back to the plain
    per-tensor grid):
      - ``equalize_alpha``: SmoothQuant per-channel equalization strength
        (None disables; 0.5 default — see :func:`_equalized_module`);
      - ``clip_sigmas`` / ``bias_correct``: passed through to the equalized
        sites;
      - ``max_site_rel_mse``: drop sites whose analytic relative output MSE
        estimate exceeds this (error-budgeted site selection — keeps the
        trajectory divergence inside the quality-dossier envelope at the cost
        of fewer int8 sites);
      - ``report``: optional dict filled with per-site diagnostics
        ``{site: {"rel_mse": float, "quantized": bool}}``."""
    out = {}
    for name, leaves in params.items():
        if (
            dense_dynamic
            and "kernel" in leaves
            and getattr(leaves["kernel"], "ndim", 0) == 2
            and should_quantize(name, leaves, skip_suffixes, min_k)
        ):
            out[name] = _quantize_module(leaves)
            continue
        stats = scales.get(name)
        eligible = (
            stats is not None
            and should_quantize(name, leaves, skip_suffixes, min_k)
            and np.asarray(leaves["kernel"]).ndim == 4
        )
        if eligible:
            if isinstance(stats, dict):
                amax, ratio = stats["amax"], stats.get("ratio", 1.0)
            else:
                amax, ratio = float(stats), 1.0
            eligible = ratio <= stability_threshold
        if not eligible:
            out[name] = leaves
            continue
        has_ch = isinstance(stats, dict) and "ch_amax" in stats
        if equalize_alpha is not None and has_ch:
            new, est = _equalized_module(
                leaves, stats, margin=margin, alpha=equalize_alpha,
                clip_sigmas=clip_sigmas, bias_correct=bias_correct)
            keep = (max_site_rel_mse is None
                    or est["rel_mse"] <= max_site_rel_mse)
            if report is not None:
                report[name] = dict(est, quantized=keep)
            out[name] = new if keep else leaves
            continue
        new = _quantize_module(leaves)
        new["act_scale"] = np.float32(max(amax, 1e-12) * margin / 127.0)
        out[name] = new
    return out
