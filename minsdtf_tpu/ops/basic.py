"""Primitive NN ops: conv / dense / norms / activations, NHWC, pure functions.

Conventions (chosen for zero-copy weight conversion from PyTorch checkpoints):
  - conv kernels are HWIO (PyTorch OIHW is transposed (2,3,1,0) at convert time, the
    same permutation the reference loader applies, ``ckpt_loader.py:2181``);
  - dense kernels are (in, out) (PyTorch (out,in) transposed (1,0));
  - a "module" is a flat-dict entry ``params[name] = {"kernel": ..., "bias": ...}`` or
    ``{"scale": ..., "bias": ...}`` for norms, with ``name`` the dotted diffusers-style
    path (e.g. ``down_blocks.0.resnets.0.conv1``) — identical to the reference's layer
    names so parity is line-checkable.

Numerics: matmuls/convs run in the dtype of the activations (bf16 in production,
fp32 in parity tests) with fp32 accumulation; normalization statistics are always fp32.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

Padding = Union[int, Tuple[Tuple[int, int], Tuple[int, int]]]

# Layout guard for W8A8 convs (see conv2d); env knob for A/B measurement.
_INT8_BARRIER = os.environ.get("MINSDTF_INT8_BARRIER", "0") == "1"
# Manual space-to-batch row-block counts ("auto" = batch-adaptive, 0/1 = direct
# conv, N = fixed fold count for sweeps). Float default ON: the r3 e2e A/B
# measured 0.594 -> 0.484 s/img wall with the conv bucket at 150.7 TF/s (XLA's
# automatic space-to-batch pass picks shallower foldings in the big UNet
# graph). Same products but a different accumulation grouping (measured 4e-5
# fp32 max abs diff on CPU), so it applies to bf16 production activations only
# — fp32 parity/oracle paths keep the direct conv.
_INT8_BLOCKS = os.environ.get("MINSDTF_INT8_BLOCKS", "auto")
_FLOAT_BLOCKS = os.environ.get("MINSDTF_FLOAT_BLOCKS", "auto")


def _parse_blocks_map(setting: str) -> dict:
    """``"64:16,32:8,*:auto"`` -> {64: "16", 32: "8", "*": "auto"} (cached)."""
    m = _BLOCKS_MAP_CACHE.get(setting)
    if m is None:
        m = {}
        for part in setting.split(","):
            k, v = part.split(":")
            m["*" if k.strip() == "*" else int(k)] = v.strip()
        _BLOCKS_MAP_CACHE[setting] = m
    return m


_BLOCKS_MAP_CACHE: dict = {}


def _resolve_blocks(setting: str, batch: int, hout: Optional[int] = None,
                    auto_cap: int = 16) -> int:
    """Batch-adaptive fold count for :func:`_blocked_conv`.

    The folding exists to fill the MXU sublanes when the conv batch is small;
    once the raw batch already fills them, folding only adds halo compute and
    layout churn. Measured (512px int8-hybrid, r3 block sweeps): the batch-1
    winner ran EVERY conv at 16 blocks (UNet CFG batch 2 + VAE batch 1;
    0.4202 s/img vs 0.4390 at 8 blocks), the batch-8 winner ran EVERY conv
    unfolded (UNet batch 16 + VAE batch 8; 0.3594 vs 0.4263 at 8 blocks,
    0.4309 at 16, 0.4900 at 4 — folding strictly loses, non-monotonically).
    "auto" reproduces both winner configs exactly: 16 blocks up to batch 2,
    none from batch 8 up, ~32/batch rows between — rounded DOWN to a power of
    two so the count survives _blocked_conv's power-of-two divisibility guard
    (SD conv output heights are 8/16/32/64: a fold count of 10 or 6 would
    silently collapse to 2 there, far from the ~32-rows-in-batch target).

    A map setting ``"64:16,32:8,*:auto"`` picks the count by conv OUTPUT height
    (per-resolution sweeps — the UNet runs the same conv shapes at 4
    resolutions and one global count need not fit all); ``*`` is the fallback."""
    if ":" in setting:
        m = _parse_blocks_map(setting)
        setting = m.get(hout, m.get("*", "auto"))
    if setting != "auto":
        return int(setting)
    if batch >= 8:
        return 1
    n = max(1, min(auto_cap, 32 // batch))
    return 1 << (n.bit_length() - 1)


def matmul_precision(dtype) -> Optional[jax.lax.Precision]:
    """fp32 activations get true-fp32 matmuls (JAX's DEFAULT precision is bf16-class
    passes even for f32 inputs — measured ~1e-2 abs error on 768-dim contractions);
    bf16 production uses the fast default."""
    return jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None


# Calibration tape (weights/calibrate.py): when active, _quantize_acts records the
# per-site activation amax — module NAMES during an eval_shape pass (params closed
# over, so dict identity maps to flat-dict names), VALUES (scalar tracers returned
# through the instrumented jit) during the measuring pass.
_CALIB_TAPE: Optional[dict] = None


def set_calibration_tape(tape: Optional[dict]) -> None:
    global _CALIB_TAPE
    _CALIB_TAPE = tape


def _quantize_acts(x: jax.Array, p: dict, axes) -> Tuple[jax.Array, jax.Array]:
    """Symmetric int8 activation quantization over ``axes``.

    Dynamic mode computes the scale from the live amax over ``axes`` — constant
    along every axis the following contraction sums (weights/quantize.py): the
    last axis for dense (per-token scales), all of (H, W, C) for conv (per-image
    scales — the 3x3 window sums across pixels).

    When the module carries a calibrated ``act_scale`` (weights/calibrate.py) the
    amax pass disappears: quantization is a single clipped round that fuses into
    the producer (the dynamic amax reduce alone measured 54 ms/gen of the int8
    e2e device time — r3 trace bucket `convert_reduce_fusion`).

    An ``act_qmul`` leaf (per-INPUT-channel fp32 vector, weights/quantize.py
    equalization) replaces the scalar ``1/act_scale`` multiply with a broadcast
    vector multiply — SmoothQuant-style per-channel quantization grids at the
    exact same VPU cost (the compensating channel factors are folded into the
    int8 weights, so the epilogue rescale stays ``act_scale * kernel_scale``)."""
    xf = x.astype(jnp.float32)
    if _CALIB_TAPE is not None:
        if "names" in _CALIB_TAPE:
            _CALIB_TAPE["names"].append(_CALIB_TAPE["id_to_name"].get(id(p)))
        if "values" in _CALIB_TAPE:
            ch_axes = tuple(range(xf.ndim - 1))  # all but the channel/contraction axis
            absx = jnp.abs(xf)
            _CALIB_TAPE["values"].append({
                "amax": jnp.max(absx),
                "ch_amax": jnp.max(absx, axis=ch_axes),
                "ch_mean": jnp.mean(xf, axis=ch_axes),
                "ch_msq": jnp.mean(jnp.square(xf), axis=ch_axes),
            })
    if "act_qmul" in p:
        asc = p["act_scale"].astype(jnp.float32)
        xq = jnp.clip(jnp.round(xf * p["act_qmul"].astype(jnp.float32)), -127, 127)
        return xq.astype(jnp.int8), asc
    if "act_scale" in p:
        asc = p["act_scale"].astype(jnp.float32)
        xq = jnp.clip(jnp.round(xf * (1.0 / asc)), -127, 127).astype(jnp.int8)
        return xq, asc
    amax = jnp.max(jnp.abs(xf), axis=axes, keepdims=True)
    asc = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    xq = jnp.round(xf / asc).astype(jnp.int8)
    return xq, asc


def _blocked_conv(xq: jax.Array, kq: jax.Array, stride: int, pad, nb: int,
                  preferred=jnp.int32, precision=None) -> jax.Array:
    """Manual space-to-batch: fold ``nb`` overlapping row blocks (halo = kh-1
    rows) into the batch dim before convolving.

    XLA's own space-to-batch pass is what makes the bf16 convs fast at batch 2
    (sublane fill), but it skips EVERY int8 conv in any graph that also contains a
    Pallas custom call — the flash-attention calls in the UNet — leaving a
    batch-in-sublane layout that runs at ~20-37 TOPS instead of ~280-330
    (experiments/int8_trigger2.py variants Q/Q5-Q7: manual 16-block folding
    restores 326 TF/s with the custom call present). Bit-exact vs the direct conv
    (identical accumulation of the same products); dtype-generic so float convs
    can A/B the same folding (MINSDTF_FLOAT_BLOCKS)."""
    b, h, w, c = xq.shape
    kh = kq.shape[0]
    (pt, pb), wpad = pad
    hout = (h + pt + pb - kh) // stride + 1
    while nb > 1 and hout % nb:
        nb //= 2
    if nb <= 1:
        return jax.lax.conv_general_dilated(
            xq, kq, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=preferred, precision=precision,
        )
    r = hout // nb
    hb = stride * (r - 1) + kh
    xp = jnp.pad(xq, ((0, 0), (pt, pb), (0, 0), (0, 0)))
    xb = jnp.stack(
        [jax.lax.slice_in_dim(xp, i * stride * r, i * stride * r + hb, axis=1)
         for i in range(nb)], axis=1,
    ).reshape(b * nb, hb, w, c)
    y = jax.lax.conv_general_dilated(
        xb, kq, (stride, stride), ((0, 0), wpad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred, precision=precision,
    )
    return y.reshape(b, nb * r, y.shape[2], y.shape[3])


def conv2d(x: jax.Array, p: dict, stride: int = 1, padding: Padding = 0) -> jax.Array:
    """2-D convolution, NHWC x HWIO. ``padding`` is an int (symmetric) or explicit
    ``((top,bottom),(left,right))`` — the VAE encoder needs the asymmetric
    ``((0,1),(0,1))`` stride-2 form (reference ``image_encoder.py:31-37``).

    A module carrying ``kernel_q`` (weights/quantize.py) runs as a W8A8 int8 conv:
    per-image dynamic activation scales x per-out-channel weight scales, int32
    accumulation on the MXU's 2x int8 path, fp32 rescale in the epilogue."""
    if isinstance(padding, int):
        pad = ((padding, padding), (padding, padding))
    else:
        pad = tuple((int(a), int(b)) for a, b in padding)
    kh = (p["kernel_q"] if "kernel_q" in p else p["kernel"]).shape[0]
    hout = (x.shape[1] + pad[0][0] + pad[0][1] - kh) // stride + 1
    if "kernel_q" in p:
        xq, asc = _quantize_acts(x, p, axes=(1, 2, 3))
        nb_int8 = _resolve_blocks(_INT8_BLOCKS, x.shape[0], hout)
        if nb_int8 > 1:
            out = _blocked_conv(xq, p["kernel_q"], stride, pad, nb_int8)
        else:
            out = jax.lax.conv_general_dilated(
                xq,
                p["kernel_q"],
                window_strides=(stride, stride),
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
        if _INT8_BARRIER:
            # Earlier layout-guard experiment: pins the conv's native output
            # layout. Superseded by the manual space-to-batch above (measured
            # no-change e2e on its own); kept as an A/B knob.
            out = jax.lax.optimization_barrier(out)
        out = (out.astype(jnp.float32) * (asc * p["kernel_scale"])).astype(x.dtype)
        if _CALIB_TAPE is not None and "values" in _CALIB_TAPE:
            # pre-bias output power: denominator of the per-site relative-MSE
            # estimate (weights/quantize._site_rel_mse)
            _CALIB_TAPE["values"][-1]["out_msq"] = jnp.mean(
                jnp.square(out.astype(jnp.float32)))
    else:
        kernel = p["kernel"].astype(x.dtype)
        # auto_cap 8 for the FLOAT path: the r5 per-resolution sweep measured 8
        # row blocks beating the r3 global 16 at every conv height (512px b1
        # bf16 wall: 0.4638 at 8-blocks vs 0.4853 at 16 — pass-1 singles and
        # pass-2 combinations in ROADMAP r5), while the int8 path's calibrated
        # 16:16 optimum (r3 sweep) is unchanged.
        nb_float = _resolve_blocks(_FLOAT_BLOCKS, x.shape[0], hout, auto_cap=8)
        if nb_float > 1 and x.dtype != jnp.float32:
            out = _blocked_conv(
                x, kernel, stride, pad, nb_float,
                preferred=jnp.float32, precision=matmul_precision(x.dtype),
            ).astype(x.dtype)
        else:
            out = jax.lax.conv_general_dilated(
                x,
                kernel,
                window_strides=(stride, stride),
                padding=pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
                precision=matmul_precision(x.dtype),
            ).astype(x.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def dense(x: jax.Array, p: dict) -> jax.Array:
    """Affine map over the last axis; kernel is (in, out).

    ``kernel_q`` modules run W8A8: per-token (last-axis) dynamic activation
    scales, int8 MXU matmul with int32 accumulation, fp32 rescale."""
    if "kernel_q" in p:
        xq, asc = _quantize_acts(x, p, axes=-1)
        y = jax.lax.dot_general(
            xq, p["kernel_q"], (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = (y.astype(jnp.float32) * (asc * p["kernel_scale"])).astype(x.dtype)
        if _CALIB_TAPE is not None and "values" in _CALIB_TAPE:
            _CALIB_TAPE["values"][-1]["out_msq"] = jnp.mean(
                jnp.square(out.astype(jnp.float32)))
    else:
        out = jnp.dot(
            x,
            p["kernel"].astype(x.dtype),
            preferred_element_type=jnp.float32,
            precision=matmul_precision(x.dtype),
        ).astype(x.dtype)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out


def group_norm(x: jax.Array, p: dict, num_groups: int = 32, eps: float = 1e-5) -> jax.Array:
    """GroupNorm over the channel (last) axis of NHWC, fp32 statistics.

    Matches ``keras.layers.GroupNormalization(epsilon=1e-5)`` with default 32 groups
    as used throughout the reference UNet/VAE (``diffusion_model.py:27``,
    ``layers.py:32``)."""
    b = x.shape[0]
    c = x.shape[-1]
    spatial = x.shape[1:-1]
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(b, *spatial, c)
    out = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def group_norm_silu(x: jax.Array, p: dict, num_groups: int = 32, eps: float = 1e-5) -> jax.Array:
    """GroupNorm + SiLU — the prologue of every ResBlock conv. XLA fuses the norm
    with neighboring elementwise work in the full graph; a standalone Pallas GN
    kernel was tried in r1/r2 and removed — it broke those fusions (lost ~8% e2e)
    and failed VMEM allocation at the 4096x960 up-path shapes."""
    h = group_norm(x, p, num_groups=num_groups, eps=eps)
    return h * jax.nn.sigmoid(h)


def layer_norm(x: jax.Array, p: dict, eps: float = 1e-5) -> jax.Array:
    """LayerNorm over the last axis, fp32 statistics."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = xf * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return out.astype(x.dtype)


def silu(x: jax.Array) -> jax.Array:
    return x * jax.nn.sigmoid(x)


def quick_gelu(x: jax.Array) -> jax.Array:
    """CLIP's quick_gelu: ``x * sigmoid(1.702 x)`` (reference ``text_encoder.py:103``)."""
    return x * jax.nn.sigmoid(1.702 * x)


def gelu_tanh(x: jax.Array) -> jax.Array:
    """tanh-approximated GELU as written in the reference GEGLU
    (``diffusion_model.py:148-153``): ``0.5 x (1 + tanh(0.79788456 x (1 + 0.044715 x²)))``."""
    return 0.5 * x * (1.0 + jnp.tanh(x * 0.7978845608 * (1.0 + 0.044715 * jnp.square(x))))


def geglu(x: jax.Array, p: dict, output_dim: int) -> jax.Array:
    """GEGLU feed-forward gate: proj to 2*output_dim, ``value * gelu_tanh(gate)``."""
    h = dense(x, p)
    value, gate = h[..., :output_dim], h[..., output_dim:]
    return value * gelu_tanh(gate)


def upsample_nearest_2x(x: jax.Array) -> jax.Array:
    """Nearest-neighbour 2x upsample (keras ``UpSampling2D(2)`` default)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)


def upsample2x_conv3x3(x: jax.Array, p: dict) -> jax.Array:
    """Fused ``conv2d(upsample_nearest_2x(x), p, padding=1)`` as four subpixel
    phase convolutions at SOURCE resolution.

    Over a nearest-2x-upsampled grid, the 3x3 window at output phase (a, b) ∈ {0,1}²
    only ever reads a 2x2 source neighbourhood, with some taps landing on the same
    source pixel. Summing those taps gives a 2x2 effective kernel per phase:

        rows a=0: tap k[0] -> source row i-1; k[1]+k[2] -> row i
        rows a=1: k[0]+k[1] -> row i;        k[2]     -> row i+1   (same for columns)

    Exact (sums of the same products), 16 source-res MACs per output quartet instead
    of the direct form's 36 at 2x res — and the (B, 2H, 2W, C) upsampled intermediate
    never exists in HBM. This is the VAE decoder's main traffic: its three
    upsample+conv pairs at 512/512/256 channels dominate the decode's HBM bytes
    (reference ``image_decoder.py:22-66`` materializes every upsample through Keras).
    """
    k = p["kernel"].astype(x.dtype)  # (3, 3, Cin, Cout)
    # row-phase combination: (2, 3, Cin, Cout) each, taps ordered by source offset
    rows = (
        jnp.stack([k[0], k[1] + k[2]]),          # a=0: offsets (-1, 0)
        jnp.stack([k[0] + k[1], k[2]]),          # a=1: offsets (0, +1)
    )
    # column-phase combination applied to each row kernel -> 2x2 per (a, b)
    def cols(kr):
        return (
            jnp.stack([kr[:, 0], kr[:, 1] + kr[:, 2]], axis=1),  # b=0: (-1, 0)
            jnp.stack([kr[:, 0] + kr[:, 1], kr[:, 2]], axis=1),  # b=1: (0, +1)
        )

    # per-phase source padding: offset -1 needs a leading pad, +1 a trailing pad
    pads = {0: (1, 0), 1: (0, 1)}
    prec = matmul_precision(x.dtype)

    def phase(kernel, a, b):
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding=(pads[a], pads[b]),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32, precision=prec,
        ).astype(x.dtype)

    k00, k01 = cols(rows[0])
    k10, k11 = cols(rows[1])
    y00, y01 = phase(k00, 0, 0), phase(k01, 0, 1)
    y10, y11 = phase(k10, 1, 0), phase(k11, 1, 1)
    bsz, h, w, cout = y00.shape
    row0 = jnp.stack([y00, y01], axis=3)          # (B, H, W, 2, C)
    row1 = jnp.stack([y10, y11], axis=3)
    out = jnp.stack([row0, row1], axis=2).reshape(bsz, 2 * h, 2 * w, cout)
    if "bias" in p:
        out = out + p["bias"].astype(x.dtype)
    return out
