"""W8A8 int8 quantization: scheme invariants + numeric error bounds vs fp32.

No reference analog (the reference is fp32 Keras throughout); the oracle here is
the fp32 computation of THIS repo's ops, with error bounds set by the int8 grid
(per-output-channel weight scales, per-token/per-image dynamic activation scales).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minsdtf_tpu.ops import basic
from minsdtf_tpu.weights import quantize
from minsdtf_tpu.models import unet as unet_lib


def _rel_err(got, want):
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    return np.linalg.norm(got - want) / max(np.linalg.norm(want), 1e-12)


def test_quantize_kernel_roundtrip_error():
    rs = np.random.RandomState(0)
    w = rs.normal(0, 0.05, (320, 640)).astype(np.float32)
    q, scale = quantize.quantize_kernel(w)
    assert q.dtype == np.int8 and scale.shape == (640,)
    deq = q.astype(np.float32) * scale
    # max error is half a quantization step per channel
    step = scale
    assert np.all(np.abs(deq - w) <= step * 0.5 + 1e-9)


def test_quantize_params_skip_rules():
    params = unet_lib.init_params(jax.random.PRNGKey(0), widths=(32, 64, 128, 128))
    qparams = quantize.quantize_params(params, min_k=64)
    # entry/exit/time-embedding/upsamplers stay float
    for name in ("conv_in", "conv_out", "time_embedding.linear_1",
                 "up_blocks.0.upsamplers.0.conv"):
        assert "kernel" in qparams[name] and "kernel_q" not in qparams[name]
    # big conv/dense modules are quantized
    assert "kernel_q" in qparams["mid_block.resnets.0.conv1"]
    assert "kernel_q" in qparams["mid_block.attentions.0.transformer_blocks.0.attn1.to_q"]
    # norms untouched
    assert set(qparams["conv_norm_out"]) == {"scale", "bias"}
    # shapes preserved; scales per out-channel
    kq = qparams["mid_block.resnets.0.conv1"]["kernel_q"]
    ks = qparams["mid_block.resnets.0.conv1"]["kernel_scale"]
    assert kq.shape == params["mid_block.resnets.0.conv1"]["kernel"].shape
    assert ks.shape == (kq.shape[-1],)


def test_int8_dense_close_to_fp32():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.normal(0, 1.0, (64, 320)), jnp.float32)
    w = rs.normal(0, 0.05, (320, 320)).astype(np.float32)
    b = rs.normal(0, 0.05, (320,)).astype(np.float32)
    p32 = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    q, scale = quantize.quantize_kernel(w)
    p8 = {"kernel_q": jnp.asarray(q), "kernel_scale": jnp.asarray(scale),
          "bias": jnp.asarray(b)}
    want = basic.dense(x, p32)
    got = basic.dense(x, p8)
    assert _rel_err(got, want) < 0.02


def test_int8_conv_close_to_fp32():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.normal(0, 1.0, (2, 16, 16, 64)), jnp.float32)
    w = rs.normal(0, 0.05, (3, 3, 64, 64)).astype(np.float32)
    b = rs.normal(0, 0.05, (64,)).astype(np.float32)
    p32 = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    q, scale = quantize.quantize_kernel(w)
    p8 = {"kernel_q": jnp.asarray(q), "kernel_scale": jnp.asarray(scale),
          "bias": jnp.asarray(b)}
    want = basic.conv2d(x, p32, padding=1)
    got = basic.conv2d(x, p8, padding=1)
    assert _rel_err(got, want) < 0.02


@pytest.mark.parametrize(
    "shape,stride,pad",
    [
        ((2, 32, 32, 32), 1, ((1, 1), (1, 1))),      # ResBlock 3x3 (divisible)
        ((2, 30, 30, 32), 1, ((1, 1), (1, 1))),      # hout=30 -> nb halves to 2
        ((2, 31, 31, 32), 1, ((1, 1), (1, 1))),      # odd hout -> falls back direct
        ((2, 32, 32, 32), 2, ((1, 1), (1, 1))),      # UNet stride-2 downsample
        ((2, 32, 32, 32), 2, ((0, 1), (0, 1))),      # VAE asymmetric stride-2
    ],
)
def test_blocked_int8_conv_bit_exact(shape, stride, pad):
    """The manual space-to-batch int8 conv (ops/basic._blocked_conv) must be
    BIT-exact vs the direct int8 conv: both accumulate the same int8 products in
    int32. (The blocked form exists because XLA's space-to-batch pass skips int8
    convs in graphs containing Pallas custom calls — ROADMAP r3.)"""
    rs = np.random.RandomState(7)
    xq = jnp.asarray(rs.randint(-127, 128, shape), jnp.int8)
    kq = jnp.asarray(rs.randint(-127, 128, (3, 3, shape[-1], 48)), jnp.int8)
    direct = jax.lax.conv_general_dilated(
        xq, kq, (stride, stride), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    blocked = basic._blocked_conv(xq, kq, stride, pad, nb=16)
    assert blocked.shape == direct.shape
    assert np.array_equal(np.asarray(blocked), np.asarray(direct))


def test_blocked_float_conv_matches_direct():
    """bf16 convs default to the manual space-to-batch folding (r3: 0.594 ->
    0.484 s/img e2e; ops/basic._FLOAT_BLOCKS = 16). Same products in a different
    accumulation grouping — must match the direct conv to fp32 round-off when
    accumulation is fp32 (measured 4e-5 max abs diff on normalized activations)."""
    rs = np.random.RandomState(11)
    x = jnp.asarray(rs.normal(0, 1, (2, 32, 32, 32)), jnp.bfloat16)
    k = jnp.asarray(rs.normal(0, 0.05, (3, 3, 32, 48)), jnp.bfloat16)
    pad = ((1, 1), (1, 1))
    direct = jax.lax.conv_general_dilated(
        x, k, (1, 1), pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    blocked = basic._blocked_conv(x, k, 1, pad, nb=16, preferred=jnp.float32)
    assert blocked.shape == direct.shape
    np.testing.assert_allclose(
        np.asarray(blocked, np.float32), np.asarray(direct, np.float32),
        atol=2e-4, rtol=0)
    # production entry point routes bf16 through the blocked path by default:
    # "auto" folds small batches (capped at 8 for the float path — the r5
    # per-resolution sweep beat the r3 global 16 at every height: 0.4638 vs
    # 0.4853 s/img) and leaves sublane-filling batches (>=8) unfolded
    # (r3 b8 sweep). The int8 path keeps its calibrated cap of 16 (r3 optimum).
    assert basic._FLOAT_BLOCKS == "auto"
    assert basic._resolve_blocks("auto", 1, auto_cap=8) == 8
    assert basic._resolve_blocks("auto", 2, auto_cap=8) == 8
    assert basic._resolve_blocks("auto", 1) == 16   # int8 default cap
    assert basic._resolve_blocks("auto", 2) == 16
    assert basic._resolve_blocks("auto", 4) == 8
    assert basic._resolve_blocks("auto", 8) == 1
    assert basic._resolve_blocks("auto", 16) == 1
    assert basic._resolve_blocks("8", 2) == 8  # explicit sweeps stay exact


def test_int8_unet_end_to_end_error():
    """Whole scaled-down UNet, quantized vs fp32: a SANITY bound, not a quality
    gate. ~30 sequential quantized ops at ~1.5% relative each compound to ~8-9%
    on this random-init net (measured 0.085); the production quality gate is the
    bf16-vs-int8 latent-MSE/PSNR audit (tools/golden.py --audit) on the real
    25-step sampler, where step-wise re-estimation absorbs per-call noise."""
    widths = (32, 64, 128, 128)
    params = unet_lib.init_params(jax.random.PRNGKey(3), widths=widths)
    qparams = quantize.quantize_params(params, min_k=64)
    rs = np.random.RandomState(4)
    latent = jnp.asarray(rs.normal(0, 1, (1, 16, 16, 4)), jnp.float32)
    t_emb = jnp.asarray(rs.normal(0, 1, (1, 32)), jnp.float32)
    ctx = jnp.asarray(rs.normal(0, 1, (1, 77, 768)), jnp.float32)
    want = jax.jit(unet_lib.apply)(params, latent, t_emb, ctx)
    got = jax.jit(unet_lib.apply)(qparams, latent, t_emb, ctx)
    err = _rel_err(got, want)
    assert err < 0.15, err


def test_calibrated_static_scales_match_dynamic():
    """weights/calibrate.py: the name pass must resolve every quantized site, and
    baking the collected trajectory amax as static scales must reproduce the
    dynamic-quant output closely on the calibration inputs (no clipping there by
    construction; only the margin-scaled rounding grid differs)."""
    from minsdtf_tpu import scheduler as sched_lib
    from minsdtf_tpu.weights import calibrate, quantize

    widths = (32, 64, 128, 128)
    params = unet_lib.init_params(jax.random.PRNGKey(3), widths=widths)
    qparams = quantize.quantize_params(params, min_k=64)

    rs = np.random.RandomState(5)
    latent0 = rs.normal(0, 1, (1, 8, 8, 4)).astype(np.float32)
    context = rs.normal(0, 1, (1, 77, 768)).astype(np.float32)
    uncond = rs.normal(0, 1, (1, 77, 768)).astype(np.float32)
    schedule = sched_lib.build_denoise_schedule(sched_lib.Scheduler(), 3, eta=0.3)
    t_embs = sched_lib.timestep_embedding(schedule.timesteps, dim=widths[0])
    rows = {k: np.asarray(getattr(schedule, k), np.float32)
            for k in ("sr_t", "nr_t", "sr_prev", "nr_prev", "is_last")}

    amax = calibrate.collect_unet_amax(
        qparams, jnp.asarray(latent0), context, uncond, t_embs, rows)
    q_sites = {n for n, l in qparams.items() if "kernel_q" in l}
    assert set(amax) == q_sites
    assert all(v["amax"] > 0 and v["ratio"] >= 1.0 for v in amax.values())

    conv_only = calibrate.bake_act_scales(qparams, amax)  # production defaults
    dense_site = "mid_block.attentions.0.transformer_blocks.0.attn1.to_q"
    assert "act_scale" not in conv_only[dense_site]       # dense: per-token dynamic
    assert "act_scale" in conv_only["mid_block.resnets.0.conv1"]  # GN-fed: stable
    # conv_shortcut reads the UN-normalized residual stream — its amax swings
    # 4-6x across steps, so the stability gate keeps it dynamic
    assert amax["up_blocks.3.resnets.2.conv_shortcut"]["ratio"] > 1.5
    assert "act_scale" not in conv_only["up_blocks.3.resnets.2.conv_shortcut"]

    # Quality criterion: error vs FP32 (comparing the two int8 variants against
    # each other is meaningless — independent rounding noise compounds to ~11%
    # over 30 sequential ops even with identical scales). Stability-gated static
    # conv scales must cost at most a modest factor over fully-dynamic; baking
    # EVERYTHING (gates off) shows the error the gates exist to avoid.
    baked_all = calibrate.bake_act_scales(
        qparams, amax, include_dense=True, stability_threshold=np.inf)
    te = np.broadcast_to(t_embs[0][None], (1, t_embs.shape[1])).astype(np.float32)
    fp32 = jax.jit(unet_lib.apply)(params, latent0, te, context)
    err_dyn = _rel_err(jax.jit(unet_lib.apply)(qparams, latent0, te, context), fp32)
    err_conv = _rel_err(jax.jit(unet_lib.apply)(conv_only, latent0, te, context), fp32)
    err_all = _rel_err(jax.jit(unet_lib.apply)(baked_all, latent0, te, context), fp32)
    assert err_conv < max(1.5 * err_dyn, err_dyn + 0.02), (err_conv, err_dyn)
    assert err_all < 0.30, err_all

    # save/load round-trips the (amax, ratio) schema
    import tempfile

    path = tempfile.mktemp(suffix=".npz")
    calibrate.save_scales(path, amax)
    loaded = calibrate.load_scales(path)
    assert set(loaded) == q_sites
    k0 = next(iter(q_sites))
    assert abs(loaded[k0]["amax"] - amax[k0]["amax"]) < 1e-6


def test_pipeline_weight_dtype_validation():
    from minsdtf_tpu.pipeline import StableDiffusion

    with pytest.raises(ValueError):
        StableDiffusion(weight_dtype="fp4")


def test_hybridize_params_stable_sites_only():
    """weight_dtype="int8_hybrid" (weights/quantize.hybridize_params): int8 ONLY
    at calibration-stable conv sites, with a static act_scale baked at every
    quantized site (the whole point is zero dynamic amax reduces); dense kernels,
    unstable convs and skip-listed modules keep their float kernels."""
    from minsdtf_tpu import scheduler as sched_lib
    from minsdtf_tpu.weights import calibrate

    widths = (32, 64, 128, 128)
    params = unet_lib.init_params(jax.random.PRNGKey(3), widths=widths)
    qparams = quantize.quantize_params(params, min_k=64, conv_only=True)
    # conv_only: no dense module carries kernel_q even above min_k
    dense_site = "mid_block.attentions.0.transformer_blocks.0.attn1.to_q"
    assert "kernel_q" not in qparams[dense_site]

    rs = np.random.RandomState(6)
    latent0 = rs.normal(0, 1, (1, 8, 8, 4)).astype(np.float32)
    context = rs.normal(0, 1, (1, 77, 768)).astype(np.float32)
    schedule = sched_lib.build_denoise_schedule(sched_lib.Scheduler(), 3, eta=0.3)
    t_embs = sched_lib.timestep_embedding(schedule.timesteps, dim=widths[0])
    rows = {k: np.asarray(getattr(schedule, k), np.float32)
            for k in ("sr_t", "nr_t", "sr_prev", "nr_prev", "is_last")}
    amax = calibrate.collect_unet_amax(
        qparams, jnp.asarray(latent0), context, context, t_embs, rows)

    hybrid = quantize.hybridize_params(params, amax, min_k=64)
    # every quantized site is static — the invariant the mode exists for
    for name, leaves in hybrid.items():
        if "kernel_q" in leaves:
            assert "act_scale" in leaves, name
            assert leaves["kernel_q"].ndim == 4, name  # convs only
    assert "kernel_q" in hybrid["mid_block.resnets.0.conv1"]      # GN-fed: stable
    assert "kernel" in hybrid[dense_site]                         # dense: float
    # the un-normalized-residual conv_shortcut fails the stability gate -> float
    assert amax["up_blocks.3.resnets.2.conv_shortcut"]["ratio"] > 1.5
    assert "kernel" in hybrid["up_blocks.3.resnets.2.conv_shortcut"]

    # numeric sanity vs fp32: hybrid quantizes a subset of the full-int8 sites,
    # so its error must not exceed the full-dynamic configuration's class
    te = np.broadcast_to(t_embs[0][None], (1, t_embs.shape[1])).astype(np.float32)
    fp32 = jax.jit(unet_lib.apply)(params, latent0, te, context)
    err_hybrid = _rel_err(jax.jit(unet_lib.apply)(hybrid, latent0, te, context), fp32)
    full_dyn = quantize.quantize_params(params, min_k=64)
    err_dyn = _rel_err(jax.jit(unet_lib.apply)(full_dyn, latent0, te, context), fp32)
    assert err_hybrid < max(1.5 * err_dyn, err_dyn + 0.02), (err_hybrid, err_dyn)


def test_hybridize_params_dense_dynamic():
    """hybridize_params(dense_dynamic=True): eligible dense kernels additionally
    run W8A8 with DYNAMIC per-token scales (no act_scale leaf — ops/basic.dense
    computes the last-axis amax live); skip-listed dense stays float; error vs
    fp32 stays in the full-dynamic class (the dense sites are a subset of it)."""
    widths = (32, 64, 128, 128)
    params = unet_lib.init_params(jax.random.PRNGKey(3), widths=widths)
    hybrid = quantize.hybridize_params(params, {}, min_k=64, dense_dynamic=True)

    dense_site = "mid_block.attentions.0.transformer_blocks.0.attn1.to_q"
    assert hybrid[dense_site]["kernel_q"].ndim == 2
    assert "act_scale" not in hybrid[dense_site]          # dynamic, not baked
    assert "kernel" in hybrid["time_embedding.linear_1"]  # skip list holds
    for leaves in hybrid.values():                        # no conv quantized
        if "kernel_q" in leaves:
            assert leaves["kernel_q"].ndim == 2

    rs = np.random.RandomState(9)
    latent = rs.normal(0, 1, (1, 8, 8, 4)).astype(np.float32)
    context = rs.normal(0, 1, (1, 77, 768)).astype(np.float32)
    t_emb = rs.normal(0, 1, (1, widths[0])).astype(np.float32)
    fp32 = jax.jit(unet_lib.apply)(params, latent, t_emb, context)
    err_dense = _rel_err(jax.jit(unet_lib.apply)(hybrid, latent, t_emb, context), fp32)
    full_dyn = quantize.quantize_params(params, min_k=64)
    err_dyn = _rel_err(jax.jit(unet_lib.apply)(full_dyn, latent, t_emb, context), fp32)
    assert err_dense < max(1.5 * err_dyn, err_dyn + 0.02), (err_dense, err_dyn)


def _conv_stats(x):
    """Calibration-equivalent per-channel stats for a (B,H,W,C) activation."""
    xf = np.asarray(x, np.float64)
    return {
        "amax": float(np.max(np.abs(xf))),
        "ratio": 1.0,
        "ch_amax": np.max(np.abs(xf), axis=(0, 1, 2)).astype(np.float32),
        "ch_mean": np.mean(xf, axis=(0, 1, 2)).astype(np.float32),
        "ch_msq": np.mean(xf**2, axis=(0, 1, 2)).astype(np.float32),
        "out_msq": 1.0,  # placeholder; set by callers that gate on rel MSE
    }


def test_equalized_module_beats_per_tensor_on_outlier_channels():
    """weights/quantize._equalized_module (SmoothQuant-style per-channel grids):
    on activations with a 30x outlier channel, equalization must cut the conv
    output error well below the per-tensor static grid — and stay exact-algebra
    (same epilogue, act_qmul vector instead of a scalar multiply)."""
    rs = np.random.RandomState(21)
    c = 64
    x = rs.normal(0, 1.0, (2, 16, 16, c)).astype(np.float32)
    x[..., 5] *= 30.0  # one outlier channel dominates the per-tensor amax
    w = rs.normal(0, 0.05, (3, 3, c, 48)).astype(np.float32)
    b = rs.normal(0, 0.05, (48,)).astype(np.float32)
    leaves = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    stats = _conv_stats(x)

    want = basic.conv2d(jnp.asarray(x), leaves, padding=1)
    stats["out_msq"] = float(np.mean(np.asarray(want, np.float64) ** 2))

    # v1: per-tensor static grid
    v1 = quantize._quantize_module(leaves)
    v1["act_scale"] = jnp.float32(stats["amax"] * 1.05 / 127.0)
    err_v1 = _rel_err(basic.conv2d(jnp.asarray(x), v1, padding=1), want)

    v2, est = quantize._equalized_module(
        leaves, stats, margin=1.05, alpha=0.5, clip_sigmas=None,
        bias_correct=False)
    assert v2["act_qmul"].shape == (c,)
    err_v2 = _rel_err(basic.conv2d(jnp.asarray(x), v2, padding=1), want)
    assert err_v2 < 0.5 * err_v1, (err_v2, err_v1)
    # the analytic estimate is the right order of magnitude (ranking metric)
    rel_mse = est["rel_mse"]
    assert 0.1 * err_v2**2 < rel_mse < 10 * err_v2**2, (rel_mse, err_v2**2)
    assert abs(est["act_rel"] + est["w_rel"] - rel_mse) < 1e-12


def test_equalized_module_bias_correction_removes_systematic_error():
    """bias_correct folds sum_j E[x_j](W_dq - W) out of the bias: on activations
    with a nonzero mean (the GN+SiLU regime) the mean output error must shrink."""
    rs = np.random.RandomState(22)
    c = 32
    x = (rs.normal(0.4, 0.6, (2, 12, 12, c))).astype(np.float32)  # shifted
    w = rs.normal(0, 0.05, (3, 3, c, 32)).astype(np.float32)
    b = np.zeros(32, np.float32)
    leaves = {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}
    stats = _conv_stats(x)
    want = np.asarray(basic.conv2d(jnp.asarray(x), leaves, padding=1), np.float64)
    stats["out_msq"] = float(np.mean(want**2))

    outs = {}
    for bc in (False, True):
        mod, _ = quantize._equalized_module(
            leaves, stats, margin=1.05, alpha=0.5, clip_sigmas=None,
            bias_correct=bc)
        got = np.asarray(basic.conv2d(jnp.asarray(x), mod, padding=1), np.float64)
        # interior only: the E[x] model ignores zero-padded borders
        outs[bc] = np.mean((got - want)[:, 1:-1, 1:-1], axis=(0, 1, 2))
    assert np.abs(outs[True]).mean() < np.abs(outs[False]).mean(), outs


def test_hybridize_max_site_rel_mse_gate():
    """max_site_rel_mse drops high-error sites (leaves them float) and the
    report records every eligible site's estimate."""
    widths = (32, 64, 128, 128)
    params = unet_lib.init_params(jax.random.PRNGKey(3), widths=widths)
    # synthesize stats for every eligible conv site from unit-normal activations
    scales = {}
    for name, leaves in params.items():
        k = leaves.get("kernel")
        if k is not None and k.ndim == 4:
            c = k.shape[2]
            scales[name] = {
                "amax": 4.0, "ratio": 1.1,
                "ch_amax": np.full(c, 4.0, np.float32),
                "ch_mean": np.zeros(c, np.float32),
                "ch_msq": np.ones(c, np.float32),
                "out_msq": 1.0,
            }
    report_all, report_gated = {}, {}
    hybrid_all = quantize.hybridize_params(
        params, scales, min_k=64, report=report_all)
    n_all = sum(1 for l in hybrid_all.values() if "kernel_q" in l)
    assert n_all > 0 and all(v["quantized"] for v in report_all.values())
    # a budget below the median estimate must drop sites
    budget = float(np.median([v["rel_mse"] for v in report_all.values()]))
    hybrid_gated = quantize.hybridize_params(
        params, scales, min_k=64, max_site_rel_mse=budget, report=report_gated)
    n_gated = sum(1 for l in hybrid_gated.values() if "kernel_q" in l)
    assert 0 < n_gated < n_all
    dropped = [k for k, v in report_gated.items() if not v["quantized"]]
    assert all(report_gated[k]["rel_mse"] > budget for k in dropped)


def test_calibration_ch_stats_roundtrip(tmp_path):
    """collect_unet_amax v2 records per-channel stats; save/load round-trips
    them; hybridize_params consumes them (act_qmul present at equalized sites)."""
    from minsdtf_tpu import scheduler as sched_lib
    from minsdtf_tpu.weights import calibrate

    widths = (32, 64, 128, 128)
    params = unet_lib.init_params(jax.random.PRNGKey(3), widths=widths)
    qparams = quantize.quantize_params(params, min_k=64, conv_only=True)
    rs = np.random.RandomState(6)
    latent0 = rs.normal(0, 1, (1, 8, 8, 4)).astype(np.float32)
    context = rs.normal(0, 1, (1, 77, 768)).astype(np.float32)
    schedule = sched_lib.build_denoise_schedule(sched_lib.Scheduler(), 2, eta=0.3)
    t_embs = sched_lib.timestep_embedding(schedule.timesteps, dim=widths[0])
    rows = {k: np.asarray(getattr(schedule, k), np.float32)
            for k in ("sr_t", "nr_t", "sr_prev", "nr_prev", "is_last")}
    stats = calibrate.collect_unet_amax(
        qparams, jnp.asarray(latent0), context, context, t_embs, rows)
    site = "mid_block.resnets.0.conv1"
    cin = params[site]["kernel"].shape[2]
    assert stats[site]["ch_amax"].shape == (cin,)
    assert stats[site]["out_msq"] > 0
    # per-channel amax is consistent with the scalar amax
    assert abs(float(np.max(stats[site]["ch_amax"])) - stats[site]["amax"]) < 1e-4

    path = str(tmp_path / "scales.npz")
    calibrate.save_scales(path, stats)
    loaded = calibrate.load_scales(path)
    np.testing.assert_allclose(loaded[site]["ch_amax"], stats[site]["ch_amax"])
    np.testing.assert_allclose(loaded[site]["ch_msq"], stats[site]["ch_msq"],
                               rtol=1e-6)
    assert abs(loaded[site]["out_msq"] - stats[site]["out_msq"]) < 1e-5

    hybrid = quantize.hybridize_params(params, loaded, min_k=64)
    assert "act_qmul" in hybrid[site] and "kernel_q" in hybrid[site]
    # equalized hybrid stays in the int8 error class vs fp32
    te = np.broadcast_to(t_embs[0][None], (1, t_embs.shape[1])).astype(np.float32)
    fp32 = jax.jit(unet_lib.apply)(params, latent0, te, context)
    err = _rel_err(jax.jit(unet_lib.apply)(hybrid, latent0, te, context), fp32)
    full_dyn = quantize.quantize_params(params, min_k=64)
    err_dyn = _rel_err(jax.jit(unet_lib.apply)(full_dyn, latent0, te, context), fp32)
    assert err < max(1.5 * err_dyn, err_dyn + 0.02), (err, err_dyn)


def test_resolve_blocks_by_height_map():
    """Per-output-height fold-count maps ("64:16,32:8,*:auto") for the
    per-resolution conv block sweeps (ROADMAP r4)."""
    assert basic._resolve_blocks("64:32,32:8,*:4", 2, hout=64) == 32
    assert basic._resolve_blocks("64:32,32:8,*:4", 2, hout=32) == 8
    assert basic._resolve_blocks("64:32,32:8,*:4", 2, hout=16) == 4
    # '*:auto' falls through to the batch-adaptive default
    assert basic._resolve_blocks("64:32,*:auto", 2, hout=16) == 16
    assert basic._resolve_blocks("64:32,*:auto", 8, hout=16) == 1
