"""Reproduce + fix the e2e int8 conv layout pathology in a small loop.

The e2e trace shows every int8 conv emitting s32 output with layout
{3,0,2,1:T(2,128)} — batch (=2) in the sublane dim — at a uniform ~20 TF/s,
while the isolated W8A8 probe (conv -> tanh carry) gets a clean layout and
270-330 TF/s. Hypothesis: with int8, the s32->f32 convert prevents the
conv+bias+GN fusion that bf16 gets, exposing an HLO edge whose consumer
(GroupNorm statistics and/or the next layer's per-image amax reduce, both
batch-preserving reductions) back-propagates the batch-minor layout onto the
conv output.

Variants (loop-carried 30x, xprof device time):
  F  prod chain: quant -> conv -> rescale+bias -> GN+SiLU -> carry
  G  F + optimization_barrier between rescale and GN
  H  F + optimization_barrier directly on the s32 conv output
  I  F with GN statistics computed over a (B, HW*W, C) reshape

r3 result: F-I all run at 270-330 TF/s — the collapse does NOT reproduce with a
single homogeneous conv in a scan, barrier or not. Variants J-N add, one at a
time, what the production UNet graph has and F lacks, to find the trigger:
  J  F with the int8 kernel passed as a jit ARGUMENT (prod weights are args)
  K  F + residual skip add around the conv (ResBlock topology)
  L  F + stride-2 downsample conv + nearest upsample back (UNet down/up path)
  M  F with mixed channel widths (C -> 2C -> C)
  N  F + token-major int8 dense between convs (interleaved spatial transformer)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/minsdtf-jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

from minsdtf_tpu import profiling

B, HW, C = 2, 64, 640
N_ITERS = 30
FLOPS_PER_ITER = 2 * B * HW * HW * 9 * C * C


def _conv_int8(xq, kq):
    return jax.lax.conv_general_dilated(
        xq, kq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _quant_dyn(x):
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)
    asc = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    xq = jnp.round(xf / asc).astype(jnp.int8)
    return xq, asc


def _gn_silu(x, scale, bias, groups=32):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, -1, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(b, h, w, c)
    out = xf * scale + bias
    return (out * jax.nn.sigmoid(out)).astype(x.dtype)


def _w8a8(x, kq, ksc, bias):
    """The production W8A8 conv chain: dynamic quant -> int8 conv -> rescale."""
    xq, asc = _quant_dyn(x)
    y = _conv_int8(xq, kq)
    return (y.astype(jnp.float32) * (asc * ksc) + bias).astype(x.dtype)


def build(variant):
    rs = np.random.RandomState(0)
    kq = jnp.asarray(rs.randint(-16, 17, (3, 3, C, C)), jnp.int8)
    ksc = jnp.asarray(rs.uniform(0.001, 0.01, (C,)), jnp.float32)
    bias = jnp.asarray(rs.normal(0, 0.1, (C,)), jnp.float32)
    gsc = jnp.asarray(rs.uniform(0.5, 1.5, (C,)), jnp.float32)
    gbi = jnp.asarray(rs.normal(0, 0.1, (C,)), jnp.float32)
    x0 = jnp.asarray(rs.normal(0, 1, (B, HW, HW, C)), jnp.bfloat16)

    if variant == "J":
        def body_j(carry, _):
            x, kq_a = carry
            nxt = _gn_silu(_w8a8(x, kq_a, ksc, bias), gsc, gbi)
            return (nxt, kq_a), None

        @jax.jit
        def run(x, kq_a):
            (x, _), _ = jax.lax.scan(body_j, (x, kq_a), None, length=N_ITERS)
            return x.reshape(-1)[0]

        return (lambda x: run(x, kq)), x0

    if variant == "K":
        def body(x, _):
            out = _gn_silu(_w8a8(x, kq, ksc, bias), gsc, gbi)
            return (out + x).astype(jnp.bfloat16), None
    elif variant == "L":
        kq_dn = jnp.asarray(rs.randint(-16, 17, (3, 3, C, C)), jnp.int8)

        def body(x, _):
            out = _gn_silu(_w8a8(x, kq, ksc, bias), gsc, gbi)
            xq, asc = _quant_dyn(out)
            dn = jax.lax.conv_general_dilated(
                xq, kq_dn, (2, 2), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            dn = (dn.astype(jnp.float32) * (asc * ksc)).astype(jnp.bfloat16)
            up = jnp.repeat(jnp.repeat(dn, 2, axis=1), 2, axis=2)
            return up, None
    elif variant == "M":
        kq_up = jnp.asarray(rs.randint(-16, 17, (3, 3, C, 2 * C)), jnp.int8)
        ksc_up = jnp.asarray(rs.uniform(0.001, 0.01, (2 * C,)), jnp.float32)
        kq_dn2 = jnp.asarray(rs.randint(-16, 17, (3, 3, 2 * C, C)), jnp.int8)

        def body(x, _):
            wide = _w8a8(x, kq_up, ksc_up, jnp.zeros((2 * C,), jnp.float32))
            out = _w8a8(wide, kq_dn2, ksc, bias)
            return _gn_silu(out, gsc, gbi), None
    elif variant == "N":
        wq = jnp.asarray(rs.randint(-16, 17, (C, C)), jnp.int8)
        wsc = jnp.asarray(rs.uniform(0.001, 0.01, (C,)), jnp.float32)

        def body(x, _):
            out = _gn_silu(_w8a8(x, kq, ksc, bias), gsc, gbi)
            b_, h_, w_, c_ = out.shape
            tok = out.reshape(b_, h_ * w_, c_).astype(jnp.float32)
            tsc = jnp.maximum(jnp.max(jnp.abs(tok), axis=-1, keepdims=True), 1e-12) / 127.0
            tq = jnp.round(tok / tsc).astype(jnp.int8)
            d = jax.lax.dot_general(tq, wq, (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            d = (d.astype(jnp.float32) * (tsc * wsc)).astype(jnp.bfloat16)
            return d.reshape(b_, h_, w_, c_), None
    else:
        def body(x, _):
            xq, asc = _quant_dyn(x)
            y = _conv_int8(xq, kq)
            if variant == "H":
                y = jax.lax.optimization_barrier(y)
            out = y.astype(jnp.float32) * (asc * ksc) + bias
            if variant == "G":
                out = jax.lax.optimization_barrier(out)
            out = out.astype(jnp.bfloat16)
            if variant == "I":
                b_, h_, w_, c_ = out.shape
                flat = out.reshape(b_, h_ * w_, c_)
                xf = flat.astype(jnp.float32).reshape(b_, h_ * w_, 32, c_ // 32)
                mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
                var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
                xf = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(b_, h_, w_, c_)
                o = xf * gsc + gbi
                nxt = (o * jax.nn.sigmoid(o)).astype(jnp.bfloat16)
            else:
                nxt = _gn_silu(out, gsc, gbi)
            return nxt, None

    @jax.jit
    def run(x):
        x, _ = jax.lax.scan(body, x, None, length=N_ITERS)
        return x.reshape(-1)[0]

    return run, x0


def main():
    which = sys.argv[1:] or ["F", "G", "H", "I"]
    for v in which:
        run, x0 = build(v)
        out = run(x0)
        jax.block_until_ready(out)
        float(out)  # staging rep
        trace_dir = f"/tmp/int8fuse-{v}"
        with profiling.trace(trace_dir):
            float(run(x0))
        print(f"==== variant {v} (analytic {FLOPS_PER_ITER*N_ITERS/1e12:.1f} TF total) ====",
              flush=True)
        profiling.op_report(trace_dir, top=6, by="category")


if __name__ == "__main__":
    main()
