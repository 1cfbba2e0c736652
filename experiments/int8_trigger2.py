"""Second round of the int8-conv-collapse trigger hunt (see int8_layout_repro.py:
variants F-N all run at 270-330 TF/s; the production UNet graph runs the SAME
W8A8 chain at a uniform ~20-37 TF/s).

Remaining structural differences, one per variant:
  P  real UNet shape pyramid: (2,64,64,320)->(2,32,32,640)->(2,16,16,1280)
     ->(2,8,8,1280) and back up, stride-2 downs + nearest ups
  Q  F + a Pallas flash-attention custom call between convs (layout constraints
     from custom calls propagate globally)
  R  graph size: 40 DISTINCT convs (distinct weights) in one scan body — does an
     XLA pass budget give up past some conv count?
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

B = 2
N_ITERS = 10


def _quant_dyn(x):
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=(1, 2, 3), keepdims=True)
    asc = jnp.maximum(amax, 1e-12) * (1.0 / 127.0)
    xq = jnp.round(xf / asc).astype(jnp.int8)
    return xq, asc


_QBARRIER = False  # variant Q4: barrier between the quant prologue and the conv
_QBLOCKED = 0      # variant Q5/Q6: manual space-to-batch with this many row blocks


def _blocked_conv_int8(xq, kq, stride, pad, nb):
    """Manual space-to-batch: fold `nb` overlapping row blocks (with halo) into the
    batch dim so the int8 conv emitter sees full sublanes even when XLA's own
    space-to-batch pass skips the conv (it does for every int8 conv in a graph
    that also contains a Pallas custom call — variant Q)."""
    B, H, W, C = xq.shape
    kh = kq.shape[0]
    (pt, pb), wpad = pad
    hout = (H + pt + pb - kh) // stride + 1
    while nb > 1 and hout % nb:
        nb //= 2
    if nb <= 1:
        return jax.lax.conv_general_dilated(
            xq, kq, (stride, stride), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32), 1
    r = hout // nb
    hb = stride * (r - 1) + kh
    xp = jnp.pad(xq, ((0, 0), (pt, pb), (0, 0), (0, 0)))
    xb = jnp.stack(
        [jax.lax.slice_in_dim(xp, i * stride * r, i * stride * r + hb, axis=1)
         for i in range(nb)], axis=1
    ).reshape(B * nb, hb, W, C)
    y = jax.lax.conv_general_dilated(
        xb, kq, (stride, stride), ((0, 0), wpad),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return y.reshape(B, nb * r, y.shape[2], y.shape[3]), nb


def _w8a8(x, kq, ksc, stride=1):
    xq, asc = _quant_dyn(x)
    if _QBARRIER:
        xq = jax.lax.optimization_barrier(xq)
    if _QBLOCKED:
        y, _ = _blocked_conv_int8(xq, kq, stride, ((1, 1), (1, 1)), _QBLOCKED)
    else:
        y = jax.lax.conv_general_dilated(
            xq, kq, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
    return (y.astype(jnp.float32) * (asc * ksc)).astype(x.dtype)


def _gn_silu(x, groups=32):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, -1, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 3), keepdims=True)
    xf = ((xf - mean) * jax.lax.rsqrt(var + 1e-5)).reshape(b, h, w, c)
    return (xf * jax.nn.sigmoid(xf)).astype(x.dtype)


def _mk_kernel(rs, cin, cout):
    kq = jnp.asarray(rs.randint(-16, 17, (3, 3, cin, cout)), jnp.int8)
    ksc = jnp.asarray(rs.uniform(0.001, 0.01, (cout,)), jnp.float32)
    return kq, ksc


def build(variant):
    rs = np.random.RandomState(0)

    if variant == "P":
        widths = [320, 640, 1280, 1280]
        downs = [_mk_kernel(rs, widths[i], widths[i + 1]) for i in range(3)]
        ups = [_mk_kernel(rs, widths[i + 1], widths[i]) for i in range(3)]
        mids = [_mk_kernel(rs, w, w) for w in widths]
        x0 = jnp.asarray(rs.normal(0, 1, (B, 64, 64, 320)), jnp.bfloat16)

        def body(x, _):
            h = x
            for i in range(3):
                h = _gn_silu(_w8a8(h, *mids[i]))
                h = _w8a8(h, *downs[i], stride=2)
            h = _gn_silu(_w8a8(h, *mids[3]))
            for i in reversed(range(3)):
                h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                h = _gn_silu(_w8a8(h, *ups[i]))
            return h.astype(jnp.bfloat16), None

    elif variant.startswith("Q"):
        global _QBARRIER, _QBLOCKED
        _QBARRIER = variant == "Q4"
        _QBLOCKED = {"Q5": 8, "Q6": 16, "Q7": 32}.get(variant, 0)
        from minsdtf_tpu.ops import attention as attn_ops

        C = 640
        kq, ksc = _mk_kernel(rs, C, C)
        kq2, ksc2 = _mk_kernel(rs, C, C)
        wq = jnp.asarray(rs.normal(0, 0.02, (C, 3 * C)), jnp.bfloat16)
        x0 = jnp.asarray(rs.normal(0, 1, (B, 64, 64, C)), jnp.bfloat16)

        def body(x, _):
            h = _gn_silu(_w8a8(x, kq, ksc))
            b, hh, ww, c = h.shape
            tok = h.reshape(b, hh * ww, c)
            if variant == "Q2":
                tok = jax.lax.optimization_barrier(tok)
            qkv = tok @ wq
            q, k, v = jnp.split(qkv, 3, axis=-1)
            if variant == "Q3":
                o = attn_ops._xla_attention(
                    q.reshape(b, hh * ww, 8, c // 8),
                    k.reshape(b, hh * ww, 8, c // 8),
                    v.reshape(b, hh * ww, 8, c // 8),
                    float(c // 8) ** -0.5, False,
                ).reshape(b, hh * ww, c)
            else:
                o = attn_ops.multi_head_attention(q, k, v, num_heads=8)
            if variant == "Q2":
                o = jax.lax.optimization_barrier(o)
            h = (tok + o).reshape(b, hh, ww, c)
            h = _gn_silu(_w8a8(h, kq2, ksc2))
            return h.astype(jnp.bfloat16), None

    elif variant == "R":
        C = 640
        ks = [_mk_kernel(rs, C, C) for _ in range(40)]
        x0 = jnp.asarray(rs.normal(0, 1, (B, 32, 32, C)), jnp.bfloat16)

        def body(x, _):
            h = x
            for kq, ksc in ks:
                h = _gn_silu(_w8a8(h, kq, ksc))
            return h.astype(jnp.bfloat16), None

    @jax.jit
    def run(x):
        x, _ = jax.lax.scan(body, x, None, length=N_ITERS)
        return x.reshape(-1)[0]

    return run, x0


def main():
    which = sys.argv[1:] or ["P", "Q", "R"]
    for v in which:
        run, x0 = build(v)
        out = run(x0)
        jax.block_until_ready(out)
        float(out)  # staging rep
        trace_dir = f"/tmp/int8trig-{v}"
        with profiling.trace(trace_dir):
            float(run(x0))
        print(f"==== variant {v} ====", flush=True)
        profiling.op_report(trace_dir, top=6, by="category")


if __name__ == "__main__":
    main()
