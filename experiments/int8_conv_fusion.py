"""Why did e2e W8A8 convs collapse to ~20 TF/s when the isolated int8 conv probe
hits 283 TOPS? (ROADMAP r3, int8 e2e A/B loss.)

Hypothesis: XLA fuses the fp32 dynamic-quant prologue (convert/amax/divide/round)
and the fp32 rescale epilogue INTO the convolution fusion, and the mixed
int8-MXU + fp32-VPU fusion falls off the fast conv emitter. Variants:

  A  pure-int8 conv, int consumer            — reproduces the 283-TOPS probe
  B  W8A8 fully fused (prod ops/basic path)  — expected ~20 TF/s (e2e repro)
  C  B + optimization_barrier around the conv (quantize and rescale forced into
     separate fusions; int8/int32 operands round-trip HBM)
  D  static per-tensor activation scale (no amax reduce), fused
  E  D + barriers

Loop-carried 30x in one jit; xprof device time per variant (measurement of
record on this host — ROADMAP measurement pitfalls).
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


def build(variant):
    rs = np.random.RandomState(0)
    kq = jnp.asarray(rs.randint(-16, 17, (3, 3, C, C)), jnp.int8)
    ksc = jnp.asarray(rs.uniform(0.001, 0.01, (C,)), jnp.float32)
    if variant == "A":
        x0 = jnp.asarray(rs.randint(-127, 128, (B, HW, HW, C)), jnp.int8)
    else:
        x0 = jnp.asarray(rs.normal(0, 1, (B, HW, HW, C)), jnp.bfloat16)
    static_asc = jnp.float32(4.0 / 127.0)

    def body(x, _):
        if variant == "A":
            y = _conv_int8(x, kq)
            return (y & 127).astype(jnp.int8), None
        if variant == "B":
            xq, asc = _quant_dyn(x)
            y = _conv_int8(xq, kq)
            out = (y.astype(jnp.float32) * (asc * ksc)).astype(jnp.bfloat16)
        elif variant == "C":
            xq, asc = _quant_dyn(x)
            xq = jax.lax.optimization_barrier(xq)
            y = jax.lax.optimization_barrier(_conv_int8(xq, kq))
            out = (y.astype(jnp.float32) * (asc * ksc)).astype(jnp.bfloat16)
        elif variant == "D":
            xq = jnp.round(x.astype(jnp.float32) * (1.0 / static_asc))
            xq = jnp.clip(xq, -127, 127).astype(jnp.int8)
            y = _conv_int8(xq, kq)
            out = (y.astype(jnp.float32) * (static_asc * ksc)).astype(jnp.bfloat16)
        elif variant == "E":
            xq = jnp.round(x.astype(jnp.float32) * (1.0 / static_asc))
            xq = jax.lax.optimization_barrier(jnp.clip(xq, -127, 127).astype(jnp.int8))
            y = jax.lax.optimization_barrier(_conv_int8(xq, kq))
            out = (y.astype(jnp.float32) * (static_asc * ksc)).astype(jnp.bfloat16)
        else:
            raise ValueError(variant)
        # keep magnitudes bounded so the loop carries
        return jnp.tanh(out).astype(jnp.bfloat16), None

    @jax.jit
    def run(x):
        x, _ = jax.lax.scan(body, x, None, length=N_ITERS)
        return x.reshape(-1)[0]

    return run, x0


def main():
    which = sys.argv[1:] or ["A", "B", "C", "D", "E"]
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
