"""Probe: int8 MXU throughput on this chip (VERDICT r3 #1 feasibility).

Questions:
  1. loop-carried 8192^3 matmul: bf16 TF/s (calibration ~138-152 measured in r1/r2)
     vs int8 TOPS — is the 2x int8 MXU ceiling real through this stack?
  2. does lax.conv_general_dilated compile with int8 inputs (-> int32 accum) on TPU,
     and at what throughput vs the same conv in bf16?
  3. W8A8 dynamic-quant dense at a production shape: quantize+matmul+rescale fused —
     net TF/s-equivalent vs plain bf16 dense.

Measurement of record: xprof device time (op_report) — immune to host contention
(ROADMAP measurement discipline).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

# persistent compile cache (compiles are minutes through this tunnel)
jax.config.update("jax_compilation_cache_dir", os.path.expanduser("~/.cache/minsdtf-jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
import jax.numpy as jnp

from minsdtf_tpu import profiling

N_ITERS = 50


def loop_matmul_bf16(n=4096):
    w = jnp.asarray(np.random.RandomState(0).normal(0, 1, (n, n)), jnp.bfloat16)
    x0 = jnp.asarray(np.random.RandomState(1).normal(0, 1, (n, n)), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(x, _):
            y = jnp.dot(x, w, preferred_element_type=jnp.float32)
            return (y * (1.0 / n)).astype(jnp.bfloat16), None
        x, _ = jax.lax.scan(body, x, None, length=N_ITERS)
        return x[0, 0]

    return run, (x0,), 2 * n * n * n * N_ITERS


def loop_matmul_int8(n=4096):
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randint(-127, 128, (n, n)), jnp.int8)
    x0 = jnp.asarray(rs.randint(-127, 128, (n, n)), jnp.int8)

    @jax.jit
    def run(x):
        def body(x, _):
            y = jax.lax.dot_general(
                x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            # keep the loop carried: low bits back to int8
            return (y & 127).astype(jnp.int8), None
        x, _ = jax.lax.scan(body, x, None, length=N_ITERS)
        return x[0, 0]

    return run, (x0,), 2 * n * n * n * N_ITERS


def loop_conv(dtype, b=2, hw=64, c=640):
    rs = np.random.RandomState(0)
    if dtype == jnp.int8:
        x0 = jnp.asarray(rs.randint(-127, 128, (b, hw, hw, c)), jnp.int8)
        k = jnp.asarray(rs.randint(-16, 17, (3, 3, c, c)), jnp.int8)
        acc = jnp.int32
    else:
        x0 = jnp.asarray(rs.normal(0, 1, (b, hw, hw, c)), dtype)
        k = jnp.asarray(rs.normal(0, 0.02, (3, 3, c, c)), dtype)
        acc = jnp.float32

    @jax.jit
    def run(x):
        def body(x, _):
            y = jax.lax.conv_general_dilated(
                x, k, (1, 1), ((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc,
            )
            if dtype == jnp.int8:
                return (y & 127).astype(jnp.int8), None
            return (y * 0.01).astype(dtype), None
        x, _ = jax.lax.scan(body, x, None, length=N_ITERS)
        return x[0, 0, 0, 0]

    return run, (x0,), 2 * b * hw * hw * 9 * c * c * N_ITERS


def loop_w8a8_dense(m=8192, kdim=1280, n=1280):
    """Production-ish dense with dynamic per-row activation quant, loop-carried."""
    rs = np.random.RandomState(0)
    wq = jnp.asarray(rs.randint(-127, 128, (kdim, n)), jnp.int8)
    wsc = jnp.asarray(rs.uniform(0.001, 0.01, (n,)), jnp.float32)
    x0 = jnp.asarray(rs.normal(0, 1, (m, kdim)), jnp.bfloat16)
    proj = jnp.asarray(rs.normal(0, 1 / np.sqrt(n), (n, kdim)), jnp.bfloat16)

    @jax.jit
    def run(x):
        def body(x, _):
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
            asc = amax / 127.0
            xq = jnp.round(x.astype(jnp.float32) / asc).astype(jnp.int8)
            y = jax.lax.dot_general(
                xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
            )
            yf = (y.astype(jnp.float32) * (asc * wsc)).astype(jnp.bfloat16)
            return jnp.dot(yf, proj, preferred_element_type=jnp.float32).astype(jnp.bfloat16), None
        x, _ = jax.lax.scan(body, x, None, length=N_ITERS)
        return x[0, 0]

    return run, (x0,), 2 * m * kdim * n * 2 * N_ITERS  # two matmuls per iter


def measure(name, builder):
    try:
        run, args, flops = builder()
        out = run(*args)  # compile + stage
        jax.block_until_ready(out)
        trace_dir = f"/tmp/int8probe-{name}"
        with profiling.trace(trace_dir):
            jax.block_until_ready(run(*args))
        print(f"==== {name} (analytic {flops/1e12:.1f} TF total) ====")
        profiling.op_report(trace_dir, top=6, by="category")
    except Exception as e:
        print(f"==== {name} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    which = sys.argv[1:] or ["bf16", "int8", "conv_bf16", "conv_int8", "w8a8"]
    if "bf16" in which:
        measure("matmul-bf16", loop_matmul_bf16)
    if "int8" in which:
        measure("matmul-int8", loop_matmul_int8)
    if "conv_bf16" in which:
        measure("conv-bf16", lambda: loop_conv(jnp.bfloat16))
    if "conv_int8" in which:
        measure("conv-int8", lambda: loop_conv(jnp.int8))
    if "w8a8" in which:
        measure("w8a8-dense", loop_w8a8_dense)
