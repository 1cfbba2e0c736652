"""Pallas TPU kernel for the UNet's dominant conv shape: 3x3, stride 1, pad 1, NHWC.

XLA's conv emitter reaches ~25% of this chip's achievable matmul throughput at the
UNet's small-batch shapes (see ROADMAP.md). This kernel recasts the conv as 9
tap-matmuls over a VMEM-resident (H+2, W+2, C) halo image: one HBM read of x, all
FLOPs on the MXU as plain (H*W, C) @ (C, bo) contractions, fp32 accumulation, bias
fused. Grid = (batch, output-channel blocks).

Applicability (gated by :func:`supports`): 3x3/stride-1/pad-1, the padded image +
accumulator + weight block must fit VMEM — true for every UNet interior level at
<=1024px; the VAE's 512x512x128 tail stays on XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 13 * 1024 * 1024


def _plan(h: int, w: int, cin: int, cout: int, dtype) -> int:
    """Output-channel block size, or 0 if unsupported."""
    esize = 2 if dtype in (jnp.bfloat16, jnp.float16) else 4
    x_bytes = (h + 2) * (w + 2) * cin * esize
    bo = min(cout, 512)
    while bo >= 128 or bo == cout:
        acc_bytes = h * w * bo * 4
        w_bytes = 9 * cin * bo * esize
        if x_bytes + acc_bytes + w_bytes <= VMEM_BUDGET and cout % bo == 0:
            return bo
        if bo <= 128:
            break
        bo //= 2
    return 0


def supports(x_shape, kernel_shape, stride: int, padding, dtype) -> bool:
    if stride != 1 or kernel_shape[0] != 3 or kernel_shape[1] != 3:
        return False
    if padding != ((1, 1), (1, 1)):
        return False
    b, h, w, cin = x_shape
    cout = kernel_shape[3]
    if h * w % 8 != 0 or cin % 128 != 0 and cin % 8 != 0:
        return False
    return _plan(h, w, cin, cout, dtype) > 0


def _kernel(x_ref, w_ref, b_ref, o_ref, acc_scr, *, h: int, w: int):
    prec = jax.lax.Precision.HIGHEST if x_ref.dtype == jnp.float32 else None
    cin = x_ref.shape[-1]
    bo = o_ref.shape[-1]
    acc_scr[:] = jnp.zeros_like(acc_scr)
    for dy in range(3):
        for dx in range(3):
            xs = x_ref[0, dy:dy + h, dx:dx + w, :].reshape(h * w, cin)
            acc_scr[:] += jax.lax.dot_general(
                xs, w_ref[dy, dx], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
    out = acc_scr[:] + b_ref[0].astype(jnp.float32)
    o_ref[0] = out.reshape(h, w, bo).astype(o_ref.dtype)


def conv3x3_pallas(x: jax.Array, kernel: jax.Array, bias: jax.Array,
                   interpret: bool = False) -> jax.Array:
    """x (B, H, W, C), kernel (3, 3, C, O), bias (O,) -> (B, H, W, O)."""
    b, h, w, cin = x.shape
    cout = kernel.shape[3]
    bo = _plan(h, w, cin, cout, x.dtype)
    assert bo > 0, "unsupported shape — gate with supports()"
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel, h=h, w=w),
        grid=(b, cout // bo),
        in_specs=[
            pl.BlockSpec((1, h + 2, w + 2, cin), lambda i, j: (i, 0, 0, 0)),
            pl.BlockSpec((3, 3, cin, bo), lambda i, j: (0, 0, 0, j)),
            pl.BlockSpec((1, bo), lambda i, j: (0, j)),
        ],
        out_specs=pl.BlockSpec((1, h, w, bo), lambda i, j: (i, 0, 0, j)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, cout), x.dtype),
        scratch_shapes=[pltpu.VMEM((h * w, bo), jnp.float32)],
        interpret=interpret,
    )(xp, kernel.astype(x.dtype), bias.reshape(1, cout))
    return out
