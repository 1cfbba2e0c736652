"""Fused GroupNorm(+SiLU) Pallas TPU kernel.

Every UNet/VAE ResBlock runs GroupNorm -> SiLU -> conv twice
(``diffusion_model.py:26-34``, ``layers.py:62-80``); the reference leaves the chain
to Keras as three ops. XLA already fuses most of the elementwise tail, but the
normalization is a two-pass reduction over (H, W, C/G) per group — this kernel does
one read of x per pass with the group statistics computed in fp32 in VMEM, then the
scale/shift + SiLU applied in the same pass through the data.

Layout: NHWC with C divisible by 32 groups (all SD1.5 widths are). Each grid step
processes one image of the batch; (H*W, C) fits VMEM for every shape the UNet sees
at <=1024px (64*64*1280*4B = 20MB is over — so blocks split the row dim, with a
two-step grid: stats accumulation then apply).

For simplicity and robustness this kernel handles the common case where one image's
(H*W, C) tile fits VMEM (all UNet interior levels; VAE at <=512px); `supports`
gates it and callers fall back to the XLA path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

VMEM_BUDGET = 12 * 1024 * 1024


def supports(shape, dtype, num_groups: int = 32) -> bool:
    b, h, w, c = shape
    if c % num_groups != 0:
        return False
    bytes_needed = h * w * c * (4 if dtype == jnp.float32 else 2) + h * w * c * 4 // 8
    return bytes_needed < VMEM_BUDGET


def _kernel(x_ref, scale_ref, bias_ref, o_ref, *, num_groups: int, eps: float, with_silu: bool):
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    hw, c = x.shape
    gsize = c // num_groups
    xg = x.reshape(hw, num_groups, gsize)
    mean = jnp.mean(xg, axis=(0, 2), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(0, 2), keepdims=True)
    xn = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(hw, c)
    out = xn * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
    if with_silu:
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


def group_norm_pallas(
    x: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    num_groups: int = 32,
    eps: float = 1e-5,
    with_silu: bool = False,
    interpret: bool = False,
) -> jax.Array:
    """x: (B, H, W, C) NHWC -> same shape; per-image grid step."""
    b, h, w, c = x.shape
    xf = x.reshape(b, h * w, c)
    out = pl.pallas_call(
        functools.partial(_kernel, num_groups=num_groups, eps=eps, with_silu=with_silu),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), x.dtype),
        interpret=interpret,
    )(xf, scale, bias)
    return out.reshape(b, h, w, c)
