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


def _kernel(x_ref, scale_ref, bias_ref, mask_ref, o_ref, *, num_groups: int, eps: float,
            with_silu: bool):
    """Group stats via matmuls against the constant channel->group one-hot mask
    (Mosaic does not support reshaping the lane axis into (groups, gsize))."""
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    hw, c = x.shape
    mask = mask_ref[:]                # (C, G) one-hot group membership
    n = jnp.float32(hw * (c // num_groups))
    s_c = jnp.sum(x, axis=0, keepdims=True)            # (1, C)
    q_c = jnp.sum(x * x, axis=0, keepdims=True)
    s_g = jnp.dot(s_c, mask, preferred_element_type=jnp.float32)   # (1, G)
    q_g = jnp.dot(q_c, mask, preferred_element_type=jnp.float32)
    mean_g = s_g / n
    var_g = q_g / n - mean_g * mean_g
    inv_g = jax.lax.rsqrt(var_g + eps)
    # broadcast per-group stats back to channels: (1, G) @ (G, C)
    mean_c = jnp.dot(mean_g, mask.T, preferred_element_type=jnp.float32)
    inv_c = jnp.dot(inv_g, mask.T, preferred_element_type=jnp.float32)
    out = (x - mean_c) * inv_c * scale_ref[:].astype(jnp.float32) + bias_ref[:].astype(jnp.float32)
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
    mask = jnp.zeros((c, num_groups), jnp.float32)
    mask = mask.at[jnp.arange(c), jnp.arange(c) // (c // num_groups)].set(1.0)
    out = pl.pallas_call(
        functools.partial(_kernel, num_groups=num_groups, eps=eps, with_silu=with_silu),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c, num_groups), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h * w, c), x.dtype),
        interpret=interpret,
    )(xf, scale, bias, mask)
    return out.reshape(b, h, w, c)
