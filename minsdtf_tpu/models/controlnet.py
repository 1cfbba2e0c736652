"""ControlNet (canny) — hint branch + control branch, pure functions, NHWC.

Reference behavior matched (``stable_diffusion/control_net.py``):
  - HintNet (:10-42): 8 convs (16,16,32,32,96,96,256,320) with SiLU between all but
    the last, stride 2 on convs 3/5/7 — maps the (H, W, 3) hint image to an
    (H/8, W/8, 320) feature map, computed **once** per generation;
  - ControlNet (:45-118): a copy of the UNet down+mid path whose input is
    ``conv_in(latent) + hint``; collects 13 feature maps, each through a 1x1 zero-conv,
    producing the residuals consumed by ``unet.apply(..., controls=...)``.

Param keys: the control branch reuses the UNet's diffusers names (``conv_in``,
``time_embedding.*``, ``down_blocks.*``, ``mid_block.*``); zero convs are
``controlnet_down_blocks.{0..11}`` + ``controlnet_mid_block``; the hint branch is
``controlnet_cond_embedding.{conv_in, blocks.0..5, conv_out}`` (diffusers naming).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from minsdtf_tpu.models import unet as unet_lib
from minsdtf_tpu.ops.basic import conv2d, silu

HINT_WIDTHS = (16, 16, 32, 32, 96, 96, 256, 320)
CONTROL_CHANNELS = (320, 320, 320, 320, 640, 640, 640, 1280, 1280, 1280, 1280, 1280, 1280)


def hint_net(params: dict, hint_image: jax.Array) -> jax.Array:
    """(B, H, W, 3) in [0,1] -> (B, H/8, W/8, 320)."""
    names = ["controlnet_cond_embedding.conv_in"] + [
        f"controlnet_cond_embedding.blocks.{i}" for i in range(6)
    ] + ["controlnet_cond_embedding.conv_out"]
    strides = (1, 1, 2, 1, 2, 1, 2, 1)
    x = hint_image
    for i, (name, s) in enumerate(zip(names, strides)):
        x = conv2d(x, params[name], stride=s, padding=1)
        if i < 7:
            x = silu(x)
    return x


def apply(
    params: dict,
    latent: jax.Array,
    t_emb: jax.Array,
    context: jax.Array,
    hint: jax.Array,
) -> Tuple[jax.Array, ...]:
    """Control branch forward -> 13 zero-conv residuals (12 skip + 1 mid)."""
    temb = unet_lib.time_embedding(params, t_emb)

    feats = []
    x = conv2d(latent, params["conv_in"], padding=1) + hint.astype(latent.dtype)
    feats.append(x)
    for level in range(3):
        for j in range(2):
            x = unet_lib.resblock(params, f"down_blocks.{level}.resnets.{j}", x, temb)
            x = unet_lib.spatial_transformer(
                params, f"down_blocks.{level}.attentions.{j}", x, context
            )
            feats.append(x)
        x = conv2d(x, params[f"down_blocks.{level}.downsamplers.0.conv"], stride=2, padding=1)
        feats.append(x)
    x = unet_lib.resblock(params, "down_blocks.3.resnets.0", x, temb)
    feats.append(x)
    x = unet_lib.resblock(params, "down_blocks.3.resnets.1", x, temb)
    feats.append(x)

    x = unet_lib.resblock(params, "mid_block.resnets.0", x, temb)
    x = unet_lib.spatial_transformer(params, "mid_block.attentions.0", x, context)
    x = unet_lib.resblock(params, "mid_block.resnets.1", x, temb)
    feats.append(x)
    assert len(feats) == 13

    outs = []
    for i, f in enumerate(feats[:12]):
        outs.append(conv2d(f, params[f"controlnet_down_blocks.{i}"]))
    outs.append(conv2d(feats[12], params["controlnet_mid_block"]))
    return tuple(outs)


def param_specs(widths=unet_lib.BLOCK_WIDTHS, temb_dim: int = 1280) -> dict:
    """Shape spec: UNet down+mid modules + hint branch + zero convs. ``widths``
    scales down for tests exactly like :func:`unet.param_specs`."""
    unet_specs = unet_lib.param_specs(widths=widths, temb_dim=temb_dim)
    keep_prefixes = ("time_embedding", "conv_in", "down_blocks", "mid_block")
    specs = {k: v for k, v in unet_specs.items() if k.startswith(keep_prefixes)}

    def convs(name, cin, cout, k):
        specs[name] = {"kernel": (k, k, cin, cout), "bias": (cout,)}

    hint_widths = HINT_WIDTHS if widths == unet_lib.BLOCK_WIDTHS else (
        tuple(max(4, w // 8) for w in HINT_WIDTHS[:-1]) + (widths[0],)
    )
    cin = 3
    names = ["controlnet_cond_embedding.conv_in"] + [
        f"controlnet_cond_embedding.blocks.{i}" for i in range(6)
    ] + ["controlnet_cond_embedding.conv_out"]
    for name, w in zip(names, hint_widths):
        convs(name, cin, w, 3)
        cin = w

    w0, w1, w2, w3 = widths
    control_channels = (w0, w0, w0, w0, w1, w1, w1, w2, w2, w2, w3, w3)
    for i, c in enumerate(control_channels):
        convs(f"controlnet_down_blocks.{i}", c, c, 1)
    convs("controlnet_mid_block", w3, w3, 1)
    return specs


def init_params(rng: jax.Array, dtype=jnp.float32, scale: float = 0.02, **spec_kw) -> dict:
    import numpy as np

    rs = np.random.RandomState(np.asarray(jax.random.key_data(rng)).ravel()[-1] % (2**31))
    params = {}
    for name, leaves in param_specs(**spec_kw).items():
        params[name] = {}
        for leaf, shape in leaves.items():
            if leaf == "scale":
                params[name][leaf] = np.ones(shape, np.dtype(dtype))
            elif leaf == "bias":
                params[name][leaf] = np.zeros(shape, np.dtype(dtype))
            else:
                params[name][leaf] = rs.normal(0.0, scale, shape).astype(np.dtype(dtype))
    return params
