"""VAE encoder/decoder (sd-vae-ft-mse architecture) as pure functions, NHWC.

Reference behavior matched:
  - encoder (``stable_diffusion/image_encoder.py:21-59``): conv 128 -> down stack
    128/256/512 with **asymmetric-pad** stride-2 downsample convs ``((0,1),(0,1))``
    -> 512/512 -> mid Res-Attn-Res -> GN+SiLU -> conv 8 -> 1x1 quant conv 8 -> take
    the mean half and scale by 0.18215 (deterministic encode, no sampling);
  - decoder (``image_decoder.py:22-66``): 1/0.18215 rescale -> 1x1 post-quant conv ->
    conv 512 -> mid Res-Attn-Res -> 3x (nearest-2x upsample + conv + 3 ResBlocks) at
    512/512/256 -> 3 ResBlocks at 128 -> GN+SiLU -> conv 3.

Param keys are diffusers-style (``encoder.down_blocks.{i}.resnets.{j}.*``,
``decoder.up_blocks.{i}.*`` in *decoder order* — up_blocks.0 is adjacent to mid).
The VAE ResnetBlock has no time embedding (reference ``layers.py:62-80``); its
attention block is single-head over h*w tokens scaled by 1/sqrt(C)
(``layers.py:28-59``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from minsdtf_tpu.ops.attention import constrain_spatial, single_head_spatial_attention
from minsdtf_tpu.ops.basic import (
    conv2d,
    dense,
    group_norm,
    group_norm_silu,
    upsample2x_conv3x3,
)

SCALE_FACTOR = 0.18215
ENC_WIDTHS = (128, 256, 512, 512)
DEC_WIDTHS = (512, 512, 256, 128)


def vae_resblock(params: dict, prefix: str, x: jax.Array) -> jax.Array:
    p = lambda name: params[f"{prefix}.{name}"]
    h = group_norm_silu(x, p("norm1"))
    h = conv2d(h, p("conv1"), padding=1)
    h = group_norm_silu(h, p("norm2"))
    h = conv2d(h, p("conv2"), padding=1)
    if f"{prefix}.conv_shortcut" in params:
        x = conv2d(x, p("conv_shortcut"))
    # sequence-parallel anchor (no-op unless SP active at this resolution) — at
    # >=2048px decode, keeps the conv/norm stack spatially partitioned
    return constrain_spatial(h + x)


def vae_attention(params: dict, prefix: str, x: jax.Array) -> jax.Array:
    p = lambda name: params[f"{prefix}.{name}"]
    b, h, w, c = x.shape
    z = group_norm(x, p("group_norm")).reshape(b, h * w, c)
    q = dense(z, p("to_q"))
    k = dense(z, p("to_k"))
    v = dense(z, p("to_v"))
    out = single_head_spatial_attention(q, k, v)
    out = dense(out, p("to_out.0")).reshape(b, h, w, c)
    return out + x


def _mid_block(params: dict, prefix: str, x: jax.Array) -> jax.Array:
    x = vae_resblock(params, f"{prefix}.resnets.0", x)
    x = vae_attention(params, f"{prefix}.attentions.0", x)
    return vae_resblock(params, f"{prefix}.resnets.1", x)


def encode(params: dict, image: jax.Array) -> jax.Array:
    """(B, H, W, 3) in [-1, 1] -> latent (B, H/8, W/8, 4), deterministic (mean * 0.18215)."""
    x = conv2d(image, params["encoder.conv_in"], padding=1)
    for level in range(4):
        for j in range(2):
            x = vae_resblock(params, f"encoder.down_blocks.{level}.resnets.{j}", x)
        if level < 3:
            x = conv2d(
                x,
                params[f"encoder.down_blocks.{level}.downsamplers.0.conv"],
                stride=2,
                padding=((0, 1), (0, 1)),
            )
    x = _mid_block(params, "encoder.mid_block", x)
    x = group_norm_silu(x, params["encoder.conv_norm_out"])
    x = conv2d(x, params["encoder.conv_out"], padding=1)  # 8 channels: mean | logvar
    x = conv2d(x, params["quant_conv"])
    mean = x[..., :4]
    return mean * SCALE_FACTOR


def decode(params: dict, latent: jax.Array) -> jax.Array:
    """latent (B, h, w, 4) -> image (B, 8h, 8w, 3) in [-1, 1]."""
    x = latent / SCALE_FACTOR
    x = conv2d(x, params["post_quant_conv"])
    x = conv2d(x, params["decoder.conv_in"], padding=1)
    x = _mid_block(params, "decoder.mid_block", x)
    for level in range(4):
        for j in range(3):
            x = vae_resblock(params, f"decoder.up_blocks.{level}.resnets.{j}", x)
        if level < 3:
            # fused nearest-2x + conv: the 2x-res intermediate never hits HBM —
            # these three pairs dominate decode traffic (decode measured 9% util r1)
            x = constrain_spatial(
                upsample2x_conv3x3(x, params[f"decoder.up_blocks.{level}.upsamplers.0.conv"])
            )
    x = group_norm_silu(x, params["decoder.conv_norm_out"])
    return conv2d(x, params["decoder.conv_out"], padding=1)


# ----------------------------------------------------------------------------------------
# Shape specs + random init
# ----------------------------------------------------------------------------------------

def param_specs(enc_widths=ENC_WIDTHS, dec_widths=DEC_WIDTHS) -> dict:
    """Defaults are sd-vae-ft-mse; tests pass scaled-down widths."""
    specs: dict = {}

    def norm(name, c):
        specs[name] = {"scale": (c,), "bias": (c,)}

    def convs(name, cin, cout, k):
        specs[name] = {"kernel": (k, k, cin, cout), "bias": (cout,)}

    def lin(name, cin, cout):
        specs[name] = {"kernel": (cin, cout), "bias": (cout,)}

    def res(prefix, cin, cout):
        norm(f"{prefix}.norm1", cin)
        convs(f"{prefix}.conv1", cin, cout, 3)
        norm(f"{prefix}.norm2", cout)
        convs(f"{prefix}.conv2", cout, cout, 3)
        if cin != cout:
            convs(f"{prefix}.conv_shortcut", cin, cout, 1)

    def attn(prefix, c):
        norm(f"{prefix}.group_norm", c)
        for n in ("to_q", "to_k", "to_v", "to_out.0"):
            lin(f"{prefix}.{n}", c, c)

    def mid(prefix, c):
        res(f"{prefix}.resnets.0", c, c)
        attn(f"{prefix}.attentions.0", c)
        res(f"{prefix}.resnets.1", c, c)

    # encoder
    convs("encoder.conv_in", 3, enc_widths[0], 3)
    cin = enc_widths[0]
    for level, w in enumerate(enc_widths):
        for j in range(2):
            res(f"encoder.down_blocks.{level}.resnets.{j}", cin if j == 0 else w, w)
        cin = w
        if level < 3:
            convs(f"encoder.down_blocks.{level}.downsamplers.0.conv", w, w, 3)
    mid("encoder.mid_block", enc_widths[-1])
    norm("encoder.conv_norm_out", enc_widths[-1])
    convs("encoder.conv_out", enc_widths[-1], 8, 3)
    convs("quant_conv", 8, 8, 1)

    # decoder
    convs("post_quant_conv", 4, 4, 1)
    convs("decoder.conv_in", 4, dec_widths[0], 3)
    mid("decoder.mid_block", dec_widths[0])
    cin = dec_widths[0]
    for level, w in enumerate(dec_widths):
        for j in range(3):
            res(f"decoder.up_blocks.{level}.resnets.{j}", cin if j == 0 else w, w)
        cin = w
        if level < 3:
            convs(f"decoder.up_blocks.{level}.upsamplers.0.conv", w, w, 3)
    norm("decoder.conv_norm_out", dec_widths[-1])
    convs("decoder.conv_out", dec_widths[-1], 3, 3)
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
