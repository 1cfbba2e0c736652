"""SD1.5 UNet (ε-prediction) as a pure function over a flat param dict, NHWC.

Architecture matched weight-for-weight to the reference
(``stable_diffusion/diffusion_model.py:163-296``):
  conv_in 320; three down levels of [ResBlock + SpatialTransformer]x2 + stride-2
  downsample at widths 320/640/1280; down_blocks.3 = 2 ResBlocks; mid Res-Attn-Res;
  four up levels of 3 ResBlocks with skip-concat (+ SpatialTransformer except
  up_blocks.0) and nearest-2x upsamplers; exit GroupNorm+SiLU+conv->4. 8 heads
  everywhere (head dims 40/80/160); one TransformerBlock per attention (self-attn,
  cross-attn vs 768-d context, GEGLU-tanh FF x4).

Optional ``controls`` is a tuple of 13 residual maps (12 added to the skip stack, 1 to
the mid output — reference ``diffusion_model.py:230-234``), produced by
:mod:`minsdtf_tpu.models.controlnet`.

TPU-first differences from the reference: this is a traced pure function (jitted once
as part of the whole denoise scan, not per-call ``predict_on_batch``); attention goes
through :mod:`minsdtf_tpu.ops.attention` (Pallas flash path on TPU); cond/uncond CFG
pairs arrive pre-batched on the batch axis.

Param keys are diffusers-style, identical to the reference's Keras layer names
(e.g. ``down_blocks.0.resnets.0.conv1``), with attention out-proj as ``to_out.0``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from minsdtf_tpu.ops.attention import (
    constrain_spatial,
    constrain_tokens,
    multi_head_attention,
)
from minsdtf_tpu.ops.basic import (
    conv2d,
    dense,
    geglu,
    group_norm,
    group_norm_silu,
    layer_norm,
    silu,
    upsample2x_conv3x3,
)

NUM_HEADS = 8
CONTEXT_DIM = 768
BLOCK_WIDTHS = (320, 640, 1280, 1280)


def resblock(params: dict, prefix: str, x: jax.Array, temb: jax.Array) -> jax.Array:
    """ResBlock (reference ``diffusion_model.py:22-51``): GN+SiLU+conv, +time proj,
    GN+SiLU+conv, +shortcut (1x1 conv iff channel count changes)."""
    p = lambda name: params[f"{prefix}.{name}"]
    h = group_norm_silu(x, p("norm1"))
    h = conv2d(h, p("conv1"), padding=1)
    h = h + dense(temb, p("time_emb_proj"))[:, None, None, :]
    h = group_norm_silu(h, p("norm2"))
    h = conv2d(h, p("conv2"), padding=1)
    if f"{prefix}.conv_shortcut" in params:
        x = conv2d(x, p("conv_shortcut"))
    # sequence-parallel anchor (no-op unless SP is active at this resolution):
    # keeps the residual stream H-sharded so GSPMD partitions the convs/norms
    # spatially instead of replicating them (ops/attention.constrain_spatial)
    return constrain_spatial(h + x)


def cross_attention(params: dict, prefix: str, x: jax.Array, context: jax.Array) -> jax.Array:
    """(B, S, C) attention with no-bias q/k/v and biased out-proj
    (reference ``diffusion_model.py:99-129``); context == x for self-attention.

    When :func:`fuse_attention_projections` has been applied, the q/k/v (self-attn)
    or k/v (cross-attn) projections run as one wide matmul — better MXU shapes."""
    p = lambda name: params[f"{prefix}.{name}"]
    if f"{prefix}.to_qkv" in params:  # fused self-attention projections
        q, k, v = jnp.split(dense(x, p("to_qkv")), 3, axis=-1)
    elif f"{prefix}.to_kv" in params:  # fused cross-attention K/V
        q = dense(x, p("to_q"))
        k, v = jnp.split(dense(context, p("to_kv")), 2, axis=-1)
    else:
        q = dense(x, p("to_q"))
        k = dense(context, p("to_k"))
        v = dense(context, p("to_v"))
    out = multi_head_attention(q, k, v, num_heads=NUM_HEADS)
    return dense(out, p("to_out.0"))


def transformer_block(params: dict, prefix: str, x: jax.Array, context: jax.Array) -> jax.Array:
    """LN->self-attn, LN->cross-attn, LN->GEGLU FF, all residual
    (reference ``diffusion_model.py:81-96``)."""
    p = lambda name: params[f"{prefix}.{name}"]
    dim = x.shape[-1]
    h = layer_norm(x, p("norm1"))
    x = cross_attention(params, f"{prefix}.attn1", h, h) + x
    x = cross_attention(params, f"{prefix}.attn2", layer_norm(x, p("norm2")), context) + x
    h = geglu(layer_norm(x, p("norm3")), p("ff.net.0.proj"), output_dim=dim * 4)
    return dense(h, p("ff.net.2")) + x


def spatial_transformer(params: dict, prefix: str, x: jax.Array, context: jax.Array) -> jax.Array:
    """GN -> 1x1 proj_in -> tokens -> TransformerBlock -> 1x1 proj_out + residual
    (reference ``Attentions``, ``diffusion_model.py:54-78``)."""
    p = lambda name: params[f"{prefix}.{name}"]
    b, h, w, c = x.shape
    z = group_norm(x, p("norm"))
    z = conv2d(z, p("proj_in"))
    z = constrain_tokens(z.reshape(b, h * w, c))  # SP: tokens stay sharded end-to-end
    z = transformer_block(params, f"{prefix}.transformer_blocks.0", z, context)
    z = constrain_tokens(z).reshape(b, h, w, c)
    return constrain_spatial(conv2d(z, p("proj_out")) + x)


def time_embedding(params: dict, t_emb_320: jax.Array) -> jax.Array:
    """320 -> Dense 1280 -> SiLU -> Dense 1280 -> SiLU
    (reference ``diffusion_model.py:184-188``)."""
    h = silu(dense(t_emb_320, params["time_embedding.linear_1"]))
    return silu(dense(h, params["time_embedding.linear_2"]))


def apply(
    params: dict,
    latent: jax.Array,
    t_emb: jax.Array,
    context: jax.Array,
    controls: Optional[Sequence[jax.Array]] = None,
) -> jax.Array:
    """UNet forward: (B,h,w,4), (B,320), (B,S,768) [, 13 control residuals] -> (B,h,w,4)."""
    temb = time_embedding(params, t_emb)

    # ---- down path; `skips` mirrors the reference's `outputs` list --------------
    skips = []
    x = constrain_spatial(conv2d(latent, params["conv_in"], padding=1))
    skips.append(x)
    for level in range(3):
        for j in range(2):
            x = resblock(params, f"down_blocks.{level}.resnets.{j}", x, temb)
            x = spatial_transformer(params, f"down_blocks.{level}.attentions.{j}", x, context)
            skips.append(x)
        x = constrain_spatial(
            conv2d(x, params[f"down_blocks.{level}.downsamplers.0.conv"], stride=2, padding=1)
        )
        skips.append(x)
    x = resblock(params, "down_blocks.3.resnets.0", x, temb)
    skips.append(x)
    x = resblock(params, "down_blocks.3.resnets.1", x, temb)
    skips.append(x)

    # ---- mid ---------------------------------------------------------------------
    x = resblock(params, "mid_block.resnets.0", x, temb)
    x = spatial_transformer(params, "mid_block.attentions.0", x, context)
    x = resblock(params, "mid_block.resnets.1", x, temb)

    if controls is not None:
        assert len(controls) == 13 and len(skips) == 12
        x = x + controls[12].astype(x.dtype)
        skips = [s + c.astype(s.dtype) for s, c in zip(skips, controls[:12])]

    # ---- up path -------------------------------------------------------------------
    # up_blocks.0: 3 ResBlocks (no attention) + upsampler (reference :237-243)
    for j in range(3):
        x = jnp.concatenate([x, skips.pop()], axis=-1)
        x = resblock(params, f"up_blocks.0.resnets.{j}", x, temb)
    x = constrain_spatial(upsample2x_conv3x3(x, params["up_blocks.0.upsamplers.0.conv"]))
    # up_blocks.1..3: [concat, ResBlock, SpatialTransformer] x3 (+ upsampler on 1,2)
    for level in (1, 2, 3):
        for j in range(3):
            x = jnp.concatenate([x, skips.pop()], axis=-1)
            x = resblock(params, f"up_blocks.{level}.resnets.{j}", x, temb)
            x = spatial_transformer(params, f"up_blocks.{level}.attentions.{j}", x, context)
        if level < 3:
            x = constrain_spatial(
                upsample2x_conv3x3(x, params[f"up_blocks.{level}.upsamplers.0.conv"])
            )
    assert not skips

    # ---- exit ------------------------------------------------------------------------
    x = group_norm_silu(x, params["conv_norm_out"])
    return conv2d(x, params["conv_out"], padding=1)


def fuse_attention_projections(params: dict) -> dict:
    """Concatenate attn1 q/k/v (and attn2 k/v) kernels into single wide matmuls.

    A load-time transform (applied by the pipeline on single-device runs): the three
    (C, C) no-bias projections share the same input, so one (C, 3C) matmul replaces
    three dispatches with a more MXU-friendly N. Not applied under TP meshes — the
    Megatron column rules shard per-projection."""
    import numpy as np

    fused = dict(params)
    for name in list(params):
        if name.endswith(".attn1.to_q"):
            base = name[: -len(".to_q")]
            kernels = [params[f"{base}.to_{t}"]["kernel"] for t in ("q", "k", "v")]
            # host leaves stay host (one packed device transfer happens later
            # in pipeline._cast); device leaves concatenate on device
            xp = np if isinstance(kernels[0], np.ndarray) else jnp
            fused[f"{base}.to_qkv"] = {"kernel": xp.concatenate(kernels, axis=1)}
            for t in ("q", "k", "v"):
                del fused[f"{base}.to_{t}"]
        elif name.endswith(".attn2.to_k"):
            base = name[: -len(".to_k")]
            kernels = [params[f"{base}.to_{t}"]["kernel"] for t in ("k", "v")]
            xp = np if isinstance(kernels[0], np.ndarray) else jnp
            fused[f"{base}.to_kv"] = {"kernel": xp.concatenate(kernels, axis=1)}
            for t in ("k", "v"):
                del fused[f"{base}.to_{t}"]
    return fused


# ---------------------------------------------------------------------------------------
# Parameter-shape table + random init (tests / benchmarks).
# ---------------------------------------------------------------------------------------

def param_specs(widths=BLOCK_WIDTHS, temb_dim: int = 1280, context_dim: int = CONTEXT_DIM) -> dict:
    """Flat {module_name: {leaf: shape}} spec. Defaults are the full SD1.5 UNet;
    tests use scaled-down widths (``apply`` reads all channel counts from the params,
    so the same code runs any width config)."""
    specs: dict = {}

    def norm(name, c):
        specs[name] = {"scale": (c,), "bias": (c,)}

    def convs(name, cin, cout, k):
        specs[name] = {"kernel": (k, k, cin, cout), "bias": (cout,)}

    def lin(name, cin, cout, bias=True):
        specs[name] = {"kernel": (cin, cout), **({"bias": (cout,)} if bias else {})}

    def res(prefix, cin, cout):
        norm(f"{prefix}.norm1", cin)
        convs(f"{prefix}.conv1", cin, cout, 3)
        lin(f"{prefix}.time_emb_proj", temb_dim, cout)
        norm(f"{prefix}.norm2", cout)
        convs(f"{prefix}.conv2", cout, cout, 3)
        if cin != cout:
            convs(f"{prefix}.conv_shortcut", cin, cout, 1)

    def attn(prefix, c):
        norm(f"{prefix}.norm", c)
        convs(f"{prefix}.proj_in", c, c, 1)
        t = f"{prefix}.transformer_blocks.0"
        for ln in ("norm1", "norm2", "norm3"):
            specs[f"{t}.{ln}"] = {"scale": (c,), "bias": (c,)}
        for a, kv in (("attn1", c), ("attn2", context_dim)):
            lin(f"{t}.{a}.to_q", c, c, bias=False)
            lin(f"{t}.{a}.to_k", kv, c, bias=False)
            lin(f"{t}.{a}.to_v", kv, c, bias=False)
            lin(f"{t}.{a}.to_out.0", c, c)
        lin(f"{t}.ff.net.0.proj", c, c * 8)
        lin(f"{t}.ff.net.2", c * 4, c)
        convs(f"{prefix}.proj_out", c, c, 1)

    lin("time_embedding.linear_1", widths[0], temb_dim)
    lin("time_embedding.linear_2", temb_dim, temb_dim)
    convs("conv_in", 4, widths[0], 3)

    for level in range(3):
        cin = widths[level - 1] if level > 0 else widths[0]
        for j in range(2):
            res(f"down_blocks.{level}.resnets.{j}", cin if j == 0 else widths[level], widths[level])
            attn(f"down_blocks.{level}.attentions.{j}", widths[level])
        convs(f"down_blocks.{level}.downsamplers.0.conv", widths[level], widths[level], 3)
    res("down_blocks.3.resnets.0", widths[2], widths[3])
    res("down_blocks.3.resnets.1", widths[3], widths[3])

    res("mid_block.resnets.0", widths[3], widths[3])
    attn("mid_block.attentions.0", widths[3])
    res("mid_block.resnets.1", widths[3], widths[3])

    # Up path input channels: x concat skip. Skip channel schedule mirrors the
    # down-path `skips` stack (see `apply`).
    w0, w1, w2, w3 = widths
    skip_cs = [w0, w0, w0, w0, w1, w1, w1, w2, w2, w2, w3, w3]
    up_widths = (w3, w2, w1, w0)
    x_c = w3
    for level in range(4):
        w = up_widths[level]
        for j in range(3):
            res(f"up_blocks.{level}.resnets.{j}", x_c + skip_cs.pop(), w)
            if level > 0:
                attn(f"up_blocks.{level}.attentions.{j}", w)
            x_c = w
        if level < 3:
            convs(f"up_blocks.{level}.upsamplers.0.conv", w, w, 3)

    norm("conv_norm_out", widths[0])
    convs("conv_out", widths[0], 4, 3)
    return specs


def init_params(rng: jax.Array, dtype=jnp.float32, scale: float = 0.02, **spec_kw) -> dict:
    """Random params matching :func:`param_specs`. Leaves are HOST numpy arrays:
    the pipeline materializes whole pytrees on device in one packed transfer
    (pipeline._cast) — constructing each leaf as a device array costs a ~28 ms
    tunnel dispatch here, ~minutes per model (measured r5)."""
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
