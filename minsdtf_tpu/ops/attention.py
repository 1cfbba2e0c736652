"""Multi-head attention with pluggable implementations.

The reference materializes the full score matrix through Keras einsums
(``diffusion_model.py:123-126``, ``text_encoder.py:91-96``, ``layers.py:42-58``), which
is O(S²) HBM traffic — the scaling limiter for large images. Here the default is a
Pallas flash-attention kernel on TPU (blockwise online softmax, scores never leave
VMEM) with an XLA einsum fallback for CPU tests / unsupported shapes.

Layout: inputs are (B, S, H*D) post-projection; heads are split internally.
Softmax statistics are fp32 regardless of the compute dtype.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

_IMPL = os.environ.get("MINSDTF_ATTN_IMPL", "auto")  # auto | xla | pallas


def set_impl(impl: str) -> None:
    global _IMPL
    assert impl in ("auto", "xla", "pallas")
    _IMPL = impl


def _pick_impl(q_len: int, kv_len: int, head_dim: int, causal: bool) -> str:
    if _IMPL != "auto":
        return _IMPL
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        return "xla"
    from minsdtf_tpu.ops import flash_attention as fa

    return "pallas" if fa.supports(q_len, kv_len, head_dim, causal) else "xla"


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    scale: Optional[float] = None,
    causal: bool = False,
) -> jax.Array:
    """Scaled dot-product attention over (B, S, H*D) tensors.

    ``scale`` defaults to ``head_dim ** -0.5`` (reference ``diffusion_model.py:105``).
    ``causal=True`` applies the CLIP text-encoder triangular mask
    (reference ``text_encoder.py:77-80``).
    """
    b, sq, hd = q.shape
    sk = k.shape[1]
    d = hd // num_heads
    if scale is None:
        scale = float(d) ** -0.5

    impl = _pick_impl(sq, sk, d, causal)
    qh = q.reshape(b, sq, num_heads, d)
    kh = k.reshape(b, sk, num_heads, d)
    vh = v.reshape(b, sk, num_heads, d)

    if impl == "pallas":
        from minsdtf_tpu.ops import flash_attention as fa

        out = fa.flash_attention(qh, kh, vh, scale=scale, causal=causal)
    else:
        out = _xla_attention(qh, kh, vh, scale=scale, causal=causal)
    return out.reshape(b, sq, hd)


def _xla_attention(q, k, v, scale: float, causal: bool) -> jax.Array:
    from minsdtf_tpu.ops.basic import matmul_precision

    prec = matmul_precision(q.dtype)
    # (B, S, H, D) -> (B, H, Sq, Sk) scores with fp32 accumulation/softmax.
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32, precision=prec
    ) * scale
    if causal:
        sq, sk = scores.shape[-2], scores.shape[-1]
        mask = jnp.tril(jnp.ones((sq, sk), dtype=bool), k=sk - sq)
        scores = jnp.where(mask, scores, jnp.float32(-jnp.inf))
    # fp32 softmax; the PV matmul runs in compute dtype (bf16 prod) or fp32 (parity).
    pv_dtype = jnp.float32 if prec is not None else q.dtype
    weights = jax.nn.softmax(scores, axis=-1).astype(pv_dtype)
    return jnp.einsum(
        "bhqk,bkhd->bqhd", weights, v.astype(pv_dtype),
        preferred_element_type=jnp.float32, precision=prec,
    ).astype(q.dtype)


def single_head_spatial_attention(q, k, v) -> jax.Array:
    """VAE attention block: single head over h*w tokens, scale 1/sqrt(C)
    (reference ``layers.py:42-58``). Inputs (B, S, C)."""
    c = q.shape[-1]
    return multi_head_attention(q, k, v, num_heads=1, scale=float(c) ** -0.5)
