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

# Sequence-parallel context: when set, self-attention over >= min_seq tokens runs as
# ring attention with the token axis sharded over `axis_name` (ops/ring_attention.py)
# — the multi-chip scaling path for >1024px generation (reference GUI exposes up to
# 2048px, app.py:168-185, which is 65k tokens). Process-global by design, like _IMPL:
# it is configuration of how this process maps attention onto its mesh, set once by
# the pipeline; callers that jit around it must key their jit cache on it (the
# sampler passes it as a static arg).
_SP = None  # (mesh, axis_name, min_seq) | None


def set_impl(impl: str) -> None:
    global _IMPL
    assert impl in ("auto", "xla", "pallas")
    _IMPL = impl


def set_sequence_parallel(mesh, axis_name: str = "model", min_seq: int = 16384) -> None:
    """Enable/disable ring-attention SP. ``mesh=None`` disables. ``min_seq`` is the
    self-attention token count at which sharding kicks in (default: the 1024px
    latent, 128x128 = 16384 tokens; smaller attentions stay single-device — their
    blocks are too small to amortize the ring permutes)."""
    global _SP
    _SP = None if mesh is None else (mesh, axis_name, int(min_seq))


def sequence_parallel_key():
    """Hashable identity of the SP config, for use as a jit static argument."""
    if _SP is None:
        return None
    mesh, axis_name, min_seq = _SP
    return (axis_name, min_seq, tuple(mesh.shape.items()))


def _sp_shardable(tokens: int):
    """(mesh, axis_name, n) when SP is active and a `tokens`-long axis should be
    sharded over it; None otherwise."""
    if _SP is None:
        return None
    mesh, axis_name, min_seq = _SP
    n = int(mesh.shape[axis_name])
    if n <= 1 or tokens < min_seq or tokens % n != 0:
        return None
    return mesh, axis_name, n


def constrain_spatial(x: jax.Array) -> jax.Array:
    """Sequence-parallel GSPMD anchor for (B, H, W, C) activations: pin the H axis
    to the SP mesh axis when the spatial token count is SP-eligible.

    This is what turns "ring attention with replicated everything-else" (r2) into
    end-to-end sequence parallelism: with the conv/norm activations pinned H-sharded,
    GSPMD runs 3x3 convs spatially partitioned (automatic halo exchanges), GroupNorm
    statistics via psum, and the elementwise/FF work token-parallel — and the ring
    shard_map boundary becomes a no-op reshard instead of a per-attention
    all-gather. No-op when SP is off or the shape is too small/indivisible."""
    cfg = _sp_shardable(x.shape[1] * x.shape[2]) if x.ndim == 4 else None
    if cfg is None or x.shape[1] % cfg[2] != 0:
        return x
    mesh, axis_name, _ = cfg
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(None, axis_name, None, None))
    )


def constrain_tokens(x: jax.Array) -> jax.Array:
    """Same anchor for (B, S, C) token-major activations (transformer block)."""
    cfg = _sp_shardable(x.shape[1]) if x.ndim == 3 else None
    if cfg is None:
        return x
    mesh, axis_name, _ = cfg
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(None, axis_name, None))
    )


def _pick_impl(q_len: int, kv_len: int, head_dim: int, causal: bool,
               itemsize: int = 2) -> str:
    if _IMPL != "auto":
        return _IMPL
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        return "xla"
    from minsdtf_tpu.ops import flash_attention as fa

    return "pallas" if fa.supports(q_len, kv_len, head_dim, causal, itemsize) else "xla"


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

    if _SP is not None and not causal and sq == sk:
        mesh, axis_name, min_seq = _SP
        n = int(mesh.shape[axis_name])
        if n > 1 and sq >= min_seq and sq % n == 0:
            from minsdtf_tpu.ops.ring_attention import ring_multi_head_attention

            return ring_multi_head_attention(q, k, v, num_heads, mesh, axis_name,
                                             scale=scale)

    impl = _pick_impl(sq, sk, d, causal, jnp.dtype(q.dtype).itemsize)
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
