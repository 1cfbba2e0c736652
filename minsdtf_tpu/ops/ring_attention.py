"""Ring attention: sequence-parallel attention over a mesh axis.

SURVEY §2.7/§5: the reference materializes O(S²) attention on one device, which caps
image size; flash attention (ops/flash_attention.py) removes the memory wall on ONE
chip, and this op removes the single-chip *compute* wall by sharding the h·w token
axis across a mesh axis. Blockwise online-softmax statistics (m, l, acc) are merged
as K/V shards rotate around the ring via ``jax.lax.ppermute`` — collectives ride ICI;
each step overlaps the permute with the local block computation (dataflow exposes it;
XLA schedules the overlap).

Layout: ``ring_attention(q, k, v, axis_name)`` must run inside ``shard_map`` with the
S axis sharded on ``axis_name``; each device sees (B, S/n, H, D).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _block_stats(q, k, v, scale: float, prec):
    """Unnormalized attention of local q against one K/V block: returns
    (o = exp(s - m) @ v, m = rowmax(s), l = rowsum(exp(s - m))), fp32 stats."""
    s = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32,
                   precision=prec) * scale
    m = jnp.max(s, axis=-1)                          # (B, H, Sq)
    p = jnp.exp(s - m[..., None])
    l = jnp.sum(p, axis=-1)                          # (B, H, Sq)
    o = jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v,
                   preferred_element_type=jnp.float32, precision=prec)
    return o.astype(jnp.float32), m, l


def ring_attention(
    q: jax.Array,  # (B, Sq_local, H, D)
    k: jax.Array,  # (B, Sk_local, H, D)
    v: jax.Array,
    axis_name: str,
    scale: Optional[float] = None,
) -> jax.Array:
    """Exact attention over the full (sharded) KV sequence; output is sharded like q."""
    d = q.shape[-1]
    scale = float(d) ** -0.5 if scale is None else scale
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    n = jax.lax.psum(1, axis_name)

    o0, m0, l0 = _block_stats(q, k, v, scale, prec)

    def step(r, carry):
        o_acc, m_acc, l_acc, k_cur, v_cur = carry
        perm = [(i, (i + 1) % n) for i in range(n)]
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        o_b, m_b, l_b = _block_stats(q, k_nxt, v_nxt, scale, prec)
        m_new = jnp.maximum(m_acc, m_b)
        c_acc = jnp.exp(m_acc - m_new)
        c_b = jnp.exp(m_b - m_new)
        # o carries are (B, Sq, H, D); stats are (B, H, Sq) -> transpose to broadcast
        def bc(x):
            return jnp.transpose(x, (0, 2, 1))[..., None]
        o_new = o_acc * bc(c_acc) + o_b * bc(c_b)
        l_new = l_acc * c_acc + l_b * c_b
        return o_new, m_new, l_new, k_nxt, v_nxt

    o, m, l, _, _ = jax.lax.fori_loop(0, n - 1, step, (o0, m0, l0, k, v))
    out = o / jnp.transpose(l, (0, 2, 1))[..., None]
    return out.astype(q.dtype)


def ring_multi_head_attention(q, k, v, num_heads: int, mesh, axis_name: str = "data",
                              scale: Optional[float] = None):
    """Convenience wrapper: (B, S, H*D) replicated inputs -> shard S over the mesh
    axis with shard_map, run the ring, gather back. Primarily for tests; production
    integration keeps activations sharded end-to-end."""
    from functools import partial

    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    b, s, hd = q.shape
    dh = hd // num_heads

    def inner(qh, kh, vh):
        return ring_attention(qh, kh, vh, axis_name, scale=scale).reshape(
            qh.shape[0], qh.shape[1], hd
        )

    spec = P(None, axis_name, None, None)
    fn = shard_map(
        inner,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=P(None, axis_name, None),
    )
    reshape = lambda x: x.reshape(b, s, num_heads, dh)
    return fn(reshape(q), reshape(k), reshape(v))
