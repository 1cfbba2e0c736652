"""Pallas TPU flash attention (blockwise online softmax).

Placeholder gate for now — the kernel lands in the perf pass. ``supports`` returning
False routes everything through the XLA path, so correctness never depends on this
module.
"""

from __future__ import annotations

import jax


def supports(q_len: int, kv_len: int, head_dim: int) -> bool:
    return False


def flash_attention(q, k, v, scale: float, causal: bool = False) -> jax.Array:
    raise NotImplementedError("Pallas flash attention not implemented yet")
