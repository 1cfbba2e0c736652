"""Sharding rules: how params and activations map onto the mesh.

Strategy (SURVEY §2.7's TPU-native plan):
  - **DP** over ``data``: the image batch (and CFG pair) is sharded; weights are
    replicated on that axis. Zero weight comms — SD1.5 (~1.1B params total) fits per
    chip.
  - **TP** over ``model``: Megatron-style column/row parallelism on every attention
    and feed-forward matmul (to_q/to_k/to_v and fc1/GEGLU-proj column-parallel;
    to_out/fc2 row-parallel), in both the UNet transformers and the CLIP encoder.
    Convolutions and norms stay replicated — they are <20% of FLOPs and GroupNorm
    wants whole channel groups.

Everything is expressed as ``NamedSharding`` placements (GSPMD); XLA inserts the
all-reduces on the row-parallel outputs automatically. The same model code runs on
1 chip (trivial mesh) or N.
"""

from __future__ import annotations

from typing import Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from minsdtf_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

# Module-name suffixes that are column-parallel (output dim sharded) / row-parallel
# (input dim sharded) under TP.
_COLUMN_SUFFIXES = (
    ".to_q", ".to_k", ".to_v",
    ".self_attn.q_proj", ".self_attn.k_proj", ".self_attn.v_proj",
    ".ff.net.0.proj", ".mlp.fc1",
)
_ROW_SUFFIXES = (".to_out.0", ".self_attn.out_proj", ".ff.net.2", ".mlp.fc2")


def param_spec(module: str, leaf: str, ndim: int) -> P:
    if leaf == "kernel" and ndim == 2:
        if module.endswith(_COLUMN_SUFFIXES):
            return P(None, MODEL_AXIS)
        if module.endswith(_ROW_SUFFIXES):
            return P(MODEL_AXIS, None)
    if leaf == "bias" and module.endswith(_COLUMN_SUFFIXES):
        return P(MODEL_AXIS)
    return P()


def shard_params(params: Dict[str, Dict[str, jax.Array]], mesh: Mesh):
    """Place a flat param dict onto the mesh according to the TP rules."""
    out: Dict[str, Dict[str, jax.Array]] = {}
    for module, leaves in params.items():
        out[module] = {}
        for leaf, value in leaves.items():
            spec = param_spec(module, leaf, value.ndim)
            out[module][leaf] = jax.device_put(value, NamedSharding(mesh, spec))
    return out


def replicate_params(params: Dict[str, Dict[str, jax.Array]], mesh: Mesh):
    """Replicate every param across the mesh (used by sequence-parallel generation,
    where the `model` axis shards the attention token dimension, not the weights)."""
    out: Dict[str, Dict[str, jax.Array]] = {}
    for module, leaves in params.items():
        out[module] = {
            leaf: jax.device_put(v, NamedSharding(mesh, P())) for leaf, v in leaves.items()
        }
    return out


def shard_batch(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Place a batched array with its leading axis on the data axis."""
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def constrain_batch(x: jax.Array, mesh: Mesh) -> jax.Array:
    """In-jit sharding constraint pinning the batch axis (GSPMD hint)."""
    spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
