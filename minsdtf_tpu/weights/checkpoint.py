"""Orbax checkpointing of converted param pytrees.

Complements the msgpack convert-cache: orbax checkpoints restore **directly into a
sharded layout** (each host/device reads only its shard), which is what multi-chip
serving wants — no full-size host copy, no broadcast. The reference has no save path
at all (its "checkpointing" is reading foreign torch files, SURVEY §5).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def save_params(params: dict, path: str) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, params, force=True)


def restore_params(path: str, mesh=None) -> dict:
    """Restore a param pytree; with ``mesh``, leaves materialize already placed
    according to the TP/DP rules (:mod:`minsdtf_tpu.parallel.sharding`)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        if mesh is None:
            return ckptr.restore(path)
        from jax.sharding import NamedSharding

        from minsdtf_tpu.parallel import sharding as sh

        metadata = ckptr.metadata(path)

        def as_sharded(subpath, leaf):
            module = ".".join(str(p.key) for p in subpath[:-1])
            name = str(subpath[-1].key)
            spec = sh.param_spec(module, name, len(leaf.shape))
            return jax.ShapeDtypeStruct(
                leaf.shape, leaf.dtype, sharding=NamedSharding(mesh, spec)
            )

        target = jax.tree_util.tree_map_with_path(as_sharded, metadata.item_metadata
                                                  if hasattr(metadata, "item_metadata") else metadata)
        return ckptr.restore(path, target)
