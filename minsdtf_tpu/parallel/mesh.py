"""Device mesh construction.

The reference has no distributed layer at all (SURVEY §2.7); scale-out here is pure
``jax.sharding``: one :class:`jax.sharding.Mesh`, with XLA GSPMD inserting the ICI
collectives implied by the param/activation shardings in
:mod:`minsdtf_tpu.parallel.sharding`.

Axes:
  - ``data``: batch (images, and the CFG cond/uncond pair) — DP, no weight comms;
  - ``model``: attention heads / FF hidden dim — Megatron-style TP.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh. Defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))
