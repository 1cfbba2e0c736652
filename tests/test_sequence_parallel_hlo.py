"""Sequence parallelism end-to-end: structural assertions on the compiled HLO.

VERDICT r2 #5 asked for sharded activations end-to-end under SP (no per-layer
all-gathers). r3 finding (see ROADMAP): GSPMD propagation from the ring shard_map
boundary already spatially partitions the conv/norm stack; the explicit anchors
(ops/attention.constrain_spatial/constrain_tokens) make that deliberate. This test
pins the property so a refactor can't silently regress to replicated compute:

  - >=1 convolution runs on H-sharded operands (H_local = H_global / n);
  - all-gathers are ONLY the K/V gathers of below-min_seq attentions (queries stay
    sharded), bounded by 2 per small attention layer;
  - ring collective-permutes are present (the sharded attentions use the ring).
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from minsdtf_tpu.models import unet as unet_lib
from minsdtf_tpu.ops import attention as attention_ops
from minsdtf_tpu.parallel import mesh as mesh_lib, sharding


@pytest.fixture()
def sp_hlo():
    mesh = mesh_lib.make_mesh(data=1, model=8)
    params = unet_lib.init_params(
        jax.random.PRNGKey(0), widths=(32, 64, 128, 128), temb_dim=128
    )
    rep = sharding.replicate_params(params, mesh)
    x = jnp.zeros((1, 64, 64, 4), jnp.float32)
    t = jnp.zeros((1, 32), jnp.float32)
    ctx = jnp.zeros((1, 77, 768), jnp.float32)
    attention_ops.set_sequence_parallel(mesh, "model", min_seq=1024)
    try:
        with mesh:
            txt = jax.jit(unet_lib.apply).lower(rep, x, t, ctx).compile().as_text()
    finally:
        attention_ops.set_sequence_parallel(None)
    return txt


def test_convs_are_spatially_partitioned(sp_hlo):
    # level-0 convs at 64x64 over 8 devices -> per-device H of 8 (+ halo variants)
    shapes = re.findall(r"f32\[1,(\d+),(\d+),\d+\]\{[0-9,]*\} convolution", sp_hlo)
    hs = {(int(h), int(w)) for h, w in shapes}
    assert any(h <= 10 and w == 64 for h, w in hs), hs  # 64/8=8 rows/device
    assert not any(h == 64 and w == 64 for h, w in hs), "replicated full-res conv"


def test_all_gathers_are_only_small_kv(sp_hlo):
    gathers = re.findall(r"%all-gather[^=]*= f32\[([0-9,]+)\]", sp_hlo)
    # 5 transformers at S=256 + 1 mid at S=64 in this config -> K and V each: <=12
    assert len(gathers) <= 12, gathers
    for shape in gathers:
        s = int(shape.split(",")[1])
        assert s <= 256, f"large-sequence all-gather: [{shape}]"


def test_ring_permutes_present(sp_hlo):
    assert "collective-permute" in sp_hlo
