"""Full-width multi-chip sharding, pinned by AOT lowering (VERDICT r3 #5).

The dryrun/suite sharding tests execute at toy widths; these tests lower the
PRODUCTION ``sampler.generate`` at real SD1.5 widths (320/640/1280 channels,
8 heads, 1280-dim time embedding, 13-skip concats, full VAE) over the 8-device
virtual mesh — ``jit(...).lower()`` with abstract (ShapeDtypeStruct) params, so
no 860M-param materialization and no compile — and assert the partition specs
that reach XLA:

  - every Megatron column/row kernel arrives model-axis sharded (the exact
    mhlo.sharding strings are derived from a 1-op probe, not hand-written);
  - batch inputs arrive data-sharded; no silent full replication of the
    attention/FF weights;
  - the 1024px sequence-parallel program contains the ring collective permutes
    and H-sharded activation constraints at lowering time.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from minsdtf_tpu import sampler
from minsdtf_tpu import scheduler as sched_lib
from minsdtf_tpu.models import unet as unet_lib, vae as vae_lib
from minsdtf_tpu.ops import attention as attention_ops
from minsdtf_tpu.parallel import mesh as mesh_lib, sharding

BATCH = 8
STEPS = 2  # scan traces its body once; step count doesn't change the lowering


def _abstract_params(specs: dict, mesh, dtype, tp: bool):
    """param_specs -> ShapeDtypeStruct tree with the production shardings
    (sharding.param_spec under TP, replicated under SP)."""
    out = {}
    for name, leaves in specs.items():
        out[name] = {}
        for leaf, shape in leaves.items():
            spec = sharding.param_spec(name, leaf, len(shape)) if tp else P()
            out[name][leaf] = jax.ShapeDtypeStruct(
                shape, dtype, sharding=NamedSharding(mesh, spec))
    return out


def _sharding_str(mesh, spec, shape):
    """The sharding attribute string the partitioner gets for (mesh, spec) — probed
    from a 1-arg lowering so the test never hand-writes sharding syntax (works for
    both Shardy `#sdy.sharding<...>` and GSPMD `mhlo.sharding = "..."` lowerings)."""
    arg = jax.ShapeDtypeStruct(shape, jnp.float32, sharding=NamedSharding(mesh, spec))
    txt = jax.jit(lambda x: x + 1).lower(arg).as_text()
    m = re.search(r'sdy\.sharding = (#sdy\.sharding<[^>]+>)', txt)
    if m is None:
        m = re.search(r'mhlo\.sharding = ("[^"]+")', txt)
    assert m, txt
    return m.group(1)


def _lower_sampler(mesh, tp: bool, latent_hw: int, sp_key=None):
    dtype = jnp.bfloat16
    unet_specs = unet_lib.param_specs()                       # full SD1.5 widths
    vae_specs = vae_lib.param_specs()
    u = _abstract_params(unet_specs, mesh, dtype, tp)
    v = _abstract_params(vae_specs, mesh, dtype, tp=False)    # VAE stays replicated

    b = BATCH if tp else 1
    baxis = mesh_lib.DATA_AXIS if tp else None
    latent0 = jax.ShapeDtypeStruct(
        (b, latent_hw, latent_hw, 4), dtype,
        sharding=NamedSharding(mesh, P(baxis, None, None, None)))
    ctx = jax.ShapeDtypeStruct(
        (b, 77, 768), jnp.float32,
        sharding=NamedSharding(mesh, P(baxis, None, None)))
    unc = jax.ShapeDtypeStruct(
        (b, 77, 768), jnp.float32,
        sharding=NamedSharding(mesh, P(baxis, None, None)))

    schedule = sched_lib.build_denoise_schedule(
        sched_lib.Scheduler(active_tcd=False), STEPS)
    t_embs = jnp.asarray(sched_lib.timestep_embedding(schedule.timesteps), jnp.float32)
    rows = {k: np.asarray(getattr(schedule, k), np.float32) for k in (
        "sr_t", "nr_t", "sr_prev", "nr_prev", "is_last")}

    with mesh:
        lowered = sampler.generate_jit().lower(
            u, v, latent0, ctx, unc, t_embs, rows,
            jnp.float32(7.5), jnp.float32(0.7),
            use_cfg=True, active_tcd=False, stochastic=False,
            use_controls=False, use_inpaint=False, decode=True, sp=sp_key,
        )
    return lowered.as_text()


@pytest.fixture(scope="module")
def tp_mesh():
    return mesh_lib.make_mesh(data=4, model=2)


@pytest.fixture(scope="module")
def dptp_hlo(tp_mesh):
    return _lower_sampler(tp_mesh, tp=True, latent_hw=64)


def test_column_and_row_kernels_are_model_sharded(tp_mesh, dptp_hlo):
    col = _sharding_str(tp_mesh, P(None, mesh_lib.MODEL_AXIS), (8, 8))
    row = _sharding_str(tp_mesh, P(mesh_lib.MODEL_AXIS, None), (8, 8))
    n_col = dptp_hlo.count(col)
    n_row = dptp_hlo.count(row)
    # 16 transformers x (attn1 q/k/v + attn2 q/k/v + ff proj) = 112 column kernels
    # (+ column biases on ff proj / to_out inputs share the row string? biases use
    # P(model) = a different 1-d sharding, not counted here)
    # 16 transformers x (2 to_out + ff.net.2) = 48 row kernels
    assert n_col >= 112, (n_col, col)
    assert n_row >= 48, (n_row, row)


def test_batch_inputs_are_data_sharded(tp_mesh, dptp_hlo):
    bsh = _sharding_str(tp_mesh, P(mesh_lib.DATA_AXIS, None, None, None),
                        (BATCH, 64, 64, 4))
    assert dptp_hlo.count(bsh) >= 1, bsh


def test_attention_ff_kernels_not_replicated(tp_mesh, dptp_hlo):
    """No silent full replication: at full widths the sharded-kernel count must
    cover EVERY Megatron site (112 column + 48 row), not a subset."""
    col = _sharding_str(tp_mesh, P(None, mesh_lib.MODEL_AXIS), (8, 8))
    row = _sharding_str(tp_mesh, P(mesh_lib.MODEL_AXIS, None), (8, 8))
    assert dptp_hlo.count(col) + dptp_hlo.count(row) == 112 + 48


def test_full_width_heads_divide_model_axis(tp_mesh):
    """8 heads / 1280-dim FF / 640-dim attention all divide model=2 — the trace
    itself (jnp.split of fused projections is not used under TP; per-head shapes
    derive from params) must lower without shape errors at full widths."""
    # lowering already happened in the fixture; this pins the batch=1 TP case too
    txt = _lower_sampler(tp_mesh, tp=True, latent_hw=64)
    assert "stablehlo" in txt or "module" in txt


def test_sequence_parallel_1024px_has_ring_permutes():
    mesh = mesh_lib.make_mesh(data=1, model=8)
    attention_ops.set_sequence_parallel(mesh, "model", min_seq=16384)
    try:
        txt = _lower_sampler(
            mesh, tp=False, latent_hw=128,
            sp_key=attention_ops.sequence_parallel_key())
    finally:
        attention_ops.set_sequence_parallel(None)
    assert "collective_permute" in txt or "collective-permute" in txt
    # the spatial anchors must pin H-sharded activations at 1024px: the
    # with_sharding_constraint lowers to an explicit constraint op carrying the
    # H-axis sharding (Shardy: `sdy.sharding_constraint %x <@mesh, [{}, {"model"},
    # {}, {}]>`; GSPMD: a @Sharding custom-call with the tile string)
    n_h = len(re.findall(
        r'sharding_constraint[^\n]*\[\{\}, \{"model"\}, \{\}, \{\}\]', txt))
    if n_h == 0:  # GSPMD fallback
        hsh = _sharding_str(mesh, P(None, "model", None, None), (1, 128, 128, 4))
        n_h = txt.count(hsh)
    # one anchor per ResBlock/transformer output at the 128x128 level and below
    # (constrain_spatial/constrain_tokens) — dozens in the full UNet
    assert n_h >= 10, n_h
