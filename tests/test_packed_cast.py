"""Packed weight materialization (pipeline._cast) — value/dtype parity.

The pipeline materializes host param pytrees on device in one packed transfer
per dtype + one jitted unpack program (replacing a per-leaf jnp.asarray storm
that cost ~28 ms of fixed tunnel dispatch per leaf, ~minutes per model on the
tunneled chip — r5 bench diagnosis). These tests pin the contract:

  - identical values and dtypes to the old per-leaf path (kernel/embedding cast
    to the compute dtype with round-to-nearest-even; everything else verbatim,
    including int8 ``kernel_q`` and scalar ``act_scale`` leaves);
  - device-array leaves pass through untouched (runtime LoRA remerge path);
  - init_params leaves are host numpy (no device construction at init).
"""

import jax
import jax.numpy as jnp
import numpy as np

from minsdtf_tpu.pipeline import StableDiffusion


def _bare_pipe(dtype):
    pipe = StableDiffusion.__new__(StableDiffusion)
    pipe.compute_dtype = dtype
    return pipe


def _params():
    rs = np.random.RandomState(0)
    return {
        "block.conv": {
            "kernel": rs.randn(3, 3, 8, 16).astype(np.float32),
            "bias": np.zeros(16, np.float32),
            "scale": np.ones(16, np.float32),
        },
        "block.q8": {
            "kernel_q": rs.randint(-127, 127, (3, 3, 4, 8)).astype(np.int8),
            "kernel_scale": rs.rand(8).astype(np.float32),
            "act_scale": np.float32(0.123),
        },
        "embed": {"embedding": rs.randn(11, 5).astype(np.float32)},
    }


def test_packed_cast_matches_per_leaf_reference():
    params = _params()
    out = _bare_pipe(jnp.bfloat16)._cast(params)
    for mod, leaves in params.items():
        for leaf, v in leaves.items():
            got = out[mod][leaf]
            if leaf in ("kernel", "embedding"):
                ref = jnp.asarray(np.asarray(v)).astype(jnp.bfloat16)
            else:
                ref = jnp.asarray(v)
            assert isinstance(got, jax.Array), (mod, leaf)
            assert got.dtype == ref.dtype, (mod, leaf, got.dtype)
            assert got.shape == np.asarray(v).shape, (mod, leaf)
            assert np.array_equal(
                np.asarray(got, np.float32), np.asarray(ref, np.float32)
            ), (mod, leaf)


def test_fp32_compute_dtype_materializes_without_cast():
    params = _params()
    out = _bare_pipe(jnp.float32)._cast(params)
    assert out["block.conv"]["kernel"].dtype == jnp.float32
    assert isinstance(out["block.conv"]["kernel"], jax.Array)
    assert out["block.q8"]["kernel_q"].dtype == jnp.int8
    assert np.array_equal(
        np.asarray(out["block.q8"]["kernel_q"]), params["block.q8"]["kernel_q"]
    )
    assert float(out["block.q8"]["act_scale"]) == float(params["block.q8"]["act_scale"])
    # scalar leaf keeps its 0-d shape
    assert out["block.q8"]["act_scale"].shape == ()


def test_device_leaves_pass_through():
    params = _params()
    dev = jnp.arange(4.0)
    params["runtime"] = {"kernel": dev}  # already-resident leaf (LoRA remerge)
    out = _bare_pipe(jnp.bfloat16)._cast(params)
    assert out["runtime"]["kernel"] is dev  # untouched, not recast
    # host leaves in the same pytree still materialize
    assert out["block.conv"]["kernel"].dtype == jnp.bfloat16


def test_init_params_are_host_numpy():
    from minsdtf_tpu.models import clip, controlnet, unet, vae

    for mod, seed in ((unet, 0), (clip, 1), (vae, 2), (controlnet, 3)):
        params = mod.init_params(jax.random.PRNGKey(seed))
        leaves = jax.tree_util.tree_leaves(params)
        assert leaves and all(isinstance(l, np.ndarray) for l in leaves), mod.__name__


def test_fused_projections_stay_host_side():
    from minsdtf_tpu.models import unet

    params = unet.init_params(jax.random.PRNGKey(0))
    fused = unet.fuse_attention_projections(params)
    qkv = [n for n in fused if n.endswith(".to_qkv")]
    assert qkv
    assert isinstance(fused[qkv[0]]["kernel"], np.ndarray)
