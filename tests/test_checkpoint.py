"""Orbax param checkpoint: roundtrip + sharded restore on the virtual mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minsdtf_tpu.parallel import mesh as mesh_lib
from minsdtf_tpu.weights import checkpoint


@pytest.fixture(scope="module")
def params():
    rng = np.random.RandomState(0)
    return {
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q": {
            "kernel": jnp.asarray(rng.normal(0, 1, (64, 64)), jnp.float32),
        },
        "conv_in": {
            "kernel": jnp.asarray(rng.normal(0, 1, (3, 3, 4, 32)), jnp.float32),
            "bias": jnp.zeros((32,), jnp.float32),
        },
    }


def test_roundtrip(params, tmp_path):
    path = str(tmp_path / "ckpt")
    checkpoint.save_params(params, path)
    restored = checkpoint.restore_params(path)
    for mod, leaves in params.items():
        for leaf, val in leaves.items():
            np.testing.assert_array_equal(np.asarray(restored[mod][leaf]), np.asarray(val))


def test_sharded_restore(params, tmp_path):
    path = str(tmp_path / "ckpt_sharded")
    checkpoint.save_params(params, path)
    mesh = mesh_lib.make_mesh(data=4, model=2)
    restored = checkpoint.restore_params(path, mesh=mesh)
    qk = restored["down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"]["kernel"]
    assert qk.sharding.spec == jax.sharding.PartitionSpec(None, "model")
    np.testing.assert_array_equal(
        np.asarray(qk),
        np.asarray(params["down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"]["kernel"]),
    )
