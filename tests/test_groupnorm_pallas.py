"""Pallas fused GroupNorm(+SiLU) vs the XLA path, interpreter mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minsdtf_tpu.ops import groupnorm as gn
from minsdtf_tpu.ops.basic import group_norm, group_norm_silu


@pytest.mark.parametrize("shape,groups", [
    ((2, 16, 16, 320), 32),
    ((1, 8, 8, 1280), 32),
    ((2, 4, 4, 64), 32),
])
@pytest.mark.parametrize("with_silu", [False, True])
def test_groupnorm_pallas_matches_xla(shape, groups, with_silu):
    rng = np.random.RandomState(0)
    x = rng.normal(0, 2.0, shape).astype(np.float32)
    scale = rng.normal(1, 0.2, shape[-1:]).astype(np.float32)
    bias = rng.normal(0, 0.2, shape[-1:]).astype(np.float32)
    p = {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)}
    want = group_norm(jnp.asarray(x), p, num_groups=groups)
    if with_silu:
        want = want * jax.nn.sigmoid(want)
    got = gn.group_norm_pallas(
        jnp.asarray(x), p["scale"], p["bias"], num_groups=groups,
        with_silu=with_silu, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_supports_gate():
    assert gn.supports((2, 64, 64, 320), jnp.bfloat16)
    assert gn.supports((2, 8, 8, 1280), jnp.bfloat16)
    assert not gn.supports((1, 128, 128, 512), jnp.float32)  # too big for VMEM
    assert not gn.supports((1, 8, 8, 100), jnp.float32)      # C not divisible
