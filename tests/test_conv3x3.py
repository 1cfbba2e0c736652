"""Pallas 3x3 conv kernel vs lax.conv (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minsdtf_tpu.ops import conv3x3


@pytest.mark.parametrize("b,hw,cin,cout", [
    (2, 16, 320, 320),
    (1, 8, 1280, 1280),
    (2, 8, 2560, 1280),
    (2, 16, 320, 640),
])
def test_conv3x3_matches_lax(b, hw, cin, cout):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(0, 1, (b, hw, hw, cin)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (3, 3, cin, cout)), jnp.float32)
    bias = jnp.asarray(rng.normal(0, 0.1, (cout,)), jnp.float32)
    want = jax.lax.conv_general_dilated(
        x, w, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
    ) + bias
    got = conv3x3.conv3x3_pallas(x, w, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_supports():
    assert conv3x3.supports((2, 64, 64, 320), (3, 3, 320, 320), 1, ((1, 1), (1, 1)), jnp.bfloat16)
    assert conv3x3.supports((2, 8, 8, 2560), (3, 3, 2560, 1280), 1, ((1, 1), (1, 1)), jnp.bfloat16)
    assert not conv3x3.supports((1, 512, 512, 128), (3, 3, 128, 128), 1, ((1, 1), (1, 1)), jnp.float32)
    assert not conv3x3.supports((2, 64, 64, 320), (3, 3, 320, 320), 2, ((1, 1), (1, 1)), jnp.bfloat16)
    assert not conv3x3.supports((2, 64, 64, 320), (1, 1, 320, 320), 1, ((0, 0), (0, 0)), jnp.bfloat16)
