"""Ring (sequence-parallel) attention vs single-device attention, on the 8-virtual-
device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minsdtf_tpu.ops.attention import multi_head_attention
from minsdtf_tpu.ops.ring_attention import ring_multi_head_attention
from minsdtf_tpu.parallel import mesh as mesh_lib


@pytest.mark.parametrize("s,heads,d", [(1024, 8, 40), (512, 2, 64)])
def test_ring_matches_single_device(s, heads, d):
    mesh = mesh_lib.make_mesh(data=8, model=1)
    rng = np.random.RandomState(0)
    b = 2
    q = rng.normal(0, 1, (b, s, heads * d)).astype(np.float32)
    k = rng.normal(0, 1, (b, s, heads * d)).astype(np.float32)
    v = rng.normal(0, 1, (b, s, heads * d)).astype(np.float32)

    want = np.asarray(multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), num_heads=heads
    ))
    got = np.asarray(ring_multi_head_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), num_heads=heads, mesh=mesh
    ))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
