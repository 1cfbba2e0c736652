"""Pallas flash attention vs the XLA reference path, in interpreter mode on CPU
(the kernel itself runs compiled on TPU; interpret=True checks the math)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from minsdtf_tpu.ops import flash_attention as fa
from minsdtf_tpu.ops.attention import _xla_attention


@pytest.mark.parametrize("sq,sk,d,h", [
    (256, 256, 40, 2),    # self-attn, small
    (512, 512, 80, 1),    # self-attn, block boundary
    (256, 77, 160, 1),    # cross-attn, ragged single KV block
    (256, 154, 40, 2),    # cross-attn, LPW 2-chunk context
])
def test_flash_matches_xla(sq, sk, d, h):
    rng = np.random.RandomState(0)
    b = 2
    q = rng.normal(0, 1, (b, sq, h, d)).astype(np.float32)
    k = rng.normal(0, 1, (b, sk, h, d)).astype(np.float32)
    v = rng.normal(0, 1, (b, sk, h, d)).astype(np.float32)
    scale = d ** -0.5
    want = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                     scale=scale, causal=False))
    got = np.asarray(fa.flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                        scale=scale, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_supports_table():
    assert fa.supports(4096, 4096, 40)      # 512x512 self-attn
    assert fa.supports(65536, 65536, 40)    # 2048x2048 self-attn
    assert not fa.supports(4096, 77, 40)    # short-KV cross-attn -> XLA (measured faster)
    assert not fa.supports(4096, 308, 40)
    assert not fa.supports(77, 77, 64, causal=True)  # CLIP stays on XLA


@pytest.mark.parametrize("sq,sk,d,h", [
    (4096, 4096, 40, 1),   # the production 512px self-attn shape (one-pass path)
    (1024, 1024, 80, 2),
    (256, 256, 160, 1),
])
def test_onepass_path_matches_xla(sq, sk, d, h, monkeypatch):
    """The one-pass kernel (whole KV row in VMEM, exp2 softmax, MXU row-sum) must
    route for these shapes and agree with XLA."""
    assert fa._use_onepass(sq, sk, d), "expected the one-pass route"
    rng = np.random.RandomState(1)
    q = rng.normal(0, 1, (1, sq, h, d)).astype(np.float32)
    k = rng.normal(0, 1, (1, sk, h, d)).astype(np.float32)
    v = rng.normal(0, 1, (1, sk, h, d)).astype(np.float32)
    scale = d ** -0.5
    want = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                     scale=scale, causal=False))
    got = np.asarray(fa.flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                        scale=scale, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
    # the online kernel handles what one-pass declines (big KV / wide heads)
    assert not fa._use_onepass(8192, 8192, 40)
    assert not fa._use_onepass(4096, 4096, 512)
