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


def test_onepass_int8qk_accuracy(monkeypatch):
    """The int8-QK one-pass variant (MINSDTF_FLASH_INT8QK=1): per-token Q/K int8
    scores must stay within ~bf16-kernel error of an fp32 oracle — int8 with
    per-token scales carries 7 value bits vs bf16's 8-bit mantissa, so its QK^T
    error is the same order as the bf16 rounding it replaces."""
    rng = np.random.RandomState(2)
    sq = sk = 512
    d, h = 40, 2
    q = rng.normal(0, 1, (1, sq, h, d)).astype(np.float32)
    k = rng.normal(0, 1, (1, sk, h, d)).astype(np.float32)
    v = rng.normal(0, 1, (1, sk, h, d)).astype(np.float32)
    scale = d ** -0.5
    oracle = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                       scale=scale, causal=False))
    qb, kb, vb = (jnp.asarray(x, jnp.bfloat16) for x in (q, k, v))
    err = {}
    for name, knob in (("bf16", "0"), ("int8qk", "1"), ("int8qk_hoisted", "2"),
                       ("int8pv", "3")):
        monkeypatch.setenv("MINSDTF_FLASH_INT8QK", knob)
        got = np.asarray(fa.flash_attention(qb, kb, vb, scale=scale,
                                            interpret=True), np.float32)
        err[name] = np.abs(got - oracle).max()
    # int8-QK must be comparable to the bf16 kernel's own error (not an order worse)
    assert err["int8qk"] < max(4 * err["bf16"], 0.02), err
    # hoisted variant: same math modulo where the quantize runs; the only numeric
    # difference is bf16 input rounding order — must stay in the same error class
    assert err["int8qk_hoisted"] < max(4 * err["bf16"], 0.02), err
    # full-int8 (QK+PV): int8 P drops sub-1/254 probability mass — documented
    # ~6% relative in the diffuse regime (experimental, never default): only pin
    # that it stays in that class and doesn't silently degrade further
    assert err["int8pv"] < 0.15, err


def test_online_int8qk_accuracy(monkeypatch):
    """The ONLINE kernel's int8-QK path (long-context: kv > ONEPASS_MAX_KV, i.e.
    >=1024px images) — force the online kernel by disabling one-pass and check the
    hoisted int8-QK against the fp32 oracle at a multi-KV-block shape."""
    rng = np.random.RandomState(3)
    sq = sk = 1024
    d, h = 40, 2
    q = rng.normal(0, 1, (1, sq, h, d)).astype(np.float32)
    k = rng.normal(0, 1, (1, sk, h, d)).astype(np.float32)
    v = rng.normal(0, 1, (1, sk, h, d)).astype(np.float32)
    scale = d ** -0.5
    oracle = np.asarray(_xla_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                                       scale=scale, causal=False))
    qb, kb, vb = (jnp.asarray(x, jnp.bfloat16) for x in (q, k, v))
    monkeypatch.setenv("MINSDTF_FLASH_ONEPASS", "0")  # force the online kernel
    err = {}
    for name, knob in (("bf16", "0"), ("int8qk", "2")):
        monkeypatch.setenv("MINSDTF_FLASH_INT8QK", knob)
        got = np.asarray(fa.flash_attention(qb, kb, vb, scale=scale,
                                            interpret=True), np.float32)
        err[name] = np.abs(got - oracle).max()
    assert err["int8qk"] < max(4 * err["bf16"], 0.02), err
