"""TF/Keras-compatible stateless RNG: reproduce ``keras.random.normal(shape, seed=s)``.

The reference seeds its initial diffusion noise with
``keras.random.normal((b, h//8, w//8, 4), seed=seed)``
(``stable_diffusion.py:555-557``), which under the TF backend is
``tf.random.stateless_normal(shape, seed=[seed, 0])``. A user moving from the
reference can only reproduce an image from the same integer seed if we realize the
exact same noise, so this module reimplements TF's stateless pipeline in numpy:

  1. key/counter derivation: one Philox-4x32-10 invocation over the two seed words
     under TF's fixed scramble key (bit-exact vs
     ``tf.raw_ops.StatelessRandomGetKeyCounter``, verified in tests/test_rng.py);
  2. Philox-4x32-10 counter stream (4 uint32 per 128-bit counter, low word
     incremented per group);
  3. TF's ``Uint32ToFloat`` (low-23-bit mantissa into [0,1)) and ``BoxMullerFloat``
     (sin first, then cos; u1 clamped at 1e-7).

Values match TF to a few float32 ULPs (libm sin/cos/log differ between numpy and
Eigen); the Philox integer stream itself is bit-exact. Negligible vs the <1e-2
latent-MSE parity gate.

Host-side numpy by design: the latent noise is tiny (KBs) and generating it on host
keeps the jitted sampler free of RNG ops.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

_M0 = np.uint64(0xD2511F53)
_M1 = np.uint64(0xCD9E8D57)
_W0 = np.uint32(0x9E3779B9)
_W1 = np.uint32(0xBB67AE85)
# TF's fixed scramble key for stateless seed -> (key, counter) derivation
_SCRAMBLE_KEY = (np.uint32(0x3EC8F720), np.uint32(0x02461E29))


def philox_4x32(counter: np.ndarray, key) -> np.ndarray:
    """Philox-4x32 with 10 rounds. ``counter``: (n, 4) uint32; ``key``: 2 uint32.
    Returns (n, 4) uint32 — the TF/XLA-standard counter-based PRNG core."""
    c = [counter[:, i].copy() for i in range(4)]
    k0, k1 = np.uint32(key[0]), np.uint32(key[1])
    with np.errstate(over="ignore"):
        for r in range(10):
            p0 = _M0 * c[0].astype(np.uint64)
            p1 = _M1 * c[2].astype(np.uint64)
            lo0 = p0.astype(np.uint32)
            hi0 = (p0 >> np.uint64(32)).astype(np.uint32)
            lo1 = p1.astype(np.uint32)
            hi1 = (p1 >> np.uint64(32)).astype(np.uint32)
            c = [hi1 ^ c[1] ^ k0, lo1, hi0 ^ c[3] ^ k1, lo0]
            if r < 9:
                k0 = np.uint32(k0 + _W0)
                k1 = np.uint32(k1 + _W1)
    return np.stack(c, axis=1)


def key_counter_from_seed(seed0: int, seed1: int = 0):
    """TF ``StatelessRandomGetKeyCounter``: scramble the two seed words with one
    Philox run under a fixed key. Returns (key[2] uint32, counter[4] uint32)."""
    s0 = np.uint64(seed0 % (1 << 64))
    s1 = np.uint64(seed1 % (1 << 64))
    ctr = np.zeros((1, 4), np.uint32)
    ctr[0, 0] = np.uint32(s0 & np.uint64(0xFFFFFFFF))
    ctr[0, 1] = np.uint32(s0 >> np.uint64(32))
    ctr[0, 2] = np.uint32(s1 & np.uint64(0xFFFFFFFF))
    ctr[0, 3] = np.uint32(s1 >> np.uint64(32))
    mix = philox_4x32(ctr, _SCRAMBLE_KEY)[0]
    return (mix[0], mix[1]), (np.uint32(0), np.uint32(0), mix[2], mix[3])


def _uint32_to_float(x: np.ndarray) -> np.ndarray:
    """TF ``Uint32ToFloat``: low 23 bits as mantissa of [1,2), minus 1 -> [0,1)."""
    return ((x & np.uint32(0x7FFFFF)) | np.uint32(0x3F800000)).view(np.float32) - np.float32(1.0)


def _box_muller(x0: np.ndarray, x1: np.ndarray):
    """TF ``BoxMullerFloat``: returns (u2*sin(v1), u2*cos(v1))."""
    eps = np.float32(1.0e-7)
    u1 = np.maximum(_uint32_to_float(x0), eps)
    v1 = np.float32(2.0 * np.pi) * _uint32_to_float(x1)
    u2 = np.sqrt(np.float32(-2.0) * np.log(u1))
    return (u2 * np.sin(v1)).astype(np.float32), (u2 * np.cos(v1)).astype(np.float32)


def random_bits(n_groups: int, seed: int) -> np.ndarray:
    """(n_groups, 4) uint32 of the TF stateless Philox stream for integer seed."""
    key, c = key_counter_from_seed(seed)
    idx = np.arange(n_groups, dtype=np.uint64)  # counter low-64 starts at 0
    ctr = np.empty((n_groups, 4), np.uint32)
    ctr[:, 0] = (idx & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    ctr[:, 1] = (idx >> np.uint64(32)).astype(np.uint32)
    ctr[:, 2] = c[2]
    ctr[:, 3] = c[3]
    return philox_4x32(ctr, key)


def stateless_normal(shape: Sequence[int], seed: int) -> np.ndarray:
    """Standard-normal fp32 matching ``keras.random.normal(shape, seed=seed)``
    (TF backend) up to libm ULPs."""
    # keras draw_seed builds an int64 [seed, 0] and _cast_seed floormods it into
    # int32 range before calling tf.random.stateless_normal — replicate, so large
    # and negative seeds keep matching keras (not just raw TF) semantics.
    seed = int(seed) % (2**31 - 2)
    n = int(np.prod(shape))
    bits = random_bits((n + 3) // 4, seed)
    f0, f1 = _box_muller(bits[:, 0], bits[:, 1])
    f2, f3 = _box_muller(bits[:, 2], bits[:, 3])
    out = np.stack([f0, f1, f2, f3], axis=1).reshape(-1)[:n]
    return out.reshape(tuple(shape))


# ---- device-side variant (inside the sampler jit) -----------------------------------
#
# The host generator above is bit-exact but its 65 KB output crosses the tunnel as a
# program argument on EVERY generate_image call, paying the ~27 ms fixed H2D latency
# (experiments/tunnel_xfer.py). The device variant moves the Philox stream + Box-Muller
# into the jitted program: the only per-seed traffic is the 16-byte (key, counter)
# derivation below. The integer stream is bit-identical to the numpy one (tested in
# tests/test_rng.py); the floats differ by libm ULPs only.


def philox_key_counter(seed: int) -> np.ndarray:
    """Host-side seed scramble (one 4-lane Philox run — microseconds): returns the
    uint32[4] ``(key0, key1, counter2, counter3)`` consumed by
    :func:`device_stateless_normal`. Applies the same keras int32 floormod as
    :func:`stateless_normal` so the two paths accept identical seeds."""
    seed = int(seed) % (2**31 - 2)
    key, c = key_counter_from_seed(seed)
    return np.array([key[0], key[1], c[2], c[3]], np.uint32)


def _jnp_mul_hilo(a, m: int):
    """(hi, lo) of the 32x64 product ``a * m`` on uint32 lanes (TPU has no u64):
    16-bit limb decomposition with explicit carry."""
    import jax.numpy as jnp

    a = a.astype(jnp.uint32)
    al = a & jnp.uint32(0xFFFF)
    ah = a >> jnp.uint32(16)
    bl = jnp.uint32(m & 0xFFFF)
    bh = jnp.uint32(m >> 16)
    ll = al * bl
    lh = al * bh
    hl = ah * bl
    hh = ah * bh
    lo = a * jnp.uint32(m)  # wrapping u32 multiply = low word
    carry = ((ll >> jnp.uint32(16)) + (lh & jnp.uint32(0xFFFF))
             + (hl & jnp.uint32(0xFFFF))) >> jnp.uint32(16)
    hi = hh + (lh >> jnp.uint32(16)) + (hl >> jnp.uint32(16)) + carry
    return hi, lo


def device_stateless_normal(kc, shape):
    """jnp standard-normal matching :func:`stateless_normal` (same Philox bits; sin/
    cos/log at device-libm ULPs). ``kc`` is :func:`philox_key_counter`'s uint32[4]
    as a traced array; ``shape`` is static. Traceable under jit."""
    import jax
    import jax.numpy as jnp

    n = int(np.prod(shape))
    ng = (n + 3) // 4
    assert ng < 2**32
    c0 = jnp.arange(ng, dtype=jnp.uint32)
    c1 = jnp.zeros(ng, jnp.uint32)
    c2 = jnp.broadcast_to(kc[2], (ng,))
    c3 = jnp.broadcast_to(kc[3], (ng,))
    c = [c0, c1, c2, c3]
    k0, k1 = kc[0], kc[1]
    for r in range(10):
        hi0, lo0 = _jnp_mul_hilo(c[0], 0xD2511F53)
        hi1, lo1 = _jnp_mul_hilo(c[2], 0xCD9E8D57)
        c = [hi1 ^ c[1] ^ k0, lo1, hi0 ^ c[3] ^ k1, lo0]
        if r < 9:
            k0 = k0 + jnp.uint32(0x9E3779B9)
            k1 = k1 + jnp.uint32(0xBB67AE85)

    def u32f(x):
        bits = (x & jnp.uint32(0x7FFFFF)) | jnp.uint32(0x3F800000)
        return jax.lax.bitcast_convert_type(bits, jnp.float32) - jnp.float32(1.0)

    def box_muller(x0, x1):
        u1 = jnp.maximum(u32f(x0), jnp.float32(1.0e-7))
        v1 = jnp.float32(2.0 * np.pi) * u32f(x1)
        u2 = jnp.sqrt(jnp.float32(-2.0) * jnp.log(u1))
        return u2 * jnp.sin(v1), u2 * jnp.cos(v1)

    f0, f1 = box_muller(c[0], c[1])
    f2, f3 = box_muller(c[2], c[3])
    out = jnp.stack([f0, f1, f2, f3], axis=1).reshape(-1)[:n]
    return out.reshape(tuple(shape))
