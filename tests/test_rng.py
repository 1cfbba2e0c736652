"""TF/Keras-compatible stateless RNG (minsdtf_tpu/rng.py).

Golden values below were captured from tf.random.stateless_normal /
tf.raw_ops.StatelessRandomGetKeyCounter in this image, so the core contract is
checked without importing TF; a live cross-check against keras.random.normal (the
exact call the reference makes, stable_diffusion.py:555-557) runs when TF is
importable.
"""

import pytest

pytestmark = pytest.mark.oracle  # heavy Keras/TF/torch oracle - excluded from the fast tier

import numpy as np
import pytest

from minsdtf_tpu import rng


# (seed, key_u64, counter_hi_u64) from tf.raw_ops.StatelessRandomGetKeyCounter
KEY_COUNTER_GOLDEN = [
    (0, 0xDF7A3EF6DD5B9083, 0xFF2F51A833DA8054),
    (123456, 0x4DEAC1D3E26952F7, 0x3CDB2D1723CD5F28),
]

# first 8 values of tf.random.stateless_normal([8], seed=[s, 0])
NORMAL_GOLDEN = {
    0: [-1.697034, -0.4813767, -0.6622369, 0.08701119,
        -1.0001622, 0.94347405, 0.61669475, 0.21356511],
    123456: [0.10760719, -0.87042826, 0.73417103, 1.4199506,
             1.7272911, 0.9743908, -1.4666824, -0.9113104],
}


@pytest.mark.parametrize("seed,key_u64,ctr_hi", KEY_COUNTER_GOLDEN)
def test_key_counter_derivation_bit_exact(seed, key_u64, ctr_hi):
    key, ctr = rng.key_counter_from_seed(seed)
    assert int(key[0]) | (int(key[1]) << 32) == key_u64
    assert int(ctr[0]) == 0 and int(ctr[1]) == 0
    assert int(ctr[2]) | (int(ctr[3]) << 32) == ctr_hi


@pytest.mark.parametrize("seed", [0, 123456])
def test_stateless_normal_matches_tf_golden(seed):
    got = rng.stateless_normal((8,), seed)
    want = np.asarray(NORMAL_GOLDEN[seed], np.float32)
    # libm sin/cos/log ULP differences only
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_distribution_sane():
    x = rng.stateless_normal((4, 64, 64, 4), 7)
    assert x.dtype == np.float32
    assert abs(float(x.mean())) < 0.02
    assert abs(float(x.std()) - 1.0) < 0.02
    # different seeds decorrelate
    y = rng.stateless_normal((4, 64, 64, 4), 8)
    assert abs(float(np.corrcoef(x.ravel(), y.ravel())[0, 1])) < 0.02


def test_live_keras_equality():
    tf = pytest.importorskip("tensorflow")
    import keras

    # 2**31 - 1 exercises keras's _cast_seed floormod; 3/999 are identity cases
    for seed in (3, 999, 2**31 - 1):
        want = keras.random.normal((2, 5, 5, 4), seed=seed).numpy()
        got = rng.stateless_normal((2, 5, 5, 4), seed)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    for seed in (3, 999):
        # the Philox integer stream must be bit-exact, not just close:
        kc = tf.raw_ops.StatelessRandomGetKeyCounter(seed=tf.constant([seed, 0], tf.int32))
        key, ctr = rng.key_counter_from_seed(seed)
        assert int(kc[0].numpy()[0]) == int(key[0]) | (int(key[1]) << 32)
        assert int(kc[1].numpy()[1]) == int(ctr[2]) | (int(ctr[3]) << 32)
