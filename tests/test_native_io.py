"""Native (C++/mmap) safetensors reader vs the python safetensors package."""

import numpy as np
import pytest

from minsdtf_tpu.weights import native_io


@pytest.fixture(scope="module")
def st_file(tmp_path_factory):
    from safetensors.numpy import save_file

    rng = np.random.RandomState(0)
    tensors = {
        "a.weight": rng.normal(0, 1, (64, 32)).astype(np.float32),
        "b.bias": rng.normal(0, 1, (17,)).astype(np.float16),
        "nested.block.0.kernel": rng.normal(0, 1, (3, 3, 8, 16)).astype(np.float32),
        "ints": rng.randint(0, 100, (5, 5)).astype(np.int32),
    }
    path = str(tmp_path_factory.mktemp("st") / "test.safetensors")
    save_file(tensors, path, metadata={"format": "pt"})
    return path, tensors


def test_native_build():
    assert native_io.available(), "g++ build of the native reader failed"


def test_keys_and_values_match(st_file):
    path, tensors = st_file
    with native_io.NativeSafetensors(path) as f:
        assert sorted(f.keys()) == sorted(tensors.keys())
        for name, want in tensors.items():
            got = f.get(name)
            assert got.shape == want.shape and got.dtype == want.dtype
            np.testing.assert_array_equal(got, want)


def test_read_state_dict_native_casts_to_f32(st_file):
    path, tensors = st_file
    sd = native_io.read_state_dict_native(path)
    assert sd["b.bias"].dtype == np.float32
    np.testing.assert_allclose(sd["b.bias"], tensors["b.bias"].astype(np.float32))
    assert sd["a.weight"].flags.owndata


def test_convert_uses_native_path(st_file):
    path, tensors = st_file
    from minsdtf_tpu.weights.convert import read_state_dict

    sd = read_state_dict(path)
    np.testing.assert_array_equal(sd["a.weight"], tensors["a.weight"])


def test_missing_tensor_raises(st_file):
    path, _ = st_file
    with native_io.NativeSafetensors(path) as f:
        with pytest.raises(KeyError):
            f.get("nope")
