"""VAE encoder/decoder parity vs the reference Keras ImageEncoder/ImageDecoder.

The synthetic checkpoint uses the old-diffusers attention names
(query/key/value/proj_attn) — exactly what sd-vae-ft-mse ships and what the
reference's tables expect (ckpt_loader.py:1480-1489)."""

import pytest

pytestmark = pytest.mark.oracle  # heavy Keras/TF/torch oracle - excluded from the fast tier

import numpy as np
import pytest

import oracle_utils
from conftest import reference_package
from minsdtf_tpu.models import vae as vae_lib
from minsdtf_tpu.weights import convert

IMG = 64


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    rng = np.random.RandomState(11)
    sd = oracle_utils.synth_state_dict(vae_lib.param_specs(), rng, names="vae_old")
    path = str(tmp_path_factory.mktemp("vae") / "vae.safetensors")
    return oracle_utils.save_safetensors(sd, path)


@pytest.fixture(scope="module")
def ours(ckpt):
    return convert.convert_vae(ckpt)


def test_encoder_parity(ckpt, ours):
    oracle_utils.disable_reference_downloads()
    reference_package()
    from stable_diffusion.image_encoder import ImageEncoder

    ref_model = ImageEncoder(ckpt_path=ckpt)
    rng = np.random.RandomState(5)
    image = rng.uniform(-1, 1, (1, IMG, IMG, 3)).astype(np.float32)
    want = ref_model.predict_on_batch(image)
    got = np.asarray(vae_lib.encode(ours, image))
    diff, mse = oracle_utils.max_abs_diff(got, want)
    assert diff < 5e-3, (diff, mse)


def test_decoder_parity(ckpt, ours):
    oracle_utils.disable_reference_downloads()
    reference_package()
    from stable_diffusion.image_decoder import ImageDecoder

    ref_model = ImageDecoder(ckpt_path=ckpt)
    rng = np.random.RandomState(6)
    latent = rng.normal(0, 1, (1, IMG // 8, IMG // 8, 4)).astype(np.float32)
    want = ref_model.predict_on_batch(latent)
    got = np.asarray(vae_lib.decode(ours, latent))
    diff, mse = oracle_utils.max_abs_diff(got, want)
    assert diff < 5e-3, (diff, mse)


def test_encode_decode_shapes(ours):
    rng = np.random.RandomState(8)
    image = rng.uniform(-1, 1, (2, IMG, IMG, 3)).astype(np.float32)
    lat = vae_lib.encode(ours, image)
    assert lat.shape == (2, IMG // 8, IMG // 8, 4)
    out = vae_lib.decode(ours, np.asarray(lat))
    assert out.shape == (2, IMG, IMG, 3)
