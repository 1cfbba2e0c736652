"""Host image utils parity vs the reference's hand-rolled resize / binomial blur
(stable_diffusion.py:217-302). The oracle methods live on StableDiffusionBase but are
pure numpy — instantiate the base class without any models."""

import pytest

pytestmark = pytest.mark.oracle  # heavy Keras/TF/torch oracle - excluded from the fast tier

import numpy as np
import pytest

from conftest import reference_package
from minsdtf_tpu import imaging


@pytest.fixture(scope="module")
def ref_base():
    reference_package()
    from stable_diffusion.stable_diffusion import StableDiffusionBase

    return StableDiffusionBase(img_height=64, img_width=96)


@pytest.mark.parametrize("shape,new_hw", [
    ((32, 48, 3), (64, 96)),
    ((100, 50, 3), (64, 96)),
    ((64, 96, 1), (8, 12)),
    ((64, 96, 3), (64, 96)),  # identity
])
def test_bilinear_resize_parity(ref_base, shape, new_hw):
    rng = np.random.RandomState(0)
    img = rng.uniform(0, 255, shape)
    want = np.asarray(ref_base.resize(img, *new_hw), dtype=np.float64)
    got = imaging.bilinear_resize(img, *new_hw)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-8)


@pytest.mark.parametrize("radius", [1, 3, 5, 9])
def test_gaussian_blur_parity(ref_base, radius):
    rng = np.random.RandomState(1)
    img = rng.uniform(0, 1, (32, 32, 1)).astype(np.float32)
    want = ref_base.gaussian_blur(img, radius=radius, h_axis=0, v_axis=1)
    got = imaging.gaussian_blur(img, radius=radius, h_axis=0, v_axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_preprocess_image_parity(ref_base):
    rng = np.random.RandomState(2)
    img = rng.randint(0, 256, (50, 70, 3)).astype(np.uint8)
    want01, want_t = ref_base.preprocessed_image(img)
    got01, got_t = imaging.preprocess_image(img, 64, 96)
    np.testing.assert_allclose(got01, want01, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_t, want_t, rtol=1e-5, atol=1e-6)


def test_preprocess_mask_square_parity():
    """Square case (the reference's latent-mask resize swaps h/w — identical for
    square images, which is what we compare; the non-square fix is documented in
    pipeline.py)."""
    reference_package()
    from stable_diffusion.stable_diffusion import StableDiffusionBase

    ref = StableDiffusionBase(img_height=64, img_width=64)
    rng = np.random.RandomState(3)
    mask = rng.randint(0, 256, (40, 40)).astype(np.uint8)
    want_px, want_lat = ref.preprocessed_mask(mask, 5)
    got_px, got_lat = imaging.preprocess_mask(mask, 64, 64, 5)
    np.testing.assert_allclose(got_px, want_px, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got_lat, want_lat, rtol=1e-5, atol=1e-6)
