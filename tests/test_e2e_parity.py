"""End-to-end north-star gate (BASELINE.json): fixed-noise txt2img / img2img /
inpaint through BOTH pipelines — the reference Keras StableDiffusion and ours — with
identical synthetic checkpoints; final latent MSE must be < 1e-2 and the uint8 images
must closely match.

The tokenizer is bypassed on both sides by feeding ``encoded_text`` directly to
``generate_image`` (the reference supports this, ``stable_diffusion.py:317``); the
unconditional context exercises the text encoder on both sides. ``diffusion_noise``
is injected explicitly (reference ``stable_diffusion.py:354-361``) since
keras.random and jax.random realizations differ.
"""

import pytest

pytestmark = pytest.mark.oracle  # heavy Keras/TF/torch oracle - excluded from the fast tier

import os

import numpy as np
import pytest

import oracle_utils
from conftest import reference_package
from minsdtf_tpu.models import unet as unet_lib
from minsdtf_tpu.models import vae as vae_lib
from minsdtf_tpu.weights import convert

# Default gate config: 128px/3-step keeps the 4-test module ~70 min on the 1-core
# oracle host. E2E_IMG=256 E2E_STEPS=8 is the recorded larger-config run
# (VERDICT r3 #6; results in ROADMAP r4) — same tests, bigger shapes.
IMG = int(os.environ.get("E2E_IMG", 128))
LAT = IMG // 8
STEPS = int(os.environ.get("E2E_STEPS", 3))


@pytest.fixture(scope="module")
def ckpts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    rng = np.random.RandomState(123)
    paths = {}
    for name, specs, names in [
        ("unet", unet_lib.param_specs(), "canonical"),
        ("vae", vae_lib.param_specs(), "vae_old"),
        ("te", convert._text_encoder_specs(), "canonical"),
    ]:
        sd = oracle_utils.synth_state_dict(specs, rng, names=names)
        paths[name] = oracle_utils.save_safetensors(sd, str(tmp / f"{name}.safetensors"))
    return paths


@pytest.fixture(scope="module")
def ref_pipe(ckpts):
    oracle_utils.disable_reference_downloads()
    reference_package()
    from stable_diffusion.stable_diffusion import StableDiffusion as RefSD

    pipe = RefSD(
        img_height=IMG, img_width=IMG, jit_compile=False, clip_skip=-1,
        unet_ckpt=ckpts["unet"], text_encoder_ckpt=ckpts["te"], vae_ckpt=ckpts["vae"],
    )
    # capture the final latent entering the decoder
    captured = {}
    decoder = pipe.image_decoder
    orig = decoder.predict_on_batch

    def capture(latent):
        captured["latent"] = np.asarray(latent)
        return orig(latent)

    decoder.predict_on_batch = capture
    return pipe, captured


@pytest.fixture(scope="module")
def our_pipe(ckpts):
    import jax.numpy as jnp

    from minsdtf_tpu.pipeline import StableDiffusion

    return StableDiffusion(
        img_height=IMG, img_width=IMG, clip_skip=-1,
        unet_ckpt=ckpts["unet"], text_encoder_ckpt=ckpts["te"], vae_ckpt=ckpts["vae"],
        compute_dtype=jnp.float32,
    )


def _fixed_inputs(seed=0):
    rng = np.random.RandomState(seed)
    encoded = rng.normal(0, 1, (1, 77, 768)).astype(np.float32)
    noise = rng.normal(0, 1, (1, LAT, LAT, 4)).astype(np.float32)
    return encoded, noise


def test_txt2img_parity(ref_pipe, our_pipe):
    ref, captured = ref_pipe
    encoded, noise = _fixed_inputs(0)
    kw = dict(num_steps=STEPS, unconditional_guidance_scale=7.5,
              guidance_rescale=0.7, diffusion_noise=noise)
    ref_img = ref.generate_image(encoded, **kw)
    our_img, our_latent = our_pipe.generate_image(encoded, return_latent=True, **kw)
    latent_mse = float(np.mean(np.square(our_latent - captured["latent"])))
    assert latent_mse < 1e-2, latent_mse
    img_diff = np.mean(np.abs(ref_img.astype(np.int32) - our_img.astype(np.int32)))
    assert img_diff < 1.0, img_diff


def test_txt2img_parity_seed_only(ref_pipe, our_pipe):
    """No injected noise: the SAME integer seed must reproduce the reference image
    (TF-Philox-compatible initial noise, minsdtf_tpu/rng.py). This is the gate the
    round-1 suite could not run — every e2e test had to inject diffusion_noise."""
    ref, captured = ref_pipe
    encoded, _ = _fixed_inputs(0)
    kw = dict(num_steps=STEPS, unconditional_guidance_scale=7.5,
              guidance_rescale=0.7, seed=123456)
    ref_img = ref.generate_image(encoded, **kw)
    our_img, our_latent = our_pipe.generate_image(encoded, return_latent=True, **kw)
    latent_mse = float(np.mean(np.square(our_latent - captured["latent"])))
    assert latent_mse < 1e-2, latent_mse
    img_diff = np.mean(np.abs(ref_img.astype(np.int32) - our_img.astype(np.int32)))
    assert img_diff < 1.0, img_diff


def test_img2img_parity(ref_pipe, our_pipe):
    ref, captured = ref_pipe
    encoded, noise = _fixed_inputs(1)
    rng = np.random.RandomState(2)
    ref_image = rng.randint(0, 256, (IMG, IMG, 3)).astype(np.uint8)
    kw = dict(num_steps=max(4, STEPS), unconditional_guidance_scale=7.5,
              guidance_rescale=0.0, diffusion_noise=noise, reference_image=ref_image,
              reference_image_strength=0.6)
    ref_img = ref.generate_image(encoded, **kw)
    our_img, our_latent = our_pipe.generate_image(encoded, return_latent=True, **kw)
    latent_mse = float(np.mean(np.square(our_latent - captured["latent"])))
    assert latent_mse < 1e-2, latent_mse
    img_diff = np.mean(np.abs(ref_img.astype(np.int32) - our_img.astype(np.int32)))
    assert img_diff < 1.0, img_diff


def test_inpaint_parity(ref_pipe, our_pipe):
    ref, captured = ref_pipe
    encoded, noise = _fixed_inputs(3)
    rng = np.random.RandomState(4)
    ref_image = rng.randint(0, 256, (IMG, IMG, 3)).astype(np.uint8)
    mask = np.zeros((IMG, IMG), dtype=np.uint8)
    mask[IMG // 4 : 3 * IMG // 4, IMG // 4 : 3 * IMG // 4] = 255
    kw = dict(num_steps=max(4, STEPS), unconditional_guidance_scale=7.5, guidance_rescale=0.0,
              diffusion_noise=noise, reference_image=ref_image,
              reference_image_strength=0.6, inpaint_mask=mask, mask_blur_strength=5)
    ref_img = ref.generate_image(encoded, **kw)
    our_img, our_latent = our_pipe.generate_image(encoded, return_latent=True, **kw)
    latent_mse = float(np.mean(np.square(our_latent - captured["latent"])))
    assert latent_mse < 1e-2, latent_mse
    img_diff = np.mean(np.abs(ref_img.astype(np.int32) - our_img.astype(np.int32)))
    assert img_diff < 1.5, img_diff
