"""UNet parity vs the reference Keras DiffusionModel, full SD1.5 architecture at a
small spatial size (128x128 image -> 16x16 latent), same synthetic checkpoint through
both weight pipelines. Also covers the ControlNet-residual input wiring."""

import pytest

pytestmark = pytest.mark.oracle  # heavy Keras/TF/torch oracle - excluded from the fast tier

import numpy as np
import pytest

import oracle_utils
from conftest import reference_package
from minsdtf_tpu.models import unet as unet_lib
from minsdtf_tpu.weights import convert

IMG = 128
LAT = IMG // 8


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    rng = np.random.RandomState(7)
    sd = oracle_utils.synth_state_dict(unet_lib.param_specs(), rng)
    path = str(tmp_path_factory.mktemp("unet") / "unet.safetensors")
    return oracle_utils.save_safetensors(sd, path)


@pytest.fixture(scope="module")
def ours(ckpt):
    return convert.convert_unet(ckpt)


def _inputs(batch=1, with_controls=False):
    rng = np.random.RandomState(3)
    latent = rng.normal(0, 1, (batch, LAT, LAT, 4)).astype(np.float32)
    t_emb = rng.normal(0, 1, (batch, 320)).astype(np.float32)
    context = rng.normal(0, 1, (batch, 77, 768)).astype(np.float32)
    controls = None
    if with_controls:
        shapes = (
            [(LAT, 320)] * 3 + [(LAT // 2, 320)] + [(LAT // 2, 640)] * 2
            + [(LAT // 4, 640)] + [(LAT // 4, 1280)] * 2 + [(LAT // 8, 1280)] * 4
        )
        controls = [
            rng.normal(0, 0.1, (batch, s, s, c)).astype(np.float32) for s, c in shapes
        ]
    return latent, t_emb, context, controls


def test_unet_parity(ckpt, ours):
    oracle_utils.disable_reference_downloads()
    reference_package()
    from stable_diffusion.diffusion_model import DiffusionModel

    ref_model = DiffusionModel(IMG, IMG, ckpt_path=ckpt)
    latent, t_emb, context, _ = _inputs()
    want = ref_model.predict_on_batch([latent, t_emb, context])
    got = np.asarray(unet_lib.apply(ours, latent, t_emb, context))
    diff, mse = oracle_utils.max_abs_diff(got, want)
    assert diff < 5e-3, (diff, mse)


def test_unet_parity_with_controls(ckpt, ours):
    oracle_utils.disable_reference_downloads()
    reference_package()
    from stable_diffusion.diffusion_model import DiffusionModel

    ref_model = DiffusionModel(IMG, IMG, apply_control_net=True, ckpt_path=ckpt)
    latent, t_emb, context, controls = _inputs(with_controls=True)
    want = ref_model.predict_on_batch([latent, t_emb, context] + controls)
    got = np.asarray(unet_lib.apply(ours, latent, t_emb, context, controls=controls))
    diff, mse = oracle_utils.max_abs_diff(got, want)
    assert diff < 5e-3, (diff, mse)
