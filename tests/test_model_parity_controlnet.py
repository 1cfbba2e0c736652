"""ControlNet + HintNet parity vs the reference Keras models. The synthetic
checkpoint uses the LDM control_model.* naming (the lllyasviel .pth layout the
reference loads)."""

import pytest

pytestmark = pytest.mark.oracle  # heavy Keras/TF/torch oracle - excluded from the fast tier

import numpy as np
import pytest

import oracle_utils
from conftest import reference_package
from minsdtf_tpu.models import controlnet as controlnet_lib
from minsdtf_tpu.weights import convert, mapping

IMG = 128
LAT = IMG // 8


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    rng = np.random.RandomState(13)
    dif_to_ldm = {v: k for k, v in mapping.controlnet_ldm_to_diffusers().items()}
    sd = oracle_utils.synth_state_dict(
        controlnet_lib.param_specs(), rng, names=lambda m: dif_to_ldm[m]
    )
    path = str(tmp_path_factory.mktemp("cn") / "controlnet.safetensors")
    return oracle_utils.save_safetensors(sd, path)


@pytest.fixture(scope="module")
def ours(ckpt):
    return convert.convert_controlnet(ckpt)


def test_hint_net_parity(ckpt, ours):
    oracle_utils.disable_reference_downloads()
    reference_package()
    from stable_diffusion.control_net import HintNet

    ref_model = HintNet(IMG, IMG, controlnet_path=ckpt)
    rng = np.random.RandomState(17)
    hint = rng.uniform(0, 1, (1, IMG, IMG, 3)).astype(np.float32)
    want = ref_model.predict_on_batch(hint)
    got = np.asarray(controlnet_lib.hint_net(ours, hint))
    diff, mse = oracle_utils.max_abs_diff(got, want)
    assert diff < 5e-3, (diff, mse)


def test_control_net_parity(ckpt, ours):
    oracle_utils.disable_reference_downloads()
    reference_package()
    from stable_diffusion.control_net import ControlNet

    ref_model = ControlNet(IMG, IMG, controlnet_path=ckpt)
    rng = np.random.RandomState(19)
    latent = rng.normal(0, 1, (1, LAT, LAT, 4)).astype(np.float32)
    t_emb = rng.normal(0, 1, (1, 320)).astype(np.float32)
    context = rng.normal(0, 1, (1, 77, 768)).astype(np.float32)
    hint = rng.normal(0, 1, (1, LAT, LAT, 320)).astype(np.float32)
    want = ref_model.predict_on_batch([latent, t_emb, context, hint])
    got = controlnet_lib.apply(ours, latent, t_emb, context, hint)
    assert len(want) == len(got) == 13
    for i, (w, g) in enumerate(zip(want, got)):
        diff, mse = oracle_utils.max_abs_diff(np.asarray(g), w)
        assert diff < 5e-3, (i, diff, mse)
