"""LoRA pipeline parity: delta-W composition + kohya->diffusers key rewriting vs the
reference loader (numpy/torch oracle), and end-to-end merge through the converter."""

import pytest

pytestmark = pytest.mark.oracle  # heavy Keras/TF/torch oracle - excluded from the fast tier

import numpy as np
import pytest

from conftest import load_reference_module
from minsdtf_tpu.weights import convert, lora as lora_lib

ref_loader = load_reference_module("ckpt_loader")


def _make_lora_sd(rank=4):
    """Synthetic kohya-format LoRA: linear, conv1x1 and conv3x3 modules for both the
    text encoder and the UNet."""
    import torch

    rng = np.random.RandomState(0)

    def t(*shape):
        return torch.from_numpy(rng.normal(0, 0.1, shape).astype(np.float32))

    sd = {}
    mods = {
        # text encoder linear
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj": (768, 768, None),
        "lora_te_text_model_encoder_layers_3_mlp_fc1": (3072, 768, None),
        # unet linear
        "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q": (320, 320, None),
        "lora_unet_up_blocks_1_attentions_2_transformer_blocks_0_ff_net_0_proj": (10240, 1280, None),
        "lora_unet_mid_block_attentions_0_transformer_blocks_0_attn2_to_out_0": (1280, 1280, None),
        # conv 1x1 and 3x3
        "lora_unet_down_blocks_0_attentions_0_proj_in": (320, 320, (1, 1)),
        "lora_unet_down_blocks_1_resnets_0_conv1": (640, 320, (3, 3)),
        "lora_unet_up_blocks_0_upsamplers_0_conv": (1280, 1280, (3, 3)),
    }
    for name, (out_c, in_c, ksize) in mods.items():
        if ksize is None:
            down, up = t(rank, in_c), t(out_c, rank)
        else:
            down, up = t(rank, in_c, *ksize), t(out_c, rank, 1, 1)
        sd[f"{name}.lora_down.weight"] = down
        sd[f"{name}.lora_up.weight"] = up
        sd[f"{name}.alpha"] = torch.tensor(float(rank) / 2.0)
    return sd


@pytest.fixture(scope="module")
def lora_path(tmp_path_factory):
    import torch

    path = str(tmp_path_factory.mktemp("lora") / "lora.pt")
    torch.save(_make_lora_sd(), path)
    return path


def test_lora_dicts_match_reference(lora_path):
    te_ref, unet_ref = ref_loader.load_weights_from_lora(lora_path)
    te_ours, unet_ours = lora_lib.load_lora(lora_path)
    assert set(te_ours) == set(te_ref)
    assert set(unet_ours) == set(unet_ref)
    for key in te_ref:
        np.testing.assert_allclose(te_ours[key], te_ref[key], rtol=1e-5, atol=1e-6)
    for key in unet_ref:
        np.testing.assert_allclose(unet_ours[key], unet_ref[key], rtol=1e-5, atol=1e-6)


def test_lora_merge_into_params(lora_path):
    """Deltas actually land in the converted pytree (merge-at-load,
    reference ckpt_loader.py:2169-2182)."""
    import oracle_utils
    from minsdtf_tpu.models import unet as unet_lib

    rng = np.random.RandomState(1)
    specs = unet_lib.param_specs()
    sd = oracle_utils.synth_state_dict(specs, rng, dtype=np.float32)
    _, unet_lora = lora_lib.load_lora(lora_path)
    base = convert.convert_unet(dict(sd))
    merged = convert.convert_unet(dict(sd), lora=unet_lora)

    changed = "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
    untouched = "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_k"
    delta = merged[changed]["kernel"] - base[changed]["kernel"]
    want = np.transpose(unet_lora[f"{changed}.weight"], (1, 0))
    np.testing.assert_allclose(delta, want, rtol=1e-4, atol=1e-6)
    np.testing.assert_array_equal(merged[untouched]["kernel"], base[untouched]["kernel"])

    conv_changed = "down_blocks.1.resnets.0.conv1"
    delta_c = merged[conv_changed]["kernel"] - base[conv_changed]["kernel"]
    want_c = np.transpose(unet_lora[f"{conv_changed}.weight"], (2, 3, 1, 0))
    np.testing.assert_allclose(delta_c, want_c, rtol=1e-4, atol=1e-6)


def test_textual_inversion_loader(tmp_path):
    import torch

    from minsdtf_tpu.weights import textual_inversion

    rng = np.random.RandomState(2)
    emb = rng.normal(0, 0.3, (3, 768)).astype(np.float32)
    path = str(tmp_path / "ti.pt")
    torch.save({"string_to_param": {"*": torch.from_numpy(emb)}}, path)
    got = textual_inversion.load_embedding(path)
    np.testing.assert_allclose(got, emb)

    # reference oracle (stable_diffusion.py:71-82) without building the pipeline
    state = torch.load(path, map_location="cpu", weights_only=False)
    ref = list(state["string_to_param"].values())[0].numpy()
    np.testing.assert_allclose(got, ref)
