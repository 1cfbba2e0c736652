"""The programmatically-generated key mappings must reproduce the reference's
hand-written tables (ckpt_loader.py:20-707 UNET_KEY_MAPPING, :709-2133 CKPT_MAPPING)."""

import numpy as np
import pytest

from conftest import load_reference_module
from minsdtf_tpu.models import controlnet as controlnet_lib
from minsdtf_tpu.models import unet as unet_lib
from minsdtf_tpu.models import vae as vae_lib
from minsdtf_tpu.weights import mapping
from minsdtf_tpu.weights.convert import _text_encoder_specs

ref_loader = load_reference_module("ckpt_loader")


def _module_leaf(key):
    module, _, leaf = key.rpartition(".")
    return module, leaf


def test_unet_ldm_mapping_matches_reference_table():
    ours = mapping.unet_ldm_to_diffusers()
    ref = ref_loader.UNET_KEY_MAPPING
    for ldm_key, dif_key in ref.items():
        module, leaf = _module_leaf(ldm_key)
        assert module in ours, f"missing LDM module {module}"
        assert f"{ours[module]}.{leaf}" == dif_key, (
            f"{ldm_key}: ours={ours[module]}.{leaf} ref={dif_key}"
        )


def test_unet_specs_cover_reference_civitai_table():
    """Every tensor the reference loads for the UNet exists in our param specs."""
    specs = unet_lib.param_specs()
    ours_map = mapping.unet_ldm_to_diffusers()
    ref_keys = {k for k, _ in ref_loader.CKPT_MAPPING["civitai_model"]}
    covered = set()
    for ldm_key in ref_keys:
        module, leaf = _module_leaf(ldm_key)
        dif_module = ours_map[module]
        assert dif_module in specs, f"spec missing {dif_module}"
        want_leaf = {"weight": None, "bias": "bias"}[leaf]
        if want_leaf is None:
            want_leaf = "scale" if "scale" in specs[dif_module] else "kernel"
        assert want_leaf in specs[dif_module]
        covered.add((dif_module, want_leaf))
    total = sum(len(v) for v in specs.values())
    assert len(covered) == len(ref_keys) == total, (len(covered), len(ref_keys), total)


@pytest.mark.parametrize("table,prefix,extra", [
    ("encoder", "encoder", "quant_conv"),
    ("decoder", "decoder", "post_quant_conv"),
])
def test_vae_specs_cover_reference_tables(table, prefix, extra):
    specs = vae_lib.param_specs()
    alt_to_canon = {v: k for k, v in mapping.VAE_ATTN_ALTERNATES.items()}
    n = 0
    for dif_key, _ in ref_loader.CKPT_MAPPING[table]:
        module, leaf = _module_leaf(dif_key)
        tail = module.rsplit(".", 1)[-1]
        if tail in alt_to_canon:
            module = module[: -len(tail)] + alt_to_canon[tail]
        assert module in specs, f"spec missing {module}"
        n += 1
    # reference loads encoder table incl. quant_conv; decoder incl. post_quant_conv
    spec_count = sum(
        len(v) for k, v in specs.items() if k.startswith(prefix) or k == extra
    )
    assert n == spec_count


def test_controlnet_specs_cover_reference_tables():
    specs = controlnet_lib.param_specs()
    ours_map = mapping.controlnet_ldm_to_diffusers()
    seen = set()
    for ldm_key, _ in ref_loader.CKPT_MAPPING["controlnet"] + ref_loader.CKPT_MAPPING["hintnet"]:
        module, leaf = _module_leaf(ldm_key)
        assert module in ours_map, f"missing LDM module {module}"
        assert ours_map[module] in specs, f"spec missing {ours_map[module]}"
        seen.add(ours_map[module])
    assert seen == set(specs.keys())


def test_text_encoder_specs_cover_reference_table():
    # Reference builds the mapping inline in TextEncoder.__init__ (text_encoder.py:140-160)
    specs = _text_encoder_specs()
    for i in range(12):
        pre = f"text_model.encoder.layers.{i}"
        for mod in ("layer_norm1", "layer_norm2", "self_attn.q_proj", "self_attn.k_proj",
                    "self_attn.v_proj", "self_attn.out_proj", "mlp.fc1", "mlp.fc2"):
            assert f"{pre}.{mod}" in specs
    assert "text_model.final_layer_norm" in specs
    assert "text_model.embeddings.token_embedding" in specs
