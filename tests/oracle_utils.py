"""Helpers for parity tests against the reference Keras implementation.

Flow: generate a synthetic random checkpoint (torch tensor layout, fp16 on disk),
have the *reference* model load it through its own ``load_weights_from_file`` path and
our converter load it through ours, then compare forwards. This exercises the
production weight pipeline on both sides — no hand-alignment of Keras weight lists.
"""

import os

import numpy as np

import conftest


def disable_reference_downloads():
    """Reference model constructors call keras.utils.get_file when no ckpt_path is
    given; point it at a nonexistent file so they fall through to random init
    (zero-egress environment)."""
    import keras

    keras.utils.get_file = lambda *a, **kw: "/nonexistent-no-download"


def synth_state_dict(specs, rng, names="canonical", dtype=np.float16):
    """Random torch-layout state dict covering ``specs`` (a converter spec dict).

    Norm scales are randomized around 1 and biases around 0 (catching scale/bias or
    key swaps that ones/zeros would mask). ``names``:
      - "canonical": diffusers names as in specs
      - "vae_old": old-diffusers VAE attention names (query/key/value/proj_attn)
      - callable: module-name translator (e.g. diffusers->LDM for ControlNet)
    """
    from minsdtf_tpu.weights import mapping

    sd = {}
    for module, leaves in specs.items():
        out_name = module
        if names == "vae_old":
            for canon, alt in mapping.VAE_ATTN_ALTERNATES.items():
                if module.endswith(canon):
                    out_name = module[: -len(canon)] + alt
        elif callable(names):
            out_name = names(module)
        for leaf, shape in leaves.items():
            if leaf == "bias":
                key, torch_shape = f"{out_name}.bias", shape
                w = rng.normal(0.0, 0.05, torch_shape)
            elif leaf == "scale":
                key, torch_shape = f"{out_name}.weight", shape
                w = 1.0 + rng.normal(0.0, 0.05, torch_shape)
            elif leaf == "embedding":
                key, torch_shape = f"{out_name}.weight", shape
                w = rng.normal(0.0, 0.05, torch_shape)
            else:  # kernel
                key = f"{out_name}.weight"
                if len(shape) == 2:  # (in, out) -> torch (out, in)
                    torch_shape = (shape[1], shape[0])
                else:  # (h, w, i, o) -> torch (o, i, h, w)
                    torch_shape = (shape[3], shape[2], shape[0], shape[1])
                fan_in = int(np.prod(torch_shape[1:]))
                w = rng.normal(0.0, fan_in ** -0.5, torch_shape)
            sd[key] = w.astype(dtype)
    return sd


def save_safetensors(sd, path):
    from safetensors.numpy import save_file

    save_file(sd, path)
    return path


def max_abs_diff(a, b):
    a = np.asarray(a, dtype=np.float32)
    b = np.asarray(b, dtype=np.float32)
    return float(np.max(np.abs(a - b))), float(np.mean(np.square(a - b)))
