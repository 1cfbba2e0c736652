"""Shared helpers for the demo apps (streamlit/gradio are not baked into the TPU
image — the apps import lazily and explain what is missing)."""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

OUTPUT_DIR = os.environ.get("MINSDTF_OUTPUT_DIR", "outputs")


def build_pipeline(img_height: int = 512, img_width: int = 512, **kw):
    """Pipeline from env-var checkpoint paths (MINSDTF_UNET / _TEXT_ENCODER / _VAE /
    _LORA / _CONTROLNET / _BPE), falling back to random weights for smoke demos."""
    from minsdtf_tpu.pipeline import StableDiffusion

    return StableDiffusion(
        img_height=img_height,
        img_width=img_width,
        unet_ckpt=os.environ.get("MINSDTF_UNET"),
        text_encoder_ckpt=os.environ.get("MINSDTF_TEXT_ENCODER"),
        vae_ckpt=os.environ.get("MINSDTF_VAE"),
        lora_path=os.environ.get("MINSDTF_LORA"),
        controlnet_path=os.environ.get("MINSDTF_CONTROLNET"),
        bpe_path=os.environ.get("MINSDTF_BPE"),
        **kw,
    )


def save_outputs(images: np.ndarray, prompt: str, out_dir: Optional[str] = None):
    """PNG + prompt sidecar, like the reference Streamlit app (app.py:84-92)."""
    from PIL import Image

    out_dir = out_dir or OUTPUT_DIR
    os.makedirs(out_dir, exist_ok=True)
    stamp = time.strftime("%Y%m%d-%H%M%S")
    paths = []
    for i, img in enumerate(images):
        path = os.path.join(out_dir, f"{stamp}-{i}.png")
        Image.fromarray(img).save(path)
        with open(path.replace(".png", ".txt"), "w") as f:
            f.write(prompt)
        paths.append(path)
    return paths
