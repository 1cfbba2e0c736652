"""Checkpoint fetching: URLs -> local cache (reference parity for default weights).

The reference auto-downloads its default weights via ``keras.utils.get_file``
(diffusion_model.py:284-293, text_encoder.py:139, image_{en,de}coder, control_net,
clip_tokenizer.py:79-83). This build environment has no network, so the pipeline
treats missing paths as seeded-random init — but outside the sandbox users get the
same defaults as the reference through this module: pass a URL (or ``"default"``)
as any ckpt path and it resolves through ``~/.cache/minsdtf/``.
"""

from __future__ import annotations

import hashlib
import os
from typing import Optional

CACHE_DIR = os.environ.get("MINSDTF_CACHE", os.path.expanduser("~/.cache/minsdtf"))

# The reference's default weight sources (same files, same models).
DEFAULT_URLS = {
    "unet": "https://huggingface.co/dreamlike-art/dreamlike-photoreal-2.0/resolve/main/dreamlike-photoreal-2.0.safetensors",
    "text_encoder": "https://huggingface.co/runwayml/stable-diffusion-v1-5/resolve/main/text_encoder/model.safetensors",
    "vae": "https://huggingface.co/stabilityai/sd-vae-ft-mse/resolve/main/diffusion_pytorch_model.safetensors",
    "controlnet": "https://huggingface.co/lllyasviel/ControlNet/resolve/main/models/control_sd15_canny.pth",
    "bpe": "https://github.com/openai/CLIP/blob/main/clip/bpe_simple_vocab_16e6.txt.gz?raw=true",
}
BPE_SHA256 = "924691ac288e54409236115652ad4aa250f48203de50a9e4722a6ecd48d6804a"

# Integrity pins for DEFAULT_URLS. Downloaded checkpoints flow into converters that
# may call ``torch.load`` (arbitrary-code pickles for .pth/.ckpt), so unverified
# downloads are a supply-chain risk. Only the BPE digest is verifiable in this
# zero-egress build environment; checkpoint pins can be added here (or supplied via
# the MINSDTF_SHA256_<KIND> env var) the first time a networked deployment records
# them. Unpinned downloads print a loud warning and the first fetch records a
# trust-on-first-use digest next to the file so later fetches detect tampering.
DEFAULT_SHA256 = {
    "bpe": BPE_SHA256,
    "unet": os.environ.get("MINSDTF_SHA256_UNET"),
    "text_encoder": os.environ.get("MINSDTF_SHA256_TEXT_ENCODER"),
    "vae": os.environ.get("MINSDTF_SHA256_VAE"),
    "controlnet": os.environ.get("MINSDTF_SHA256_CONTROLNET"),
}


def _sha256_file(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def fetch(url: str, fname: Optional[str] = None, sha256: Optional[str] = None) -> str:
    """Download ``url`` into the cache (once) and return the local path.

    With ``sha256`` the download is verified against the pin. Without one, the
    digest is recorded on first fetch (``<file>.sha256``) and re-checked on later
    calls — trust-on-first-use rather than no verification at all."""
    import urllib.request

    os.makedirs(CACHE_DIR, exist_ok=True)
    fname = fname or os.path.basename(url.split("?")[0])
    path = os.path.join(CACHE_DIR, fname)
    if not os.path.exists(path):
        print(f"downloading {url} -> {path}")
        tmp = path + ".part"
        urllib.request.urlretrieve(url, tmp)
        os.replace(tmp, path)
    digest = _sha256_file(path)
    if sha256 is not None:
        if digest != sha256:
            raise IOError(f"{path}: sha256 mismatch ({digest} != {sha256})")
    else:
        record = path + ".sha256"
        if os.path.exists(record):
            pinned = open(record).read().strip()
            if digest != pinned:
                raise IOError(f"{path}: sha256 changed since first fetch "
                              f"({digest} != {pinned}) — delete both files to re-trust")
        else:
            print(f"WARNING: {fname} downloaded without a sha256 pin; "
                  f"recording {digest} (trust-on-first-use)")
            with open(record, "w") as f:
                f.write(digest + "\n")
    return path


def resolve(path_or_url: Optional[str], kind: str) -> Optional[str]:
    """Local path -> unchanged; http(s) URL -> fetched; "default" -> the reference's
    default weight source for ``kind``; None -> None."""
    if path_or_url is None:
        return None
    s = str(path_or_url)
    pin = None
    if s == "default":
        s = DEFAULT_URLS[kind]
        pin = DEFAULT_SHA256.get(kind)
    elif kind == "bpe":
        pin = BPE_SHA256 if s == DEFAULT_URLS["bpe"] else None
    if s.startswith(("http://", "https://")):
        return fetch(s, sha256=pin)
    return s
