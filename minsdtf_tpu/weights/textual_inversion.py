"""Textual-inversion embedding files -> (n_tokens, 768) numpy matrices.

The reference reads A1111-style ``.pt`` files via ``torch.load`` and takes the first
float tensor under ``state_dict["string_to_param"]`` (``stable_diffusion.py:71-82``).
Also accepts the common safetensors TI layout (``emb_params``) as a superset.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np


def load_embedding(path: str) -> Optional[np.ndarray]:
    if not os.path.exists(str(path)):
        return None
    if str(path).endswith(".safetensors"):
        from minsdtf_tpu.weights.convert import read_state_dict

        sd = read_state_dict(str(path))
        for key in ("emb_params", "string_to_param"):
            if key in sd:
                return np.asarray(sd[key], dtype=np.float32)
        for val in sd.values():  # single-tensor files
            return np.asarray(val, dtype=np.float32)
        return None

    import torch

    # A1111 TI .pt files hold tensors in a plain dict — the safe unpickler usually
    # suffices; full pickle (code-exec risk) needs explicit opt-in.
    try:
        state = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if os.environ.get("MINSDTF_UNSAFE_PICKLE") != "1":
            raise IOError(
                f"{path}: not loadable with torch weights_only=True; if you trust "
                "this file, set MINSDTF_UNSAFE_PICKLE=1 to allow full unpickling"
            )
        state = torch.load(path, map_location="cpu", weights_only=False)
    table = state.get("string_to_param") if isinstance(state, dict) else None
    if table is None:
        return None
    for value in table.values():
        if hasattr(value, "dtype") and value.dtype in (torch.float32, torch.float16):
            return value.detach().to(torch.float32).numpy()
    return None
