"""PyTorch / safetensors checkpoint -> JAX flat param pytree.

The reference re-reads + re-maps torch checkpoints at every model construction
(``ckpt_loader.py:2136-2193``); here conversion is a standalone step producing plain
``{module_name: {leaf: np.ndarray}}`` dicts (fp32) that the jitted models consume
directly, with torch needed only for ``.pth/.ckpt/.pt`` pickles (safetensors reads are
torch-free via ``safetensors.numpy``).

Semantics matched to the reference loader:
  - permutations: dense ``(1,0)``; conv OIHW->HWIO ``(2,3,1,0)``; norms/embeddings
    unchanged (``ckpt_loader.py:2181-2182``, tables :709-2133);
  - dual UNet layout: LDM ``model.diffusion_model.*`` and diffusers, auto-detected
    (:2160-2164, via the generated mapping instead of the 686-entry table);
  - LoRA deltas added to the torch-layout tensor *before* transposition (:2169-2182);
  - per-tensor shape verification (:2183-2184) — here a hard error, not a print.

Capability supersets (documented, deliberate): the VAE and text encoder can also be
extracted from a *single-file* ckpt (``first_stage_model.*`` / ``cond_stage_model.*``),
and old-diffusers VAE attention names (``query/key/value/proj_attn``) are accepted
alongside the modern ``to_q/..`` names.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np

from minsdtf_tpu.models import clip as clip_lib
from minsdtf_tpu.models import controlnet as controlnet_lib
from minsdtf_tpu.models import unet as unet_lib
from minsdtf_tpu.models import vae as vae_lib
from minsdtf_tpu.weights import mapping

StateDict = Dict[str, np.ndarray]
Params = Dict[str, Dict[str, np.ndarray]]


def read_state_dict(path: str) -> StateDict:
    """Read a checkpoint file into a {torch_key: float32 numpy} dict."""
    if path.endswith(".safetensors"):
        from minsdtf_tpu.weights import native_io

        if native_io.available():
            try:
                return native_io.read_state_dict_native(path)
            except Exception as e:  # fall through to the python reader
                print(f"native reader failed ({e}); using python fallback")

        from safetensors import safe_open

        try:
            out: StateDict = {}
            with safe_open(path, framework="numpy") as f:
                for key in f.keys():
                    out[key] = _to_numpy(f.get_tensor(key))
            return out
        except (TypeError, ValueError):
            # numpy framework can't represent bf16 — fall back to torch reads.
            out = {}
            with safe_open(path, framework="pt") as f:
                for key in f.keys():
                    out[key] = _to_numpy(f.get_tensor(key))
            return out
    import torch

    # Prefer the safe unpickler; legacy .ckpt/.pth files that need full pickle
    # (arbitrary code execution risk) only load on explicit opt-out.
    try:
        state = torch.load(path, map_location="cpu", weights_only=True)
    except Exception:
        if os.environ.get("MINSDTF_UNSAFE_PICKLE") != "1":
            raise IOError(
                f"{path}: not loadable with torch weights_only=True; if you trust "
                "this file, set MINSDTF_UNSAFE_PICKLE=1 to allow full unpickling"
            )
        state = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(state, dict) and "state_dict" in state and isinstance(state["state_dict"], dict):
        state = state["state_dict"]
    return {k: _to_numpy(v) for k, v in state.items() if hasattr(v, "shape")}


def _to_numpy(t) -> np.ndarray:
    try:
        import torch

        if isinstance(t, torch.Tensor):
            return t.detach().to(torch.float32).cpu().numpy()
    except ImportError:
        pass
    arr = np.asarray(t)
    if arr.dtype in (np.float16, np.float64) or str(arr.dtype) == "bfloat16":
        arr = arr.astype(np.float32)
    return arr


def _renamed(sd: StateDict, module_map: Dict[str, str], prefix_strip: str = "") -> StateDict:
    """Translate module-level names; keys not covered by the map pass through with
    the prefix stripped (covers layouts that are already diffusers-named)."""
    out: StateDict = {}
    for key, val in sd.items():
        if prefix_strip and key.startswith(prefix_strip):
            key = key[len(prefix_strip):]
        module, _, leaf = key.rpartition(".")
        out[f"{module_map.get(module, module)}.{leaf}"] = val
    return out


def _build_params(
    sd: StateDict,
    specs: Dict[str, Dict[str, tuple]],
    lora: Optional[StateDict] = None,
    alternates: Optional[Dict[str, str]] = None,
) -> Params:
    """Assemble the flat param dict from a diffusers-named state dict.

    ``alternates`` maps a module-name *suffix* to an alternate suffix to try
    (e.g. VAE ``to_q`` -> ``query``).
    """
    lora = lora or {}
    applied_lora = 0
    params: Params = {}
    missing = []
    for module, leaves in specs.items():
        params[module] = {}
        for leaf, shape in leaves.items():
            suffix = "bias" if leaf == "bias" else "weight"
            key = f"{module}.{suffix}"
            w = sd.get(key)
            if w is None and alternates:
                for want, alt in alternates.items():
                    if module.endswith(want):
                        w = sd.get(f"{module[: -len(want)]}{alt}.{suffix}")
                        if w is not None:
                            break
            if w is None:
                missing.append(key)
                continue
            if leaf == "kernel":
                lw = lora.get(key)
                if lw is not None:
                    w = w + lw.reshape(w.shape)
                    applied_lora += 1
                if w.ndim == 2 and len(shape) == 2:
                    w = np.transpose(w, (1, 0))
                elif w.ndim == 4 and len(shape) == 4:
                    w = np.transpose(w, (2, 3, 1, 0))
                elif w.ndim == 4 and len(shape) == 2:
                    # 1x1-conv checkpoint into a dense module (LDM VAE attention)
                    w = np.transpose(w[:, :, 0, 0], (1, 0))
                else:
                    raise ValueError(f"{key}: rank {w.ndim} vs spec {shape}")
            w = np.ascontiguousarray(w, dtype=np.float32)
            if tuple(w.shape) != tuple(shape):
                raise ValueError(f"{key}: shape {w.shape} != expected {shape}")
            params[module][leaf] = w
    if missing:
        raise KeyError(f"{len(missing)} missing checkpoint keys, first: {missing[:8]}")
    if lora:
        n_lora = sum(1 for k in lora if k.endswith(".weight"))
        if applied_lora != n_lora:
            print(f"Applied {applied_lora}/{n_lora} LoRA deltas")
    return params


# ---- converted-pytree cache -------------------------------------------------------------

CONVERTERS = {}


def convert_cached(kind: str, path: str, lora: Optional[StateDict] = None,
                   use_cache: Optional[bool] = None) -> Params:
    """Convert with an on-disk msgpack cache next to the checkpoint.

    The reference re-reads and re-maps the torch checkpoint on every model
    construction (ckpt_loader.py:2136); here the converted fp32 pytree is cached as
    ``<ckpt>.minsdtf-<kind>.msgpack`` (flax serialization) and reloaded directly —
    torch/safetensors parsing happens once per file. LoRA-merged loads are not
    cached (the merge is cheap and lora files vary). Disable with
    MINSDTF_NO_CACHE=1 or use_cache=False.
    """
    import flax.serialization as fser

    if use_cache is None:
        use_cache = os.environ.get("MINSDTF_NO_CACHE") != "1"
    fn = CONVERTERS[kind]
    if lora is not None or not use_cache:
        return fn(path) if lora is None else fn(path, lora=lora)
    cache_path = f"{path}.minsdtf-{kind}.msgpack"
    try:
        if os.path.exists(cache_path) and os.path.getmtime(cache_path) >= os.path.getmtime(path):
            with open(cache_path, "rb") as f:
                return fser.msgpack_restore(f.read())
    except Exception as e:
        print(f"pytree cache read failed ({e}); reconverting")
    params = fn(path)
    try:
        with open(cache_path, "wb") as f:
            f.write(fser.msgpack_serialize(params))
    except Exception as e:
        print(f"pytree cache write failed ({e})")
    return params


# ---- per-model entry points ------------------------------------------------------------


def convert_unet(source, lora: Optional[StateDict] = None) -> Params:
    """``source`` is a path or a state dict; LDM or diffusers layout, auto-detected."""
    sd = read_state_dict(source) if isinstance(source, str) else source
    if any(k.startswith(mapping.UNET_LDM_PREFIX) for k in sd):
        sd = _renamed(sd, mapping.unet_ldm_to_diffusers())
    return _build_params(sd, unet_lib.param_specs(), lora=lora)


def convert_vae(source) -> Params:
    sd = read_state_dict(source) if isinstance(source, str) else source
    if any(k.startswith(mapping.VAE_LDM_PREFIX) for k in sd):
        sd = {k[len(mapping.VAE_LDM_PREFIX):]: v
              for k, v in sd.items() if k.startswith(mapping.VAE_LDM_PREFIX)}
        sd = _renamed(sd, mapping.vae_ldm_to_diffusers())
    return _build_params(sd, vae_lib.param_specs(), alternates=mapping.VAE_ATTN_ALTERNATES)


def convert_text_encoder(source, clip_skip: int = -1, lora: Optional[StateDict] = None) -> Params:
    """clip_skip only affects which layers exist in the checkpoint slice the model
    needs; all present layers are converted (cheap) so one pytree serves any skip."""
    sd = read_state_dict(source) if isinstance(source, str) else source
    if any(k.startswith(mapping.TEXT_ENCODER_LDM_PREFIX) for k in sd):
        sd = {k[len(mapping.TEXT_ENCODER_LDM_PREFIX):]: v
              for k, v in sd.items() if k.startswith(mapping.TEXT_ENCODER_LDM_PREFIX)}
    specs = _text_encoder_specs()
    return _build_params(sd, specs, lora=lora)


def convert_controlnet(source) -> Params:
    sd = read_state_dict(source) if isinstance(source, str) else source
    if any(k.startswith("control_model.") for k in sd):
        sd = _renamed(sd, mapping.controlnet_ldm_to_diffusers())
    return _build_params(sd, controlnet_lib.param_specs())


CONVERTERS.update({
    "unet": convert_unet,
    "vae": convert_vae,
    "text_encoder": convert_text_encoder,
    "controlnet": convert_controlnet,
})


def _text_encoder_specs() -> Dict[str, Dict[str, tuple]]:
    d = clip_lib.EMBED_DIM
    specs: Dict[str, Dict[str, tuple]] = {
        "text_model.embeddings.token_embedding": {"embedding": (clip_lib.VOCAB_SIZE, d)},
        "text_model.embeddings.position_embedding": {"embedding": (clip_lib.MAX_LENGTH, d)},
        "text_model.final_layer_norm": {"scale": (d,), "bias": (d,)},
    }
    for i in range(clip_lib.NUM_LAYERS):
        pre = f"text_model.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            specs[f"{pre}.{ln}"] = {"scale": (d,), "bias": (d,)}
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            specs[f"{pre}.self_attn.{proj}"] = {"kernel": (d, d), "bias": (d,)}
        specs[f"{pre}.mlp.fc1"] = {"kernel": (d, 4 * d), "bias": (4 * d,)}
        specs[f"{pre}.mlp.fc2"] = {"kernel": (4 * d, d), "bias": (d,)}
    return specs
