"""The public StableDiffusion pipeline — same API surface as the reference
(``stable_diffusion/stable_diffusion.py:47-725``), TPU-native execution.

Reference-compatible surface: constructor kwargs (img_height/img_width/jit_compile/
clip_skip/unet_ckpt/text_encoder_ckpt/vae_ckpt/lora_path/controlnet_path/active_tcd)
and methods ``text_to_image`` / ``image_to_image`` / ``inpaint`` / ``encode_text`` /
``generate_image`` with the reference's kwargs.

Execution differences (by design — see DESIGN.md):
  - the whole denoise loop + VAE decode is ONE jitted program (zero per-step host
    round-trips; the reference does >=50 dispatches per image);
  - CFG cond/uncond runs as one batched UNet call when context lengths match;
  - weights convert once into fp32 pytrees; compute dtype is a policy (bf16 on TPU by
    default, fp32 otherwise / for parity);
  - TCD's per-step noise uses jax.random.fold_in (same distribution as the
    reference's ``np.random.randn``, different realization);
  - no weight auto-download (zero-egress): checkpoint paths must exist, otherwise
    seeded random init is used (useful for benchmarks/tests) with a warning;
  - additional kwargs: ``bpe_path`` (CLIP merges file, the reference downloads it),
    ``compute_dtype``, ``mesh``/``batch_axis`` for multi-chip sharding.

Known reference bug NOT reproduced: ``preprocessed_mask`` swaps h/w when resizing the
latent mask (``stable_diffusion.py:301``), which breaks non-square inpainting; we
resize to (h//8, w//8).
"""

from __future__ import annotations

import hashlib
import os
from typing import List, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from minsdtf_tpu import imaging, rng as rng_lib, sampler, scheduler as sched_lib
from minsdtf_tpu.ops import attention as attention_ops
from minsdtf_tpu.models import clip as clip_lib
from minsdtf_tpu.models import controlnet as controlnet_lib
from minsdtf_tpu.models import unet as unet_lib
from minsdtf_tpu.models import vae as vae_lib
from minsdtf_tpu.text import prompt_weighting as lpw
from minsdtf_tpu.text.tokenizer import ClipTokenizer
from minsdtf_tpu.weights import convert, lora as lora_lib, textual_inversion

MAX_PROMPT_LENGTH = 77
PAD_TOKEN_ID = 49407
BOS_TOKEN_ID = 49406

# Pure-txt2img initial noise is drawn inside the sampler jit (same TF-Philox
# stream as rng.stateless_normal; see generate_image). Knob for A/B + fallback.
_DEVICE_NOISE = os.environ.get("MINSDTF_DEVICE_NOISE", "1") == "1"

# Persistent compilation cache: the sampler program is large (whole denoise loop);
# caching makes process restarts start in seconds instead of minutes. CPU runs must
# NOT use it: XLA:CPU AOT executables bake the compiling host's vector ISA and the
# cache key does not include it, so an entry written by a different host generation
# aborts the process at load ("Machine type ... doesn't match", then SIGABRT in
# jax Array._value — hit by tests/test_sharding.py when the build machine changed).
if not os.environ.get("JAX_COMPILATION_CACHE_DIR") and not (
    jax.config.jax_platforms == "cpu" or os.environ.get("JAX_PLATFORMS") == "cpu"
):
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser("~/.cache/minsdtf-jax")
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def _default_dtype():
    try:
        return jnp.bfloat16 if jax.devices()[0].platform == "tpu" else jnp.float32
    except Exception:
        return jnp.float32


_HOST_CALLBACKS_SUPPORTED = None


def _host_callbacks_supported() -> bool:
    """Some PJRT backends (e.g. tunneled TPUs) reject host callbacks; probe once.
    When unsupported, per-step progress falls back to post-hoc invocation."""
    global _HOST_CALLBACKS_SUPPORTED
    if _HOST_CALLBACKS_SUPPORTED is None:
        try:
            def probe(x):
                jax.debug.callback(lambda v: None, x)
                return x

            jax.block_until_ready(jax.jit(probe)(jnp.zeros(())))
            _HOST_CALLBACKS_SUPPORTED = True
        except Exception:
            _HOST_CALLBACKS_SUPPORTED = False
    return _HOST_CALLBACKS_SUPPORTED


class StableDiffusion:
    """Stable Diffusion 1.5 txt2img / img2img / inpaint on TPU."""

    def __init__(
        self,
        img_height: int = 512,
        img_width: int = 512,
        jit_compile: bool = True,  # accepted for API parity; everything is always jitted
        clip_skip: int = -1,
        unet_ckpt: Optional[str] = None,
        text_encoder_ckpt: Optional[str] = None,
        vae_ckpt: Optional[str] = None,
        lora_path: Optional[str] = None,
        controlnet_path: Optional[str] = None,
        active_tcd: bool = False,
        bpe_path: Optional[str] = None,
        compute_dtype=None,
        mesh=None,
        scheduler_type: Optional[str] = None,
        sequence_parallel: bool = False,
        weight_dtype: Optional[str] = None,
        int8_act_scales=None,
        prediction_type: str = "epsilon",
    ):
        self.img_height = int(img_height)
        self.img_width = int(img_width)
        # The UNet downsamples the /8 latent 3 more times; sizes not divisible by
        # 64 break the skip-concat shapes deep in the graph. The reference's docs
        # claim rounding (stable_diffusion.py:589-593) but its code does not —
        # its GUI just steps the sliders by 64 (app.py:172,181). Fail loud here.
        for name, v in (("img_height", self.img_height), ("img_width", self.img_width)):
            if v <= 0 or v % 64:
                raise ValueError(
                    f"{name}={v} is not a positive multiple of 64; the UNet's "
                    "downsampling stack requires image sides divisible by 64")
        self.clip_skip = int(clip_skip)
        # prediction_type="v": v-objective checkpoints (arXiv:2202.00512; many
        # modern SD1.5-architecture finetunes) — the sampler converts the model
        # output to (x0, eps) per step; all schedulers work unchanged.
        if prediction_type not in ("epsilon", "v"):
            raise ValueError(
                f"prediction_type must be 'epsilon' or 'v', got {prediction_type!r}")
        self.prediction_type = prediction_type
        self.compute_dtype = compute_dtype or _default_dtype()
        self.mesh = mesh
        # weight_dtype="int8": W8A8 quantization of the UNet/ControlNet conv+dense
        # kernels (weights/quantize.py) — 2x MXU peak on the serving path. The text
        # encoder and VAE stay in compute_dtype (tiny / quality-critical shares).
        # weight_dtype="int8_hybrid": int8 ONLY on calibration-stable conv sites
        # with baked static scales (zero dynamic amax reduces); everything else
        # bf16 (weights/quantize.hybridize_params). Requires int8_act_scales or a
        # calibrate_int8() call before generating.
        if weight_dtype not in (None, "int8", "int8_hybrid"):
            raise ValueError(
                f"weight_dtype must be None, 'int8' or 'int8_hybrid', got {weight_dtype!r}")
        if weight_dtype is not None and mesh is not None:
            raise ValueError(
                "weight_dtype='int8' is single-device only for now (the TP sharding "
                "rules operate on float kernels)"
            )
        self.weight_dtype = weight_dtype
        # Calibrated static activation scales for the int8 path: a {site: amax}
        # dict or an .npz path from weights/calibrate.py. None = dynamic scales.
        if isinstance(int8_act_scales, str):
            from minsdtf_tpu.weights import calibrate as _cal

            int8_act_scales = _cal.load_scales(int8_act_scales)
        self._int8_act_scales = int8_act_scales
        # Read once at construction: the dense-site W8A8 A/B knob for int8_hybrid
        # (quantize.hybridize_params dense_dynamic). A per-call environment read
        # could silently flip the config between lazy param materialization and a
        # later calibrate_int8() (ADVICE r3).
        self._hybrid_dense = os.environ.get("MINSDTF_HYBRID_DENSE", "0") == "1"
        # int8_hybrid quality knobs (weights/quantize.hybridize_params v2), all
        # read once here for the same reason. Defaults = the dossier-winning
        # config; set a knob to "none"/"0" to A/B the v1 behavior.
        _f = lambda k, d: (None if os.environ.get(k, d).lower() == "none"
                           else float(os.environ.get(k, d)))
        self._hybrid_cfg = {
            "equalize_alpha": _f("MINSDTF_HYBRID_ALPHA", "0.5"),
            "clip_sigmas": _f("MINSDTF_HYBRID_CLIP", "none"),
            "bias_correct": os.environ.get("MINSDTF_HYBRID_BIASCORR", "1") == "1",
            "max_site_rel_mse": _f("MINSDTF_HYBRID_MAX_ERR", "none"),
        }
        # Sequence parallelism: shard the self-attention token axis over the mesh's
        # `model` axis via ring attention (ops/ring_attention.py) for >=1024px
        # generation. Weights are then REPLICATED (the model axis carries tokens,
        # not Megatron shards). The config is PER-INSTANCE: it is asserted into the
        # (trace-time) process-global attention config at the top of every
        # generation call via _apply_sp, and the sampler's jit cache is keyed on it
        # (the `sp` static arg) — so constructing a second, non-SP pipeline in the
        # same process no longer disables a previously built SP pipeline.
        self.sequence_parallel = bool(sequence_parallel) and mesh is not None
        self._sp_config = None
        if self.sequence_parallel:
            from minsdtf_tpu.parallel.mesh import MODEL_AXIS

            self._sp_config = (
                mesh, MODEL_AXIS, int(os.environ.get("MINSDTF_SP_MIN_SEQ", 16384))
            )
        # scheduler_type supersets the reference's active_tcd flag: None derives from
        # active_tcd; "lcm" selects the LCM consistency sampler (reference TODO
        # "Sampler", README.md:150) over the same distillation timestep grid.
        if scheduler_type is None:
            scheduler_type = "tcd" if active_tcd else "ddim"
        if scheduler_type == "lcm":
            self.scheduler = sched_lib.LCMScheduler()
        elif scheduler_type == "dpm":
            # DPM-Solver++(2M): DDIM-25 quality at ~12-15 steps (beyond reference)
            self.scheduler = sched_lib.DPMSolverScheduler()
        elif scheduler_type == "dpm_karras":
            # the community-standard "DPM++ 2M Karras" spacing (arXiv:2206.00364)
            self.scheduler = sched_lib.DPMSolverScheduler(karras_sigmas=True)
        elif scheduler_type == "euler_a":
            # Euler-Ancestral, the community "Euler a" (beyond reference)
            self.scheduler = sched_lib.EulerAncestralScheduler()
        elif scheduler_type == "tcd":
            self.scheduler = sched_lib.Scheduler(active_tcd=True)
        elif scheduler_type in ("ddim", "euler"):
            # "euler" is an exact alias: on the VP eps-prediction parametrization
            # the (non-ancestral) Euler update algebraically equals DDIM
            # (scheduler.EulerAncestralScheduler docstring)
            self.scheduler = sched_lib.Scheduler(active_tcd=False)
        else:
            raise ValueError(f"unknown scheduler_type: {scheduler_type!r}")
        self.scheduler_type = scheduler_type
        self.active_tcd = self.scheduler.active_tcd

        self.unet_ckpt = unet_ckpt
        self.text_encoder_ckpt = text_encoder_ckpt
        self.vae_ckpt = vae_ckpt
        self.controlnet_path = controlnet_path
        self.bpe_path = bpe_path

        self.text_encoder_lora = None
        self.unet_lora = None
        if lora_path is not None and os.path.exists(str(lora_path)):
            self.text_encoder_lora, self.unet_lora = lora_lib.load_lora(lora_path)

        self._unet_params = None
        self._text_params = None
        self._vae_params = None
        self._controlnet_params = None
        self._tokenizer = None
        self._embed_jit = None
        self._text_encode_jit = None
        self._hint_jit = None
        self._uncond_cache = None
        self._uncond_dev = None
        self._sched_cache = {}
        self._scalar_cache = {}

    def _apply_sp(self) -> None:
        """Point the process-global sequence-parallel attention config at THIS
        instance. Globals are only read at trace time; the sampler's jit cache is
        keyed on ``sequence_parallel_key()`` so traces from instances with
        different SP configs cannot collide."""
        if self._sp_config is None:
            attention_ops.set_sequence_parallel(None)
        else:
            attention_ops.set_sequence_parallel(*self._sp_config)

    def set_lora(self, lora_path: Optional[str], scale: float = 1.0) -> None:
        """Switch the active LoRA at runtime (a capability the reference lacks —
        README: "Merge yes / Switch no"). Re-derives the UNet/text-encoder params
        from the (msgpack-cached) base checkpoint with the new deltas merged;
        ``None`` removes any LoRA. ``scale`` multiplies the deltas."""
        from minsdtf_tpu.weights import lora as lora_lib

        if lora_path is None:
            self.text_encoder_lora = self.unet_lora = None
        else:
            te, un = lora_lib.load_lora(str(lora_path))
            self.text_encoder_lora = lora_lib.scale_lora(te, scale)
            self.unet_lora = lora_lib.scale_lora(un, scale)
        self._unet_params = None
        self._text_params = None
        self._uncond_cache = None
        self._uncond_dev = None

    # ---- lazy weights -----------------------------------------------------------

    def _load_or_init(self, path, kind, init_fn, seed, lora=None, cast=True):
        if path is not None and not os.path.exists(str(path)):
            # URL or "default": resolve through the download cache (reference
            # auto-downloads its defaults; needs network, absent in the CI sandbox).
            from minsdtf_tpu.weights import fetch

            try:
                path = fetch.resolve(path, kind)
            except Exception as e:
                raise FileNotFoundError(f"{kind}: cannot fetch {path}: {e}") from e
        if path is not None and os.path.exists(str(path)):
            print(f"{kind}: converting weights from {os.path.basename(str(path))}")
            params = convert.convert_cached(kind, str(path), lora=lora)
        elif path is not None:
            raise FileNotFoundError(f"{kind}: checkpoint not found: {path}")
        else:
            print(f"{kind}: no checkpoint given — using seeded random init (no-network env)")
            params = init_fn(jax.random.PRNGKey(seed))
        return self._cast(params) if cast else params

    def _cast(self, params):
        """Matmul/conv weights live in the compute dtype (bf16 in production: halves
        weight HBM traffic and avoids per-step casts inside the scan); norm
        scale/bias stay fp32 — the norm ops compute fp32 statistics anyway.

        Materialization is BATCHED: casts happen host-side (numpy/ml_dtypes
        bf16 — same round-to-nearest-even as a device astype), then the whole
        host pytree lands in ONE ``jax.device_put`` whose transfers stream
        asynchronously. The previous per-leaf ``jnp.asarray`` paid ~28 ms of
        fixed tunnel dispatch per leaf (~700 leaves/model, ~215 s before the
        first trace — measured r5); batched it is ~42 s for the 1.1 GB UNet,
        i.e. bandwidth-bound, and the bf16 host cast also halves the bytes
        crossing the tunnel. (A packed single-buffer + jitted slice/reshape
        unpack was tried first: XLA pads small-minor conv-shape reshapes from
        one flat bf16 buffer to a 54 GB allocation at compile time — tiled
        layouts make that design a non-starter on TPU.) Device-array leaves
        (e.g. runtime LoRA remerges of already-resident params) pass through
        untouched."""
        cast_to = (None if self.compute_dtype == jnp.float32
                   else np.dtype(self.compute_dtype))
        host, passthrough, any_host = {}, {}, False
        for module, leaves in params.items():
            for leaf, v in leaves.items():
                if isinstance(v, jax.Array):
                    passthrough[(module, leaf)] = v
                    continue
                a = np.asarray(v)
                if cast_to is not None and leaf in ("kernel", "embedding"):
                    a = a.astype(cast_to)
                host.setdefault(module, {})[leaf] = a
                any_host = True
        if not any_host:  # pure-device pytree (already materialized)
            return params
        out = jax.device_put(host)
        for (module, leaf), v in passthrough.items():
            out.setdefault(module, {})[leaf] = v
        return out

    @property
    def unet_params(self):
        if self._unet_params is None:
            # Load uncast (fp32): int8 quantization snaps from the fp32 originals,
            # not from already-rounded bf16 kernels.
            params = self._load_or_init(
                self.unet_ckpt, "unet", unet_lib.init_params, 0, lora=self.unet_lora,
                cast=False,
            )
            if self.mesh is None and os.environ.get("MINSDTF_FUSE_QKV", "1") == "1":
                params = unet_lib.fuse_attention_projections(params)
            if self.weight_dtype == "int8":
                from minsdtf_tpu.weights import quantize

                params = quantize.quantize_params(params)
                if self._int8_act_scales:
                    from minsdtf_tpu.weights import calibrate as _cal

                    params = _cal.bake_act_scales(params, self._int8_act_scales)
            elif self.weight_dtype == "int8_hybrid" and (
                self._int8_act_scales or self._hybrid_dense
            ):
                from minsdtf_tpu.weights import quantize

                # stable-conv-site-only int8 from the fp32 originals; without
                # scales the conv sites stay float until calibrate_int8() runs.
                # MINSDTF_HYBRID_DENSE=1 additionally runs the dense sites W8A8
                # with dynamic per-token scales (A/B knob, see quantize.py) —
                # dense needs no calibrated scales, so it applies even when
                # int8_act_scales is absent.
                params = quantize.hybridize_params(
                    params, self._int8_act_scales or {},
                    dense_dynamic=self._hybrid_dense, **self._hybrid_cfg,
                )
            self._unet_params = self._shard(self._cast(params))
        return self._unet_params

    @property
    def text_params(self):
        if self._text_params is None:
            self._text_params = self._shard(self._load_or_init(
                self.text_encoder_ckpt, "text_encoder", clip_lib.init_params, 1,
                lora=self.text_encoder_lora,
            ))
        return self._text_params

    @property
    def vae_params(self):
        if self._vae_params is None:
            self._vae_params = self._shard(self._load_or_init(
                self.vae_ckpt, "vae", vae_lib.init_params, 2,
            ))
        return self._vae_params

    @property
    def controlnet_params(self):
        if self._controlnet_params is None and self.controlnet_path is not None:
            params = self._load_or_init(
                self.controlnet_path, "controlnet", controlnet_lib.init_params, 3,
                cast=False,
            )
            if self.weight_dtype == "int8":
                from minsdtf_tpu.weights import quantize

                params = quantize.quantize_params(params)
            self._controlnet_params = self._shard(self._cast(params))
        return self._controlnet_params

    def _shard(self, params):
        if self.mesh is None:
            return params
        from minsdtf_tpu.parallel import sharding

        if self.sequence_parallel:
            return sharding.replicate_params(params, self.mesh)
        return sharding.shard_params(params, self.mesh)

    @property
    def tokenizer(self) -> ClipTokenizer:
        if self._tokenizer is None:
            if not self.bpe_path:
                raise ValueError(
                    "bpe_path is required (CLIP merges file, e.g. "
                    "bpe_simple_vocab_16e6.txt.gz); this environment cannot download it."
                )
            self._tokenizer = ClipTokenizer(self.bpe_path)
        return self._tokenizer

    # ---- text encoding ------------------------------------------------------------

    def _text_fns(self):
        if self._embed_jit is None:
            clip_skip = self.clip_skip

            @jax.jit
            def embed(params, tokens):
                positions = jnp.arange(tokens.shape[-1], dtype=jnp.int32)[None]
                positions = jnp.broadcast_to(positions, tokens.shape)
                return clip_lib.clip_embedding(params, tokens, positions)

            @jax.jit
            def encode(params, emb):
                return clip_lib.text_encoder(params, emb, clip_skip=clip_skip)

            self._embed_jit = embed
            self._text_encode_jit = encode
        params = self.text_params
        return (
            lambda tokens: self._embed_jit(params, jnp.asarray(tokens, jnp.int32)),
            lambda emb: self._text_encode_jit(params, jnp.asarray(emb, jnp.float32)),
        )

    def encode_text(self, prompt: Union[str, List[str]], embedding_data=None) -> np.ndarray:
        """Prompt -> (B, 77*m, 768) context via A1111 LPW; optional textual-inversion
        embedding (path to .pt/.safetensors or array) spliced at the front."""
        return np.asarray(self._encode_text_dev(prompt, embedding_data), np.float32)

    def _encode_text_dev(self, prompt: Union[str, List[str]], embedding_data=None):
        """Device-resident encode_text: tokenize/parse on host, then the whole
        embed -> TI splice -> encoder -> LPW weighting stack in ONE dispatch
        (clip_lib.fused_lpw_encode) returning a (B, S, 768) fp32 device array that
        feeds the sampler with no host round-trip. The first call also encodes the
        unconditional context as one extra batch row (same dispatch). Repeat
        prompts (no TI) hit a small device-side cache."""
        cache_key = None
        if embedding_data is None:
            cache_key = (prompt if isinstance(prompt, str) else tuple(prompt),
                         self._uncond_dev is not None)
            cache = getattr(self, "_prompt_dev_cache", None)
            if cache is None:
                cache = self._prompt_dev_cache = {}
            hit = cache.get(cache_key)
            if hit is not None:
                return hit
        embedding = None
        embedding_tokens_count = 0
        if embedding_data is not None:
            # Multi-textual-inversion (a reference TODO): a list of files/arrays
            # concatenates along the token axis.
            items = embedding_data if isinstance(embedding_data, (list, tuple)) else [embedding_data]
            mats = []
            for item in items:
                if isinstance(item, str):
                    mat = textual_inversion.load_embedding(item)
                    if mat is None:
                        raise ValueError(f"failed to load embedding file: {item}.")
                else:
                    mat = np.asarray(item, dtype=np.float32)
                mats.append(mat)
            embedding = np.concatenate(mats, axis=0)
            embedding_tokens_count = embedding.shape[0]
            embedding = embedding[None]
        embed_fn, encode_fn = self._text_fns()
        out = lpw.get_weighted_text_embeddings(
            self.tokenizer,
            embed_fn,
            encode_fn,
            prompt,
            model_max_length=MAX_PROMPT_LENGTH,
            pad_token_id=PAD_TOKEN_ID,
            embedding=embedding,
            embedding_tokens_count=embedding_tokens_count,
            fused_fn=self._fused_text_call,
        )
        if cache_key is not None:
            if len(self._prompt_dev_cache) >= 8:
                self._prompt_dev_cache.pop(next(iter(self._prompt_dev_cache)))
            self._prompt_dev_cache[cache_key] = out
        return out

    def _fused_text_call(self, token_array, weight_array, embedding, splice_n,
                         no_boseos_middle):
        """lpw fused_fn hook -> clip_lib.fused_lpw_encode. Encodes the uncond
        context in the same dispatch while it is still unset (one extra encoder
        batch row instead of a separate ~27 ms tunnel dispatch later)."""
        params = self.text_params
        m = (token_array.shape[1] - 2) // (MAX_PROMPT_LENGTH - 2)
        want_uncond = self._uncond_dev is None
        tok = self.tokenizer
        context, uncond = clip_lib.fused_lpw_encode(
            params,
            jnp.asarray(token_array, jnp.int32),
            None if weight_array is None else jnp.asarray(weight_array, jnp.float32),
            None if embedding is None else jnp.asarray(embedding, jnp.float32),
            m=m,
            splice_n=int(splice_n),
            with_uncond=want_uncond,
            no_boseos_middle=bool(no_boseos_middle),
            weighted=weight_array is not None,
            clip_skip=self.clip_skip,
            bos=int(tok.start_of_text),
            eot=int(tok.end_of_text),
        )
        if want_uncond:
            self._uncond_dev = uncond
        return context

    def warm_text(self) -> None:
        """Pre-compile the fused text-encoding traces for single-chunk prompts
        (with and without the batched uncond row) so a serving daemon's first
        fresh prompt pays dispatch latency, not compile latency."""
        self._encode_text_dev("warmup prompt")
        self._prompt_dev_cache.clear()
        self._encode_text_dev("warmup prompt")
        self._prompt_dev_cache.clear()

    def _unconditional_context(self) -> np.ndarray:
        """[BOS] + [EOT]*76 through embed+encode, bypassing LPW (reference :488-493).
        Prompt-independent, so cached after the first call."""
        if getattr(self, "_uncond_cache", None) is None:
            if getattr(self, "_uncond_dev", None) is not None:
                # already encoded (batched into a fused text dispatch)
                self._uncond_cache = np.asarray(self._uncond_dev, np.float32)
                return self._uncond_cache
            tokens = np.asarray(
                [[BOS_TOKEN_ID] + [PAD_TOKEN_ID] * (MAX_PROMPT_LENGTH - 1)], np.int32
            )
            embed_fn, encode_fn = self._text_fns()
            self._uncond_cache = np.asarray(encode_fn(embed_fn(tokens)))
        return self._uncond_cache

    def _unconditional_context_dev(self):
        """Device-resident (1, 77, 768) unconditional context — transferred once,
        reused every call (it crossed the tunnel per generate_image before)."""
        if getattr(self, "_uncond_dev", None) is None:
            self._uncond_dev = jnp.asarray(self._unconditional_context(), jnp.float32)
        return self._uncond_dev

    def _device_schedule(self, num_steps, strength, eta):
        """Per-instance cache of (schedule, t_embs, rows) with the arrays already
        on device: the schedule depends only on (num_steps, strength, eta) for a
        given scheduler, but was rebuilt and re-transferred (12 small H2D copies,
        each paying the tunnel's per-transfer latency) on EVERY generate_image."""
        cache = getattr(self, "_sched_cache", None)
        if cache is None:
            cache = self._sched_cache = {}
        key = (num_steps, None if strength is None else round(float(strength), 6),
               round(float(eta), 6))
        hit = cache.get(key)
        if hit is None:
            schedule = sched_lib.build_denoise_schedule(
                self.scheduler, num_steps, strength=strength, eta=eta
            )
            t_embs = jnp.asarray(
                sched_lib.timestep_embedding(schedule.timesteps), jnp.float32
            )
            rows = {
                k: jnp.asarray(getattr(schedule, k), jnp.float32)
                for k in ("sr_t", "nr_t", "sr_prev", "nr_prev", "sr_s", "nr_s",
                          "c_denoised", "c_noise", "c_skip", "c_out",
                          "c_x", "c_d", "w", "is_last")
            }
            if len(cache) >= 16:
                cache.pop(next(iter(cache)))
            hit = cache[key] = (schedule, t_embs, rows)
        return hit

    def _context_dev(self, context: np.ndarray):
        """Content-keyed device cache for text contexts: repeated prompts (every
        bench rep, every CFG-batched serving request with a popular prompt) skip
        the 236 KB H2D and its ~27 ms fixed tunnel latency. md5 of the bytes is
        ~0.3 ms — content hashing is safe against callers mutating arrays in
        place, where an id() key would serve stale embeddings."""
        arr = np.ascontiguousarray(context, np.float32)
        key = (arr.shape, hashlib.md5(arr.tobytes()).hexdigest())
        cache = getattr(self, "_ctx_dev_cache", None)
        if cache is None:
            cache = self._ctx_dev_cache = {}
        hit = cache.get(key)
        if hit is None:
            if len(cache) >= 8:
                cache.pop(next(iter(cache)))
            hit = cache[key] = jnp.asarray(arr)
        return hit

    def _scalar(self, value):
        """Value-keyed cache of traced f32 scalars (guidance scale/rescale) — each
        distinct value is one tunnel H2D, ever, instead of two per call."""
        cache = getattr(self, "_scalar_cache", None)
        if cache is None:
            cache = self._scalar_cache = {}
        key = float(value)
        if key not in cache:
            if len(cache) >= 32:
                cache.pop(next(iter(cache)))
            cache[key] = jnp.float32(key)
        return cache[key]

    # ---- public generation methods --------------------------------------------------

    def text_to_image(
        self,
        prompt,
        negative_prompt=None,
        batch_size=1,
        num_steps=50,
        unconditional_guidance_scale=7.5,
        embedding=None,
        negative_embedding=None,
        seed=None,
        control_net_image=None,
        guidance_rescale=0.7,
        callback=None,
    ):
        encoded_text = self._encode_text_dev(prompt, embedding)
        return self.generate_image(
            encoded_text,
            negative_prompt=negative_prompt,
            batch_size=batch_size,
            num_steps=num_steps,
            unconditional_guidance_scale=unconditional_guidance_scale,
            seed=seed,
            negative_embedding=negative_embedding,
            control_net_image=control_net_image,
            guidance_rescale=guidance_rescale,
            callback=callback,
        )

    def image_to_image(
        self,
        prompt,
        negative_prompt=None,
        batch_size=1,
        num_steps=50,
        unconditional_guidance_scale=7.5,
        embedding=None,
        negative_embedding=None,
        seed=None,
        control_net_image=None,
        reference_image=None,
        reference_image_strength=0.8,
        guidance_rescale=0.7,
        callback=None,
    ):
        encoded_text = self._encode_text_dev(prompt, embedding)
        return self.generate_image(
            encoded_text,
            negative_prompt=negative_prompt,
            batch_size=batch_size,
            num_steps=num_steps,
            unconditional_guidance_scale=unconditional_guidance_scale,
            seed=seed,
            negative_embedding=negative_embedding,
            control_net_image=control_net_image,
            reference_image=reference_image,
            reference_image_strength=reference_image_strength,
            guidance_rescale=guidance_rescale,
            callback=callback,
        )

    def inpaint(
        self,
        prompt,
        negative_prompt=None,
        batch_size=1,
        num_steps=50,
        unconditional_guidance_scale=7.5,
        embedding=None,
        negative_embedding=None,
        seed=None,
        control_net_image=None,
        reference_image=None,
        reference_image_strength=0.8,
        inpaint_mask=None,
        mask_blur_strength=None,
        guidance_rescale=0.7,
        callback=None,
    ):
        encoded_text = self._encode_text_dev(prompt, embedding)
        return self.generate_image(
            encoded_text,
            negative_prompt=negative_prompt,
            batch_size=batch_size,
            num_steps=num_steps,
            unconditional_guidance_scale=unconditional_guidance_scale,
            seed=seed,
            negative_embedding=negative_embedding,
            control_net_image=control_net_image,
            reference_image=reference_image,
            reference_image_strength=reference_image_strength,
            inpaint_mask=inpaint_mask,
            mask_blur_strength=mask_blur_strength,
            guidance_rescale=guidance_rescale,
            callback=callback,
        )

    def generate_image(
        self,
        encoded_text,
        negative_prompt=None,
        batch_size=1,
        num_steps=50,
        unconditional_guidance_scale=7.5,
        diffusion_noise=None,
        seed=None,
        negative_embedding=None,
        control_net_image=None,
        inpaint_mask=None,
        mask_blur_strength=None,
        reference_image=None,
        reference_image_strength=0.8,
        guidance_rescale=0.0,
        callback=None,
        eta=0.3,
        return_latent=False,
        return_trajectory=False,
        _defer_fetch=False,
    ):
        if diffusion_noise is not None and seed is not None:
            raise ValueError(
                "`diffusion_noise` and `seed` should not both be passed to "
                "`generate_image`. `seed` is only used to generate diffusion "
                "noise when it's not already user-specified."
            )
        self._apply_sp()
        h8, w8 = self.img_height // 8, self.img_width // 8
        dtype = self.compute_dtype

        # Contexts may arrive as device arrays (the fused _encode_text_dev path —
        # zero host round-trips) or as host arrays (reference-style callers passing
        # numpy from encode_text); host arrays go through the content-keyed device
        # cache.
        if isinstance(encoded_text, jax.Array) and encoded_text.ndim == 3:
            context = encoded_text
        else:
            context = self._context_dev(self._as_context(encoded_text, batch_size))
        use_cfg = unconditional_guidance_scale > 0.0
        uncond_context = None
        if use_cfg:
            if negative_prompt is None and negative_embedding is None:
                uncond_context = self._unconditional_context_dev()
            else:
                uncond_context = self._encode_text_dev(
                    negative_prompt or "", negative_embedding
                )

        # ---- noise & init latent ------------------------------------------------
        if seed is None and diffusion_noise is None:
            seed = int(np.random.randint(0, 2**31 - 1))
        # `key_seed` seeds TCD's/LCM's per-step stochastic noise. When the caller
        # supplies diffusion_noise (seed must be None), draw a fresh seed so repeated
        # runs get fresh TCD noise — matching the reference's per-step
        # np.random.randn (scheduler.py:301) rather than replaying one fixed stream.
        # The device PRNGKey itself is built lazily below: it costs two tunnel
        # dispatches and only the stochastic branches consume it.
        key_seed = seed if seed is not None else int(np.random.randint(0, 2**31 - 1))
        use_img2img = reference_image is not None and (0.0 < reference_image_strength < 1.0)
        use_inpaint = inpaint_mask is not None
        # Pure txt2img draws the initial noise INSIDE the sampler jit from the
        # 16-byte Philox (key, counter) — same TF-Philox stream as the host path,
        # same seed semantics, but the 65 KB noise H2D (a ~27 ms fixed-latency
        # tunnel transfer, experiments/tunnel_xfer.py) disappears. img2img/inpaint
        # combine the noise with host-side latents, so they keep the host generator.
        device_noise = (
            _DEVICE_NOISE and diffusion_noise is None
            and not use_img2img and not use_inpaint
        )
        philox_kc = noise = None
        if diffusion_noise is not None:
            noise = np.squeeze(np.asarray(diffusion_noise, np.float32))
            if noise.ndim == 3:
                noise = np.repeat(noise[None], batch_size, axis=0)
            noise = jnp.asarray(noise, jnp.float32)
        elif device_noise:
            # numpy, NOT jnp.asarray: an explicit pre-dispatch transfer pays its
            # own fixed tunnel RTT (~28 ms); as a host arg the 16 bytes ride the
            # sampler dispatch's own arg upload.
            philox_kc = np.asarray(rng_lib.philox_key_counter(seed))
        else:
            # TF-Philox-compatible host generator: the SAME integer seed yields the
            # SAME initial noise as the reference's keras.random.normal(seed)
            # (stable_diffusion.py:555-557), so seed-only runs reproduce reference
            # images. The latent is KBs — host generation costs nothing.
            noise = jnp.asarray(
                rng_lib.stateless_normal((batch_size, h8, w8, 4), seed), jnp.float32
            )

        # ---- img2img / inpaint preprocessing --------------------------------------
        strength = None
        init_latent = None
        image01 = pixel_mask = latent_mask = None
        if use_inpaint:
            pixel_mask, latent_mask = imaging.preprocess_mask(
                inpaint_mask, self.img_height, self.img_width, mask_blur_strength
            )
        if use_img2img:
            image01, image_tensor = imaging.preprocess_image(
                reference_image, self.img_height, self.img_width
            )
            init_latent = np.asarray(
                self._encode_image(image_tensor.astype(np.float32)), np.float32
            )
            strength = float(reference_image_strength)

        schedule, t_embs, rows = self._device_schedule(num_steps, strength, eta)

        if use_img2img:
            t0 = schedule.init_timestep
            latent0 = (
                self.scheduler.signal_rates[t0] * np.repeat(init_latent, batch_size, axis=0)
                + self.scheduler.noise_rates[t0] * noise
            ).astype(np.float32)
        else:
            latent0 = noise

        # ---- ControlNet hint ----------------------------------------------------------
        hint = None
        use_controls = False
        if control_net_image is not None:
            arr = imaging.load_image(control_net_image, "RGB")
            arr = imaging.bilinear_resize(arr, self.img_height, self.img_width)
            cn_img = (np.asarray(arr, np.float32) / 255.0)[None]
            cn_img = np.tile(cn_img, (batch_size, 1, 1, 1))
            hint = self._hint(cn_img.astype(np.float32))
            use_controls = True

        is_lcm = schedule.mode == "lcm"
        is_dpm = schedule.mode == "dpm"
        is_euler_a = schedule.mode == "euler_a"
        stochastic = schedule.active_tcd and not is_lcm and eta > 0.0
        noise_key = (
            jax.random.fold_in(jax.random.PRNGKey(key_seed), 1)
            if (is_lcm or stochastic or is_euler_a) else None
        )
        inpaint_active = use_inpaint and init_latent is not None
        live_progress = callback is not None and _host_callbacks_supported()
        if live_progress:
            sampler.set_progress_callback(callback)
        try:
            out = sampler.generate(
                self.unet_params,
                self.vae_params,
                None if device_noise else jnp.asarray(latent0, dtype),
                context,
                jnp.asarray(uncond_context, jnp.float32) if use_cfg else None,
                t_embs,
                rows,
                self._scalar(unconditional_guidance_scale),
                self._scalar(guidance_rescale),
                noise_key=noise_key,
                philox_kc=philox_kc,
                latent_shape=(batch_size, h8, w8, 4) if device_noise else None,
                latent_dtype=jnp.dtype(dtype).name if device_noise else None,
                controlnet_params=self.controlnet_params if use_controls else None,
                hint=hint,
                init_latent=jnp.asarray(init_latent, jnp.float32)
                if inpaint_active else None,
                latent_mask=jnp.asarray(latent_mask, jnp.float32) if inpaint_active else None,
                blend_noise=jnp.asarray(noise, jnp.float32) if inpaint_active else None,
                image_for_blend=jnp.asarray(image01, jnp.float32)
                if (use_inpaint and image01 is not None) else None,
                pixel_mask=jnp.asarray(pixel_mask, jnp.float32)
                if (use_inpaint and image01 is not None) else None,
                use_cfg=use_cfg,
                active_tcd=schedule.active_tcd and not is_lcm,
                stochastic=stochastic,
                lcm=is_lcm,
                dpm=is_dpm,
                euler_a=is_euler_a,
                v_prediction=self.prediction_type == "v",
                use_controls=use_controls,
                use_inpaint=inpaint_active,
                with_progress=live_progress,
                sp=attention_ops.sequence_parallel_key(),
                trace_latents=return_trajectory,
            )
            image_u8, latent = out[0], out[1]
            trajectory = out[2] if return_trajectory else None
            # _defer_fetch (generate_images): leave the result on device — the
            # caller fetches later, overlapping this D2H with the next dispatch.
            image = image_u8 if _defer_fetch else np.asarray(image_u8)
        finally:
            # Always clear the module-global callback so a failed run cannot leak
            # it into the next generate_image call.
            if live_progress:
                sampler.set_progress_callback(None)
        if callback is not None and not live_progress and not _defer_fetch:
            for i in range(schedule.num_steps):  # post-hoc fallback
                callback(i + 1)
        if return_trajectory:
            traj = trajectory if _defer_fetch else np.asarray(trajectory, np.float32)
            if return_latent:
                return image, np.asarray(latent, np.float32), traj
            return image, traj
        if return_latent:
            return image, (latent if _defer_fetch else np.asarray(latent, np.float32))
        return image

    def calibrate_int8(
        self,
        encoded_text=None,
        num_steps: int = 25,
        seeds=(0, 1),
        unconditional_guidance_scale: float = 7.5,
        guidance_rescale: float = 0.7,
        margin: float = 1.05,
        include_dense: bool = False,
        save_path: Optional[str] = None,
    ):
        """Calibrate static int8 activation scales on real denoising trajectories
        and bake them into the live UNet params (weights/calibrate.py).

        Replaces the per-call dynamic amax reduces (~54 ms/gen of int8 device
        time) with fused clipped rounds. Returns the {site: amax} dict; pass it
        (or ``save_path``) to ``StableDiffusion(int8_act_scales=...)`` to skip
        recalibration in later processes. Triggers one sampler recompile (the
        quantization graph changes).

        Under ``weight_dtype="int8_hybrid"`` the calibration trajectory runs on a
        TEMPORARY conv-only dynamically-quantized copy; the live params then
        become the hybrid form (stable conv sites int8+static scale, everything
        else float — weights/quantize.hybridize_params)."""
        if self.weight_dtype not in ("int8", "int8_hybrid"):
            raise ValueError(
                "calibrate_int8 requires weight_dtype='int8' or 'int8_hybrid'")
        from minsdtf_tpu.weights import calibrate as _cal

        h8, w8 = self.img_height // 8, self.img_width // 8
        uncond = self._as_context(self._unconditional_context(), 1)
        context = (
            self._as_context(encoded_text, 1) if encoded_text is not None else uncond
        )
        schedule = sched_lib.build_denoise_schedule(self.scheduler, num_steps, eta=0.3)
        t_embs = sched_lib.timestep_embedding(schedule.timesteps)
        rows = {
            k: np.asarray(getattr(schedule, k), np.float32)
            for k in ("sr_t", "nr_t", "sr_prev", "nr_prev", "is_last")
        }
        calib_params = self.unet_params
        if self.weight_dtype == "int8_hybrid":
            from minsdtf_tpu.weights import quantize as _q

            # temporary fully-dynamic conv-only quantization: the tape only
            # records sites that actually quantize, so the calibration copy must
            # carry kernel_q at every candidate conv site
            calib_params = _q.quantize_params(self.unet_params, conv_only=True)
        amax: dict = {}
        for seed in seeds:
            latent0 = rng_lib.stateless_normal((1, h8, w8, 4), seed).astype(np.float32)
            got = _cal.collect_unet_amax(
                calib_params,
                jnp.asarray(latent0, self.compute_dtype),
                context,
                uncond,
                t_embs,
                rows,
                guidance_scale=unconditional_guidance_scale,
                guidance_rescale=guidance_rescale,
            )
            # fold across seeds: worst-case maxima, union stability ratio,
            # averaged channel moments (weights/calibrate.merge_stats)
            _cal.merge_stats(amax, got)
        if self.weight_dtype == "int8_hybrid":
            from minsdtf_tpu.weights import quantize as _q

            self._unet_params = _q.hybridize_params(
                self.unet_params, amax, margin=margin,
                dense_dynamic=self._hybrid_dense, **self._hybrid_cfg,
            )
        else:
            self._unet_params = _cal.bake_act_scales(
                self.unet_params, amax, margin=margin, include_dense=include_dense
            )
        if save_path:
            _cal.save_scales(save_path, amax)
        return amax

    def generate_images(self, encoded_texts, seeds=None, **kwargs):
        """Throughput-mode generation: dispatch EVERY request before fetching any
        result, so the host work + image D2H of request i overlap device compute of
        request i+1 (JAX async dispatch queues the programs on device).

        Measured anatomy (ROADMAP r2): a single 512px generation is ~0.50 s device
        + ~0.1 s host/transfer; queued dispatch hides the latter, so serving
        throughput approaches pure device time. ``encoded_texts`` is a list of
        contexts (as accepted by ``generate_image``); ``seeds`` an optional list.
        Remaining kwargs are passed through (``callback`` is not supported here).
        Returns a list of uint8 image batches.
        """
        if kwargs.get("callback") is not None:
            raise ValueError("generate_images does not support per-step callbacks")
        if kwargs.get("return_latent"):
            raise ValueError("generate_images returns images only")
        handles = [
            self.generate_image(
                enc,
                seed=None if seeds is None else seeds[i],
                _defer_fetch=True,
                **kwargs,
            )
            for i, enc in enumerate(encoded_texts)
        ]
        return [np.asarray(h) for h in handles]

    # ---- small jitted helpers --------------------------------------------------------

    def _encode_image(self, image_tensor: np.ndarray):
        self._apply_sp()  # VAE spatial attention may route through SP at >=2048px
        params = self.vae_params

        @jax.jit
        def run(p, x):
            return vae_lib.encode(p, x)

        return run(params, jnp.asarray(image_tensor, self.compute_dtype)).astype(jnp.float32)

    def _hint(self, cn_img: np.ndarray):
        if self._hint_jit is None:
            self._hint_jit = jax.jit(controlnet_lib.hint_net)
        return self._hint_jit(self.controlnet_params, jnp.asarray(cn_img, self.compute_dtype))

    @staticmethod
    def _expand(text_embedding: np.ndarray, batch_size: int) -> np.ndarray:
        text_embedding = np.squeeze(text_embedding)
        if text_embedding.ndim == 2:
            text_embedding = np.repeat(text_embedding[None], batch_size, axis=0)
        return text_embedding

    @staticmethod
    def _as_context(text_embedding, batch_size: int) -> np.ndarray:
        """Shape a context for the sampler WITHOUT host-side batch tiling: a single
        prompt stays (1, S, 768) and is broadcast to the latent batch inside the
        jit (sampler.generate), so only 236 KB crosses the tunnel however large
        the batch. Per-image prompt lists pass through as (B, S, 768)."""
        emb = np.squeeze(np.asarray(text_embedding, np.float32))
        if emb.ndim == 2:
            return emb[None]
        return emb

    # ---- reference-compatible sub-model attributes --------------------------------
    # The reference exposes each sub-model as a Keras Model with predict_on_batch
    # (stable_diffusion.py:650-725). These shims give reference users the same
    # handles over the jitted functional models.

    @property
    def diffusion_model(self):
        params = self.unet_params

        def fn(inputs):
            latent, t_emb, context, *controls = inputs
            return np.asarray(jax.jit(unet_lib.apply)(
                params,
                jnp.asarray(latent, self.compute_dtype),
                jnp.asarray(t_emb, self.compute_dtype),
                jnp.asarray(context, self.compute_dtype),
                controls=tuple(jnp.asarray(c, self.compute_dtype) for c in controls) or None,
            ), np.float32)

        return _CompatModel(fn)

    @property
    def text_clip_embedding(self):
        params = self.text_params

        def fn(inputs):
            tokens, positions = inputs
            positions = np.broadcast_to(np.asarray(positions, np.int32), np.asarray(tokens).shape)
            return np.asarray(jax.jit(clip_lib.clip_embedding)(
                params, jnp.asarray(tokens, jnp.int32), jnp.asarray(positions, jnp.int32)
            ), np.float32)

        return _CompatModel(fn)

    @property
    def text_encoder(self):
        embed_fn, encode_fn = self._text_fns()
        return _CompatModel(lambda emb: np.asarray(encode_fn(emb), np.float32))

    @property
    def image_encoder(self):
        return _CompatModel(lambda img: np.asarray(self._encode_image(np.asarray(img)), np.float32))

    @property
    def image_decoder(self):
        params = self.vae_params

        def fn(latent):
            return np.asarray(jax.jit(vae_lib.decode)(
                params, jnp.asarray(latent, self.compute_dtype)
            ), np.float32)

        return _CompatModel(fn)

    @property
    def hint_net(self):
        return _CompatModel(lambda img: np.asarray(self._hint(np.asarray(img)), np.float32))

    @property
    def control_net(self):
        params = self.controlnet_params

        def fn(inputs):
            latent, t_emb, context, hint = inputs
            outs = controlnet_lib.apply(
                params,
                jnp.asarray(latent, self.compute_dtype),
                jnp.asarray(t_emb, self.compute_dtype),
                jnp.asarray(context, self.compute_dtype),
                jnp.asarray(hint, self.compute_dtype),
            )
            return [np.asarray(o, np.float32) for o in outs]

        return _CompatModel(fn)


class _CompatModel:
    """Minimal stand-in for a Keras Model handle: ``predict_on_batch`` + ``__call__``."""

    def __init__(self, fn):
        self._fn = fn

    def predict_on_batch(self, inputs):
        return self._fn(inputs)

    def __call__(self, inputs):
        return self._fn(inputs)
