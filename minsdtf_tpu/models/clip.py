"""CLIP ViT-L/14 text stack as pure functions over a flat param dict.

Reference behavior being matched (``stable_diffusion/text_encoder.py``):
  - the token+position embedding is a *separate* stage from the transformer
    (``TextClipEmbedding``, :107-124) so textual-inversion vectors can be spliced in
    between (``long_prompt_weighting.py:202-213``);
  - 12 pre-LayerNorm encoder blocks, 12 heads, 768 dim, quick_gelu MLP, causal mask
    (:35-100);
  - ``clip_skip``: tap the output of layer ``num_layers + clip_skip`` and apply the
    final LayerNorm to it (:133-137). clip_skip=-1 is the usual last-layer output.

Param keys use HF/diffusers naming (``text_model.encoder.layers.{i}.*``,
``text_model.embeddings.*``, ``text_model.final_layer_norm``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from minsdtf_tpu.ops.attention import multi_head_attention
from minsdtf_tpu.ops.basic import dense, layer_norm, quick_gelu

EMBED_DIM = 768
NUM_HEADS = 12
NUM_LAYERS = 12
VOCAB_SIZE = 49408
MAX_LENGTH = 77
# CLIP-universal special token ids (the checkpoint vocabulary is always 49408
# rows); used for the fused unconditional-context row, mirroring the reference's
# hardcoded [BOS] + [EOT]*76 (stable_diffusion.py:488-493).
UNCOND_BOS = 49406
UNCOND_PAD = 49407


def clip_embedding(params: dict, tokens: jax.Array, positions: jax.Array) -> jax.Array:
    """Token + position embedding. tokens/positions: (B, S) int32 -> (B, S, 768)."""
    tok = params["text_model.embeddings.token_embedding"]["embedding"][tokens]
    pos = params["text_model.embeddings.position_embedding"]["embedding"][positions]
    return tok + pos


def _encoder_layer(p_prefix: str, params: dict, x: jax.Array) -> jax.Array:
    p = lambda name: params[f"{p_prefix}.{name}"]
    residual = x
    h = layer_norm(x, p("layer_norm1"))
    q = dense(h, p("self_attn.q_proj"))
    k = dense(h, p("self_attn.k_proj"))
    v = dense(h, p("self_attn.v_proj"))
    attn = multi_head_attention(q, k, v, num_heads=NUM_HEADS, causal=True)
    h = dense(attn, p("self_attn.out_proj"))
    x = residual + h
    residual = x
    h = layer_norm(x, p("layer_norm2"))
    h = dense(h, p("mlp.fc1"))
    h = quick_gelu(h)
    h = dense(h, p("mlp.fc2"))
    return residual + h


def text_encoder(params: dict, clip_emb: jax.Array, clip_skip: int = -1) -> jax.Array:
    """Encoder stack on top of :func:`clip_embedding` output.

    Runs layers ``0 .. NUM_LAYERS + clip_skip`` inclusive then the final LayerNorm —
    numerically identical to the reference's run-all-and-tap formulation, but the
    skipped layers are never traced (the reference relies on Keras graph pruning for
    the same effect, ``text_encoder.py:141``).
    """
    num_effective = NUM_LAYERS + clip_skip + 1
    assert 1 <= num_effective <= NUM_LAYERS, f"invalid clip_skip {clip_skip}"
    x = clip_emb
    for idx in range(num_effective):
        x = _encoder_layer(f"text_model.encoder.layers.{idx}", params, x)
    return layer_norm(x, params["text_model.final_layer_norm"])


@partial(
    jax.jit,
    static_argnames=(
        "m", "splice_n", "with_uncond", "no_boseos_middle", "weighted",
        "clip_skip", "bos", "eot",
    ),
)
def fused_lpw_encode(
    params: dict,
    tokens: jax.Array,              # (B, (MAX_LENGTH-2)*m + 2) int32, LPW-padded
    weights: jax.Array,             # (B, L_out) fp32 per-token weights, or None
    embedding: jax.Array,           # (1, splice_n, 768) textual-inversion matrix, or None
    *,
    m: int,                         # chunk count (1..max_embeddings_multiples)
    splice_n: int,                  # textual-inversion token count (0 = none)
    with_uncond: bool,              # also encode [BOS]+[EOT]*76 in the same batch
    no_boseos_middle: bool,
    weighted: bool,                 # apply weights + mean-preserving rescale in-jit
    clip_skip: int,
    bos: int,                       # tokenizer BOS/EOT ids for chunk boundaries
    eot: int,
):
    """The WHOLE text stack in one dispatch: chunk split -> embed -> TI splice ->
    encoder -> boundary strip -> LPW weighting (+ the unconditional context as one
    extra batch row on first use).

    Replaces the per-chunk embed->encode dispatch pairs of
    :func:`minsdtf_tpu.text.prompt_weighting.encode_chunked` (the reference's
    per-chunk ``predict_on_batch`` storm, ``long_prompt_weighting.py:178-237``):
    through the tunnel each dispatch pays ~27 ms fixed RTT, so a fresh prompt cost
    2 RTTs (embed + encode) x chunks + 1 for the uncond context. Here all chunks
    AND the uncond row stack on the encoder's batch axis — one dispatch total.

    Returns ``(context fp32 (B, L_out, 768), uncond fp32 (1, 77, 768) | None)``.
    """
    b = tokens.shape[0]
    chunk = MAX_LENGTH
    step = chunk - 2
    if m == 1:
        rows = tokens
    else:
        # overlapping 77-token windows with BOS/EOT written over the boundaries
        # (reference long_prompt_weighting.py:195-200)
        cs = []
        for i in range(m):
            c = tokens[:, i * step: i * step + chunk]
            cs.append(c.at[:, 0].set(bos).at[:, -1].set(eot))
        rows = jnp.concatenate(cs, axis=0)  # (m*B, 77), chunk-major
    if with_uncond:
        urow = jnp.full((1, chunk), UNCOND_PAD, jnp.int32).at[0, 0].set(UNCOND_BOS)
        rows = jnp.concatenate([rows, urow], axis=0)
    positions = jnp.arange(chunk, dtype=jnp.int32)[None]
    emb = clip_embedding(params, rows, jnp.broadcast_to(positions, rows.shape))
    if splice_n:
        # splice the TI matrix over positions 1..n of chunk 0 (rows 0..B-1),
        # between embedding and encoder (reference :202-213)
        tiled = jnp.broadcast_to(
            embedding.astype(emb.dtype), (b, splice_n, emb.shape[-1])
        )
        head = jnp.concatenate([emb[:b, :1], tiled, emb[:b, splice_n + 1:]], axis=1)
        emb = jnp.concatenate([head, emb[b:]], axis=0)
    enc = text_encoder(params, emb.astype(jnp.float32), clip_skip=clip_skip)
    uncond = enc[-1:] if with_uncond else None
    if with_uncond:
        enc = enc[:-1]
    if m == 1:
        out = enc
    else:
        parts = []
        for i in range(m):
            e = enc[i * b: (i + 1) * b]
            if no_boseos_middle:
                e = e[:, (0 if i == 0 else 1): (None if i == m - 1 else -1)]
            parts.append(e)
        out = jnp.concatenate(parts, axis=1)
    out = out.astype(jnp.float32)
    if weighted:
        # weight multiply + mean-preserving rescale (reference :329-332)
        prev_mean = out.mean(axis=(-2, -1))
        out = out * weights.astype(jnp.float32)[:, :, None]
        out = out * (prev_mean / out.mean(axis=(-2, -1)))[:, None, None]
    return out, uncond


def encode_tokens(params: dict, tokens: jax.Array, clip_skip: int = -1) -> jax.Array:
    """Embedding + encoder in one call; positions are 0..S-1."""
    positions = jnp.arange(tokens.shape[-1], dtype=jnp.int32)[None, :]
    emb = clip_embedding(params, tokens, jnp.broadcast_to(positions, tokens.shape))
    return text_encoder(params, emb, clip_skip=clip_skip)


def init_params(rng: jax.Array, dtype=jnp.float32) -> dict:
    """Random-initialized param dict (tests / benchmarks; production converts weights)."""
    import numpy as np

    rs = np.random.RandomState(np.asarray(jax.random.key_data(rng)).ravel()[-1] % (2**31))

    nd = np.dtype(dtype)

    def normal(*shape, scale=0.02):
        # HOST numpy leaves (like the other models' init_params): the pipeline
        # materializes the pytree on device in one packed transfer.
        return rs.normal(0.0, scale, shape).astype(nd)

    params = {
        "text_model.embeddings.token_embedding": {"embedding": normal(VOCAB_SIZE, EMBED_DIM)},
        "text_model.embeddings.position_embedding": {"embedding": normal(MAX_LENGTH, EMBED_DIM)},
        "text_model.final_layer_norm": {
            "scale": np.ones((EMBED_DIM,), nd),
            "bias": np.zeros((EMBED_DIM,), nd),
        },
    }
    for i in range(NUM_LAYERS):
        pre = f"text_model.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            params[f"{pre}.{ln}"] = {
                "scale": np.ones((EMBED_DIM,), nd),
                "bias": np.zeros((EMBED_DIM,), nd),
            }
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            params[f"{pre}.self_attn.{proj}"] = {
                "kernel": normal(EMBED_DIM, EMBED_DIM),
                "bias": np.zeros((EMBED_DIM,), nd),
            }
        params[f"{pre}.mlp.fc1"] = {
            "kernel": normal(EMBED_DIM, EMBED_DIM * 4),
            "bias": np.zeros((EMBED_DIM * 4,), nd),
        }
        params[f"{pre}.mlp.fc2"] = {
            "kernel": normal(EMBED_DIM * 4, EMBED_DIM),
            "bias": np.zeros((EMBED_DIM,), nd),
        }
    return params
