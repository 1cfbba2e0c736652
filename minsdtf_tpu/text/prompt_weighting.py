"""A1111-style long-prompt weighting (LPW).

Host-side prompt machinery with the exact semantics of the reference
(``stable_diffusion/long_prompt_weighting.py``):
  - ``(abc)`` x1.1, ``[abc]`` /1.1, ``(abc:w)`` xw, escapes, nested stacking,
    run-merging (:26-109);
  - tokenization of weighted fragments with optional textual-inversion placeholder
    tokens prepended (:112-150);
  - padding to ``(77-2)*m + 2`` and per-chunk BOS/EOT weight handling (:153-175);
  - chunked >77-token encoding with 2-token overlap and boundary overwrite, and the
    textual-inversion embedding spliced into chunk 0 between the embedding and the
    encoder (:178-237);
  - final weighting with mean-preserving rescale (:329-332).

Device work is delegated to two callables so this module stays jit-free:
``embed_fn(tokens) -> clip embedding`` and ``encode_fn(clip_embedding) -> context``.
"""

from __future__ import annotations

import re as _stdre
from typing import Callable, List, Optional, Tuple, Union

import numpy as np

_ATTENTION_RE = _stdre.compile(
    r"\\\(|\\\)|\\\[|\\]|\\\\|\\|\(|\[|:([+-]?[.\d]+)\)|\)|]|[^\\()\[\]:]+|:",
    _stdre.X,
)

ROUND_MULTIPLIER = 1.1
SQUARE_MULTIPLIER = 1 / 1.1


def parse_prompt_attention(text: str) -> List[List[Union[str, float]]]:
    r"""Parse A1111 attention syntax into [text, weight] pairs.

    >>> parse_prompt_attention('normal text')
    [['normal text', 1.0]]
    >>> parse_prompt_attention('an (important) word')
    [['an ', 1.0], ['important', 1.1], [' word', 1.0]]
    >>> parse_prompt_attention('(unbalanced')
    [['unbalanced', 1.1]]
    >>> parse_prompt_attention('(unnecessary)(parens)')
    [['unnecessaryparens', 1.1]]
    """
    res: List[List[Union[str, float]]] = []
    round_stack: List[int] = []
    square_stack: List[int] = []

    def scale_from(start: int, multiplier: float):
        for i in range(start, len(res)):
            res[i][1] *= multiplier

    for m in _ATTENTION_RE.finditer(text):
        tok = m.group(0)
        weight = m.group(1)
        if tok.startswith("\\"):
            res.append([tok[1:], 1.0])
        elif tok == "(":
            round_stack.append(len(res))
        elif tok == "[":
            square_stack.append(len(res))
        elif weight is not None and round_stack:
            scale_from(round_stack.pop(), float(weight))
        elif tok == ")" and round_stack:
            scale_from(round_stack.pop(), ROUND_MULTIPLIER)
        elif tok == "]" and square_stack:
            scale_from(square_stack.pop(), SQUARE_MULTIPLIER)
        else:
            res.append([tok, 1.0])

    for pos in round_stack:
        scale_from(pos, ROUND_MULTIPLIER)
    for pos in square_stack:
        scale_from(pos, SQUARE_MULTIPLIER)
    if not res:
        return [["", 1.0]]
    # merge adjacent runs of equal weight
    merged: List[List[Union[str, float]]] = [res[0]]
    for text_i, w_i in res[1:]:
        if merged[-1][1] == w_i:
            merged[-1][0] += text_i
        else:
            merged.append([text_i, w_i])
    return merged


def tokenize_weighted(
    tokenizer,
    prompts: List[str],
    max_length: int,
    embedding_tokens_count: int = 0,
    embedding_tokens_weight: float = 1.0,
) -> Tuple[List[List[int]], List[List[float]]]:
    """Tokenize weighted fragments; no BOS/EOT/padding yet. Textual-inversion
    placeholder tokens (the BPE of ``*``) are prepended ``embedding_tokens_count``
    times (reference :126-130)."""
    all_tokens, all_weights = [], []
    truncated = False
    for text in prompts:
        tokens: List[int] = []
        weights: List[float] = []
        if embedding_tokens_count > 0:
            star = tokenizer.encode("*")[1:-1]
            tokens += star * embedding_tokens_count
            weights += [embedding_tokens_weight] * embedding_tokens_count
        for fragment, weight in parse_prompt_attention(text):
            ids = tokenizer.encode(fragment.strip())[1:-1]
            tokens += list(ids)
            weights += [weight] * len(ids)
            if len(tokens) > max_length:
                truncated = True
                break
        if len(tokens) > max_length:
            truncated = True
            tokens, weights = tokens[:max_length], weights[:max_length]
        all_tokens.append(tokens)
        all_weights.append(weights)
    if truncated:
        print("Prompt was truncated; shorten it or raise max_embeddings_multiples.")
    return all_tokens, all_weights


def pad_tokens_and_weights(
    tokens, weights, max_length, bos, eos, pad, no_boseos_middle=True, chunk_length=77
):
    """Wrap with BOS/.../pad/EOT; weight layout depends on whether chunk boundaries
    keep their BOS/EOT (reference :153-175, incl. EOT-at-end padding layout)."""
    max_multiples = (max_length - 2) // (chunk_length - 2)
    weights_length = max_length if no_boseos_middle else max_multiples * chunk_length
    for i in range(len(tokens)):
        tokens[i] = [bos] + tokens[i] + [pad] * (max_length - 2 - len(tokens[i])) + [eos]
        if no_boseos_middle:
            weights[i] = [1.0] + weights[i] + [1.0] * (max_length - 1 - len(weights[i]))
        else:
            w: List[float] = []
            if len(weights[i]) == 0:
                w = [1.0] * weights_length
            else:
                for j in range(max_multiples):
                    w.append(1.0)  # chunk BOS
                    w += weights[i][j * (chunk_length - 2): min(len(weights[i]), (j + 1) * (chunk_length - 2))]
                    w.append(1.0)  # chunk EOT
                w += [1.0] * (weights_length - len(w))
            weights[i] = w[:]
    return tokens, weights


def encode_chunked(
    embed_fn: Callable[[np.ndarray], np.ndarray],
    encode_fn: Callable[[np.ndarray], np.ndarray],
    text_input: np.ndarray,
    chunk_length: int = 77,
    no_boseos_middle: bool = True,
    embedding_tokens_count: int = 0,
    embedding: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Split a (B, (chunk-2)*m + 2) token array into m overlapping 77-token chunks,
    encode each, optionally splice the TI embedding into chunk 0 (reference :178-237)."""
    use_embedding = embedding_tokens_count > 0 and embedding is not None

    def embed_and_splice(chunk_tokens: np.ndarray, splice: bool) -> np.ndarray:
        clip_emb = np.asarray(embed_fn(chunk_tokens))
        if splice:
            tiled = np.tile(embedding, (clip_emb.shape[0], 1, 1)).astype(clip_emb.dtype)
            clip_emb = np.concatenate(
                [clip_emb[:, 0:1, :], tiled, clip_emb[:, embedding_tokens_count + 1:, :]],
                axis=1,
            )
        return np.asarray(encode_fn(clip_emb))

    max_multiples = (text_input.shape[1] - 2) // (chunk_length - 2)
    if max_multiples <= 1:
        return embed_and_splice(text_input, use_embedding)

    parts = []
    for i in range(max_multiples):
        chunk = text_input[:, i * (chunk_length - 2): (i + 1) * (chunk_length - 2) + 2].copy()
        chunk[:, 0] = text_input[0, 0]
        chunk[:, -1] = text_input[0, -1]
        encoded = embed_and_splice(chunk, use_embedding and i == 0)
        if no_boseos_middle:
            if i == 0:
                encoded = encoded[:, :-1]
            elif i == max_multiples - 1:
                encoded = encoded[:, 1:]
            else:
                encoded = encoded[:, 1:-1]
        parts.append(encoded)
    return np.concatenate(parts, axis=1)


def get_weighted_text_embeddings(
    tokenizer,
    embed_fn: Callable,
    encode_fn: Callable,
    prompt: Union[str, List[str]],
    max_embeddings_multiples: int = 4,
    no_boseos_middle: bool = False,
    skip_parsing: bool = False,
    skip_weighting: bool = False,
    model_max_length: int = 77,
    pad_token_id: int = 49407,
    embedding_tokens_count: int = 0,
    embedding_tokens_weight: float = 1.0,
    embedding: Optional[np.ndarray] = None,
    fused_fn: Optional[Callable] = None,
) -> np.ndarray:
    """Full LPW entry point (reference :240-333): parse -> pad -> chunked encode ->
    weight multiply -> mean-preserving rescale.

    ``fused_fn`` (single-dispatch device path): when given, the chunked encode AND
    the weighting run inside one jit — called as ``fused_fn(token_array,
    weight_array_or_None, embedding, embedding_tokens_count, no_boseos_middle)``
    and its (device-array) result is returned directly. The host logic above
    (parsing, tokenization, padding, multiples) is shared between both paths."""
    if embedding_tokens_count > 0 and embedding is None:
        embedding_tokens_count = 0
    max_length = (model_max_length - 2) * max_embeddings_multiples + 2
    if isinstance(prompt, str):
        prompt = [prompt]

    if not skip_parsing:
        tokens, weights = tokenize_weighted(
            tokenizer, prompt, max_length - 2, embedding_tokens_count, embedding_tokens_weight
        )
    else:
        tokens = [tokenizer.encode(p)[1:-1][: max_length - 2] for p in prompt]
        weights = [[1.0] * len(t) for t in tokens]

    longest = max(len(t) for t in tokens)
    max_embeddings_multiples = max(
        1, min(max_embeddings_multiples, (longest - 1) // (model_max_length - 2) + 1)
    )
    max_length = (model_max_length - 2) * max_embeddings_multiples + 2

    tokens, weights = pad_tokens_and_weights(
        tokens,
        weights,
        max_length,
        bos=tokenizer.start_of_text,
        eos=tokenizer.end_of_text,
        pad=pad_token_id,
        no_boseos_middle=no_boseos_middle,
        chunk_length=model_max_length,
    )
    token_array = np.asarray(tokens, dtype=np.int32)
    if fused_fn is not None:
        weighted = not skip_parsing and not skip_weighting
        return fused_fn(
            token_array,
            np.asarray(weights, dtype=np.float32) if weighted else None,
            embedding,
            embedding_tokens_count,
            no_boseos_middle,
        )
    embeddings = encode_chunked(
        embed_fn,
        encode_fn,
        token_array,
        chunk_length=model_max_length,
        no_boseos_middle=no_boseos_middle,
        embedding_tokens_count=embedding_tokens_count,
        embedding=embedding,
    ).astype(np.float32)

    if not skip_parsing and not skip_weighting:
        weight_array = np.asarray(weights, dtype=embeddings.dtype)
        previous_mean = embeddings.mean(axis=(-2, -1))
        embeddings = embeddings * weight_array[:, :, None]
        embeddings = embeddings * (previous_mean / embeddings.mean(axis=(-2, -1)))[:, None, None]
    return embeddings
