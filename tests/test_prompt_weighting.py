"""LPW parser/padding parity vs the reference long_prompt_weighting module (numpy-only
oracle), and tokenizer parity vs the reference SimpleTokenizer on a synthetic merges
vocabulary (the real CLIP merges file needs network access)."""

import gzip

import numpy as np
import pytest

from conftest import load_reference_module
from minsdtf_tpu.text import prompt_weighting as lpw
from minsdtf_tpu.text.tokenizer import ClipTokenizer

ref_lpw = load_reference_module("long_prompt_weighting")

PROMPTS = [
    "normal text",
    "an (important) word",
    "(unbalanced",
    r"\(literal\]",
    "(unnecessary)(parens)",
    "a (((house:1.3)) [on] a (hill:0.5), sun, (((sky))).",
    "",
    "[[nested [brackets]]] and (weights:0.25) \\\\ escapes",
    "colon:in:text (with:2) end",
]


@pytest.mark.parametrize("prompt", PROMPTS)
def test_parse_prompt_attention_parity(prompt):
    assert lpw.parse_prompt_attention(prompt) == ref_lpw.parse_prompt_attention(prompt)


def _synthetic_merges(tmp_path):
    """A tiny merges file in the CLIP format (version header + ranked merges)."""
    merges = [
        "h e", "l l", "he ll", "o</w> w", "hell o</w>", "w o", "wo r", "wor l",
        "worl d</w>", "t h", "th e</w>", "a</w> b", "c a", "ca t</w>", "d o", "do g</w>",
        "s t", "st a", "sta r</w>", "1 2", "* *",
    ]
    path = tmp_path / "merges.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write("#version: synthetic\n")
        f.write("\n".join(merges) + "\n")
    return str(path)


@pytest.fixture(scope="module")
def tokenizers(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bpe")
    path = _synthetic_merges(tmp)
    ref_tok_mod = load_reference_module("clip_tokenizer")
    return ClipTokenizer(path), ref_tok_mod.SimpleTokenizer(bpe_path=path)


TEXTS = [
    "hello world",
    "the cat,  the DOG!",
    "star 123 star",
    "Ünïcödé & <html> entities &amp;",
    "a (weighted:1.2) prompt's test",
    "",
    "*",
]


@pytest.mark.parametrize("text", TEXTS)
def test_tokenizer_encode_parity(tokenizers, text):
    ours, ref = tokenizers
    assert ours.encode(text) == ref.encode(text)


def test_tokenizer_decode_roundtrip(tokenizers):
    ours, ref = tokenizers
    ids = ours.encode("hello world the cat")
    assert ours.decode(ids[1:-1]) == ref.decode(ids[1:-1])


def test_add_tokens_parity(tokenizers):
    ours, ref = tokenizers
    assert ours.add_tokens("<my-ti-token>") == ref.add_tokens("<my-ti-token>") == 1
    assert ours.add_tokens("<my-ti-token>") == ref.add_tokens("<my-ti-token>") == 0
    text = "a <my-ti-token> b"
    assert ours.encode(text) == ref.encode(text)


def test_pad_tokens_and_weights_parity(tokenizers):
    ours, _ = tokenizers
    for no_boseos in (True, False):
        toks = [[5, 6, 7], list(range(5, 100))]
        ws = [[1.0, 1.1, 1.0], [1.0] * 95]
        import copy

        got = lpw.pad_tokens_and_weights(
            copy.deepcopy(toks), copy.deepcopy(ws), 152, bos=1, eos=2, pad=0,
            no_boseos_middle=no_boseos, chunk_length=77,
        )
        want = ref_lpw.pad_tokens_and_weights(
            copy.deepcopy(toks), copy.deepcopy(ws), 152, bos=1, eos=2, pad=0,
            no_boseos_middle=no_boseos, chunk_length=77,
        )
        assert got[0] == want[0] and got[1] == want[1]


def test_get_weighted_text_embeddings_parity(tokenizers):
    """Full LPW path with stub encoders (deterministic function of tokens), short and
    long (multi-chunk) prompts, with and without a TI embedding."""
    ours_tok, ref_tok = tokenizers
    rng = np.random.RandomState(0)
    table = rng.normal(0, 1, (49410, 8)).astype(np.float32)
    mix = rng.normal(0, 0.5, (8, 8)).astype(np.float32)

    def embed_fn(tokens):
        return table[np.asarray(tokens)]

    def encode_fn(emb):
        return np.tanh(emb @ mix)

    class StubModel:  # mimics keras predict_on_batch for the reference path
        def __init__(self, fn):
            self.fn = fn

        def predict_on_batch(self, inputs):
            return self.fn(inputs)

    ref_embed = StubModel(lambda io: table[np.asarray(io[0])])
    ref_encode = StubModel(lambda e: np.tanh(np.asarray(e) @ mix))

    ti = rng.normal(0, 1, (1, 3, 8)).astype(np.float32)
    long_prompt = " ".join(["the cat (dog:1.3) star"] * 20)
    for prompt, emb, cnt in [
        ("hello (world:1.3)", None, 0),
        (long_prompt, None, 0),
        ("hello world", ti, 3),
    ]:
        got = lpw.get_weighted_text_embeddings(
            ours_tok, embed_fn, encode_fn, prompt,
            embedding=emb, embedding_tokens_count=cnt,
        )
        want = ref_lpw.get_weighted_text_embeddings(
            ref_tok, ref_embed, ref_encode, prompt,
            embedding=emb, embedding_tokens_count=cnt,
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
