"""encode_text parity through BOTH full pipelines: tokenizer -> LPW -> CLIP embed ->
TI splice -> encoder -> weighting. Uses a synthetic BPE vocabulary injected into both
tokenizers (the real merges file needs network) and one shared synthetic text-encoder
checkpoint."""

import pytest

pytestmark = pytest.mark.oracle  # heavy Keras/TF/torch oracle - excluded from the fast tier

import gzip

import numpy as np
import pytest

import oracle_utils
from conftest import reference_package
from minsdtf_tpu.weights import convert

MERGES = [
    "h e", "l l", "he ll", "o</w> w", "hell o</w>", "w o", "wo r", "wor l",
    "worl d</w>", "t h", "th e</w>", "c a", "ca t</w>", "d o", "do g</w>",
    "s t", "st a", "sta r</w>", "s k", "sk y</w>", "* *",
]


@pytest.fixture(scope="module")
def bpe_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("bpe") / "merges.txt.gz"
    with gzip.open(path, "wt") as f:
        f.write("#version: synthetic\n" + "\n".join(MERGES) + "\n")
    return str(path)


@pytest.fixture(scope="module")
def te_ckpt(tmp_path_factory):
    rng = np.random.RandomState(77)
    sd = oracle_utils.synth_state_dict(convert._text_encoder_specs(), rng)
    path = str(tmp_path_factory.mktemp("te") / "te.safetensors")
    return oracle_utils.save_safetensors(sd, path)


@pytest.fixture(scope="module")
def ti_path(tmp_path_factory):
    import torch

    rng = np.random.RandomState(5)
    emb = rng.normal(0, 0.5, (3, 768)).astype(np.float32)
    path = str(tmp_path_factory.mktemp("ti") / "emb.pt")
    torch.save({"string_to_param": {"*": torch.from_numpy(emb)}}, path)
    return path


@pytest.fixture(scope="module")
def ref_pipe(te_ckpt, bpe_path):
    oracle_utils.disable_reference_downloads()
    reference_package()
    from stable_diffusion.clip_tokenizer import SimpleTokenizer
    from stable_diffusion.stable_diffusion import StableDiffusion as RefSD

    pipe = RefSD(img_height=128, img_width=128, text_encoder_ckpt=te_ckpt)
    pipe._tokenizer = SimpleTokenizer(bpe_path=bpe_path)
    return pipe


@pytest.fixture(scope="module")
def our_pipe(te_ckpt, bpe_path):
    import jax.numpy as jnp

    from minsdtf_tpu.pipeline import StableDiffusion

    return StableDiffusion(
        img_height=128, img_width=128, text_encoder_ckpt=te_ckpt, bpe_path=bpe_path,
        compute_dtype=jnp.float32,
    )


PROMPTS = [
    "hello world",
    "(hello:1.3) [world] the (cat)",
    " ".join(["the cat dog star sky"] * 25),  # multi-chunk LPW (>77 tokens)
    "",
]


@pytest.mark.parametrize("prompt", PROMPTS)
def test_encode_text_parity(ref_pipe, our_pipe, prompt):
    want = np.asarray(ref_pipe.encode_text(prompt))
    got = np.asarray(our_pipe.encode_text(prompt))
    assert got.shape == want.shape
    diff = np.max(np.abs(got - want))
    assert diff < 5e-3, diff


def test_encode_text_with_textual_inversion(ref_pipe, our_pipe, ti_path):
    prompt = "the cat"
    want = np.asarray(ref_pipe.encode_text(prompt, embedding_data=ti_path))
    got = np.asarray(our_pipe.encode_text(prompt, embedding_data=ti_path))
    assert got.shape == want.shape
    diff = np.max(np.abs(got - want))
    assert diff < 5e-3, diff


def test_multi_textual_inversion(our_pipe, ti_path, tmp_path):
    """A list of TI files concatenates token-wise (reference TODO, implemented)."""
    import torch

    rng = np.random.RandomState(9)
    emb2 = rng.normal(0, 0.5, (2, 768)).astype(np.float32)
    path2 = str(tmp_path / "emb2.pt")
    torch.save({"string_to_param": {"*": torch.from_numpy(emb2)}}, path2)

    both = our_pipe.encode_text("the cat", embedding_data=[ti_path, path2])
    single = our_pipe.encode_text("the cat", embedding_data=ti_path)
    assert both.shape == single.shape  # still one 77-token chunk
    assert not np.allclose(both, single)


def test_unconditional_context_parity(ref_pipe, our_pipe):
    want = np.asarray(ref_pipe._get_unconditional_context())
    got = np.asarray(our_pipe._unconditional_context())
    diff = np.max(np.abs(got - want))
    assert diff < 5e-3, diff
