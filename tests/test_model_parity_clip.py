"""CLIP text stack parity: our pure-functional JAX model vs the reference Keras
TextClipEmbedding + TextEncoder, both loading the same synthetic checkpoint."""

import pytest

pytestmark = pytest.mark.oracle  # heavy Keras/TF/torch oracle - excluded from the fast tier

import numpy as np
import pytest

import oracle_utils
from conftest import reference_package
from minsdtf_tpu.models import clip as clip_lib
from minsdtf_tpu.weights import convert


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    rng = np.random.RandomState(42)
    sd = oracle_utils.synth_state_dict(convert._text_encoder_specs(), rng)
    path = str(tmp_path_factory.mktemp("clip") / "text_encoder.safetensors")
    return oracle_utils.save_safetensors(sd, path)


@pytest.fixture(scope="module")
def ref(ckpt):
    oracle_utils.disable_reference_downloads()
    reference_package()
    from stable_diffusion.text_encoder import TextClipEmbedding, TextEncoder

    emb = TextClipEmbedding(77, ckpt_path=ckpt)
    encoders = {
        skip: TextEncoder(77, clip_skip=skip, ckpt_path=ckpt) for skip in (-1, -2)
    }
    return emb, encoders


@pytest.fixture(scope="module")
def ours(ckpt):
    return convert.convert_text_encoder(ckpt)


def test_clip_embedding_parity(ref, ours):
    emb_ref, _ = ref
    tokens = np.array([[49406] + list(range(100, 175)) + [49407]], dtype=np.int32)
    positions = np.arange(77, dtype=np.int32)[None]
    want = emb_ref.predict_on_batch([tokens, positions])
    got = np.asarray(clip_lib.clip_embedding(ours, tokens, positions))
    diff, mse = oracle_utils.max_abs_diff(got, want)
    assert diff < 1e-3, (diff, mse)


@pytest.mark.parametrize("clip_skip", [-1, -2])
def test_text_encoder_parity(ref, ours, clip_skip):
    emb_ref, encoders = ref
    rng = np.random.RandomState(0)
    clip_emb = rng.normal(0, 1.0, (2, 77, 768)).astype(np.float32)
    want = encoders[clip_skip].predict_on_batch(clip_emb)
    got = np.asarray(clip_lib.text_encoder(ours, clip_emb, clip_skip=clip_skip))
    diff, mse = oracle_utils.max_abs_diff(got, want)
    assert diff < 5e-3, (diff, mse)


def test_encode_tokens_end_to_end(ref, ours):
    emb_ref, encoders = ref
    tokens = np.array([[49406] + [1000, 2000, 3000] + [49407] * 73], dtype=np.int32)
    positions = np.arange(77, dtype=np.int32)[None]
    clip_emb = emb_ref.predict_on_batch([tokens, positions])
    want = encoders[-1].predict_on_batch(clip_emb)
    got = np.asarray(clip_lib.encode_tokens(ours, tokens, clip_skip=-1))
    diff, mse = oracle_utils.max_abs_diff(got, want)
    assert diff < 5e-3, (diff, mse)
