"""Reference-style sub-model handles on the pipeline (pipe.diffusion_model etc. with
predict_on_batch), exercised with small random weights on CPU."""

import gzip

import numpy as np
import pytest


@pytest.fixture(scope="module")
def pipe(tmp_path_factory):
    import jax.numpy as jnp

    import oracle_utils
    from minsdtf_tpu.pipeline import StableDiffusion
    from minsdtf_tpu.weights import convert

    rng = np.random.RandomState(0)
    sd = oracle_utils.synth_state_dict(convert._text_encoder_specs(), rng)
    te = oracle_utils.save_safetensors(sd, str(tmp_path_factory.mktemp("p") / "te.safetensors"))
    return StableDiffusion(img_height=64, img_width=64, text_encoder_ckpt=te,
                           compute_dtype=jnp.float32)


def test_text_model_handles(pipe):
    tokens = np.array([[49406] + [49407] * 76], np.int32)
    positions = np.arange(77, dtype=np.int32)[None]
    emb = pipe.text_clip_embedding.predict_on_batch([tokens, positions])
    assert emb.shape == (1, 77, 768)
    ctx = pipe.text_encoder.predict_on_batch(emb)
    assert ctx.shape == (1, 77, 768)
    np.testing.assert_allclose(ctx, pipe._unconditional_context(), rtol=1e-5, atol=1e-5)


def test_generate_images_queued_dispatch(pipe, monkeypatch):
    """generate_images defers fetches (dispatch all, then convert, order kept) and
    rejects callback/return_latent. The real device path is exercised by bench.py's
    `pipelined` field on TPU."""
    calls = []

    def fake_generate(encoded_text, seed=None, _defer_fetch=False, **kw):
        assert _defer_fetch is True
        calls.append(seed)
        return np.full((1, 4, 4, 3), seed, np.uint8)

    monkeypatch.setattr(pipe, "generate_image", fake_generate)
    out = pipe.generate_images([0, 1, 2], seeds=[5, 6, 7], num_steps=2)
    assert calls == [5, 6, 7]
    assert [int(o[0, 0, 0, 0]) for o in out] == [5, 6, 7]
    with pytest.raises(ValueError):
        pipe.generate_images([0], callback=lambda i: None)
    with pytest.raises(ValueError):
        pipe.generate_images([0], return_latent=True)


def test_runtime_lora_switch(pipe, tmp_path):
    """set_lora merges / removes deltas at runtime against the cached base ckpt."""
    import torch

    rng = np.random.RandomState(3)
    rank = 4
    down = torch.from_numpy(rng.normal(0, 0.1, (rank, 768)).astype(np.float32))
    up = torch.from_numpy(rng.normal(0, 0.1, (768, rank)).astype(np.float32))
    sd = {
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_down.weight": down,
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj.lora_up.weight": up,
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj.alpha": torch.tensor(2.0),
    }
    lora_path = str(tmp_path / "lora.pt")
    torch.save(sd, lora_path)

    key = "text_model.encoder.layers.0.self_attn.q_proj"
    base = np.asarray(pipe.text_params[key]["kernel"])
    pipe.set_lora(lora_path, scale=1.0)
    merged = np.asarray(pipe.text_params[key]["kernel"])
    want_delta = ((up @ down).numpy() * (2.0 / rank)).T  # torch (out,in) -> ours (in,out)
    np.testing.assert_allclose(merged - base, want_delta, rtol=1e-4, atol=1e-6)

    pipe.set_lora(lora_path, scale=0.5)
    half = np.asarray(pipe.text_params[key]["kernel"])
    np.testing.assert_allclose(half - base, 0.5 * want_delta, rtol=1e-4, atol=1e-6)

    pipe.set_lora(None)
    np.testing.assert_allclose(np.asarray(pipe.text_params[key]["kernel"]), base)


def test_vae_handles(pipe):
    rng = np.random.RandomState(1)
    img = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    lat = pipe.image_encoder.predict_on_batch(img)
    assert lat.shape == (1, 8, 8, 4)
    out = pipe.image_decoder.predict_on_batch(lat)
    assert out.shape == (1, 64, 64, 3)


def test_dpm_scheduler_wiring():
    """scheduler_type="dpm" selects DPMSolverScheduler and the cached device rows
    carry the DPM coefficients the sampler's dpm branch consumes (no model init —
    sub-models are lazy and _device_schedule is pure host+schedule work)."""
    from minsdtf_tpu import scheduler as sched_lib
    from minsdtf_tpu.pipeline import StableDiffusion

    pipe = StableDiffusion(img_height=64, img_width=64, scheduler_type="dpm")
    assert isinstance(pipe.scheduler, sched_lib.DPMSolverScheduler)
    assert pipe.scheduler.mode == "dpm"
    schedule, t_embs, rows = pipe._device_schedule(4, None, 0.3)
    assert schedule.mode == "dpm"
    for k in ("c_x", "c_d", "w"):
        assert k in rows and rows[k].shape == (4,)
    assert float(rows["w"][0]) == 0.0 and float(rows["c_d"][-1]) == 1.0
