"""CLI tools: converter end-to-end on a synthetic checkpoint."""

import os

import numpy as np
import pytest


def test_fetch_resolve_local_paths():
    from minsdtf_tpu.weights import fetch

    assert fetch.resolve(None, "unet") is None
    assert fetch.resolve("/some/local/file.safetensors", "unet") == "/some/local/file.safetensors"
    assert fetch.DEFAULT_URLS["vae"].startswith("https://")
    with pytest.raises(Exception):
        # no network in this environment; "default" must fail loudly, not hang
        fetch.fetch("https://127.0.0.1:1/none.safetensors")


def test_golden_harness_offline_skip(tmp_path, monkeypatch, capsys):
    """golden.py skips cleanly (rc 2) when weights are unresolvable offline."""
    from minsdtf_tpu.tools import golden

    rc = golden.run("default", "default", "default", "default", str(tmp_path))
    assert rc == 2
    assert "SKIP" in capsys.readouterr().out


def test_selfcheck_skips_unsupported_shapes():
    """Shapes the flash kernel declines route to XLA and are skipped, not compared."""
    from minsdtf_tpu.tools import selfcheck

    results = selfcheck.check_flash_attention(shapes=[(1, 256, 2, 160)], verbose=False)
    assert results == []  # kv < 512 -> xla path, nothing to check


def test_convert_cli(tmp_path):
    import oracle_utils
    from minsdtf_tpu.tools import convert as cli
    from minsdtf_tpu.weights import checkpoint, convert as convert_lib

    rng = np.random.RandomState(0)
    sd = oracle_utils.synth_state_dict(convert_lib._text_encoder_specs(), rng)
    ckpt = oracle_utils.save_safetensors(sd, str(tmp_path / "te.safetensors"))
    out_dir = str(tmp_path / "out")
    cli.main(["--text-encoder", ckpt, "--out-dir", out_dir])

    # msgpack cache written next to the source
    assert os.path.exists(ckpt + ".minsdtf-text_encoder.msgpack")
    # orbax checkpoint restorable
    params = checkpoint.restore_params(os.path.join(out_dir, "text_encoder"))
    assert "text_model.encoder.layers.0.self_attn.q_proj" in params
    # second run hits the cache (no exception, same result)
    cli.main(["--text-encoder", ckpt])


def test_bench_synthetic_merges_tokenize():
    """bench.py's e2e_prompt field relies on a synthetic CLIP merges file in the
    zero-egress env — the generated file must load through ClipTokenizer and
    tokenize a bench prompt (timing needs the same code path, not the real vocab)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench
    from minsdtf_tpu.text.tokenizer import ClipTokenizer

    tok = ClipTokenizer(bench._synthetic_merges())
    ids = tok.encode("a photograph of an astronaut riding a horse")
    assert len(ids) > 0
