"""The int8-hybrid quality dossier fixture stays honest (VERDICT r3 #1).

``experiments/quality_dossier.py`` runs four same-noise 512px/25-step
trajectories (fp32 / bf16 / bf16+ulp / int8-hybrid) on the real chip and writes
``fixtures/quality_dossier_r4.json`` with per-step normalized divergence curves
and four PASS criteria. These tests re-apply the criteria to the committed
curves and pin that ``bench.py``'s headline dtype matches the verdict — a
future edit cannot silently re-promote int8-hybrid without a passing dossier.
"""

import glob
import importlib.util
import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "fixtures", "quality_dossier_r4.json")

# Every committed dossier variant (e.g. quality_dossier_r4_v2.json, the
# equalized+bias-corrected quantizer's evidence) must satisfy the same
# honesty invariants as the headline-deciding fixture.
ALL_FIXTURES = sorted(
    glob.glob(os.path.join(REPO, "fixtures", "quality_dossier_r4*.json")))


def _load(path, name):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def dossier():
    if not os.path.exists(FIXTURE):
        pytest.skip("dossier fixture not produced yet (needs the real chip)")
    with open(FIXTURE) as f:
        return json.load(f)


@pytest.fixture(params=ALL_FIXTURES or [None],
                ids=[os.path.basename(p) for p in ALL_FIXTURES] or ["none"],
                scope="module")
def any_dossier(request):
    if request.param is None:
        pytest.skip("no dossier fixtures produced yet (needs the real chip)")
    with open(request.param) as f:
        return json.load(f)


def test_verdicts_match_committed_curves(any_dossier):
    """Re-evaluating the stored curves with the protocol's own criteria must
    reproduce the stored verdict booleans — the fixture cannot assert a verdict
    its own data does not support."""
    dossier = any_dossier
    qd = _load(os.path.join(REPO, "experiments", "quality_dossier.py"), "qd")
    steps = dossier["config"]["steps"]
    fresh = qd.evaluate(dossier["curves"], steps)
    for key in ("step1_class", "envelope", "growth_rate"):
        assert fresh[key] == dossier["verdicts"][key], key
    psnr_gap_ok = (dossier["images"]["psnr_hybrid_bf16"]
                   >= dossier["images"]["psnr_bf16_fp32"] - 2.0)
    assert psnr_gap_ok == dossier["verdicts"]["final_psnr"]
    all_pass = all(dossier["verdicts"][k]
                   for k in ("step1_class", "envelope", "growth_rate", "final_psnr"))
    assert all_pass == dossier["verdicts"]["all_pass"]


def test_curves_are_full_length(any_dossier):
    dossier = any_dossier
    steps = dossier["config"]["steps"]
    assert dossier["config"]["size"] == 512 and steps == 25
    for tag in ("hybrid_vs_bf16", "bf16_vs_fp32", "ulp_vs_bf16"):
        curve = dossier["curves"][tag]
        assert len(curve) == steps
        assert all(v >= 0 for v in curve)


def test_bench_headline_follows_verdict(dossier, monkeypatch):
    """bench.py's default headline dtype is the dossier's verdict, mechanically:
    int8-hybrid only on all_pass, bf16 otherwise (BENCH_WEIGHT_DTYPE overrides)."""
    monkeypatch.delenv("BENCH_WEIGHT_DTYPE", raising=False)
    bench = _load(os.path.join(REPO, "bench.py"), "bench_mod")
    expected = "int8_hybrid" if dossier["verdicts"]["all_pass"] else "bf16"
    assert bench.headline_weight_dtype(REPO) == expected
    monkeypatch.setenv("BENCH_WEIGHT_DTYPE", "int8_hybrid")
    assert bench.headline_weight_dtype(REPO) == "int8_hybrid"


def test_missing_dossier_defaults_to_bf16(tmp_path, monkeypatch):
    """No dossier -> unproven quality never headlines."""
    monkeypatch.delenv("BENCH_WEIGHT_DTYPE", raising=False)
    bench = _load(os.path.join(REPO, "bench.py"), "bench_mod2")
    assert bench.headline_weight_dtype(str(tmp_path)) == "bf16"
