"""The int8-hybrid quality dossier fixture stays honest (VERDICT r3 #1).

``experiments/quality_dossier.py`` runs four same-noise 512px/25-step
trajectories (fp32 / bf16 / bf16+ulp / int8-hybrid) on the real chip and writes
``fixtures/quality_dossier.json`` with per-step normalized divergence curves
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
FIXTURE = os.path.join(REPO, "fixtures", "quality_dossier.json")

# Every committed dossier variant (e.g. a re-run quantizer's evidence committed
# under quality_dossier_<tag>.json) must satisfy the same honesty invariants as
# the headline-deciding fixture. experiments/quality_dossier.py warns when
# DOSSIER_OUT escapes this glob, so committed variants are always covered.
ALL_FIXTURES = sorted(
    glob.glob(os.path.join(REPO, "fixtures", "quality_dossier*.json")))


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
        data = json.load(f)
    data["_path"] = request.param
    return data


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
    """Curves match the fixture's OWN declared protocol length; only the
    headline-deciding fixture is pinned to the full 512px/25-step protocol
    (ADVICE r4: variants with a different legitimate protocol must be validated
    on their own terms, not rejected)."""
    dossier = any_dossier
    steps = dossier["config"]["steps"]
    if os.path.basename(dossier["_path"]) == os.path.basename(FIXTURE):
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


# bench.py speed fields that claim "DDIM-25 quality class" and therefore need a
# same-noise bf16-vs-fp32 anchor row in the dossier (VERDICT r4 #5). The headline
# `value`/`bf16` fields are anchored by the main protocol's bf16_vs_fp32 curve.
ANCHORED_FAST_FIELDS = ("dpm15", "tcd4_b8")


def test_fast_speed_fields_have_quality_anchors(dossier):
    """Every published fast bench field carries a quality anchor of the same
    protocol class as the headline's (same-noise bf16-vs-fp32 divergence +
    final PSNR/SSIM), produced by DOSSIER_FAST_ONLY=1 on the real chip."""
    if "fast_configs" not in dossier:
        pytest.skip("fast-config anchors not produced yet (needs the real chip: "
                    "DOSSIER_FAST_ONLY=1 python experiments/quality_dossier.py)")
    fast = dossier["fast_configs"]
    for field in ANCHORED_FAST_FIELDS:
        assert field in fast, f"bench field {field} has no quality anchor"
        row = fast[field]
        assert len(row["bf16_vs_fp32"]) == row["steps"]
        assert all(v >= 0 for v in row["bf16_vs_fp32"])
        assert 0.0 < row["ssim_bf16_fp32"] <= 1.0
    # dpm15's speed claim is "DDIM-25 quality class", so its anchor must sit in
    # the DDIM-25 bf16-vs-fp32 envelope class (42.0 dB): measured 40.9 dB r5.
    assert fast["dpm15"]["psnr_bf16_fp32"] > 35.0
    # tcd4_b8 claims few-step DISTILLED serving, not DDIM parity; its anchor
    # documents the measured class instead of gating on one. r5 on-chip:
    # 21.4 dB / SSIM 0.834 — TCD's four large steps amplify bf16 weight
    # rounding through the x0 extrapolation at t~999 (injected noise is fp32
    # and identical across legs), the same chaos mechanism the main dossier
    # quantified. A floor still catches a silently broken anchor config.
    assert fast["tcd4_b8"]["psnr_bf16_fp32"] > 15.0


def test_missing_dossier_defaults_to_bf16(tmp_path, monkeypatch):
    """No dossier -> unproven quality never headlines."""
    monkeypatch.delenv("BENCH_WEIGHT_DTYPE", raising=False)
    bench = _load(os.path.join(REPO, "bench.py"), "bench_mod2")
    assert bench.headline_weight_dtype(str(tmp_path)) == "bf16"
