"""benchmarks/revalidate_autos.py report logic: the one-command
revalidation harness for the shipped "auto" performance tables (round-5
verdict ask #7).  The TPU measurement legs are exercised on hardware
(BASELINE.md "Round-5 revalidation run"); these tests pin the
hardware-independent half — shipped-default resolution, best-vs-shipped
margin math, and the noise-gated LOOKS-GOOD/RETUNE verdict — by stubbing
the A/B runners.
"""

import os
import sys

import pytest

jax = pytest.importorskip("jax")

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "benchmarks")
)

import revalidate_autos  # noqa: E402


@pytest.mark.quick
def test_grad_accum_verdict_gating(monkeypatch):
    """Shipped=best -> LOOKS-GOOD at 0%; a challenger within the noise
    gate stays LOOKS-GOOD; beyond it flags RETUNE with the right cell."""
    import grad_accum_ab

    from icek_tpu.train import step as step_lib

    monkeypatch.setattr(step_lib.jax, "default_backend", lambda: "tpu")

    def fake_run_preset(preset, pairs, iters, chunk):
        # knowledge ships accum=2; make accum=8 beat it by ~10%
        rates = {1: 2200.0, 2: 2330.0, 4: 2280.0, 8: 2563.0}
        out = {"preset": preset}
        for _, a in pairs:
            out[f"accum{a}_samples_per_sec"] = rates[a]
        return out

    monkeypatch.setattr(grad_accum_ab, "run_preset", fake_run_preset)
    (r,) = revalidate_autos.revalidate_grad_accum(
        ["k_georic"], 256, iters=1, chunk=1, noise_pct=4.0
    )
    assert r["shipped"] == 2 and r["best_measured"] == 8
    assert r["verdict"] == "RETUNE"
    assert r["best_vs_shipped_pct"] == 10.0

    # same rates, wider gate: not actionable
    (r,) = revalidate_autos.revalidate_grad_accum(
        ["k_georic"], 256, iters=1, chunk=1, noise_pct=12.0
    )
    assert r["verdict"] == "LOOKS-GOOD"


@pytest.mark.quick
def test_kv_dtype_verdict_gating(monkeypatch):
    """kv table: shipped comes from resolve_kv_dtype (news -> int8 on TPU);
    margin is measured against it over the bf16/int8/int8_cross variants."""
    import int8_kv_ab

    from icek_tpu.decode import beam as beam_lib

    monkeypatch.setattr(beam_lib.jax, "default_backend", lambda: "tpu")

    def fake_run_preset(preset, batch, beam, iters):
        return {"bf16_caps_per_sec": 1137.0, "int8_caps_per_sec": 1219.0,
                "int8_cross_caps_per_sec": 1148.0}

    monkeypatch.setattr(int8_kv_ab, "run_preset", fake_run_preset)
    (r,) = revalidate_autos.revalidate_kv_dtype(
        ["nytimes800k"], 256, beam=5, iters=1, noise_pct=4.0
    )
    assert r["shipped"] == "int8"
    assert r["best_measured"] == "int8"
    assert r["verdict"] == "LOOKS-GOOD" and r["best_vs_shipped_pct"] == 0.0

    # geo ships bf16 (int8 measured a regression there); if int8 suddenly
    # won big on new hardware the harness must flag it
    def fake_geo(preset, batch, beam, iters):
        return {"bf16_caps_per_sec": 1400.0, "int8_caps_per_sec": 1600.0,
                "int8_cross_caps_per_sec": 1350.0}

    monkeypatch.setattr(int8_kv_ab, "run_preset", fake_geo)
    (r,) = revalidate_autos.revalidate_kv_dtype(
        ["georic"], 256, beam=5, iters=1, noise_pct=4.0
    )
    assert r["shipped"] == "bf16" and r["best_measured"] == "int8"
    assert r["verdict"] == "RETUNE"
