#!/usr/bin/env python3
"""Smoke tests for benchaudit's control calibration — the branch that
stops a degraded host from minting false REGRESSIONs (r15: q194/q281/
q153, all untouched code, all condemned by a ~2x-slow box). Pure
in-process tests with an injected iso_fn; run directly:

    python3 tools/test_benchaudit.py
"""
import sys

import benchaudit


def fake_iso(results):
    def f(q, samples):
        r = results.get(q)
        return None if r is None else {"warm_min_median": r, "spread": 0.1}
    return f


def approx(a, b, eps=1e-9):
    return abs(a - b) < eps


def test_degraded_host():
    # the r15 fixture: controls isolate ~1.8-2x above seal rows
    seal = {"q76_bloom_semijoin": 0.356, "q303_ks_fdr": 0.307}
    iso = fake_iso({"q76_bloom_semijoin": 0.625, "q303_ks_fdr": 0.605})
    inflation, degraded, rows = benchaudit.calibrate(
        ["q76_bloom_semijoin", "q303_ks_fdr"], seal, 3, 1.4, iso_fn=iso)
    assert degraded, f"controls at {inflation:.2f}x must mark degraded"
    assert 1.7 < inflation < 2.1, inflation
    assert len(rows) == 2


def test_quiet_host_scales_nothing():
    seal = {"q76_bloom_semijoin": 0.356, "q303_ks_fdr": 0.307}
    iso = fake_iso({"q76_bloom_semijoin": 0.34, "q303_ks_fdr": 0.31})
    inflation, degraded, _ = benchaudit.calibrate(
        ["q76_bloom_semijoin", "q303_ks_fdr"], seal, 3, 1.4, iso_fn=iso)
    assert not degraded
    # faster-than-seal never tightens the bar below 1.0
    assert approx(inflation, 1.0), inflation


def test_mild_inflation_scales_threshold():
    seal = {"q76_bloom_semijoin": 0.356, "q303_ks_fdr": 0.307}
    iso = fake_iso({"q76_bloom_semijoin": 0.356 * 1.25,
                    "q303_ks_fdr": 0.307 * 1.15})
    inflation, degraded, _ = benchaudit.calibrate(
        ["q76_bloom_semijoin", "q303_ks_fdr"], seal, 3, 1.4, iso_fn=iso)
    assert not degraded
    assert approx(inflation, 1.2), inflation  # median of 1.25, 1.15


def test_missing_and_failed_controls_are_skipped():
    seal = {"q303_ks_fdr": 0.307}
    iso = fake_iso({"q303_ks_fdr": None})  # isobench failure
    inflation, degraded, rows = benchaudit.calibrate(
        ["q76_bloom_semijoin", "q303_ks_fdr"], seal, 3, 1.4, iso_fn=iso)
    assert not degraded and approx(inflation, 1.0)
    notes = [r[3] for r in rows]
    assert any("not in seal" in n for n in notes), notes
    assert any("FAILED" in n for n in notes), notes
    assert any("uncalibrated" in n for n in notes), notes


def test_one_usable_control_still_calibrates():
    seal = {"q76_bloom_semijoin": 0.356}
    iso = fake_iso({"q76_bloom_semijoin": 0.72})
    inflation, degraded, _ = benchaudit.calibrate(
        ["q76_bloom_semijoin", "q303_ks_fdr"], seal, 3, 1.4, iso_fn=iso)
    assert degraded and inflation > 2.0


if __name__ == "__main__":
    tests = [v for k, v in sorted(globals().items()) if k.startswith("test_")]
    for t in tests:
        t()
        print(f"ok {t.__name__}")
    print(f"{len(tests)}/{len(tests)} pass")
    sys.exit(0)
