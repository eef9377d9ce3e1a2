#!/usr/bin/env python3
"""Unit tests for seal.py's in-bench control gate — the r17
seal-admissibility check (run's own rows vs prior seal)."""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from seal import in_bench_gate

PASS = 0
FAIL = 0


def check(name, cond):
    global PASS, FAIL
    if cond:
        PASS += 1
        print(f"ok {name}")
    else:
        FAIL += 1
        print(f"FAIL {name}")


def test_parity_passes():
    prev = {"q76_bloom_semijoin": 0.356, "q303_ks_fdr": 0.307,
            "qa": 1.0, "qb": 0.5, "qc": 2.0}
    new = {"q76_bloom_semijoin": 0.390, "q303_ks_fdr": 0.271,
           "qa": 1.02, "qb": 0.49, "qc": 2.05}
    ok, msg, med = in_bench_gate(prev, new)
    check("parity_passes", ok and 0.95 < med < 1.05 and "OK" in msg)


def test_inflated_control_fails():
    prev = {"q76_bloom_semijoin": 0.356, "q303_ks_fdr": 0.307, "qa": 1.0}
    new = {"q76_bloom_semijoin": 0.700, "q303_ks_fdr": 0.300, "qa": 1.0}
    ok, msg, _ = in_bench_gate(prev, new)
    check("inflated_control_fails", not ok and "q76_bloom_semijoin" in msg)


def test_inflated_median_fails():
    prev = {f"q{i}": 1.0 for i in range(10)}
    prev.update({"q76_bloom_semijoin": 0.356, "q303_ks_fdr": 0.307})
    new = {f"q{i}": 1.2 for i in range(10)}  # 1.2x across the board
    new.update({"q76_bloom_semijoin": 0.360, "q303_ks_fdr": 0.310})
    ok, _, med = in_bench_gate(prev, new)
    check("inflated_median_fails", not ok and med > 1.15)


def test_first_seal_trivially_passes():
    ok, _, med = in_bench_gate({}, {"qa": 1.0})
    check("first_seal_trivially_passes", ok and med == 1.0)


def test_tiny_rows_excluded_from_median():
    # sub-min_sec rows are noise-dominated and must not drive the gate
    prev = {"q76_bloom_semijoin": 0.356, "qa": 0.05, "qb": 1.0}
    new = {"q76_bloom_semijoin": 0.350, "qa": 0.15, "qb": 1.01}  # qa 3x but tiny
    ok, _, med = in_bench_gate(prev, new)
    check("tiny_rows_excluded", ok and med < 1.05)


if __name__ == "__main__":
    for t in (test_parity_passes, test_inflated_control_fails,
              test_inflated_median_fails, test_first_seal_trivially_passes,
              test_tiny_rows_excluded_from_median):
        t()
    print(f"{PASS}/{PASS + FAIL} pass")
    sys.exit(1 if FAIL else 0)
