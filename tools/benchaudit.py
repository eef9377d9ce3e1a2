#!/usr/bin/env python3
"""One-shot adjudication of a FOREIGN bench snapshot (typically the
driver's BENCH_r{N}.json) against the committed quiet-box seal: diff
the per-query warm times, classify each slower mover from the embedded
telemetry (per-query load / GC when present), auto-isobench the
candidates in fresh JVMs, and print the verdict table BENCHNOTES wants
— the single command that replaces the per-round hand-rolled
q115/q89/q113-style adjudication.

Accepted foreign formats:
  - graft.Bench's own bench_out.json (full queries_warm map +
    queries_load / queries_gc_sec telemetry);
  - the driver's BENCH_r{N}.json wrapper ({"parsed": {...}}): only the
    summary survives there (total_warm, slowest_warm top-5, run-level
    load averages), so the audit covers the slowest_warm set — exactly
    the queries whose inflation matters.

Usage:
  benchaudit.py FOREIGN.json [--seal bench_out.json] [-t 1.5]
      [--min-sec 0.5] [--iso-samples 3] [--iso-threshold 1.5]
      [--no-isobench]

Verdicts per mover:
  env-inflated   telemetry already explains it (per-query load >
                 ~half the box or GC-dominated) AND the fresh-JVM
                 median returns to seal range
  contamination  isolated median within --iso-threshold x of the seal
  REGRESSION     isolated median stays above — exit 1
  box-degraded   the CONTROL isobenches themselves isolate above
                 --control-threshold x of their seal rows, so the
                 host cannot reproduce ANY seal row right now and no
                 REGRESSION verdict is meaningful — exit 3, re-run on
                 a quiet host

Control calibration (runs FIRST, before any mover is adjudicated):
two untouched control queries (q76/q303 — the BENCHNOTES pair) are
isobenched and compared to their own seal rows. r15 minted three
false REGRESSIONs exactly because this step was manual: a lucky-fast
seal row plus a ~2x-degraded host exceeds any fixed iso-threshold on
code nobody touched. Mild inflation (controls between 1.0x and the
cutoff) SCALES the iso-threshold instead, so the mover bar moves with
the box.
"""
import argparse, json, os, statistics, subprocess, sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from benchdiff import isobench  # fresh-JVM adjudicator, shared

DEFAULT_CONTROLS = "q76_bloom_semijoin,q303_ks_fdr"


def calibrate(controls, seal_warm, samples, cutoff, iso_fn=isobench):
    """Isobench the control pair; return (inflation, degraded, rows).

    inflation = median over controls of (isolated median / seal row),
    floored at 1.0 (a faster-than-seal box never TIGHTENS the bar).
    degraded  = inflation > cutoff. rows = per-control detail for the
    report. Controls missing from the seal or failing to isobench are
    skipped; with zero usable controls the calibration is inconclusive
    and (1.0, False, rows) is returned with a warning row.
    """
    rows, ratios = [], []
    for q in controls:
        a = seal_warm.get(q)
        if a is None or a <= 0:
            rows.append((q, None, None, "not in seal — skipped"))
            continue
        s = iso_fn(q, samples)
        if s is None:
            rows.append((q, a, None, "isobench FAILED — skipped"))
            continue
        r = s["warm_min_median"] / a
        ratios.append(r)
        rows.append((q, a, s["warm_min_median"], f"{r:.2f}x"))
    if not ratios:
        rows.append(("(calibration)", None, None,
                     "NO usable controls — verdicts uncalibrated"))
        return 1.0, False, rows
    inflation = max(1.0, statistics.median(ratios))
    return inflation, inflation > cutoff, rows


def load_foreign(path):
    """Return (warm_map, telemetry, meta) from either accepted format."""
    d = json.load(open(path))
    if "queries_warm" in d:
        return (d["queries_warm"],
                {"load": d.get("queries_load", {}),
                 "gc": d.get("queries_gc_sec", {})},
                {"total_warm": d.get("total_warm"),
                 "load_avg": (d.get("load_avg_start"), d.get("load_avg_end")),
                 "coverage": "full", "errors": d.get("errors", [])})
    p = d.get("parsed", d)
    warm = dict(p.get("slowest_warm", {}))
    return (warm, {"load": {}, "gc": {}},
            {"total_warm": p.get("total_warm"),
             "load_avg": (p.get("load_avg_start"), p.get("load_avg_end")),
             "coverage": f"slowest_warm top-{len(warm)} only",
             "errors": p.get("errors", [])})


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("foreign")
    ap.add_argument("--seal", default=os.path.join(
        os.path.dirname(HERE), "bench_out.json"))
    ap.add_argument("-t", "--threshold", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=0.5)
    ap.add_argument("--iso-samples", type=int, default=3)
    ap.add_argument("--iso-threshold", type=float, default=1.5)
    ap.add_argument("--no-isobench", dest="iso", action="store_false")
    ap.add_argument("--controls", default=DEFAULT_CONTROLS,
                    help="comma-separated control queries isobenched "
                         "FIRST to calibrate the host against the seal")
    ap.add_argument("--control-threshold", type=float, default=1.4,
                    help="controls isolating above this x of their "
                         "seal rows mark the host degraded (exit 3)")
    ap.add_argument("--no-controls", dest="ctl", action="store_false")
    args = ap.parse_args()

    warm, tel, meta = load_foreign(args.foreign)
    seal = json.load(open(args.seal))
    sw = seal["queries_warm"]
    ncpu = os.cpu_count() or 32

    print(f"seal:    {len(sw)} queries, warm {seal['total_warm']:.1f}s "
          f"({args.seal})")
    la = meta["load_avg"]
    print(f"foreign: coverage={meta['coverage']}, "
          f"total_warm={meta['total_warm']}, "
          f"load_avg={la[0]}->{la[1]}, errors={meta['errors']}")
    if meta["errors"]:
        print("FOREIGN RUN HAS ERRORS — timings below are secondary",
              file=sys.stderr)
    # An audit against a seal that IS the foreign snapshot proves
    # nothing (this happened in r13: the driver's artifact commit
    # overwrote bench_out.json with its own run, and the audit
    # reported "nothing to adjudicate" about a 27s contaminated tail).
    if meta["total_warm"] is not None and \
            abs(meta["total_warm"] - seal["total_warm"]) < 1e-9:
        print("\nSEAL == FOREIGN (identical total_warm): the committed "
              "bench_out.json is the snapshot you are auditing, not a "
              "quiet-box seal. Restore the real seal (git log "
              "bench_out.json) and re-run.", file=sys.stderr)
        sys.exit(2)

    movers = []
    for q, b in sorted(warm.items()):
        a = sw.get(q)
        if a is None:
            print(f"  {q}: not in seal ({b:.2f}s foreign) — new query?")
            continue
        if b < args.min_sec or a <= 0:
            continue
        r = b / a
        if r >= args.threshold:
            movers.append((q, a, b, r))
    if not movers:
        print(f"\nno foreign query >= {args.threshold}x its seal value — "
              "nothing to adjudicate")
        return

    # Control calibration BEFORE any mover verdict: can this host
    # reproduce seal rows for code nobody touched?
    inflation, degraded, eff_iso = 1.0, False, args.iso_threshold
    if args.iso and args.ctl:
        controls = [c for c in args.controls.split(",") if c]
        print(f"\ncalibrating against controls {controls} "
              f"(untouched queries; seal rows are the yardstick):")
        inflation, degraded, rows = calibrate(
            controls, sw, args.iso_samples, args.control_threshold)
        for q, a, med, note in rows:
            seal_s = "—" if a is None else f"{a:.3f}s"
            iso_s = "—" if med is None else f"{med:.3f}s"
            print(f"  control {q}: seal {seal_s}, isolated {iso_s} ({note})")
        if degraded:
            print(f"HOST DEGRADED: controls isolate {inflation:.2f}x above "
                  f"their seal rows (> {args.control_threshold}x) — fresh "
                  "JVMs cannot reproduce the seal for UNTOUCHED code, so "
                  "no REGRESSION verdict below is meaningful. Re-run on a "
                  "quiet host.")
            # hardware attribution (r16 VERDICT ask #4): append a
            # hostcheck row so the episode carries a CAUSE (thread-wake
            # latency / page-fault path / CPU), not just a ratio — the
            # row also lands in tools/hostcheck_history.jsonl
            try:
                hc = subprocess.run(
                    [sys.executable, os.path.join(HERE, "hostcheck.py")],
                    text=True)
                # exit 3 = degraded-vs-reference, which is EXPECTED
                # here; anything else nonzero means the probe itself
                # broke and the episode has NO attribution row
                if hc.returncode not in (0, 3):
                    print(f"(hostcheck exited {hc.returncode} — no "
                          "hardware attribution recorded for this episode)")
            except Exception as e:
                print(f"(hostcheck failed: {e})")
        elif inflation > 1.0:
            eff_iso = args.iso_threshold * inflation
            print(f"controls isolate {inflation:.2f}x — scaling the "
                  f"iso-threshold {args.iso_threshold} -> {eff_iso:.2f}")

    print(f"\n{len(movers)} mover(s); adjudicating:")
    print("\n| query | seal | foreign | ratio | telemetry | "
          "isolated median (spread) | verdict |")
    print("|---|---|---|---|---|---|---|")
    bad = []
    for q, a, b, r in sorted(movers, key=lambda m: -m[3]):
        qload, qgc = tel["load"].get(q), tel["gc"].get(q, 0.0)
        telcol = ("n/a" if qload is None else
                  f"load={qload:.1f} gc={qgc:.1f}s")
        env_hint = (qload is not None and qload > ncpu / 2) or \
                   (qgc > 0.5 * b)
        if not args.iso:
            verdict = "UNADJUDICATED (--no-isobench)"
            bad.append(q)
            print(f"| {q} | {a:.2f}s | {b:.2f}s | {r:.2f}x | {telcol} "
                  f"| — | {verdict} |")
            continue
        s = isobench(q, args.iso_samples)
        if s is None:
            bad.append(q)
            print(f"| {q} | {a:.2f}s | {b:.2f}s | {r:.2f}x | {telcol} "
                  f"| isobench FAILED | unadjudicated |")
            continue
        med, spread = s["warm_min_median"], s["spread"]
        clean = med <= a * eff_iso
        if clean:
            verdict = "env-inflated" if env_hint else "contamination"
        elif degraded:
            verdict = (f"box-degraded (controls {inflation:.2f}x) — "
                       "re-run on quiet host")
        else:
            verdict = "REGRESSION"
            bad.append(q)
        print(f"| {q} | {a:.2f}s | {b:.2f}s | {r:.2f}x | {telcol} "
              f"| {med:.3f}s ({spread:.3f}) | {verdict} |")
    if bad:
        print(f"\nNOT clean: {', '.join(bad)}")
        sys.exit(1)
    if degraded:
        print("\nhost degraded — adjudication INCONCLUSIVE, not clean: "
              "re-run this audit on a quiet box")
        sys.exit(3)
    print("\nall movers adjudicated clean against the committed seal — "
          "paste the table into BENCHNOTES")


if __name__ == "__main__":
    main()
