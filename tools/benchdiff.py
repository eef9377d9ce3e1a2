#!/usr/bin/env python3
"""Mechanical seal-checklist diff between two Bench snapshots: flags
every query whose warm time moved more than THRESHOLD x in either
direction, lists added/removed queries, and summarizes totals. Feed it
the prior seal (e.g. `git show <ref>:bench_out.json`) and the fresh
run; anything flagged goes to tools/isobench.py BEFORE the snapshot is
committed (BENCHNOTES "Seal checklist").

With --isobench (the default), every slower-side mover is
auto-adjudicated: tools/isobench.py runs it in N fresh JVMs and the
verdict table (the one BENCHNOTES used to assemble by hand) prints
ready to paste — `contamination` when the isolated median returns to
within --iso-threshold x of the prior seal, `REGRESSION` otherwise.
Exit code 1 only for unadjudicated or confirmed-regression movers.

Usage:
  benchdiff.py PREV.json CUR.json [-t 2.0] [--min-sec 0.5]
      [--no-isobench] [--iso-samples 3] [--iso-threshold 1.5]
  git show <ref>:bench_out.json > /tmp/prev.json && \
      tools/benchdiff.py /tmp/prev.json bench_out.json
"""
import argparse, json, os, statistics, subprocess, sys

HERE = os.path.dirname(os.path.abspath(__file__))

def isobench(query, samples):
    """Run tools/isobench.py and return its summary dict (or None)."""
    out = subprocess.run(
        [sys.executable, os.path.join(HERE, "isobench.py"),
         query, "-n", str(samples)],
        capture_output=True, text=True)
    for line in reversed(out.stdout.splitlines()):
        if line.startswith('{"query"'):
            return json.loads(line)
    print(f"  isobench {query} FAILED:\n{out.stderr[-1500:]}",
          file=sys.stderr)
    return None

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("cur")
    ap.add_argument("-t", "--threshold", type=float, default=2.0)
    ap.add_argument("--min-sec", type=float, default=0.5,
                    help="ignore movers whose slower side is under this")
    ap.add_argument("--no-isobench", dest="iso", action="store_false",
                    help="report movers only; skip auto-adjudication")
    ap.add_argument("--iso-samples", type=int, default=3)
    ap.add_argument("--iso-threshold", type=float, default=1.5,
                    help="isolated median within this x of prev = jitter")
    ap.add_argument("--no-controls", dest="ctl", action="store_false",
                    help="skip the control calibration before "
                         "adjudication (tests only)")
    ap.add_argument("--control-threshold", type=float, default=1.4)
    args = ap.parse_args()
    prev = json.load(open(args.prev))
    cur = json.load(open(args.cur))
    wp, wc = prev["queries_warm"], cur["queries_warm"]
    loads = cur.get("queries_load", {})
    gcs = cur.get("queries_gc_sec", {})

    print(f"prev: {len(wp)} queries, warm {prev['total_warm']:.1f}s")
    print(f"cur:  {len(wc)} queries, warm {cur['total_warm']:.1f}s, "
          f"errors {cur.get('errors', [])}")
    added = sorted(set(wc) - set(wp))
    removed = sorted(set(wp) - set(wc))
    if added:
        print("added:  " + ", ".join(f"{q}={wc[q]:.2f}s" for q in added))
    if removed:
        print("removed: " + ", ".join(removed))

    movers = []
    for q in sorted(set(wc) & set(wp)):
        a, b = wp[q], wc[q]
        if max(a, b) < args.min_sec or min(a, b) <= 0:
            continue
        ratio = b / a
        if ratio >= args.threshold or ratio <= 1 / args.threshold:
            movers.append((q, a, b, ratio))
    if not movers:
        print("\nno movers — snapshot is seal-clean")
        return

    print(f"\nMOVERS (>= {args.threshold}x either way, "
          f"slower side >= {args.min_sec}s):")
    slower = []
    for q, a, b, r in sorted(movers, key=lambda m: -max(m[3], 1 / m[3])):
        extra = ""
        if q in loads or q in gcs:
            extra = (f"  [load={loads.get(q, -1):.1f}"
                     f" gc={gcs.get(q, 0):.1f}s]")
        if r > 1:
            slower.append((q, a, b, r))
            print(f"  {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x){extra}")
        else:
            print(f"  {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x){extra}  (improved)")
    if not slower:
        return

    if not args.iso:
        print("\n--no-isobench: adjudicate the movers above by hand "
              "(tools/isobench.py <q> -n 3) before sealing")
        sys.exit(1)

    # Control calibration FIRST (r17: ported from benchaudit after the
    # fresh-JVM startup tax was measured at ~2x on a box whose warmed
    # bench rows sat at seal parity): if untouched controls isolate
    # above --control-threshold x their prev rows, a fresh JVM cannot
    # reproduce ANY prev row and every isobench verdict below would be
    # a false REGRESSION — report box-degraded and exit 3. Mild
    # inflation scales the iso-threshold (and the mild-growth floor)
    # instead, so the bar moves with the box.
    eff_iso, mild_floor = args.iso_threshold, 1.2
    if args.ctl:
        from benchaudit import calibrate, DEFAULT_CONTROLS
        controls = [c for c in DEFAULT_CONTROLS.split(",") if c]
        print(f"\ncalibrating against controls {controls}:")
        inflation, degraded, rows = calibrate(
            controls, wp, args.iso_samples, args.control_threshold)
        for q, a, med, note in rows:
            pa = "—" if a is None else f"{a:.3f}s"
            pm = "—" if med is None else f"{med:.3f}s"
            print(f"  control {q}: prev {pa}, isolated {pm} ({note})")
        if degraded:
            print(f"HOST DEGRADED: controls isolate {inflation:.2f}x above "
                  f"their prev rows (> {args.control_threshold}x) — fresh "
                  "JVMs cannot reproduce prev rows for untouched code; "
                  "movers below are box-degraded, not adjudicable. "
                  "Re-run on a quiet host (exit 3).")
            for q, a, b, r in slower:
                print(f"  {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x) — box-degraded")
            sys.exit(3)
        if inflation > 1.0:
            eff_iso = args.iso_threshold * inflation
            mild_floor = 1.2 * inflation
            print(f"controls isolate {inflation:.2f}x — scaling "
                  f"iso-threshold {args.iso_threshold} -> {eff_iso:.2f}, "
                  f"mild floor 1.2 -> {mild_floor:.2f}")

    # Auto-adjudication: fresh-JVM isolated medians decide jitter vs
    # regression mechanically (the table BENCHNOTES used to hand-roll).
    print(f"\nauto-isobench ({args.iso_samples} fresh JVMs per mover):")
    print("\n| query | prev seal | this run | ratio | isolated median "
          "(spread) | verdict |")
    print("|---|---|---|---|---|---|")
    bad = []
    for q, a, b, r in slower:
        s = isobench(q, args.iso_samples)
        if s is None:
            bad.append(q)
            print(f"| {q} | {a:.2f}s | {b:.2f}s | {r:.2f}x | "
                  f"isobench FAILED | unadjudicated |")
            continue
        med, spread = s["warm_min_median"], s["spread"]
        real = med > a * eff_iso
        mild = (not real) and med > a * mild_floor
        verdict = ("REGRESSION" if real else
                   f"mild real growth ({med / a:.2f}x)" if mild else
                   "contamination")
        # mild (1.2x, iso_threshold] growth is REAL growth on the
        # isolated median — it must not auto-seal: require a human
        # BENCHNOTES justification like a full regression does.
        if real or mild:
            bad.append(q)
        print(f"| {q} | {a:.2f}s | {b:.2f}s | {r:.2f}x | "
              f"{med:.2f}s ({spread:.2f}) | {verdict} |")
    if bad:
        print(f"\nNOT seal-clean: {', '.join(bad)} — fix or justify "
              "in BENCHNOTES before committing")
        sys.exit(1)
    print("\nall slower movers adjudicated clean (isolated medians "
          "within 1.2x of the prior seal) — paste the table into "
          "BENCHNOTES and seal")

if __name__ == "__main__":
    main()
