#!/usr/bin/env python3
"""Mechanical seal-checklist diff between two Bench snapshots: flags
every query whose warm time moved more than THRESHOLD x in either
direction, lists added/removed queries, and summarizes totals. Feed it
the prior seal (e.g. `git show <ref>:bench_out.json`) and the fresh
run; anything flagged goes to tools/isobench.py BEFORE the snapshot is
committed (BENCHNOTES "Seal checklist").

Usage:
  benchdiff.py PREV.json CUR.json [-t 2.0] [--min-sec 0.5]
  git show <ref>:bench_out.json > /tmp/prev.json && \
      tools/benchdiff.py /tmp/prev.json bench_out.json
Exit code 1 if any mover is flagged (wire into a pre-seal script).
"""
import argparse, json, sys

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("cur")
    ap.add_argument("-t", "--threshold", type=float, default=2.0)
    ap.add_argument("--min-sec", type=float, default=0.5,
                    help="ignore movers whose slower side is under this")
    args = ap.parse_args()
    prev = json.load(open(args.prev))
    cur = json.load(open(args.cur))
    wp, wc = prev["queries_warm"], cur["queries_warm"]

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
    if movers:
        print(f"\nMOVERS (>= {args.threshold}x either way, "
              f"slower side >= {args.min_sec}s):")
        for q, a, b, r in sorted(movers, key=lambda m: -max(m[3], 1 / m[3])):
            print(f"  {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x)"
                  + ("  <-- isobench before sealing" if r > 1 else "  (improved)"))
        if any(r > 1 for *_ , r in movers):
            sys.exit(1)
    else:
        print("\nno movers — snapshot is seal-clean")

if __name__ == "__main__":
    main()
