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
"""
import argparse, json, os, sys

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
from benchdiff import isobench  # fresh-JVM adjudicator, shared


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
        clean = med <= a * args.iso_threshold
        verdict = (("env-inflated" if env_hint else "contamination")
                   if clean else "REGRESSION")
        if not clean:
            bad.append(q)
        print(f"| {q} | {a:.2f}s | {b:.2f}s | {r:.2f}x | {telcol} "
              f"| {med:.3f}s ({spread:.3f}) | {verdict} |")
    if bad:
        print(f"\nNOT clean: {', '.join(bad)}")
        sys.exit(1)
    print("\nall movers adjudicated clean against the committed seal — "
          "paste the table into BENCHNOTES")


if __name__ == "__main__":
    main()
