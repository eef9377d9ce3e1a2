#!/usr/bin/env python3
"""Fresh-JVM isolated bench for one query: spawn N graft.IsoBench JVMs
(one sample each), report per-sample warm minima, the cross-JVM median
and spread, and the host load average — the mechanical adjudicator for
"did this query regress, or was the box loaded?".

Usage: isobench.py <queryName> [-n SAMPLES] [-w WARM_RUNS_PER_JVM]

Interpretation guide (BENCHNOTES seal checklist):
  - spread = (max - min) / median of the per-JVM warm minima. Under
    ~0.3 on a quiet box; a large spread with high load_avg means the
    box is contaminated, NOT that the code regressed.
  - compare the MEDIAN across samples to the prior round's seal value;
    a real regression moves the median with a small spread.
"""
import argparse, json, os, subprocess, statistics, sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ADD_OPENS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]

def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("query")
    ap.add_argument("-n", "--samples", type=int, default=5)
    ap.add_argument("-w", "--warm-runs", type=int, default=3)
    args = ap.parse_args()

    cp = os.path.join(REPO, "target", "scala-2.13", "classes") + ":/opt/spark/jars/*"
    cmd = ["java"]
    for p in ADD_OPENS:
        cmd += ["--add-opens", f"{p}=ALL-UNNAMED"]
    cmd += ["-Xmx" + os.environ.get("SPARK_DRIVER_MEM", "8g"),
            "-cp", cp, "graft.IsoBench", args.query, str(args.warm_runs)]

    samples = []
    for i in range(args.samples):
        out = subprocess.run(cmd, capture_output=True, text=True)
        line = next((l for l in out.stdout.splitlines()
                     if l.startswith('{"query"')), None)
        if line is None:
            print(f"sample {i}: FAILED\n{out.stderr[-2000:]}", file=sys.stderr)
            continue
        rec = json.loads(line)
        samples.append(rec)
        print(f"sample {i}: warm_min={rec['warm_min']:.3f}s "
              f"cold={rec['cold']:.3f}s warm_runs={rec['warm_runs']} "
              f"load_avg={rec['load_avg_start']:.1f}->{rec['load_avg_end']:.1f}")

    if not samples:
        print("all samples failed", file=sys.stderr)
        sys.exit(1)
    mins = sorted(s["warm_min"] for s in samples)
    med = statistics.median(mins)
    spread = (mins[-1] - mins[0]) / med if med > 0 else 0.0
    summary = {
        "query": args.query, "n_jvms": len(samples),
        "warm_min_median": round(med, 3),
        "warm_min_all": mins,
        "spread": round(spread, 3),
        "load_avg_max": max(max(s["load_avg_start"], s["load_avg_end"])
                            for s in samples),
        "sf": samples[0]["sf"],
    }
    print(json.dumps(summary))

if __name__ == "__main__":
    main()
