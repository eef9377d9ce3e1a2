#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: compare each
SparkEntry query's parquet dump against its DuckDB oracle run on the
same sf tables. Usage: check.py <sfDir> <verifyOutDir>"""
import json, os, sys
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
# Bounded config: under restricted environments (thread/cgroup caps)
# DuckDB's default ncpu thread pool dies with EAGAIN "bad allocation"
# on tiny blocks; 8 threads / 8GB is plenty for the sf0.01 oracles.
con = duckdb.connect(config={"memory_limit": "8GB", "threads": 8})
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
names = sorted(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
fail = 0
for name in names:
    try:
        eng = pd.read_parquet(os.path.join(out_dir, name))
    except Exception as e:
        print(f"FAIL {name}: engine parquet unreadable: {e}"); fail += 1
        continue
    if name not in oracle:
        print(f"ROWS-ONLY {name}: rows={len(eng)} (no oracle)")
        continue
    try:
        ora = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fail += 1
        continue
    ecols, ocols = sorted(eng.columns), sorted(ora.columns)
    if ecols != ocols:
        print(f"FAIL {name}: schema {ecols} vs {ocols}"); fail += 1
        continue
    if len(eng) != len(ora):
        print(f"FAIL {name}: rows {len(eng)} vs {len(ora)}"); fail += 1
        continue
    e = eng[ecols].sort_values(ecols).reset_index(drop=True)
    o = ora[ocols].sort_values(ocols).reset_index(drop=True)
    bad = None
    for c in ecols:
        ev, ov = e[c], o[c]
        if ev.dtype.kind == "f" or ov.dtype.kind == "f":
            ev, ov = ev.astype(float), ov.astype(float)
            neq = ~((ev.isna() & ov.isna()) | ((ev - ov).abs() < 1e-9))
        else:
            neq = ~((ev.isna() & ov.isna()) | (ev.astype(str) == ov.astype(str)))
        if neq.any():
            i = neq.idxmax()
            bad = f"col {c} row {i}: {e[c][i]!r} vs {o[c][i]!r} ({int(neq.sum())} diffs)"
            break
    if bad:
        print(f"FAIL {name}: {bad}"); fail += 1
    else:
        print(f"OK   {name}: rows={len(eng)}")
print(f"\n{len(names) - fail}/{len(names)} pass")
sys.exit(1 if fail else 0)
