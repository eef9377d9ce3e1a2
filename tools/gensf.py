#!/usr/bin/env python3
"""Deterministic scale-factor amplifier for the scale-path bench
(VERDICT r11 ask #1): builds sfN from sf0.1 by unioning N key-shifted
replicas of each needed table, STRUCTURE-PRESERVINGLY:

  - documents: per-replica alphabet permutation (translate) — token
    lengths, whitespace, zipf shape and the WITHIN-replica dup/near-dup
    structure are preserved exactly, while cross-replica text is
    disjoint, so dup pairs scale LINEARLY (xN) like a real corpus, not
    quadratically like naive copies would.
  - embeddings: per-replica coordinate rotation — norms and
    within-replica distances exact, cross-replica vectors decorrelated
    (no artificial 10-way exact-dup clusters in the ANN buckets).
  - lineitem/orders: key shifts only (orderkey/custkey); suppliers and
    parts stay shared, as dimensions would.

Usage: gensf.py <outDir> [factor=10] [tables]
(seed fixed; rerun = same bytes; tables = comma list, default all —
 e.g. `documents,embeddings` for a text-family-only 100x pass)
"""
import hashlib
import random
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
ALPHA = "abcdefghijklmnopqrstuvwxyz"


def signed_perm(i, dim=64):
    """Per-replica orthogonal transform for the embedding amplifier:
    a coordinate rotation + sign-flip mask, both md5-derived from the
    replica index. Signed permutations preserve every within-replica
    norm and inner product exactly (they're orthogonal matrices), but
    the 2^64 distinct sign masks make cross-replica collisions
    impossible at any replica count — unlike the old (i*7)%64
    rotation-only schedule, which aliased at factor>=64 replicas and
    (because rotations preserve the coordinate multiset) planted
    near-exact cross-replica twins that corrupted ANN recall
    measurement at sf10 (VERDICT r13 ask #4). Replica 0 is identity so
    the sf0.1 prefix of every amplified corpus is byte-exact."""
    if i == 0:
        return 0, [1] * dim
    h = hashlib.md5(f"graft-replica-{i}".encode()).digest()
    rot = h[0] % dim
    bits = int.from_bytes(h[8:16], "big")
    signs = [1 if (bits >> (k % 64)) & 1 == 0 else -1 for k in range(dim)]
    return rot, signs

def main():
    out = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    which = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else {
        "documents", "embeddings", "lineitem", "orders", "customer",
        "supplier", "part", "nation", "region", "events"}
    rng = random.Random(42)
    perms = [ALPHA] + ["".join(rng.sample(ALPHA, 26)) for _ in range(n - 1)]
    con = duckdb.connect()
    con.sql("PRAGMA threads=16")

    # Replica key shifts DERIVED from max(id)+1 of the source (never
    # hardcoded): if sf0.1 is ever regenerated larger, hardcoded
    # shifts would silently alias replica keys and corrupt the
    # amplified data with no error (the events branch always did this;
    # now every shifted table does).
    def shift(table, idcol):
        return con.sql(f"SELECT max({idcol}) + 1 FROM "
                       f"read_parquet('{SRC}/{table}.parquet')").fetchone()[0]
    doc_shift = shift("documents", "doc_id")
    emb_shift = shift("embeddings", "vec_id")
    # lineitem shares the orderkey space with orders — shift past both
    ord_shift = max(shift("orders", "o_orderkey"),
                    shift("lineitem", "l_orderkey"))
    cust_shift = max(shift("customer", "c_custkey"),
                     shift("orders", "o_custkey"))

    docs = "\nUNION ALL\n".join(
        f"SELECT doc_id + {i * doc_shift} AS doc_id, "
        f"translate(text, '{ALPHA}', '{perms[i]}') AS text, lang, source, "
        f"n_chars FROM read_parquet('{SRC}/documents.parquet')"
        for i in range(n))
    if "documents" in which:
        con.sql(f"COPY ({docs}) TO '{out}/documents.parquet' (FORMAT PARQUET)")

    def emb_replica(i):
        rot, signs = signed_perm(i)
        sign_list = "[" + ", ".join(str(s) for s in signs) + "]"
        return (
            f"SELECT vec_id + {i * emb_shift} AS vec_id, "
            f"CAST(list_transform(range(1, 65), k -> "
            f"embedding[1 + ((k - 1 + {rot}) % 64)] * ({sign_list})[k]) "
            f"AS FLOAT[]) AS embedding, "
            f"label FROM read_parquet('{SRC}/embeddings.parquet')")
    embs = "\nUNION ALL\n".join(emb_replica(i) for i in range(n))
    if "embeddings" in which:
        con.sql(f"COPY ({embs}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")

    li = "\nUNION ALL\n".join(
        f"SELECT l_orderkey + {i * ord_shift} AS l_orderkey, l_partkey, "
        f"l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_discount, "
        f"l_tax, l_returnflag, l_linestatus, l_shipdate "
        f"FROM read_parquet('{SRC}/lineitem.parquet')"
        for i in range(n))
    if "lineitem" in which:
        con.sql(f"COPY ({li}) TO '{out}/lineitem.parquet' (FORMAT PARQUET)")

    orders = "\nUNION ALL\n".join(
        f"SELECT o_orderkey + {i * ord_shift} AS o_orderkey, "
        f"o_custkey + {i * cust_shift} AS o_custkey, o_orderstatus, o_totalprice, "
        f"o_orderdate, o_orderpriority "
        f"FROM read_parquet('{SRC}/orders.parquet')"
        for i in range(n))
    if "orders" in which:
        con.sql(f"COPY ({orders}) TO '{out}/orders.parquet' (FORMAT PARQUET)")

    # customer scales with orders (custkey shift must match); events
    # scale with shifted user/event ids in the SAME time window (a
    # higher event rate, as real growth looks); the remaining
    # dimensions stay verbatim (dims grow slower than facts).
    cust = "\nUNION ALL\n".join(
        f"SELECT c_custkey + {i * cust_shift} AS c_custkey, c_name, "
        f"c_nationkey, c_acctbal, c_mktsegment "
        f"FROM read_parquet('{SRC}/customer.parquet')"
        for i in range(n))
    if "customer" in which:
        con.sql(f"COPY ({cust}) TO '{out}/customer.parquet' (FORMAT PARQUET)")

    ev = "\nUNION ALL\n".join(
        f"SELECT event_id + {i} * (SELECT max(event_id) + 1 FROM "
        f"read_parquet('{SRC}/events.parquet')) AS event_id, "
        f"user_id + {i} * (SELECT max(user_id) + 1 FROM "
        f"read_parquet('{SRC}/events.parquet')) AS user_id, "
        f"ts, event_type, value, props "
        f"FROM read_parquet('{SRC}/events.parquet')"
        for i in range(n))
    if "events" in which:
        con.sql(f"COPY ({ev}) TO '{out}/events.parquet' (FORMAT PARQUET)")

    for t in ["supplier", "part", "nation", "region"]:
        if t in which:
            con.sql(f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet'))"
                    f" TO '{out}/{t}.parquet' (FORMAT PARQUET)")

    for t in sorted(which):
        c = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {c} rows")

if __name__ == "__main__":
    main()
