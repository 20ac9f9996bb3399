"""Deterministic scale-up of the driver's sf0.1 testdata.

The driver's generator is not shipped, so sf1 (and beyond) is built by
FK-consistent replication of sf0.1: N key-shifted copies of every
scaling table, each copy's foreign keys pointing at its own copy of the
referenced dimension, so per-key distributions (orders per customer,
lineitems per order, events per user) are EXACTLY those of sf0.1 and
every join/aggregate grows linearly by construction. Fixed tables
(region, nation) are copied as-is, mirroring TPC-H.

De-twinning (round 10): naive replication makes every document/vector
a near-twin of its 9 copies, so near-dup candidate pairs grow
quadratically in the copy count (the round-9 probe saw LSH candidates
x975 on x10 data) — the opposite of a real corpus, where duplicates
arrive at a roughly constant rate and pair counts grow linearly. So:

- documents.text: copy i > 0 suffixes EVERY token with a copy marker
  ('cI'), giving each copy a disjoint shingle vocabulary — cross-copy
  Jaccard is exactly 0, within-copy near-dup structure is sf0.1's
  own, so near-dup density stays constant with n. n_chars is
  recomputed to match.
- embeddings.embedding: copy i > 0 applies a seeded SIGNED COORDINATE
  PERMUTATION (an orthogonal map): within-copy cosine similarities
  are preserved exactly (rotation invariance), cross-copy cosines
  scramble toward 0 (|cos| ~ 1/sqrt(dim) for generic vectors), so
  semantic-dedup/LSH pair counts also grow linearly.

This data is for SCALE PROBES only (BENCH_sf1 artifacts) — the
correctness gate stays on the driver's own parquet.

Usage:
    python tools/gen_scale.py [--factor 10] [--src /root/testdata/sf0.1]
                              [--out /root/repo/.scale/sf1]
"""

from __future__ import annotations

import argparse
import os
import random

import duckdb

SHIFTS = {
    # table -> (columns shifted by that table's own key stride)
    "customer": {"c_custkey": "customer"},
    "supplier": {"s_suppkey": "supplier"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
    },
    "events": {"event_id": "events", "user_id": "__user"},
    "documents": {"doc_id": "documents"},
    "embeddings": {"vec_id": "embeddings"},
}
FIXED = ("region", "nation")
KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "lineitem": "l_orderkey",
    "events": "event_id",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/root/repo/.scale/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()

    strides: dict[str, int] = {}
    for t, key in KEY_OF.items():
        strides[t] = (
            con.execute(
                f"SELECT MAX({key}) + 1 FROM "
                f"read_parquet('{args.src}/{t}.parquet')"
            ).fetchone()[0]
        )
    strides["__user"] = (
        con.execute(
            "SELECT MAX(user_id) + 1 FROM "
            f"read_parquet('{args.src}/events.parquet')"
        ).fetchone()[0]
    )

    for t in FIXED:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{args.src}/{t}.parquet'))"
            f" TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied")

    dim = con.execute(
        "SELECT MAX(length(embedding)) FROM "
        f"read_parquet('{args.src}/embeddings.parquet')"
    ).fetchone()[0]

    def doc_text(i: int) -> str:
        if i == 0:
            return "text"
        # disjoint shingle vocabulary per copy: every token suffixed
        return (
            "array_to_string(list_transform(string_split(text, ' '), "
            f"w -> w || 'c{i}'), ' ')"
        )

    def emb_expr(i: int) -> str:
        if i == 0:
            return "embedding"
        # seeded signed permutation — orthogonal, so within-copy
        # cosines are exact while cross-copy cosines scramble
        rng = random.Random(1000 + i)
        perm = list(range(dim))
        rng.shuffle(perm)
        terms = ", ".join(
            f"{'-' if rng.random() < 0.5 else ''}embedding[{p + 1}]"
            for p in perm
        )
        return f"CAST([{terms}] AS FLOAT[])"

    for t, shifted in SHIFTS.items():
        cols = con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{args.src}/{t}.parquet')"
        ).df()["column_name"].tolist()
        if t in ("documents", "embeddings"):
            # per-copy branches: the de-twin expressions depend on i
            branches = []
            for i in range(args.factor):
                exprs = []
                for c in cols:
                    if c in shifted:
                        exprs.append(
                            f"{c} + {i} * {strides[shifted[c]]} AS {c}"
                        )
                    elif t == "documents" and c == "text":
                        exprs.append(f"{doc_text(i)} AS text")
                    elif t == "documents" and c == "n_chars":
                        exprs.append(f"length({doc_text(i)}) AS n_chars")
                    elif t == "embeddings" and c == "embedding":
                        exprs.append(f"{emb_expr(i)} AS embedding")
                    else:
                        exprs.append(c)
                branches.append(
                    f"SELECT {', '.join(exprs)} "
                    f"FROM read_parquet('{args.src}/{t}.parquet')"
                )
            body = "\nUNION ALL\n".join(branches)
            sql = (
                f"COPY (SELECT * FROM ({body}) ORDER BY {KEY_OF[t]}) "
                f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
            )
        else:
            exprs = []
            for c in cols:
                if c in shifted:
                    exprs.append(f"{c} + i.i * {strides[shifted[c]]} AS {c}")
                else:
                    exprs.append(c)
            sql = (
                f"COPY (SELECT {', '.join(exprs)} "
                f"FROM read_parquet('{args.src}/{t}.parquet'), "
                f"range({args.factor}) i(i) ORDER BY {KEY_OF[t]}) "
                f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
            )
        con.execute(sql)
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{args.out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
