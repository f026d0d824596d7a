#!/usr/bin/env python
"""Replicate a testdata SF directory N-fold with consistent foreign keys —
the scaling-evidence harness behind README's "Scaling evidence" table.

Each copy i shifts every key column by i * (max_key + 1) so joins stay
consistent across copies (customer 7 in copy 2 owns copy-2's orders, etc.).
Dimension tables (region, nation) are copied verbatim: their keys are
referenced by nationkey columns that are NOT shifted, preserving the
original dim cardinality — exactly how a bigger TPC-H SF behaves.
Documents/embeddings replicate with shifted ids and VERBATIM content, so an
8x corpus contains 8-way duplicate clusters — the adversarial case for the
dedup operators (candidate generation must not blow up quadratically).

Usage: python tools/replicate_sf.py [SRC] [DST] [FACTOR]
       defaults: /root/testdata/sf0.1  /tmp/sf0.1x8  8
Then:  SPARK_GRAFT_SF_DIR=DST python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
VERBATIM = ["region", "nation"]
# key -> the table that owns its domain (max computed there once)
KEY_DOMAIN = {
    "c_custkey": ("customer", "c_custkey"), "o_custkey": ("customer", "c_custkey"),
    "o_orderkey": ("orders", "o_orderkey"), "l_orderkey": ("orders", "o_orderkey"),
    "p_partkey": ("part", "p_partkey"), "l_partkey": ("part", "p_partkey"),
    "s_suppkey": ("supplier", "s_suppkey"), "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"), "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"), "vec_id": ("embeddings", "vec_id"),
}


def main() -> None:
    from pyspark.sql import functions as F

    from cascading_flink_spark.session import get_spark

    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.1x8"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    spark = get_spark("replicate-sf")
    # events.ts is TIMESTAMP(NANOS); read as long (the driver contract's
    # _t loader converts either representation)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    bases: dict[tuple[str, str], int] = {}
    for tbl, col in set(KEY_DOMAIN.values()):
        m = (spark.read.parquet(f"{src}/{tbl}.parquet")
             .agg(F.max(col)).collect()[0][0])
        bases[(tbl, col)] = int(m) + 1

    os.makedirs(dst, exist_ok=True)
    for tbl in VERBATIM:
        (spark.read.parquet(f"{src}/{tbl}.parquet")
         .write.mode("overwrite").parquet(f"{dst}/{tbl}.parquet"))
        print(f"{tbl}: verbatim")
    for tbl, cols in SHIFT_COLS.items():
        df = spark.read.parquet(f"{src}/{tbl}.parquet")
        copies = []
        for i in range(factor):
            c = df
            for col in cols:
                base = bases[KEY_DOMAIN[col]]
                c = c.withColumn(col, (F.col(col) + i * base)
                                 .cast(dict(df.dtypes)[col]))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{dst}/{tbl}.parquet")
        print(f"{tbl}: x{factor} -> {out.count()} rows")


if __name__ == "__main__":
    main()
