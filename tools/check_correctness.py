#!/usr/bin/env python
"""Local mimic of the driver's correctness gate.

Runs every ``queries()`` entry through Spark at sf0.01 and the matching
``oracle_sql()`` through DuckDB on the same parquet tables, comparing
row count, sorted column names, and an order-insensitive value hash over
normalized stringified cells.  Queries without an oracle get a rows-only
check, like the driver.

Usage: python tools/check_correctness.py [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF_DIR", "/root/testdata/sf0.01")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v) -> str:
    import datetime
    import math
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # Full-precision shortest repr: a 1-ulp cross-engine difference MUST
        # fail here, so the local mimic can never pass what the driver fails
        # (round-2 lesson: %.6g masked exactly such a divergence).
        return repr(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


_INT_SPARK = {"tinyint", "smallint", "int", "bigint", "long"}
_FLOAT_SPARK = {"float", "double"}


def dtype_mismatches(spark_dtypes, arrow_schema) -> list[str]:
    """int-vs-float type-class clashes between a Spark schema and the
    oracle's TRUE DuckDB column types, read off the Arrow result schema.

    Arrow types are exact regardless of row content — a NULL-padded
    BIGINT column stays int64 here, where a pandas ``fetchdf()`` frame
    coerces it to float64 and used to raise a spurious "cast AS BIGINT"
    warning (the round-5/6 advice item).  Only genuine engine-type skews
    remain: a DuckDB HUGEINT/DECIMAL aggregate (arrow decimal128) or
    DOUBLE against a Spark integer, and the reverse."""
    import pyarrow as pa
    out = []
    okinds = {}
    for f in arrow_schema:
        if pa.types.is_integer(f.type):
            okinds[f.name] = "int"
        elif pa.types.is_floating(f.type):
            okinds[f.name] = "float"
        elif pa.types.is_decimal(f.type):
            okinds[f.name] = "decimal"
    for col, sdt in spark_dtypes:
        k = okinds.get(col)
        if k is None:
            continue
        if sdt in _INT_SPARK and k in ("float", "decimal"):
            out.append(f"dtype skew {col}: spark {sdt} vs oracle "
                       f"{'HUGEINT/DECIMAL' if k == 'decimal' else 'DOUBLE'}"
                       " (cast the oracle aggregate AS BIGINT)")
        elif sdt in _FLOAT_SPARK and k == "int":
            out.append(f"dtype skew {col}: spark {sdt} vs oracle int "
                       "(cast one side)")
    return out


def value_hash(rows: list[dict], cols: list[str]) -> str:
    cols = sorted(cols)
    lines = sorted("|".join(norm_cell(r[c]) for c in cols) for r in rows)
    h = hashlib.md5()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()


def main() -> int:
    import duckdb
    import __spark_entry__ as entrymod
    from cascading_flink_spark.session import get_spark

    only = set(sys.argv[1:])
    qs = entrymod.queries()
    unknown = only - set(qs)
    if unknown:
        # An unknown name (typo, or a flag like --queries) must NOT
        # silently select nothing and print "all checks passed".
        print(f"ERROR: unknown queries: {sorted(unknown)}; "
              f"usage: check_correctness.py [query ...]")
        return 2
    spark = get_spark("check-correctness", cpus=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sdf.columns
            srows = [r.asDict() for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only check, {len(srows)} rows ({dt:.1f}s)")
            if len(srows) == 0:
                print(f"     WARNING {name}: 0 rows — weak evidence")
            continue
        try:
            # arrow pass: TRUE engine column types for the dtype check;
            # fetchdf pass: the value frame in the same normalization the
            # gate has always hashed (oracles are deterministic, so the
            # double execution is safe and cheap at sf0.01)
            otbl = con.execute(sql).fetch_arrow_table()
            ores = con.execute(sql).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures.append(name)
            continue
        ocols = list(ores.columns)
        orows = ores.to_dict("records")
        # duckdb NaN for NULL floats in fetchdf: convert
        import math
        for r in orows:
            for k, v in r.items():
                if isinstance(v, float) and math.isnan(v):
                    r[k] = None
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount {len(srows)} != {len(orows)}")
        # dtype-parity: an int64 Spark column whose oracle twin is a DuckDB
        # HUGEINT/DOUBLE stringifies as "11757.0" vs "11757" at the driver;
        # norm_cell collapses integral floats and would mask exactly that,
        # so fail on the TRUE engine type class (arrow schema — immune to
        # pandas' NULL-padded-int -> float64 fetch coercion).
        problems += dtype_mismatches(sdf.dtypes, otbl.schema)
        if sorted(scols) != sorted(ocols):
            problems.append(f"schema {sorted(scols)} != {sorted(ocols)}")
        else:
            sh, oh = value_hash(srows, scols), value_hash(orows, ocols)
            if sh != oh:
                problems.append("value-hash mismatch")
                sset = {"|".join(norm_cell(r[c]) for c in sorted(scols)) for r in srows}
                oset = {"|".join(norm_cell(r[c]) for c in sorted(ocols)) for r in orows}
                diff_s = list(sset - oset)[:3]
                diff_o = list(oset - sset)[:3]
                if diff_s:
                    problems.append(f"spark-only rows: {diff_s}")
                if diff_o:
                    problems.append(f"oracle-only rows: {diff_o}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"PASS {name}: {len(srows)} rows match ({dt:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
