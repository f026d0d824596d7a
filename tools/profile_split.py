"""Split-profile queries: construction (driver plan/analysis, eager
probes, localCheckpoint planning) vs noop execution, best-of-N each.

Usage: python tools/profile_split.py <query...> [--runs N] [--sf DIR]

One process, serialized, idle-box protocol like tools/ab_probe.py.
Prints one JSON line per query: {"q": name, "build": s, "exec": s,
"total": s} (best-of-N of each phase independently, plus best total of
the same run).  Helps attribute flagship-composition cost: the
curation queries pay Catalyst planning at every localCheckpoint
boundary INSIDE the timed bench region (checkpoint(eager=False) still
calls queryExecution.toRdd at construction).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

args = [a for a in sys.argv[1:] if not a.startswith("--")]
runs = 3
sf = "/root/testdata/sf0.1"
for i, a in enumerate(sys.argv[1:]):
    if a == "--runs":
        runs = int(sys.argv[1:][i + 1]); args.remove(sys.argv[1:][i + 1])
    if a == "--sf":
        sf = sys.argv[1:][i + 1]; args.remove(sf)

import __spark_entry__ as entry  # noqa: E402
from cascading_flink_spark.session import get_spark  # noqa: E402

spark = get_spark("profile_split")
qs = entry.queries()


def execute(df):
    df.write.format("noop").mode("overwrite").save()


# warm-up (same rationale as bench.py)
for w in ["groupby_agg", "wordcount"]:
    execute(qs[w](spark, "/root/testdata/sf0.001"))
for name in args:
    execute(qs[name](spark, "/root/testdata/sf0.001"))
    spark.catalog.clearCache()

for name in args:
    best = {"build": float("inf"), "exec": float("inf"),
            "total": float("inf")}
    for _ in range(runs):
        t0 = time.time()
        df = qs[name](spark, sf)
        t1 = time.time()
        execute(df)
        t2 = time.time()
        best["build"] = min(best["build"], t1 - t0)
        best["exec"] = min(best["exec"], t2 - t1)
        best["total"] = min(best["total"], t2 - t0)
        spark.catalog.clearCache()
    print(json.dumps({"q": name, "build": round(best["build"], 3),
                      "exec": round(best["exec"], 3),
                      "total": round(best["total"], 3)}), flush=True)
