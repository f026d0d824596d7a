"""Idle A/B harness for adjudicating per-query bench movers.

Usage: python tools/ab_probe.py <repo_or_worktree_dir> <label>

Runs a fixed probe anchor pair (groupby_agg, ngram_jaccard) plus the
watch queries best-of-5 at sf0.1 in ONE process and prints one JSON
line.  Adjudication protocol (README "Bench noise"): alternate
passes over the two checkouts (A/B/A/B) on an idle box, serialized --
any concurrent Spark session poisons timings -- and compare best-of-
passes per checkout; the anchors confirm phase stability.  Round-14
example: closed the gram_novelty/harmonic watch items (r12 worktree
vs HEAD; HEAD read 0.71x/0.82x -- no regression).

Optional extra argv name the WATCH queries (default:
gram_novelty harmonic)."""
import json
import os
import sys
import time

repo = sys.argv[1]; label = sys.argv[2]
watch = sys.argv[3:] or ["gram_novelty", "harmonic"]
sys.path.insert(0, repo)
os.chdir(repo)
import __spark_entry__ as entry
from cascading_flink_spark.session import get_spark

SF = "/root/testdata/sf0.1"
spark = get_spark("ab_" + label)

def execute(df):
    df.write.format("noop").mode("overwrite").save()

qs = entry.queries()
# warm-up on sf0.001
for w in ["groupby_agg"] + watch:
    execute(qs[w](spark, "/root/testdata/sf0.001"))
spark.catalog.clearCache()

out = {}
for name in ["groupby_agg", "ngram_jaccard"] + watch:
    best = float("inf")
    for _ in range(5):
        t0 = time.time()
        execute(qs[name](spark, SF))
        best = min(best, time.time() - t0)
        spark.catalog.clearCache()
    out[name] = round(best, 3)
print(json.dumps({"label": label, **out}))
