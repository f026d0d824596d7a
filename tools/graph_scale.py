#!/usr/bin/env python
"""Graph-family scaling harness: run pagerank / hits / triangle_count on
an events-derived link graph whose NODE COUNT grows with the replicate
factor (``user_id % (50 * N)``), not just its edge multiplicity — the
round-10 answer to "the 8x rows mostly measure job latency because the
node set is fixed at 50".

Usage: python tools/graph_scale.py SF_DIR FACTOR [REPS] [BASE_NODES]
       e.g. python tools/graph_scale.py /tmp/sf0.1x8 8
(the directory should be a tools/replicate_sf.py output so edge count
and node count BOTH grow ~FACTOR-fold; FACTOR=1 with /root/testdata/sf0.1
gives the baseline row).

BASE_NODES picks the density regime.  The default 50 reproduces the
driver queries' key arithmetic — but measured densities are 1.0 / 0.99
/ 0.71 at 1x/8x/32x (the modulus saturates), so the 32x graph is a
near-CLIQUE and triangle counting there measures the O(m^1.5) wedge
work on ~10^9 wedges, not scaling.  BASE_NODES=2000 keeps average
degree ~50 constant while nodes and edges both grow FACTOR-fold — the
realistic sparse-web-graph regime the README scaling rows use.

Prints one line per operator: best-of-REPS wall seconds, node count,
edge count (distinct canonical for triangles, multigraph for PR/HITS),
and the max-tasks-in-one-stage sanity signal (via the final frame's
partition count — the plan-level no-single-task assertion lives in
tests/test_round10_ops.py)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cascading_flink_spark import get_spark  # noqa: E402
from cascading_flink_spark.extensions import (  # noqa: E402
    bfs_distances, hits, pagerank, triangle_count,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    base_nodes = int(sys.argv[4]) if len(sys.argv) > 4 else 50
    n_mod = base_nodes * factor
    spark = get_spark("graph-scale", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    edges = ev.select(
        (F.col("user_id") % n_mod).alias("src"),
        ((F.col("user_id") * 7 + F.col("event_id")) % n_mod).alias("dst"))
    n_edges = edges.count()
    n_nodes = (edges.select(F.col("src").alias("n"))
               .unionByName(edges.select(F.col("dst").alias("n")))
               .distinct().count())
    print(f"factor={factor} n_mod={n_mod} nodes={n_nodes} "
          f"edges={n_edges}", flush=True)
    ops = [
        ("pagerank", lambda: pagerank(edges, iterations=3)),
        ("pagerank_redistribute",
         lambda: pagerank(edges, iterations=3, dangling="redistribute")),
        ("hits", lambda: hits(edges, iterations=2)),
        ("triangle_count", lambda: triangle_count(edges)),
        ("bfs_distances", lambda: bfs_distances(edges, seeds=[0, 1, 2],
                                                max_hops=3)),
    ]
    # warm-up on the small SF so codegen/classloading doesn't tax rep 1
    small = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select((F.col("user_id") % 50).alias("src"),
                ((F.col("user_id") * 7 + F.col("event_id")) % 50)
                .alias("dst"))
    pagerank(small, iterations=1).collect()
    for name, fn in ops:
        best = None
        for _ in range(reps):
            t0 = time.time()
            out = fn().collect()
            el = time.time() - t0
            best = el if best is None or el < best else best
        print(f"{name}: best={best:.2f}s rows={len(out)}", flush=True)


if __name__ == "__main__":
    main()
