"""Event analytics: ordered funnels and exact value histograms.

* :func:`event_funnel` — classic ordered-funnel analysis: how many users
  completed step 1, then step 2 *after* their step-1 time, and so on.
  Each stage is ``min(ts)`` per user over an equi-join with the previous
  stage's completion times — all partial-aggregated shuffles on
  ``user_id``; no window over the full event stream, no driver loop over
  users.  At 100 TB the per-stage frames shrink monotonically (only
  converting users survive), so later joins are broadcast-able and AQE
  picks that up at runtime.
* :func:`value_histogram` — exact fixed-width histogram per group.  The
  bin id is ``floor(value / width)`` (one IEEE divide + floor, so any
  engine reproduces the exact binning), and the count is one
  partial-aggregated ``groupBy`` — the profiling primitive that replaces
  a non-deterministic ``approx_percentile`` when results must be
  reproducible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def event_funnel(events: DataFrame, steps: list[str],
                 user_col: str = "user_id", ts_col: str = "ts",
                 type_col: str = "event_type") -> DataFrame:
    """Ordered funnel: users must hit each step strictly after the
    previous step's (earliest qualifying) time.

    Returns one row per funnel step: ``(step, step_name, n_users)``.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    def _count(frame: DataFrame, i: int, name: str) -> DataFrame:
        return (frame.agg(F.count(F.lit(1)).cast("long").alias("n_users"))
                     .select(F.lit(i).alias("step"),
                             F.lit(name).alias("step_name"), "n_users"))

    cur = (events.filter(F.col(type_col) == steps[0])
                 .groupBy(user_col)
                 .agg(F.min(ts_col).alias("__t")))
    counts = [_count(cur, 1, steps[0])]
    for i, step in enumerate(steps[1:], start=2):
        ev = events.filter(F.col(type_col) == step) \
                   .select(user_col, F.col(ts_col).alias("__ts"))
        cur = (ev.join(cur, on=user_col)
                 .filter(F.col("__ts") > F.col("__t"))
                 .groupBy(user_col)
                 .agg(F.min("__ts").alias("__t")))
        counts.append(_count(cur, i, step))
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def value_histogram(df: DataFrame, value_col: str = "value",
                    by: str = "event_type", width: float = 10.0) -> DataFrame:
    """Exact fixed-width histogram of ``value_col`` per ``by`` group.

    Returns ``(group, bin, bin_lo, n)`` with ``bin = floor(value/width)``.
    """
    b = F.floor(F.col(value_col) / F.lit(float(width)))
    return (df.select(F.col(by).alias("grp"), b.cast("long").alias("bin"))
              .groupBy("grp", "bin")
              .agg(F.count(F.lit(1)).cast("long").alias("n"))
              .select("grp", "bin",
                      (F.col("bin") * F.lit(float(width))).alias("bin_lo"),
                      "n"))
