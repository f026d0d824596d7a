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

from pyspark.sql import DataFrame, Window
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


def group_quantiles(df: DataFrame, value_col: str = "value",
                    by: str = "event_type",
                    ps: list[float] | None = None) -> DataFrame:
    """Exact discrete quantiles per group: for each p, the smallest value
    whose rank reaches ``ceil(p * n)`` — a real member of the data (no
    interpolation arithmetic), so the result is reproducible bit-for-bit
    in any engine, unlike ``approx_percentile`` (sketch-dependent) or
    continuous quantiles (interpolation formulas differ).

    Returns ``(grp, p, q)``.  Duplicates pre-aggregate FIRST (one
    partial-agg hash aggregation), so the per-group window sorts only the
    DISTINCT values with their counts — the rank is then read off the
    cumulative count.  A hot group with repeated values (the common shape:
    status codes, rounded metrics, prices) costs its distinct-value count,
    not its row count.  The residual limit is a hot group of fully unique
    continuous values — there, cut cardinality first (fixed-width
    :func:`value_histogram` bins, then recurse into the one bin holding
    the target rank) or accept ``approx_percentile``.
    """
    if ps is None:
        ps = [0.5, 0.9, 0.99]
    per_val = (df.select(F.col(by).alias("grp"), F.col(value_col).alias("q"))
                 .groupBy("grp", "q")
                 .agg(F.count(F.lit(1)).alias("__c")))
    w = Window.partitionBy("grp").orderBy("q") \
              .rowsBetween(Window.unboundedPreceding, 0)
    cum = (per_val.withColumn("__cum", F.sum("__c").over(w))
                  .withColumn("__n", F.sum("__c").over(
                      Window.partitionBy("grp"))))
    p_col = F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p")
    t = F.ceil(F.col("p") * F.col("__n"))
    # the quantile value's cumulative range [cum - c, cum) covers rank t
    return (cum.select("grp", "q", "__c", "__cum", "__n", p_col)
               .filter((F.col("__cum") >= t) & (F.col("__cum") - F.col("__c") < t))
               .select("grp", "p", "q"))
