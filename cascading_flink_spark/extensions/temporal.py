"""Temporal joins: as-of and bounded range joins over event streams.

Two operators the reference's users hand-roll (and the prompt-level survey
calls out as table-stakes for event analytics), built scale-first:

* :func:`asof_join` — for every left row, the single nearest right row at
  or before (backward) / at or after (forward) its timestamp, per key.
  NOT a range join: implemented as union + per-key ordered forward-fill
  (one shuffle, one sort, no candidate explosion) — the classic
  distributed as-of formulation.  A hot key serializes its partition like
  any per-key window; pass ``salt=N`` to split it (right rows replicate,
  left rows scatter — see the docstring).
* :func:`range_join` — all (left, right) pairs with the same key and
  ``right_ts - left_ts`` within ``[lower, upper]`` seconds.  Implemented
  as a BUCKETED equi-join: right rows land in one time bucket, left rows
  probe every bucket their window overlaps, the exact predicate filters
  after — so Catalyst runs a shuffled equi-join, never a broadcast
  nested-loop / cartesian (plan-asserted in tests), and each true pair is
  produced exactly once (the right row lives in exactly one bucket).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str, right_ts: str,
              right_cols: dict[str, str] | None = None,
              direction: str = "backward",
              tolerance_seconds: float | None = None,
              salt: int | None = None) -> DataFrame:
    """Left as-of join: every left row, plus the nearest right row's
    ``right_cols`` (out_name -> right column; default: all right columns
    prefixed ``r_``) at-or-before (``backward``) / at-or-after
    (``forward``) the left timestamp, per ``on`` key.  Unmatched left rows
    keep nulls.  ``tolerance_seconds`` bounds how far the match may be.

    ``salt=N`` splits each key's fill across N partitions for skewed keys:
    right rows REPLICATE to all N salt buckets, left rows scatter by a
    deterministic hash — each (key, salt) partition then holds every right
    row it could match plus ~1/N of the left rows, so a dominant key's
    window sort parallelizes at the cost of N× the (usually far smaller)
    right side.  Leave ``None`` when keys are roughly uniform."""
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if salt is not None and salt < 2:
        raise ValueError("salt must be >= 2 (or None)")
    if right_cols is None:
        right_cols = {f"r_{c}": c for c in right.columns
                      if c not in (on, right_ts)}

    payload = F.struct(
        F.col(right_ts).alias("__rts"),
        *[F.col(src).alias(out) for out, src in right_cols.items()])
    r = right.select(F.col(on).alias("__k"),
                     F.col(right_ts).alias("__ts"),
                     F.lit(0).alias("__side"),
                     payload.alias("__r"))
    lcols = left.columns
    l = left.select(F.col(on).alias("__k"),
                    F.col(left_ts).alias("__ts"),
                    F.lit(1).alias("__side"),
                    F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
                    *lcols)
    r = r.select("__k", "__ts", "__side", "__r",
                 *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
                   for c in lcols])
    part_keys = ["__k"]
    if salt is not None:
        # left rows scatter deterministically; right rows replicate to every
        # bucket so each bucket can fill independently
        l = l.withColumn(
            "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in lcols]),
                             F.lit(salt)).cast("int"))
        r = r.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
        part_keys = ["__k", "__salt"]
    u = l.unionByName(r)

    # right rows sort BEFORE left rows at equal timestamps, so ties match
    # (r.ts <= l.ts / >= is inclusive); forward = the same fill over the
    # reversed timeline.
    order = ([F.col("__ts").asc(), F.col("__side").asc()]
             if direction == "backward"
             else [F.col("__ts").desc(), F.col("__side").asc()])
    w = (Window.partitionBy(*part_keys).orderBy(*order)
         .rowsBetween(Window.unboundedPreceding, 0))
    filled = u.withColumn("__m", F.last("__r", ignorenulls=True).over(w))

    out = filled.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        gap = (F.col("__ts").cast("double")
               - F.col("__m.__rts").cast("double"))
        if direction == "forward":
            gap = -gap
        out = out.withColumn(
            "__m", F.when(gap <= float(tolerance_seconds), F.col("__m")))
    return out.select(*lcols,
                      *[F.col(f"__m.{name}").alias(name)
                        for name in right_cols])


def range_join(left: DataFrame, right: DataFrame, on: str,
               left_ts: str, right_ts: str,
               lower_seconds: float, upper_seconds: float,
               how: str = "inner") -> DataFrame:
    """All (left, right) pairs with equal ``on`` key and
    ``lower <= right_ts - left_ts <= upper`` (seconds, or whatever unit the
    ``*_ts`` columns are in when numeric).  Returns left columns plus right
    columns except the join key (other collisions must be pre-renamed).

    The equality key for the physical join is (key, time bucket) with
    bucket width = the window span, so the plan is a shuffled equi-join
    with a post-filter — never a nested-loop."""
    if upper_seconds < lower_seconds:
        raise ValueError("upper_seconds < lower_seconds")
    if how != "inner":
        raise ValueError("range_join supports inner joins")
    span = max(upper_seconds - lower_seconds, 1e-9)

    # right row -> its single bucket; left row -> every bucket its window
    # [ts+lower, ts+upper] overlaps (window span == bucket width, so at
    # most 2 buckets; sequence() handles boundary-exact cases).
    r = right.withColumn(
        "__bucket", F.floor(F.col(right_ts).cast("double") / span))
    lus = F.col(left_ts).cast("double")
    lo_b = F.floor((lus + float(lower_seconds)) / span)
    hi_b = F.floor((lus + float(upper_seconds)) / span)
    l = left.withColumn("__bucket", F.explode(F.sequence(lo_b, hi_b)))

    # Alias FIRST, then build the condition from qualified refs: with
    # same-lineage inputs (e.g. two filters of one table) an unqualified
    # l[on] == r[on] degenerates to a trivially-true self-comparison that
    # Spark only rescues via dataset-id disambiguation, and a left/right
    # timestamp name collision would silently bind both sides to one frame.
    l = l.alias("l")
    r = r.alias("r")
    qlus = F.col(f"l.{left_ts}").cast("double")
    qrus = F.col(f"r.{right_ts}").cast("double")
    cond = ((F.col(f"l.{on}") == F.col(f"r.{on}")) &
            (F.col("l.__bucket") == F.col("r.__bucket")) &
            (qrus - qlus >= float(lower_seconds)) &
            (qrus - qlus <= float(upper_seconds)))
    joined = l.join(r, on=cond, how="inner")
    return joined.select(*[F.col(f"l.{c}") for c in left.columns],
                         *[F.col(f"r.{c}") for c in right.columns
                           if c != on])
