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
                 type_col: str = "event_type",
                 pin_stages: bool = True) -> DataFrame:
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

    # pin each stage frame: every count branch AND the next stage read
    # it — unpinned, stage k's branch would re-execute the whole join
    # chain for steps 1..k-1, scanning the events source O(steps^2)
    # times.  localCheckpoint(eager=False) instead of persist(): same
    # branch-reuse, but the blocks are scoped to the returned frame's
    # lifetime (ContextCleaner frees them on GC) rather than parked in
    # the cached-query registry until someone clears the cache.
    # pin_stages=False skips the pinning — for plan inspection (the
    # boundary hides the source scans from explain) or when a caller
    # composes the funnel into its own cached/checkpointed plan
    def _pin(frame: DataFrame) -> DataFrame:
        return frame.localCheckpoint(eager=False) if pin_stages else frame

    cur = _pin(events.filter(F.col(type_col) == steps[0])
                     .groupBy(user_col)
                     .agg(F.min(ts_col).alias("__t")))
    counts = [_count(cur, 1, steps[0])]
    for i, step in enumerate(steps[1:], start=2):
        ev = events.filter(F.col(type_col) == step) \
                   .select(user_col, F.col(ts_col).alias("__ts"))
        cur = _pin(ev.join(cur, on=user_col)
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


def rolling_stats(events: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  value_col: str = "value",
                  window_rows: int = 5) -> DataFrame:
    """Per-key ordered moving-frame statistics — the sliding-window
    profile (moving sum / min / max, step delta, running count) that
    monitoring and feature pipelines compute over an event stream, as
    one batch window pass.

    Each event gets, over the frame of the last ``window_rows`` events
    of the SAME key ordered by ``(ts, id)`` (the id breaks timestamp
    ties deterministically):

    * ``mov_sum_cents`` / ``mov_min_cents`` / ``mov_max_cents`` — over
      the value in integer cents (``floor(value*100 + 0.5)``: one IEEE
      multiply+add+floor, so any engine bins identically and every
      aggregate is exact long arithmetic — no float summation-order
      drift can reach the output)
    * ``mov_n`` — rows actually in the frame (< ``window_rows`` near the
      key's start; consumers divide for the moving average)
    * ``delta_cents`` — difference from the previous event's cents
      (NULL on each key's first event)
    * ``cum_n`` — running event count for the key

    Scale shape (100 TB): ONE shuffle on the key; every frame is bounded
    by ``window_rows``, and running aggregates stream through the sorted
    partition — cost is the per-key sort.  A mega-key (one user with a
    large fraction of all events) serializes in one task's sort, the
    same documented limit as ``group_quantiles``; bound it upstream
    (sessionize first, or split the key by day) — the moving frame is
    then computed per sub-key.
    """
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    cents = F.floor(F.col(value_col) * 100 + F.lit(0.5)).cast("long")
    base = events.withColumn("__cents", cents)
    order = [F.col(ts_col), F.col(id_col)]
    frame = (Window.partitionBy(key_col).orderBy(*order)
             .rowsBetween(-(window_rows - 1), 0))
    seq = Window.partitionBy(key_col).orderBy(*order)
    return (base.select(
        F.col(key_col), F.col(id_col), F.col(ts_col),
        F.col("__cents").alias("value_cents"),
        F.sum("__cents").over(frame).alias("mov_sum_cents"),
        F.min("__cents").over(frame).alias("mov_min_cents"),
        F.max("__cents").over(frame).alias("mov_max_cents"),
        F.count(F.lit(1)).over(frame).alias("mov_n"),
        (F.col("__cents") - F.lag("__cents", 1).over(seq))
            .alias("delta_cents"),
        F.row_number().over(seq).cast("long").alias("cum_n"),
    ))


def group_quantiles(df: DataFrame, value_col: str = "value",
                    by: str = "event_type",
                    ps: list[float] | None = None,
                    strategy: str = "binned",
                    approx_accuracy: int = 10000) -> DataFrame:
    """Exact discrete quantiles per group: for each p, the smallest value
    whose rank reaches ``ceil(p * n)`` — a real member of the data (no
    interpolation arithmetic), so the result is reproducible bit-for-bit
    in any engine, unlike ``approx_percentile`` (sketch-dependent) or
    continuous quantiles (interpolation formulas differ).

    Returns ``(grp, p, q)``.  The DEFAULT execution is the hot-group-safe
    two-pass bin recursion of :func:`group_quantiles_binned` (identical
    output by construction; per-group sorts bounded by ``bins`` and
    ~n/bins) — a billion-row group through the default entry point must
    never sort in one task.  ``strategy="onepass"`` selects the explicit
    small-data variant: one partial-agg dedup plus a per-group window
    over the DISTINCT values — cheaper when groups are modest or values
    repeat heavily (status codes, prices), but a hot group of unique
    continuous values sorts its whole distinct set in a single task.

    ``strategy="approx"`` is the sketch scale path (the
    cardinality_report exact/HLL++ twin pattern): one
    ``approx_percentile`` partial aggregation, NO second pass and NO
    per-group sort at all — rank error bounded by ``n /
    approx_accuracy`` (pytest-pinned).  Sketch results are
    engine-specific, so this path is not oracle-gateable; the exact
    strategies carry the correctness gate.
    """
    if strategy == "binned":
        return group_quantiles_binned(df, value_col=value_col, by=by, ps=ps)
    if strategy == "approx":
        if ps is None:
            ps = [0.5, 0.9, 0.99]
        agg = (df.select(F.col(by).alias("grp"),
                         F.col(value_col).alias("q"))
                 .filter(F.col("q").isNotNull())
                 .groupBy("grp")
                 .agg(F.percentile_approx(
                         "q", [float(p) for p in ps],
                         int(approx_accuracy)).alias("__qs")))
        pair = F.explode(F.arrays_zip(
            F.array(*[F.lit(float(p)) for p in ps]).alias("p"),
            F.col("__qs").alias("q"))).alias("pq")
        return agg.select("grp", pair).select(
            "grp", F.col("pq.p").alias("p"), F.col("pq.q").alias("q"))
    if strategy != "onepass":
        raise ValueError("strategy must be 'binned', 'onepass' or 'approx'")
    if ps is None:
        ps = [0.5, 0.9, 0.99]
    # quantiles are over NON-NULL values (the standard semantics; it also
    # keeps this path and the binned path identical — unfiltered, Spark
    # windows sort nulls first while least()/floor() binning would park
    # them in the last bin)
    per_val = (df.select(F.col(by).alias("grp"), F.col(value_col).alias("q"))
                 .filter(F.col("q").isNotNull())
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


def group_quantiles_binned(df: DataFrame, value_col: str = "value",
                           by: str = "event_type",
                           ps: list[float] | None = None,
                           bins: int = 1024) -> DataFrame:
    """Exact discrete quantiles per group via the two-pass bin recursion
    named in :func:`group_quantiles` — the hot-group-safe path.

    Pass 1 histograms each group into ``bins`` fixed-width bins (per-bin
    counts are a partial aggregation; the per-group cumulative window
    sorts at most ``bins`` rows per group, never the group's row count)
    and locates, for every p, the single bin holding rank
    ``ceil(p * n)``.  Pass 2 sorts ONLY the rows of those target bins
    (expected n/bins rows each; duplicates pre-aggregate first exactly as
    in the one-pass path) and reads the value at the residual rank.

    Identical output to :func:`group_quantiles` by construction — the
    same smallest-value-reaching-rank definition, so the same oracle —
    but a group of a billion rows costs two scans plus a sort of
    ~n/bins rows instead of one sort of n distinct values.  Residual
    limit: an adversarial group packing everything into one bin (range
    collapse) degrades to the one-pass cost; real metrics spread.

    Returns ``(grp, p, q)``.
    """
    if ps is None:
        ps = [0.5, 0.9, 0.99]
    # non-null values only, exactly as in group_quantiles (see note there)
    vals = (df.select(F.col(by).alias("grp"), F.col(value_col).alias("q"))
              .filter(F.col("q").isNotNull()))
    stats = (vals.groupBy("grp")
             .agg(F.min("q").alias("__lo"), F.max("q").alias("__hi"),
                  F.count(F.lit(1)).alias("__n")))
    width = (F.col("__hi") - F.col("__lo")) / F.lit(float(bins))
    # identical binning expression in both passes; width 0 (constant
    # group) puts everything in bin 0
    def bin_of(q):
        return F.when(F.col("__hi") == F.col("__lo"), F.lit(0)) \
                .otherwise(F.least(F.lit(bins - 1),
                                   F.floor((q - F.col("__lo")) / width))) \
                .cast("long")

    binned = (vals.join(F.broadcast(stats), "grp")
              .select("grp", "q", bin_of(F.col("q")).alias("__bin")))
    per_bin = (binned.groupBy("grp", "__bin")
               .agg(F.count(F.lit(1)).alias("__bc")))
    wb = Window.partitionBy("grp").orderBy("__bin") \
               .rowsBetween(Window.unboundedPreceding, 0)
    cum_bins = (per_bin.withColumn("__bcum", F.sum("__bc").over(wb))
                .join(F.broadcast(stats.select("grp", "__n")), "grp"))
    p_col = F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p")
    t = F.ceil(F.col("p") * F.col("__n"))
    # the target bin's cumulative range covers rank t; residual rank is
    # local to the bin
    targets = (cum_bins.select("grp", "__bin", "__bc", "__bcum", "__n",
                               p_col)
               .filter((F.col("__bcum") >= t)
                       & (F.col("__bcum") - F.col("__bc") < t))
               .select("grp", "__bin", "p",
                       (t - (F.col("__bcum") - F.col("__bc")))
                       .alias("__local_rank")))
    # pass 2: only rows of target bins; duplicates pre-aggregate first
    hit = (binned.join(F.broadcast(targets.select("grp", "__bin")
                                   .distinct()),
                       ["grp", "__bin"])
           .groupBy("grp", "__bin", "q")
           .agg(F.count(F.lit(1)).alias("__c")))
    wv = Window.partitionBy("grp", "__bin").orderBy("q") \
               .rowsBetween(Window.unboundedPreceding, 0)
    cum_vals = hit.withColumn("__vcum", F.sum("__c").over(wv))
    return (cum_vals.join(targets, ["grp", "__bin"])
            .filter((F.col("__vcum") >= F.col("__local_rank"))
                    & (F.col("__vcum") - F.col("__c")
                       < F.col("__local_rank")))
            .select("grp", "p", "q"))


def hot_keys(df: DataFrame, key_col: str, top: int = 20) -> DataFrame:
    """Skew diagnosis for any prospective join/group key: the ``top``
    heaviest keys with exact counts and corpus mass share
    ``(key, n, share_x10000)``, ordered by (n desc, key asc).

    The pre-flight check before keying a shuffle at 100 TB: one partial
    aggregate on the key, a 1-row total cross-joined back (the tpch_q11
    integer-threshold pattern), and a global top-N that compiles to
    TakeOrderedAndProject — no full sort, no second scan.  NULL keys are
    counted as a key (they hash to one partition too — the most common
    real-world skew); the tie-order pins NULL last EXPLICITLY (Spark's
    bare ASC defaults nulls-first, SQL engines default NULLS LAST — an
    implicit default would flip the cutoff row set between engines)."""
    counts = df.groupBy(F.col(key_col).alias("key")) \
               .agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__t"))
    return (counts.crossJoin(F.broadcast(total))
                  .select("key", "n",
                          F.expr("n * 10000 div __t").alias("share_x10000"))
                  .orderBy(F.desc("n"), F.asc_nulls_last("key"))
                  .limit(top))


def heavy_hitters(df: DataFrame, key_col: str, k: int = 100,
                  capacity: int | None = None) -> DataFrame:
    """EXACT phi-heavy hitters — every key occurring MORE than n/``k``
    times — at bounded memory: ``(key, n, share_x10000)`` ordered by
    (n desc, key asc), NULL keys counted like :func:`hot_keys`.

    :func:`hot_keys` group-counts every distinct key, which is the right
    tool until the key's cardinality itself is the problem: counting
    every URL/shingle/user in a 100 TB corpus shuffles one row per
    DISTINCT key.  This operator is the classic two-pass sketch-verify
    alternative whose shuffle is O(partitions * k), independent of
    cardinality:

    1. **Candidates**: a Misra-Gries summary of ``capacity`` (default
       ``4*k``) counters per partition (one Arrow pass, O(capacity)
       memory).  MG guarantees any key with partition frequency
       > n_p/(capacity+1) survives its partition summary, so every
       global > n/k key survives in at least one partition — the
       candidate union is a SUPERSET of the true heavy hitters (the
       standard MG merge bound; capacity > k widens the safety margin
       and costs only sketch width).
    2. **Verify**: one exact count of the candidate keys only — the
       candidate set (<= partitions * capacity rows) broadcasts into a
       map-side semi-join filter, so the second scan aggregates a tiny
       key set — then the exact ``n * k > total`` threshold.  The grand
       total rides out of the sketch pass as per-partition count rows,
       so the whole operator is exactly TWO scans of the input.

    Output is therefore IDENTICAL to the full GROUP BY + HAVING answer
    (oracle-checked), with the full-cardinality shuffle replaced by a
    broadcast of ~partitions*capacity candidates.  NULL keys ride
    through a dedicated ``__isnull`` sketch column (and the partition
    row counts through a ``__rowcnt`` marker column) — no in-band
    sentinel key values, so any representable string key is reportable."""
    if k <= 1:
        raise ValueError("k must be > 1 (threshold is count*k > total)")
    cap = int(capacity) if capacity is not None else 4 * int(k)
    if cap < k:
        raise ValueError("capacity must be >= k or the MG superset "
                         "guarantee for the n/k threshold is lost")
    import pandas as pd

    def mg(batches):
        # Batched MG (the mergeable-summaries formulation, Agarwal et
        # al.): fold each Arrow chunk's exact value_counts into the
        # counter table, then if it overflows ``cap``, subtract the
        # (cap+1)-th largest count from every counter and drop the
        # non-positive ones.  Total decrement mass stays <= n_p/(cap+1),
        # so the survival guarantee is the per-row sketch's, at
        # vectorized speed (no per-row Python).  NULL keys get their own
        # out-of-dict counter and ride out as a dedicated __isnull
        # column; the per-partition row count rides out as a __rowcnt
        # marker row — no in-band sentinel key values, so EVERY
        # representable string key (including "\\x00..." ones) is a
        # first-class candidate.
        counters: dict = {}
        null_counter = 0
        n_rows = 0
        for pdf in batches:
            n_rows += len(pdf)
            col = pdf["__k"]
            null_counter += int(col.isna().sum())
            for key, cnt in col.value_counts().items():
                counters[key] = counters.get(key, 0) + int(cnt)
            width = len(counters) + (1 if null_counter > 0 else 0)
            if width > cap:
                vals = list(counters.values())
                if null_counter > 0:
                    vals.append(null_counter)
                cut = sorted(vals, reverse=True)[cap]
                counters = {c: n - cut for c, n in counters.items()
                            if n > cut}
                null_counter = max(0, null_counter - cut)
        if n_rows:
            # candidates (count unused) + ONE partition-count row; a
            # fully-compressed-away table still reports its row count
            ks = list(counters)
            isnull = [False] * len(ks)
            if null_counter > 0:
                ks.append(None)
                isnull.append(True)
            yield pd.DataFrame({
                "__k": ks + [None],
                "__isnull": isnull + [False],
                "__n": [0] * len(ks) + [n_rows],
                "__rowcnt": [False] * len(ks) + [True]})

    keyed = df.select(F.col(key_col).cast("string").alias("__k"))
    # The sketch output is tiny (<= partitions * (capacity+1) rows) but
    # read by BOTH the total and the candidate branch; localCheckpoint
    # (eager=False) pins it for the branches while scoping the blocks to
    # this frame's lifetime (ContextCleaner releases them when the
    # caller's reference is collected) — unlike persist(), repeated
    # operator calls leave nothing in the cached-query registry.
    sketch = (keyed.mapInPandas(
        mg, "__k string, __isnull boolean, __n long, __rowcnt boolean")
        .localCheckpoint(eager=False))
    total = (sketch.filter(F.col("__rowcnt"))
                   .agg(F.sum("__n").alias("__t")))
    cands = (sketch.filter(~F.col("__rowcnt"))
                   .select(F.when(F.col("__isnull"), F.lit(None))
                            .otherwise(F.col("__k")).alias("__k"))
                   .distinct())
    counts = (keyed.join(F.broadcast(cands),
                         keyed["__k"].eqNullSafe(cands["__k"]), "left_semi")
                   .groupBy("__k").agg(F.count(F.lit(1)).alias("n")))
    return (counts.crossJoin(F.broadcast(total))
                  .filter(F.col("n") * k > F.col("__t"))
                  .select(F.col("__k").alias("key"), "n",
                          F.expr("n * 10000 div __t").alias("share_x10000"))
                  .orderBy(F.desc("n"), F.asc_nulls_last("key")))


def classifier_auc(df: DataFrame, score_col: str, label_col: str,
                   group_col: str | None = None,
                   out_col: str = "auc_x1e6",
                   quantize_x: int | None = None) -> DataFrame:
    """Exact ROC-AUC of a score against binary labels, per group or
    globally — the standard acceptance gate for a quality classifier
    before its scores drive corpus selection (does the fastText logit
    actually rank held-out good docs above bad ones, per language?).

    Tie-correct Mann-Whitney in PURE INTEGER arithmetic (no sampling,
    no trapezoids): ``AUC = [P(s_pos > s_neg) + P(s_pos = s_neg)/2]``,
    computed from per-distinct-score counts — ``2*numerator = sum over
    scores s of n_pos(s) * (2 * n_neg_below(s) + n_neg(s))`` — so the
    x1e6 output is one truncating division of exact longs and
    value-hashes cross-engine.  Labels must be 0/1 (in-plan raise on
    anything else); groups missing a class have undefined AUC and are
    EXCLUDED from the output (documented, not an error — a one-class
    group is normal in small slices).

    Scale shape: one partial-agg groupBy onto (group, distinct score)
    — the frame a 100 TB corpus reduces to is |groups| x |distinct
    scores|, and this repo's quality signals are integer-quantized
    (x100/x1e4/x1e6), so per-group score cardinality is bounded by the
    quantization, NOT the row count; one cumulative window over that
    reduced frame; one partial-agg rollup.  A continuous
    never-repeating score would make the reduced frame row-sized —
    ``quantize_x`` buckets raw doubles in-plan (``round(score *
    quantize_x)`` as an exact long — scores within 1/(2*quantize_x)
    of each other tie; the repo's standard x1e6 recipe), so a caller
    with raw logits can't accidentally build a row-sized frame.

    Overflow: the Mann-Whitney numerator is ``O(n_pos * n_neg)`` per
    group — past ~4.6e12 positive x negative pairs (a few million of
    each) an int64 x1e6 numerator would wrap SILENTLY under Spark's
    non-ANSI arithmetic, so both the numerator sum and the final
    ratio run through DECIMAL(38,0) intermediates (headroom to 1e38;
    the oracle twin uses HUGEINT) and only the final x1e6 ratio is
    cast back to long."""
    lab = F.col(label_col)
    ok = F.when((lab == 0) | (lab == 1), lab.cast("long")) \
          .otherwise(F.raise_error(F.lit(
              "classifier_auc: labels must be 0/1")).cast("long"))
    if quantize_x is None:
        score = F.col(score_col)
    else:
        if int(quantize_x) < 1:
            raise ValueError("classifier_auc: quantize_x must be >= 1")
        score = F.round(F.col(score_col).cast("double")
                        * int(quantize_x)).cast("long")
    g = [group_col] if group_col is not None else []
    c = (df.select(*g, score.alias("__s"), ok.alias("__l"))
         .groupBy(*g, "__s")
         .agg(F.sum("__l").cast("long").alias("__p"),
              F.sum(1 - F.col("__l")).cast("long").alias("__q")))
    w = (Window.partitionBy(*g).orderBy("__s")
         .rowsBetween(Window.unboundedPreceding, -1))
    c = c.withColumn("__nb", F.coalesce(F.sum("__q").over(w),
                                        F.lit(0).cast("long")))
    num = (c.groupBy(*g)
           .agg(F.sum(F.col("__p").cast("decimal(38,0)")
                      * (2 * F.col("__nb") + F.col("__q")))
                .alias("__num2"),
                F.sum("__p").cast("long").alias("__np"),
                F.sum("__q").cast("long").alias("__nq")))
    return (num.filter((F.col("__np") > 0) & (F.col("__nq") > 0))
            .select(*g,
                    F.expr("__num2 * 1000000 DIV "
                           "(2 * CAST(__np AS DECIMAL(38,0)) * __nq)")
                     .cast("long").alias(out_col),
                    F.col("__np").alias("n_pos"),
                    F.col("__nq").alias("n_neg")))


def cardinality_report(df: DataFrame, group_col: str,
                       cols: list[str], exact: bool = True,
                       rsd: float = 0.05) -> DataFrame:
    """Per-group cardinality profile: row count + distinct count per column.

    ``exact=True`` (the correctness-gate twin) computes true
    ``count_distinct`` — a two-phase partial-deduplicating shuffle per
    column, fine up to very large groups.  ``exact=False`` switches every
    distinct to ``approx_count_distinct`` (HyperLogLog++, relative
    standard deviation ``rsd``): single-pass, constant memory per group —
    the 100 TB profiling path where a distinct-shuffle per column over
    the full corpus is the bottleneck.  Both paths share one aggregation
    (partial-agg map-side combine); output schema is identical so callers
    can flip the flag by data size.  Pytest pins approx within 5*rsd of
    exact on the same input.
    """
    if exact:
        aggs = [F.count_distinct(F.col(c)).alias(f"{c}_distinct")
                for c in cols]
    else:
        aggs = [F.approx_count_distinct(c, rsd).alias(f"{c}_distinct")
                for c in cols]
    return (df.groupBy(group_col)
              .agg(F.count(F.lit(1)).alias("n_rows"), *aggs))


def sessionize(events: DataFrame, key_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id",
               gap_us: int = 1800 * 1_000_000,
               keep_cols: list[str] | None = None) -> DataFrame:
    """Gap-based sessionization: label every event with its session —
    ``(key, id, ts_us, session_n, session_seq)`` where a NEW session
    starts whenever the gap to the key's previous event exceeds
    ``gap_us`` — the batch twin of
    :func:`~cascading_flink_spark.streaming.ops.stateful_sessionize`
    and the prerequisite of every dwell-time / journey analysis
    (``rolling_stats`` and ``group_quantiles`` both document
    "sessionize first" as the mega-key bound).

    Determinism recipe: timestamps become integer epoch micros
    (``unix_micros``), ordering is ``(ts_us, id)`` — the id breaks
    timestamp ties — and the session boundary test ``ts_us - prev >
    gap_us`` (strictly greater; equal-timestamp bursts share a
    session) is exact long arithmetic.  ``session_n`` is the running
    sum of boundary flags (1-based per key), ``session_seq`` the
    1-based position within the session, derived as ``rn -
    max(boundary rn so far) + 1`` so BOTH columns come out of the SAME
    window pass.

    Scale shape (100 TB of events): ONE shuffle on ``key_col``; every
    derived column is a running aggregate streaming through the sorted
    partition — no second window partitioning, no driver pulls.  A
    mega-key serializes in one task's sort (the documented
    ``rolling_stats`` limit); bound it upstream by splitting the key
    by day.  ``keep_cols`` rides extra columns through the same window
    pass (e.g. the event type for :func:`session_funnel`) — no join
    back onto the source."""
    if gap_us < 1:
        raise ValueError("gap_us must be >= 1")
    # keep_cols must not shadow the key/id passthroughs, the output
    # columns, or the window internals — a collision would emit a
    # duplicate/ambiguous column that only errors downstream (the
    # gap_us / step-name-literal guard convention).
    reserved = {key_col, id_col, ts_col, "ts_us", "session_n",
                "session_seq", "__us", "__ns", "__rn"}
    kc = list(keep_cols or [])
    if len(kc) != len(set(kc)):
        raise ValueError("sessionize: keep_cols contains duplicates")
    bad = sorted(set(kc) & reserved)
    if bad:
        raise ValueError(
            f"sessionize: keep_cols {bad} collide with the key/id/ts "
            "columns, the output columns (ts_us, session_n, "
            "session_seq) or window internals (__us, __ns, __rn)")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy("__us", id_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    extra = [F.col(c) for c in kc]
    # NULL keys/timestamps are out of contract (engines disagree on NULL
    # sort position — Spark NULLS FIRST, DuckDB NULLS LAST) and dropped
    # in-plan, the cohort_retention convention.
    base = (events.filter(F.col(key_col).isNotNull()
                          & F.col(ts_col).isNotNull())
            .select(F.col(key_col), F.col(id_col), us.alias("__us"),
                    *extra)
            .withColumn("__ns", F.when(
                (F.col("__us") - F.lag("__us", 1).over(w) > F.lit(int(gap_us)))
                | F.lag("__us", 1).over(w).isNull(), 1).otherwise(0))
            .withColumn("__rn", F.row_number().over(w)))
    return base.select(
        F.col(key_col), F.col(id_col), F.col("__us").alias("ts_us"),
        F.sum("__ns").over(run).cast("long").alias("session_n"),
        (F.col("__rn")
         - F.max(F.when(F.col("__ns") == 1, F.col("__rn"))).over(run)
         + 1).cast("long").alias("session_seq"),
        *extra)


def session_stats(events: DataFrame, key_col: str = "user_id",
                  ts_col: str = "ts", id_col: str = "event_id",
                  gap_us: int = 1800 * 1_000_000) -> DataFrame:
    """Per-session summary over :func:`sessionize`: ``(key, session_n,
    n_events, start_us, end_us, duration_us)`` — the session-length /
    dwell-time table product analytics aggregates from the labels.

    One extra partial-aggregated ``groupBy (key, session_n)`` on top of
    the sessionize window pass; all exact long arithmetic (duration is
    a difference of epoch micros).  Same single-shuffle-class shape:
    the groupBy keys refine the window partitioning, so at scale AQE
    coalesces what is already nearly co-located."""
    lab = sessionize(events, key_col=key_col, ts_col=ts_col,
                     id_col=id_col, gap_us=gap_us)
    return (lab.groupBy(key_col, "session_n")
            .agg(F.count(F.lit(1)).cast("long").alias("n_events"),
                 F.min("ts_us").alias("start_us"),
                 F.max("ts_us").alias("end_us"))
            .withColumn("duration_us",
                        (F.col("end_us") - F.col("start_us")).cast("long")))


def session_funnel(events: DataFrame, steps: list[str],
                   key_col: str = "user_id", ts_col: str = "ts",
                   id_col: str = "event_id",
                   type_col: str = "event_type",
                   gap_us: int = 1800 * 1_000_000) -> DataFrame:
    """Ordered funnel WITHIN sessions — the actual product-analytics
    ask that :func:`event_funnel` (per USER, unbounded time) and
    :func:`sessionize` separately approximate: ``(step, step_name,
    n_sessions)`` where a session counts for step ``i`` iff it
    contains the whole step prefix at strictly increasing times
    (``t_i = min event time of steps[i] after t_{i-1}``, the
    :func:`event_funnel` recurrence, scoped to the session).

    Scale shape — ONE shuffle total: the session labels come out of
    :func:`sessionize`'s ``key_col`` window (event type rides along
    via ``keep_cols``, no join back), and every funnel stage is a
    conditional ``min`` window over ``(key, session_n)`` — a
    REFINEMENT of the key partitioning, so Spark reuses the existing
    exchange and only re-sorts; no per-step joins, no per-step scans
    (contrast event_funnel's per-step source scans, which are the
    right trade only when steps hit disjoint source partitions).  The
    final counts are one partial-agg groupBy + a 1-row aggregate,
    unpivoted with ``stack``."""
    if not steps:
        raise ValueError("steps must be non-empty")
    if any("'" in s or "\\" in s for s in steps):
        # step names become string literals inside the stack() unpivot
        raise ValueError("step names must not contain quotes or "
                         "backslashes")
    lab = sessionize(events, key_col=key_col, ts_col=ts_col,
                     id_col=id_col, gap_us=gap_us,
                     keep_cols=[type_col])
    wsn = Window.partitionBy(key_col, "session_n")
    d = lab
    for i, step in enumerate(steps, start=1):
        cond = F.col(type_col) == step
        if i > 1:
            cond = cond & (F.col("ts_us") > F.col(f"__t{i - 1}"))
        d = d.withColumn(
            f"__t{i}", F.min(F.when(cond, F.col("ts_us"))).over(wsn))
    per = (d.groupBy(key_col, "session_n")
           .agg(*[F.min(f"__t{i}").alias(f"__t{i}")
                  for i in range(1, len(steps) + 1)]))
    counts = per.agg(*[F.count(f"__t{i}").alias(f"__c{i}")
                       for i in range(1, len(steps) + 1)])
    stack_args = ", ".join(
        f"{i}, '{s}', __c{i}" for i, s in enumerate(steps, start=1))
    return counts.selectExpr(
        f"stack({len(steps)}, {stack_args}) "
        "AS (step, step_name, n_sessions)").select(
        F.col("step").cast("long").alias("step"),
        "step_name",
        F.col("n_sessions").cast("long").alias("n_sessions"))


def session_transitions(events: DataFrame, key_col: str = "user_id",
                        ts_col: str = "ts", id_col: str = "event_id",
                        type_col: str = "event_type",
                        gap_us: int = 1800 * 1_000_000) -> DataFrame:
    """Markov transition matrix of event types WITHIN sessions:
    ``(from_type, to_type, n_trans, p_x1e6)`` counting consecutive
    event pairs of the same key whose gap is within the session
    threshold — the user-journey / next-action model product analytics
    fits on a clickstream (and the n-gram analogue over action
    sequences).

    A transition exists between an event and the key's previous event
    iff ``ts_us - prev_ts_us <= gap_us`` (the same strict-greater
    boundary as :func:`sessionize`, so transition pairs are exactly
    the within-session adjacencies).  ``p_x1e6 = n_trans * 1e6 DIV
    row-total of from_type`` — one truncating integer division per
    cell, exact cross-engine.  NULL keys/timestamps/types are out of
    contract and dropped in-plan.

    Scale shape (100 TB): one shuffle on ``key_col`` for the lag
    window, then a partial-agg groupBy onto the tiny |types|^2 grid
    and a broadcast join against the |types|-row totals — no driver
    pulls, no second full-data window."""
    if gap_us < 1:
        raise ValueError("gap_us must be >= 1")
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    w = Window.partitionBy(key_col).orderBy("__us", id_col)
    base = (events.filter(F.col(key_col).isNotNull()
                          & F.col(ts_col).isNotNull()
                          & F.col(type_col).isNotNull())
            .select(F.col(key_col), F.col(id_col),
                    F.col(type_col).alias("__t"), us.alias("__us")))
    pairs = (base
             .withColumn("__pt", F.lag("__t", 1).over(w))
             .withColumn("__pus", F.lag("__us", 1).over(w))
             .filter(F.col("__pt").isNotNull()
                     & (F.col("__us") - F.col("__pus")
                        <= F.lit(int(gap_us)))))
    cells = (pairs.groupBy(F.col("__pt").alias("from_type"),
                           F.col("__t").alias("to_type"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_trans")))
    totals = (cells.groupBy("from_type")
              .agg(F.sum("n_trans").alias("__tot")))
    return (cells.join(F.broadcast(totals), "from_type")
            .select("from_type", "to_type", "n_trans",
                    F.expr("n_trans * 1000000 DIV __tot")
                     .cast("long").alias("p_x1e6")))


def cohort_retention(df: DataFrame, ts_col: str = "ts",
                     user_col: str = "user_id",
                     period_us: int = 7 * 86400 * 1_000_000) -> DataFrame:
    """Cohort retention matrix: group users by their FIRST-active period
    (the cohort), then count how many of each cohort were active again
    ``k`` periods later — the classic product-analytics triangle chart.

    Returns ``(cohort_period, period_offset, n_users, cohort_size,
    retention_x1e4)`` with one row per (cohort, offset) that had any
    activity; ``period_offset = 0`` rows carry the cohort definition
    itself (``n_users == cohort_size``, retention 10000).

    Determinism recipe: periods are pure integer arithmetic —
    ``epoch_micros(ts) DIV period_us`` (truncating division; Spark DIV
    and DuckDB ``//`` both truncate toward zero, verified, so the
    engines agree on every sign) — and the retention ratio is one
    truncating integer division, so the whole matrix value-hashes
    cross-engine.  Pre-1970 timestamps (negative epoch micros) are OUT
    OF CONTRACT and filtered in-plan: truncation makes the period-0
    window double-width around the epoch ((-period, period) collapses
    to one bucket), which would skew cohort assignment — the operator
    keeps only rows with non-negative raw epoch micros (pytest-pinned).

    Scale shape (100 TB of events): one distinct over (user, period)
    — partial-aggregated, the natural dedup of per-user event bursts —
    one min-per-user aggregate for cohorts, one join back on user_col,
    and one final count_distinct.  Shuffles key on user and on the
    tiny (cohort, offset) grid; no windows, no driver pulls."""
    if period_us < 1:
        raise ValueError("period_us must be >= 1")
    us = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP))")
    p = F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) "
               f"DIV {int(period_us)}")
    # the scope filter is on the RAW epoch, not on p: a negative epoch in
    # (-period_us, 0) truncates to p = 0 and would sneak into the
    # double-width bucket a p >= 0 filter cannot see
    act = (df.select(F.col(user_col).alias("u"), p.alias("p"), us.alias("__us"))
             .filter(F.col("u").isNotNull() & F.col("p").isNotNull()
                     & (F.col("__us") >= 0))
             .drop("__us")
             .distinct())
    cohort = act.groupBy("u").agg(F.min("p").alias("c"))
    sizes = cohort.groupBy("c").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size"))
    ret = (act.join(cohort, "u")
           .groupBy(F.col("c").alias("cohort_period"),
                    (F.col("p") - F.col("c")).alias("period_offset"))
           .agg(F.count_distinct("u").cast("long").alias("n_users")))
    return (ret.join(sizes.withColumnRenamed("c", "cohort_period"),
                     "cohort_period")
            .select(F.col("cohort_period").cast("long"),
                    F.col("period_offset").cast("long"),
                    "n_users", "cohort_size",
                    F.expr("(n_users * 10000) DIV cohort_size")
                     .cast("long").alias("retention_x1e4")))


def _binary_label(label_col: str):
    """0/1-validated long label column (the classifier_auc contract:
    in-plan raise on anything else, so a mislabeled frame fails loudly
    instead of silently skewing the metric)."""
    lab = F.col(label_col)
    return (F.when((lab == 0) | (lab == 1), lab.cast("long"))
            .otherwise(F.raise_error(F.lit(
                "labels must be 0/1")).cast("long")))


def _prob_x(score_col: str, scale: int):
    """round(score * scale) as an exact long, range-validated in-plan
    to [0, scale] — a probability outside [0,1] is a caller bug
    (un-sigmoided logit, wrong column) that must not silently land in
    the edge bins.  A NULL score raises too (the NULL comparison
    falls through to the raise branch): an unscored row in a
    calibration frame is the same caller bug, not a droppable row —
    filter upstream if absent scores are expected."""
    sq = F.round(F.col(score_col).cast("double") * int(scale)) \
          .cast("long")
    return (F.when((sq >= 0) & (sq <= int(scale)), sq)
            .otherwise(F.raise_error(F.lit(
                f"score must be a probability in [0, 1] "
                f"(round(score*{int(scale)}) out of range)"))
                .cast("long")))


def calibration_report(df: DataFrame, score_col: str, label_col: str,
                       bins: int = 10, group_col: str | None = None,
                       scale: int = 1_000_000) -> DataFrame:
    """Reliability diagram of a probability score against binary
    labels, per group or globally: ``(group?, bin, n, n_pos,
    mean_score_x, pos_rate_x, gap_x)`` — the calibration companion of
    :func:`classifier_auc` (AUC says the classifier RANKS well;
    calibration says its probabilities MEAN what they say, the gate
    before scores become sampling weights or accept thresholds in a
    curation pipeline).

    Integer-exact recipe: scores quantize in-plan to
    ``round(score*scale)`` longs (range-validated to [0, scale] — an
    un-sigmoided logit raises instead of saturating an edge bin);
    equal-width bin ``least(bins-1, sq*bins DIV scale)`` so bin i
    covers [i/bins, (i+1)/bins) with 1.0 closed into the last bin;
    per-bin ``mean_score_x = sum(sq) DIV n`` and ``pos_rate_x =
    n_pos*scale DIV n`` are single truncating divisions of exact
    longs, and ``gap_x = abs(sum(sq) - n_pos*scale) DIV n`` is the
    EXACT |confidence - accuracy| (one division of the exact integer
    numerator, not a difference of two truncated ratios).

    Overflow: ``sum(sq)`` and ``n_pos*scale`` are O(n*scale) per bin —
    both run through DECIMAL(38,0) intermediates (the classifier_auc
    convention) so a trillion-row bin cannot wrap int64 silently.

    Scale shape: ONE partial-agg groupBy onto (group, bin) — the
    output frame is |groups| x bins regardless of corpus size; no
    windows, no joins, no driver pulls."""
    if bins < 1:
        raise ValueError("calibration_report: bins must be >= 1")
    if int(scale) < 1:
        raise ValueError("calibration_report: scale must be >= 1")
    g = [group_col] if group_col is not None else []
    sq = _prob_x(score_col, scale)
    b = F.least(F.lit(int(bins) - 1),
                F.expr(f"__sq * {int(bins)} DIV {int(scale)}")) \
         .cast("long")
    c = (df.select(*g, sq.alias("__sq"),
                   _binary_label(label_col).alias("__l"))
         .withColumn("bin", b)
         .groupBy(*g, "bin")
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("__l").cast("long").alias("n_pos"),
              F.sum(F.col("__sq").cast("decimal(38,0)")).alias("__ss")))
    return (c.select(
        *g, "bin", "n", "n_pos",
        F.expr("__ss DIV n").cast("long").alias("mean_score_x"),
        F.expr(f"CAST(n_pos AS DECIMAL(38,0)) * {int(scale)} DIV n")
         .cast("long").alias("pos_rate_x"),
        F.expr(f"abs(__ss - CAST(n_pos AS DECIMAL(38,0)) "
               f"* {int(scale)}) DIV n")
         .cast("long").alias("gap_x")))


def calibration_summary(df: DataFrame, score_col: str, label_col: str,
                        bins: int = 10, group_col: str | None = None,
                        scale: int = 1_000_000) -> DataFrame:
    """One-row-per-group calibration scorecard: ``(group?, n,
    pos_rate_x, ece_x, brier_x)`` — expected calibration error over
    ``bins`` equal-width bins plus the Brier score, both in units of
    ``1/scale`` (Naeini et al. 2015's ECE; Brier 1950).

    Integer-exact: ECE's per-bin term ``(n_b/N)*|acc_b - conf_b|``
    telescopes to ``|sum(sq)_b - n_pos_b*scale| / N`` — the per-bin
    absolute integer numerators sum exactly and ONE truncating
    division by N produces ``ece_x``; ``brier_x = sum((sq -
    l*scale)^2) DIV (N*scale)``, an exact integer sum of squares
    (each term <= scale^2) over one more partial agg.  Both sums run
    through DECIMAL(38,0) (sum of 1e12-sized squares wraps int64 past
    ~9e6 rows — far below corpus scale).

    Scale shape: one partial-agg groupBy onto (group, bin), one
    partial-agg rollup to (group) — both frames bounded by
    |groups| x bins; no windows, no driver pulls."""
    if bins < 1:
        raise ValueError("calibration_summary: bins must be >= 1")
    if int(scale) < 1:
        raise ValueError("calibration_summary: scale must be >= 1")
    g = [group_col] if group_col is not None else []
    sq = _prob_x(score_col, scale)
    b = F.least(F.lit(int(bins) - 1),
                F.expr(f"__sq * {int(bins)} DIV {int(scale)}")) \
         .cast("long")
    per_bin = (df.select(*g, sq.alias("__sq"),
                         _binary_label(label_col).alias("__l"))
               .withColumn("__b", b)
               .groupBy(*g, "__b")
               .agg(F.count(F.lit(1)).cast("long").alias("__n"),
                    F.sum("__l").cast("long").alias("__p"),
                    F.sum(F.col("__sq").cast("decimal(38,0)"))
                     .alias("__ss"),
                    F.sum(((F.col("__sq") - F.col("__l") * int(scale))
                           * (F.col("__sq") - F.col("__l")
                              * int(scale))).cast("decimal(38,0)"))
                     .alias("__sq2")))
    tot = (per_bin.groupBy(*g)
           .agg(F.sum("__n").cast("long").alias("n"),
                F.sum("__p").cast("long").alias("__np"),
                F.sum(F.expr(f"abs(__ss - CAST(__p AS DECIMAL(38,0)) "
                             f"* {int(scale)})")).alias("__ece_num"),
                F.sum("__sq2").alias("__br_num")))
    return (tot.select(
        *g, "n",
        F.expr(f"CAST(__np AS DECIMAL(38,0)) * {int(scale)} DIV n")
         .cast("long").alias("pos_rate_x"),
        F.expr("__ece_num DIV n").cast("long").alias("ece_x"),
        F.expr(f"__br_num DIV (CAST(n AS DECIMAL(38,0)) "
               f"* {int(scale)})").cast("long").alias("brier_x")))


def pr_threshold_stats(df: DataFrame, score_col: str, label_col: str,
                       group_col: str | None = None,
                       quantize_x: int | None = None) -> DataFrame:
    """Full precision/recall/F1 sweep over every distinct score
    threshold, per group or globally: ``(group?, threshold, tp, fp,
    fn, precision_x1e6, recall_x1e6, f1_x1e6)`` where a row means
    "predict positive when score >= threshold" — the operating-point
    companion of :func:`classifier_auc` (AUC summarizes the whole
    curve; this is the curve, for picking the accept threshold a
    curation filter will actually run).

    Tie-correct and integer-exact: the corpus reduces to per-(group,
    distinct score) positive/negative counts (the classifier_auc
    frame — bounded by score QUANTIZATION, not row count; pass
    ``quantize_x`` to bucket raw continuous scores in-plan, same
    contract as classifier_auc); tp/fp are cumulative sums DESCENDING
    over that reduced frame; ``precision_x1e6 = tp*1e6 DIV (tp+fp)``,
    ``recall_x1e6 = tp*1e6 DIV P``, and ``f1_x1e6 = 2*tp*1e6 DIV
    (2*tp + fp + fn)`` (the harmonic mean in ONE exact truncating
    division, not composed from the rounded P and R).  Groups with no
    positive row are EXCLUDED (recall undefined — the one-class
    contract).  Numerators run through DECIMAL(38,0) (tp*2e6 wraps
    int64 past ~4.6e12 positives).

    Scale shape: one partial-agg groupBy onto (group, distinct
    score), one cumulative window + one unbounded total over that
    reduced frame — no joins, no driver pulls."""
    if quantize_x is None:
        score = F.col(score_col)
    else:
        if int(quantize_x) < 1:
            raise ValueError("pr_threshold_stats: quantize_x must "
                             "be >= 1")
        score = F.round(F.col(score_col).cast("double")
                        * int(quantize_x)).cast("long")
    g = [group_col] if group_col is not None else []
    c = (df.select(*g, score.alias("__s"),
                   _binary_label(label_col).alias("__l"))
         .groupBy(*g, "__s")
         .agg(F.sum("__l").cast("long").alias("__p"),
              F.sum(1 - F.col("__l")).cast("long").alias("__q")))
    wcum = (Window.partitionBy(*g).orderBy(F.desc("__s"))
            .rowsBetween(Window.unboundedPreceding, 0))
    wall = (Window.partitionBy(*g)
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    c = (c.withColumn("tp", F.sum("__p").over(wcum).cast("long"))
          .withColumn("fp", F.sum("__q").over(wcum).cast("long"))
          .withColumn("__P", F.sum("__p").over(wall).cast("long")))
    return (c.filter(F.col("__P") > 0)
            .select(*g, F.col("__s").alias("threshold"), "tp", "fp",
                    (F.col("__P") - F.col("tp")).alias("fn"),
                    F.expr("CAST(tp AS DECIMAL(38,0)) * 1000000 "
                           "DIV (tp + fp)").cast("long")
                     .alias("precision_x1e6"),
                    F.expr("CAST(tp AS DECIMAL(38,0)) * 1000000 "
                           "DIV __P").cast("long").alias("recall_x1e6"),
                    F.expr("CAST(tp AS DECIMAL(38,0)) * 2000000 DIV "
                           "(2 * tp + fp + (__P - tp))").cast("long")
                     .alias("f1_x1e6")))


def label_agreement(df: DataFrame, item_col: str, label_col: str,
                    min_votes: int = 1) -> DataFrame:
    """Majority vote + agreement rate per item over an annotation
    table: ``(item, n_votes, n_labels, majority_label, majority_n,
    agreement_x1e6)`` — the label-aggregation step of every
    human-feedback / LLM-judge pipeline (N raters or N judge samples
    per item; keep the modal label, and the agreement rate is the
    per-item confidence the downstream filter thresholds on).

    Deterministic tiebreak: the majority label is row_number() = 1 by
    (count DESC, label ASC) — label ASC in the label column's OWN
    ordering (type preserved, the connected_components convention).
    NULL labels are EXCLUDED before counting (an abstaining rater is
    not a vote — documented contract); items with < ``min_votes``
    remaining votes are dropped.  ``agreement_x1e6 = majority_n*1e6
    DIV n_votes`` is one exact truncating division.

    Scale shape: one partial-agg groupBy onto (item, label) — the
    frame is votes-per-item bounded, tiny next to the corpus — then
    one window + filter on that reduced frame (the second exchange
    keys the reduced frame on item only).  No joins, no driver
    pulls."""
    if min_votes < 1:
        raise ValueError("label_agreement: min_votes must be >= 1")
    c = (df.filter(F.col(label_col).isNotNull())
         .groupBy(F.col(item_col).alias("item"),
                  F.col(label_col).alias("majority_label"))
         .agg(F.count(F.lit(1)).cast("long").alias("majority_n")))
    w = Window.partitionBy("item")
    wr = (Window.partitionBy("item")
          .orderBy(F.desc("majority_n"), F.asc("majority_label")))
    out = (c.withColumn("n_votes", F.sum("majority_n").over(
               w.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)).cast("long"))
           .withColumn("n_labels", F.count(F.lit(1)).over(
               w.rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing)).cast("long"))
           .withColumn("__rn", F.row_number().over(wr))
           .filter((F.col("__rn") == 1)
                   & (F.col("n_votes") >= int(min_votes))))
    return out.select("item", "n_votes", "n_labels", "majority_label",
                      "majority_n",
                      F.expr("majority_n * 1000000 DIV n_votes")
                       .cast("long").alias("agreement_x1e6"))


def signal_corr(df: DataFrame, x_col: str, y_col: str,
                group_col: str | None = None,
                method: str = "pearson",
                quantize_x: int | None = None,
                quantize_y: int | None = None) -> DataFrame:
    """Correlation between two quality signals, per group or globally:
    ``(group?, n, rho)`` — Pearson on the (integer-valued) signals, or
    Spearman (tie-averaged ranks) on their order — the standard check
    before one signal substitutes for another in a curation pipeline
    (does the cheap heuristic track the expensive classifier per
    language?).

    Both methods reduce the corpus to per-(group, distinct x, distinct
    y) counts FIRST — one partial-agg groupBy, the classifier_auc
    reduced-frame contract: bounded by the signals' QUANTIZATION, not
    the row count (pass ``quantize_x``/``quantize_y`` to bucket raw
    doubles in-plan via ``round(col * q)``; integer-quantized repo
    signals pass through exactly).  Spearman's tie-averaged rank never
    materializes per row: the 2x-rank of a distinct value v is
    ``2*cnt_less(v) + cnt_eq(v) + 1`` — a cumulative window over the
    per-(group, value) MARGINAL frame, joined back to the joint frame
    (the factor 2 keeps it integer and cancels in rho).  So no
    ``Window.partitionBy(group)`` ever sorts a mega-key group's rows
    (the grouped_rank lesson), and no rank array is row-sized.

    All moment sums (n, Sx, Sy, Sxx, Syy, Sxy — count-weighted over
    the reduced frame) are exact DECIMAL(38,0) integers; rho is
    computed in doubles from those exact components and rounded to
    4dp at the OUTPUT only (the house float recipe).  Headroom: the
    binding term is the FINAL covariance numerator ``n*Sxy - Sx*Sy``
    — O(4*n^4) for Spearman's 2x-ranks, so the rank path is exact to
    ~7e8 rows per GROUP inside DECIMAL(38,0)/HUGEINT (an eval-sized
    bound; sample or shard beyond it); every Pearson term is bounded
    by ``(n*max|x|) * (n*max|y|)``, so keep ``n * max|signal|``
    under ~3e18 per group (quantize coarser or sample when the
    corpus pushes past it).  Groups where either signal is CONSTANT
    have
    undefined rho and are EXCLUDED (the one-class AUC convention).
    NULL in either signal drops the row (documented).

    Scale shape: one corpus-pass partial-agg groupBy; two cumulative
    windows + two un-hinted joins on the reduced frames; one final
    partial-agg rollup.  No driver pulls."""
    if method not in ("pearson", "spearman"):
        raise ValueError("signal_corr: method must be 'pearson' or "
                         "'spearman'")
    def _q(col, q, name):
        if q is None:
            return F.col(col)
        if int(q) < 1:
            raise ValueError(f"signal_corr: {name} must be >= 1")
        return F.round(F.col(col).cast("double") * int(q)).cast("long")
    g = [group_col] if group_col is not None else []
    joint = (df.select(*g, _q(x_col, quantize_x, "quantize_x")
                       .alias("__x"),
                       _q(y_col, quantize_y, "quantize_y").alias("__y"))
             .filter(F.col("__x").isNotNull()
                     & F.col("__y").isNotNull())
             .groupBy(*g, "__x", "__y")
             .agg(F.count(F.lit(1)).cast("long").alias("__c")))
    if method == "spearman":
        def _rank2(frame, col, out):
            marg = (frame.groupBy(*g, col)
                    .agg(F.sum("__c").cast("long").alias("__m")))
            w = (Window.partitionBy(*g).orderBy(col)
                 .rowsBetween(Window.unboundedPreceding, -1))
            return (marg.withColumn(
                out, (2 * F.coalesce(F.sum("__m").over(w),
                                     F.lit(0))
                      + F.col("__m") + 1).cast("long"))
                .select(*g, col, out))
        joint = (joint
                 .join(_rank2(joint, "__x", "__rx"), [*g, "__x"])
                 .join(_rank2(joint, "__y", "__ry"), [*g, "__y"])
                 .select(*g, F.col("__rx").alias("__x"),
                         F.col("__ry").alias("__y"), "__c"))
    dec = "decimal(38,0)"
    m = (joint.groupBy(*g)
         .agg(F.sum("__c").cast("long").alias("n"),
              F.sum((F.col("__c") * F.col("__x")).cast(dec))
               .alias("__sx"),
              F.sum((F.col("__c") * F.col("__y")).cast(dec))
               .alias("__sy"),
              F.sum((F.col("__c").cast(dec) * F.col("__x")
                     * F.col("__x"))).alias("__sxx"),
              F.sum((F.col("__c").cast(dec) * F.col("__y")
                     * F.col("__y"))).alias("__syy"),
              F.sum((F.col("__c").cast(dec) * F.col("__x")
                     * F.col("__y"))).alias("__sxy")))
    num = F.expr("CAST(n AS DECIMAL(38,0)) * __sxy - __sx * __sy")
    dx = F.expr("CAST(n AS DECIMAL(38,0)) * __sxx - __sx * __sx")
    dy = F.expr("CAST(n AS DECIMAL(38,0)) * __syy - __sy * __sy")
    return (m.withColumn("__num", num).withColumn("__dx", dx)
            .withColumn("__dy", dy)
            .filter((F.col("__dx") > 0) & (F.col("__dy") > 0))
            .select(*g, "n",
                    F.round(F.col("__num").cast("double")
                            / (F.sqrt(F.col("__dx").cast("double"))
                               * F.sqrt(F.col("__dy").cast("double"))),
                            4).alias("rho")))


def confusion_report(df: DataFrame, pred_col: str, gold_col: str,
                     group_col: str | None = None) -> DataFrame:
    """Per-class classification scorecard from a predicted-vs-gold
    table: ``(group?, label, n_gold, n_pred, tp, precision_x1e6,
    recall_x1e6, f1_x1e6)`` — one row per class that appears in
    EITHER column (a class the model never predicts still reports
    recall 0; a hallucinated class still reports precision 0) — the
    acceptance gate for a multi-class quality/topic/language
    classifier before its labels drive routing or mixture weights.

    Integer-exact: the corpus reduces to per-(group, pred, gold)
    counts — one partial-agg groupBy, the reduced frame is bounded by
    |classes|^2 per group; marginals (n_pred, n_gold) and diagonal tp
    come from that frame with two more partial aggs and one full
    outer join on the class label (the either-column contract);
    ``precision_x1e6 = tp*1e6 DIV n_pred`` (0 when n_pred = 0),
    ``recall_x1e6 = tp*1e6 DIV n_gold`` (0 when n_gold = 0), and
    ``f1_x1e6 = 2*tp*1e6 DIV (n_pred + n_gold)`` — the harmonic mean
    in ONE truncating division of exact longs (n_pred + n_gold > 0
    always holds by the either-column contract).  DECIMAL(38,0)
    intermediates for the x1e6 products.  NULL in pred or gold drops
    the row (an unlabeled example is not a prediction — documented);
    the label column keeps the input columns' own type (the
    connected_components convention; pred and gold must be the same
    type).

    Scale shape: one corpus-pass partial-agg groupBy; everything
    after rides the |classes|^2-bounded frame.  No windows over raw
    rows, no driver pulls."""
    g = [group_col] if group_col is not None else []
    c = (df.filter(F.col(pred_col).isNotNull()
                   & F.col(gold_col).isNotNull())
         .groupBy(*g, F.col(pred_col).alias("__p"),
                  F.col(gold_col).alias("__g"))
         .agg(F.count(F.lit(1)).cast("long").alias("__c")))
    c = c.localCheckpoint(eager=False)
    pred = (c.groupBy(*g, F.col("__p").alias("label"))
            .agg(F.sum("__c").cast("long").alias("n_pred"),
                 F.sum(F.when(F.col("__p") == F.col("__g"),
                              F.col("__c")).otherwise(0))
                  .cast("long").alias("__tp_p")))
    gold = (c.groupBy(*g, F.col("__g").alias("label"))
            .agg(F.sum("__c").cast("long").alias("n_gold")))
    joined = pred.join(gold, [*g, "label"], "full_outer")
    return (joined.select(
        *g, "label",
        F.coalesce("n_gold", F.lit(0).cast("long")).alias("n_gold"),
        F.coalesce("n_pred", F.lit(0).cast("long")).alias("n_pred"),
        F.coalesce("__tp_p", F.lit(0).cast("long")).alias("tp"))
        .select(*g, "label", "n_gold", "n_pred", "tp",
                F.when(F.col("n_pred") == 0, F.lit(0).cast("long"))
                 .otherwise(F.expr("CAST(tp AS DECIMAL(38,0)) "
                                   "* 1000000 DIV n_pred")
                            .cast("long")).alias("precision_x1e6"),
                F.when(F.col("n_gold") == 0, F.lit(0).cast("long"))
                 .otherwise(F.expr("CAST(tp AS DECIMAL(38,0)) "
                                   "* 1000000 DIV n_gold")
                            .cast("long")).alias("recall_x1e6"),
                F.expr("CAST(tp AS DECIMAL(38,0)) * 2000000 "
                       "DIV (n_pred + n_gold)").cast("long")
                 .alias("f1_x1e6")))


def concentration_report(df: DataFrame, key_col: str,
                         group_col: str | None = None,
                         top_n: int = 4) -> DataFrame:
    """Concentration data card over a categorical key, per group or
    globally: ``(group?, n, n_keys, hhi_x1e6, top_share_x1e6,
    cr{top_n}_x1e6)`` — the Herfindahl-Hirschman index, the single
    largest key's share, and the top-``top_n`` combined share — the
    "is one crawl/source/domain dominating this slice?" gate a
    mixture designer checks before trusting per-group statistics
    (HHI 1e6/n_keys = perfectly even; 1e6 = one key owns
    everything).

    Integer-exact: the corpus reduces to per-(group, key) counts —
    one partial-agg groupBy; ``hhi_x1e6 = sum(cnt^2) * 1e6 DIV
    total^2`` is ONE truncating division of exact integers (not a
    sum of per-key rounded shares); the top-share and CR numerators
    come from one (cnt DESC, key ASC) row_number window over the
    REDUCED frame.  DECIMAL(38,0) intermediates throughout (sum of
    squared counts wraps int64 past ~3e9 rows in one key).  NULL
    keys are excluded before counting (documented — an unattributed
    row has no source).

    Scale shape: one corpus-pass partial-agg groupBy; one window +
    one rollup on the keys-per-group-bounded frame.  No driver
    pulls."""
    if top_n < 1:
        raise ValueError("concentration_report: top_n must be >= 1")
    g = [group_col] if group_col is not None else []
    c = (df.filter(F.col(key_col).isNotNull())
         .groupBy(*g, F.col(key_col).alias("__k"))
         .agg(F.count(F.lit(1)).cast("long").alias("__c")))
    w = (Window.partitionBy(*g)
         .orderBy(F.desc("__c"), F.asc("__k")))
    c = c.withColumn("__rn", F.row_number().over(w))
    tot = (c.groupBy(*g)
           .agg(F.sum("__c").cast("long").alias("n"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum((F.col("__c").cast("decimal(38,0)")
                       * F.col("__c"))).alias("__sq"),
                F.max(F.when(F.col("__rn") == 1, F.col("__c")))
                 .cast("long").alias("__top1"),
                F.sum(F.when(F.col("__rn") <= int(top_n),
                             F.col("__c")).otherwise(0))
                 .cast("long").alias("__topn")))
    return (tot.select(
        *g, "n", "n_keys",
        F.expr("__sq * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * n)")
         .cast("long").alias("hhi_x1e6"),
        F.expr("CAST(__top1 AS DECIMAL(38,0)) * 1000000 DIV n")
         .cast("long").alias("top_share_x1e6"),
        F.expr("CAST(__topn AS DECIMAL(38,0)) * 1000000 DIV n")
         .cast("long").alias(f"cr{int(top_n)}_x1e6")))


def trimmed_stats(df: DataFrame, value_col: str,
                  group_col: str | None = None,
                  trim_lo_x1000: int = 50,
                  trim_hi_x1000: int = 50) -> DataFrame:
    """Robust per-group location stats: ``(group?, n, n_kept, lo_cut,
    hi_cut, trimmed_mean_x, winsor_mean_x)`` — the mean after
    DROPPING the lowest/highest ``trim_*_x1000/1000`` rank fractions
    (trimmed) and after CLAMPING them to the cut values (winsorized)
    — the outlier-robust readouts for loss/length/score columns where
    a plain mean chases corrupted tails.

    Exact integer recipe on the per-(group, distinct value) reduced
    frame (the classifier_auc contract — values must be
    integer-valued; quantize upstream): each distinct value occupies
    the rank interval ``[cum_before+1, cum_before+cnt]``, the kept
    rank window is ``[floor(n*lo/1000)+1, n - floor(n*hi/1000)]``,
    and a value's kept multiplicity is the INTERVAL OVERLAP — so the
    trimmed sum needs no per-row rank, no row-level sort, just one
    cumulative window over the reduced frame.  ``lo_cut``/``hi_cut``
    are the values whose intervals contain the window's endpoints
    (the classic winsorizing boundaries); ``winsor_mean_x =
    (kept_sum + lo_cut*(LB-1) + hi_cut*(n-UB)) DIV n`` and
    ``trimmed_mean_x = kept_sum DIV n_kept`` are single truncating
    divisions of DECIMAL(38,0)-exact sums.  A group whose kept window
    is empty (over-trimmed) is EXCLUDED (documented, the one-class
    convention).  NULL values drop their row.

    Scale shape: one corpus-pass partial-agg groupBy; one cumulative
    window + one rollup on the quantization-bounded frame.  No
    driver pulls."""
    for nm, v in (("trim_lo_x1000", trim_lo_x1000),
                  ("trim_hi_x1000", trim_hi_x1000)):
        if not 0 <= int(v) < 1000:
            raise ValueError(f"trimmed_stats: {nm} must be in "
                             "[0, 1000)")
    lo, hi = int(trim_lo_x1000), int(trim_hi_x1000)
    g = [group_col] if group_col is not None else []
    c = (df.filter(F.col(value_col).isNotNull())
         .select(*g, F.col(value_col).cast("long").alias("__v"))
         .groupBy(*g, "__v")
         .agg(F.count(F.lit(1)).cast("long").alias("__c")))
    wcum = (Window.partitionBy(*g).orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, -1))
    wall = (Window.partitionBy(*g)
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    c = (c.withColumn("__before", F.coalesce(
            F.sum("__c").over(wcum), F.lit(0).cast("long")))
         .withColumn("__n", F.sum("__c").over(wall).cast("long")))
    lb = (F.expr(f"__n * {lo} DIV 1000") + 1).cast("long")
    ub = (F.col("__n") - F.expr(f"__n * {hi} DIV 1000")).cast("long")
    kept = (F.greatest(F.lit(0).cast("long"),
                       F.least(F.col("__before") + F.col("__c"), ub)
                       - F.greatest(F.col("__before") + 1, lb) + 1))
    c = (c.withColumn("__lb", lb).withColumn("__ub", ub)
         .withColumn("__kept", kept))
    out = (c.groupBy(*g)
           .agg(F.max("__n").alias("n"),
                F.max("__lb").alias("__LB"),
                F.max("__ub").alias("__UB"),
                F.sum("__kept").cast("long").alias("n_kept"),
                F.sum((F.col("__kept").cast("decimal(38,0)")
                       * F.col("__v"))).alias("__ksum"),
                F.max(F.when(
                    (F.col("__before") < F.col("__lb"))
                    & (F.col("__before") + F.col("__c")
                       >= F.col("__lb")), F.col("__v")))
                 .cast("long").alias("lo_cut"),
                F.max(F.when(
                    (F.col("__before") < F.col("__ub"))
                    & (F.col("__before") + F.col("__c")
                       >= F.col("__ub")), F.col("__v")))
                 .cast("long").alias("hi_cut")))
    return (out.filter(F.col("n_kept") > 0)
            .select(*g, "n", "n_kept", "lo_cut", "hi_cut",
                    F.expr("__ksum DIV n_kept").cast("long")
                     .alias("trimmed_mean_x"),
                    F.expr("(__ksum + CAST(lo_cut AS DECIMAL(38,0)) "
                           "* (__LB - 1) "
                           "+ CAST(hi_cut AS DECIMAL(38,0)) "
                           "* (n - __UB)) DIV n").cast("long")
                     .alias("winsor_mean_x")))


def cohen_kappa(df: DataFrame, rater_a_col: str, rater_b_col: str,
                group_col: str | None = None,
                scale: int = 1_000_000) -> DataFrame:
    """Cohen's kappa between two raters/judges over a labeled table,
    per group or globally: ``(group?, n, po_x, pe_x, kappa_x)`` —
    chance-corrected agreement, the standard "are two annotators (or
    an LLM judge vs the human gold) agreeing beyond luck" gate that
    raw agreement (:func:`label_agreement`) overstates whenever one
    label dominates.

    Exact integer recipe: ``kappa = (po - pe) / (1 - pe)`` clears
    denominators to ``kappa_x = (n*D - P) * scale DIV (n*n - P)``
    where ``D = sum of diagonal counts`` and ``P = sum over labels of
    rowmarginal*colmarginal`` — every term an exact integer off the
    per-(group, a, b) reduced frame (one corpus-pass partial agg, the
    classifier_auc contract: bounded by the label alphabet, not
    rows); ``po_x``/``pe_x`` are reported alongside as their own
    single truncating divisions.  Negative kappa (worse than chance)
    comes out naturally — both engines' integer division truncates
    toward zero, verified.  Groups with ``n*n == P`` (both raters
    constant — kappa undefined) are EXCLUDED, the one-class
    convention; a NULL from either rater drops the row (an
    abstention is not a rating).  DECIMAL(38,0) intermediates (the
    marginal products are O(n^2): exact to ~5e15 rows per group).

    Scale shape: one corpus-pass partial-agg groupBy; two marginal
    rollups + one equi-join + one rollup on the alphabet-bounded
    frame.  No windows over raw rows, no driver pulls."""
    if int(scale) < 1:
        raise ValueError("cohen_kappa: scale must be >= 1")
    g = [group_col] if group_col is not None else []
    c = (df.filter(F.col(rater_a_col).isNotNull()
                   & F.col(rater_b_col).isNotNull())
         .groupBy(*g, F.col(rater_a_col).alias("__a"),
                  F.col(rater_b_col).alias("__b"))
         .agg(F.count(F.lit(1)).cast("long").alias("__c")))
    c = c.localCheckpoint(eager=False)
    rowm = (c.groupBy(*g, F.col("__a").alias("__l"))
            .agg(F.sum("__c").cast("long").alias("__ra")))
    colm = (c.groupBy(*g, F.col("__b").alias("__l"))
            .agg(F.sum("__c").cast("long").alias("__rb")))
    pe = (rowm.join(colm, [*g, "__l"])
          .groupBy(*g)
          .agg(F.sum(F.col("__ra").cast("decimal(38,0)")
                     * F.col("__rb")).alias("__P")))
    tot = (c.groupBy(*g)
           .agg(F.sum("__c").cast("long").alias("n"),
                F.sum(F.when(F.col("__a") == F.col("__b"),
                             F.col("__c")).otherwise(0))
                 .cast("long").alias("__D")))
    return (tot.join(pe, g) if g else tot.crossJoin(pe)) \
        .filter(F.expr("CAST(n AS DECIMAL(38,0)) * n") != F.col("__P")) \
        .select(*g, "n",
                F.expr(f"CAST(__D AS DECIMAL(38,0)) * {int(scale)} "
                       "DIV n").cast("long").alias("po_x"),
                F.expr(f"__P * {int(scale)} DIV "
                       "(CAST(n AS DECIMAL(38,0)) * n)")
                 .cast("long").alias("pe_x"),
                F.expr(f"(CAST(n AS DECIMAL(38,0)) * __D - __P) "
                       f"* {int(scale)} DIV "
                       "(CAST(n AS DECIMAL(38,0)) * n - __P)")
                 .cast("long").alias("kappa_x"))


def fleiss_kappa(df: DataFrame, item_col: str, label_col: str,
                 group_col: str | None = None,
                 scale: int = 1_000_000) -> DataFrame:
    """Fleiss-style multi-rater kappa over a (item, label) vote
    table, per group or globally: ``(group?, n_items, n_votes, po_x,
    pe_x, kappa_x)`` — chance-corrected agreement for ANY number of
    raters per item, the panel generalization of :func:`cohen_kappa`
    (three LLM judges + a human, redundant annotation batches) that
    :func:`label_agreement`'s raw majority rate overstates under
    label imbalance.

    Exact single-division recipe: observed agreement pools the
    pairwise counts — ``po = A / P`` with ``A = sum over (item,
    label) of c*(c-1)`` (agreeing ordered pairs) and ``P = sum over
    items of n_i*(n_i-1)`` (all ordered pairs); chance agreement is
    ``pe = S / T^2`` with ``S = sum over labels of t_l^2`` off the
    label marginals and ``T`` the total vote count.  ``kappa = (po -
    pe) / (1 - pe)`` then clears ALL denominators to ONE truncating
    division of exact DECIMAL(38,0) integers: ``kappa_x = (A*T^2 -
    P*S) * scale DIV (P * (T^2 - S))``.  With a constant rater count
    per item this IS Fleiss 1971 (the per-item mean of ratios equals
    the pooled ratio when denominators are equal); with varying
    panel sizes it is the natural pooled generalization,
    documented.  Negative kappa truncates toward zero on both
    engines (the cohen_kappa convention).  Items with a single vote
    carry no pairwise information and drop from A/P (they still
    feed the label marginals); groups where ``T^2 == S`` (every
    vote the same label — kappa undefined) or ``P == 0`` (no item
    with >= 2 votes) are EXCLUDED; NULL labels drop their row.
    Headroom: ``A*T^2`` is O(votes^3) — exact to ~1e12 votes per
    group inside DECIMAL(38,0).

    Scale shape: one corpus-pass partial agg onto (group, item,
    label); one item rollup + one label rollup + one group rollup,
    all frames bounded by items x alphabet.  No windows over raw
    rows, no driver pulls."""
    if int(scale) < 1:
        raise ValueError("fleiss_kappa: scale must be >= 1")
    g = [group_col] if group_col is not None else []
    c = (df.filter(F.col(label_col).isNotNull())
         .groupBy(*g, F.col(item_col).alias("__i"),
                  F.col(label_col).alias("__l"))
         .agg(F.count(F.lit(1)).cast("long").alias("__c")))
    c = c.localCheckpoint(eager=False)
    dec = "decimal(38,0)"
    items = (c.groupBy(*g, "__i")
             .agg(F.sum("__c").cast("long").alias("__ni"),
                  F.sum(F.col("__c").cast(dec)
                        * (F.col("__c") - 1)).alias("__ai")))
    ap = (items.groupBy(*g)
          .agg(F.count(F.lit(1)).cast("long").alias("n_items"),
               F.sum("__ai").alias("__A"),
               F.sum(F.col("__ni").cast(dec)
                     * (F.col("__ni") - 1)).alias("__P")))
    marg = (c.groupBy(*g, "__l")
            .agg(F.sum("__c").cast("long").alias("__t")))
    se = (marg.groupBy(*g)
          .agg(F.sum("__t").cast("long").alias("n_votes"),
               F.sum(F.col("__t").cast(dec) * F.col("__t"))
                .alias("__S")))
    joined = ap.join(se, g) if g else ap.crossJoin(se)
    t2 = "CAST(n_votes AS DECIMAL(38,0)) * n_votes"
    return (joined
            .filter((F.col("__P") > 0)
                    & (F.expr(t2) != F.col("__S")))
            .select(*g, "n_items", "n_votes",
                    F.expr(f"__A * {int(scale)} DIV __P")
                     .cast("long").alias("po_x"),
                    F.expr(f"__S * {int(scale)} DIV ({t2})")
                     .cast("long").alias("pe_x"),
                    F.expr(f"(__A * ({t2}) - __P * __S) "
                           f"* {int(scale)} DIV (__P * (({t2}) "
                           "- __S))").cast("long").alias("kappa_x")))


def krippendorff_alpha(df: DataFrame, item_col: str, label_col: str,
                       group_col: str | None = None,
                       max_panel: int = 12,
                       order: list | None = None,
                       scale: int = 1_000_000) -> DataFrame:
    """Krippendorff's alpha over a (item, label) vote table, per
    group or globally: ``(group?, n_units, n_vals, alpha_x)`` — the
    MISSING-TOLERANT member of the agreement family
    (:func:`cohen_kappa` needs exactly two fixed raters,
    :func:`fleiss_kappa` pools a panel, alpha is the standard when
    judges abstain or panels vary per item: LLM judge ensembles with
    timeouts, partially-redundant annotation batches).  Missing votes
    are simply ABSENT ROWS; units with fewer than 2 votes carry no
    pairable information and drop entirely (Krippendorff's pairable-
    values rule — unlike fleiss_kappa they do not even feed the
    marginals).

    Exact single-division recipe: with ``m_u`` votes on unit u and
    ``n_uc`` of them for label c, nominal alpha is ``1 - (n-1) *
    sum_u (m_u^2 - sum_c n_uc^2) / (m_u - 1) / (n^2 - sum_c n_c^2)``
    (coincidence-matrix identity; ``n = sum m_u`` and ``n_c`` over
    pairable units only).  The per-unit denominators ``m_u - 1``
    would force per-unit rounding — so they are CLEARED EXACTLY by
    the literal ``LCM(1..max_panel-1)``: ``T_u = (m_u^2 - sum
    n_uc^2) * (LCM / (m_u - 1))`` is an exact integer for every
    ``m_u <= max_panel`` (in-plan raise past it, the eccentricity
    guard convention), and ``alpha_x = scale - (n-1) * sum T_u *
    scale DIV (LCM * (n^2 - sum n_c^2))`` is ONE truncating division
    of exact DECIMAL(38,0) integers.  Negative alpha (systematic
    disagreement) truncates toward zero on both engines via the
    nonnegative subtracted term (the cohen_kappa convention).
    Groups where ``n^2 == sum n_c^2`` (every pairable vote the same
    label — alpha undefined) are EXCLUDED; NULL labels drop their
    row.  Headroom: ``(n-1) * sum T_u * scale`` is
    O(votes^3 * LCM(max_panel)) — exact to ~1e8 votes per group at
    the default panel bound inside DECIMAL(38,0).

    ``order`` (round 13, pytest-pinned): an explicit rank order of
    the label alphabet switches the metric to ORDINAL alpha — a
    grade that is off by one step disagrees LESS than one off by
    four (Likert scales, quality tiers, star ratings), which nominal
    alpha cannot see.  Krippendorff's ordinal distance ``delta_ck =
    sum_{g=c..k} n_g - (n_c + n_k)/2`` (marginal-mass distance)
    enters squared in BOTH Do and De, so the /2 clears: the integer
    ``D_ck = 2*cum_k - 2*cum_c + n_c - n_k`` (one cumulative window
    over the alphabet-bounded marginal frame) satisfies ``delta^2 =
    D^2/4`` and the /4 CANCELS in the ratio — ``alpha_x = scale -
    (n-1) * sum_u sum_{c<k} n_uc*n_uk*D_ck^2*(LCM/(m_u-1)) * scale
    DIV (LCM * sum_{c<k} n_c*n_k*D_ck^2)`` stays one truncating
    division of exact integers.  Labels outside ``order`` raise
    in-plan; nominal and ordinal agree exactly on binary alphabets
    (D^2 is constant there).  Headroom tightens to O(votes^5 *
    LCM): exact to ~1e6 votes per group.

    Scale shape: one corpus-pass partial agg onto (group, item,
    label); one unit rollup + one label rollup + one group rollup,
    all frames bounded by units x alphabet (the ordinal path adds a
    per-unit label-pair self-join and a marginal pair frame — both
    alphabet^2-bounded, never per-vote).  No windows over raw rows,
    no driver pulls."""
    import math as _math
    if int(scale) < 1:
        raise ValueError("krippendorff_alpha: scale must be >= 1")
    if int(max_panel) < 2:
        raise ValueError("krippendorff_alpha: max_panel must be >= 2")
    lcm = 1
    for i in range(1, int(max_panel)):
        lcm = _math.lcm(lcm, i)
    g = [group_col] if group_col is not None else []
    lab: Column = F.col(label_col)
    if order is not None:
        if len(order) < 2 or len(set(order)) != len(order):
            raise ValueError("krippendorff_alpha: order must list "
                             ">= 2 distinct label values")
        # label -> 1-based rank, in-plan raise on labels outside the
        # declared alphabet (a silent drop would bias alpha)
        rank = F.when(lab == order[0], F.lit(1).cast("long"))
        for i, v in enumerate(order[1:], start=2):
            rank = rank.when(lab == v, F.lit(i).cast("long"))
        lab = rank.otherwise(
            F.raise_error(F.concat(
                F.lit("krippendorff_alpha: label outside the "
                      "declared order: "), F.col(label_col)
                .cast("string"))).cast("long"))
    c = (df.filter(F.col(label_col).isNotNull())
         .groupBy(*g, F.col(item_col).alias("__i"),
                  lab.alias("__l"))
         .agg(F.count(F.lit(1)).cast("long").alias("__c")))
    c = c.localCheckpoint(eager=False)
    dec = "decimal(38,0)"
    units = (c.groupBy(*g, "__i")
             .agg(F.sum("__c").cast("long").alias("__m"),
                  F.sum(F.col("__c").cast(dec) * F.col("__c"))
                   .alias("__s2"))
             .filter(F.col("__m") >= 2))
    guarded_m = (F.when(F.col("__m") <= int(max_panel), F.col("__m"))
                 .otherwise(F.raise_error(F.lit(
                     "krippendorff_alpha: a unit has more votes than "
                     f"max_panel={int(max_panel)} — raise max_panel "
                     "(the LCM denominator-clearing bound)"))
                     .cast("long")))
    units = units.withColumn("__gm", guarded_m)
    # (m-1) divides LCM exactly for m <= max_panel, so the integer DIV
    # is exact — no per-unit rounding anywhere
    units = units.withColumn(
        "__t", F.expr(f"(CAST(__m AS DECIMAL(38,0)) * __m - __s2) "
                      f"* ({int(lcm)} DIV (__gm - 1))"))
    units = units.localCheckpoint(eager=False)
    per_g = (units.groupBy(*g)
             .agg(F.count(F.lit(1)).cast("long").alias("n_units"),
                  F.sum("__m").cast("long").alias("n_vals"),
                  F.sum("__t").cast(dec).alias("__T")))
    marg = (c.join(units.select(*g, "__i"), [*g, "__i"])
            .groupBy(*g, "__l")
            .agg(F.sum("__c").cast("long").alias("__nc")))
    if order is None:
        se = (marg.groupBy(*g)
              .agg(F.sum(F.col("__nc").cast(dec) * F.col("__nc"))
                   .alias("__S")))
        joined = per_g.join(se, g) if g else per_g.crossJoin(se)
        n2 = "CAST(n_vals AS DECIMAL(38,0)) * n_vals"
        return (joined
                .filter(F.expr(n2) != F.col("__S"))
                .select(*g, "n_units", "n_vals",
                        F.expr(f"{int(scale)} - CAST((n_vals - 1) "
                               f"AS DECIMAL(38,0)) * __T "
                               f"* {int(scale)} "
                               f"DIV ({int(lcm)} * (({n2}) - __S))")
                         .cast("long").alias("alpha_x")))
    # --- ordinal path: marginal-mass distances over the rank axis ---
    w = Window.partitionBy(*g).orderBy("__l") \
        .rowsBetween(Window.unboundedPreceding, 0)
    mcum = (marg.withColumn("__cum", F.sum("__nc").over(w))
            .localCheckpoint(eager=False))
    from functools import reduce as _reduce
    a, b = mcum.alias("a"), mcum.alias("b")
    gj = [F.col(f"a.{x}") == F.col(f"b.{x}") for x in g]
    # D_ck = 2*cum_k - 2*cum_c + n_c - n_k; delta^2 = D^2/4 and the
    # /4 cancels between Do and De, so D^2 rides both sums directly
    dd = (2 * F.col("b.__cum") - 2 * F.col("a.__cum")
          + F.col("a.__nc") - F.col("b.__nc")).cast(dec)
    pair_d = (a.join(b, _reduce(lambda x, y: x & y,
                                gj + [F.col("a.__l") < F.col("b.__l")]))
              .select(*[F.col(f"a.{x}").alias(x) for x in g],
                      F.col("a.__l").alias("__la"),
                      F.col("b.__l").alias("__lb"),
                      F.col("a.__nc").alias("__na"),
                      F.col("b.__nc").alias("__nb"),
                      (dd * dd).alias("__d2"))
              .localCheckpoint(eager=False))
    e_agg = F.sum(F.col("__na").cast(dec) * F.col("__nb")
                  * F.col("__d2")).alias("__E")
    # groupBy() with no keys still yields ONE row on an empty input
    # (null sum), so the global path cannot lose its row
    s_e = pair_d.groupBy(*g).agg(e_agg) if g else pair_d.agg(e_agg)
    ca, cb = c.alias("ca"), c.alias("cb")
    cgj = _reduce(lambda x, y: x & y,
                  [F.col(f"ca.{x}") == F.col(f"cb.{x}") for x in g]
                  + [F.col("ca.__i") == F.col("cb.__i"),
                     F.col("ca.__l") < F.col("cb.__l")])
    cpair = (ca.join(cb, cgj)
             .select(*[F.col(f"ca.{x}").alias(x) for x in g],
                     F.col("ca.__i").alias("__i"),
                     F.col("ca.__l").alias("__la"),
                     F.col("cb.__l").alias("__lb"),
                     (F.col("ca.__c").cast(dec) * F.col("cb.__c"))
                     .alias("__w")))
    ufac = units.select(
        *g, "__i", F.expr(f"{int(lcm)} DIV (__gm - 1)").alias("__f"))
    u_src = (cpair.join(ufac, [*g, "__i"])
             .join(pair_d.select(*g, "__la", "__lb", "__d2"),
                   [*g, "__la", "__lb"]))
    u_agg = F.sum(F.col("__w") * F.col("__f") * F.col("__d2")) \
        .alias("__U")
    s_u = u_src.groupBy(*g).agg(u_agg) if g else u_src.agg(u_agg)
    joined = per_g.join(s_u, g, "left") if g else \
        per_g.crossJoin(s_u)
    joined = joined.join(s_e, g) if g else joined.crossJoin(s_e)
    return (joined
            .filter(F.col("__E") > 0)
            .select(*g, "n_units", "n_vals",
                    F.expr(f"{int(scale)} - CAST((n_vals - 1) "
                           f"AS DECIMAL(38,0)) "
                           "* coalesce(__U, CAST(0 AS "
                           f"DECIMAL(38,0))) * {int(scale)} "
                           f"DIV ({int(lcm)} * __E)")
                     .cast("long").alias("alpha_x")))


def average_precision(df: DataFrame, score_col: str, label_col: str,
                      group_col: str | None = None,
                      quantize_x: int | None = None,
                      scale: int = 1_000_000) -> DataFrame:
    """Average precision (area under the PR curve, step
    interpolation) per group or globally: ``(group?, n_pos, n_neg,
    ap_x)`` — THE single-number ranking summary for imbalanced
    classes, where ROC-AUC (:func:`classifier_auc`) is inflated by
    the easy negatives.

    Step-AP over the distinct-score sweep: ``AP = sum over
    thresholds t of (tp_t - tp_prev) * precision_t / P`` — each term
    computed as ``delta_tp * tp * scale DIV (tp + fp)`` (exact longs,
    ONE truncation per distinct score, deterministic and spelled
    identically on both engines — documented as the quantized-sweep
    estimator: ties share one threshold row exactly like
    :func:`pr_threshold_stats`), then one final ``DIV P``.  The
    reduced frame, the ``quantize_x`` contract for continuous
    scores, the 0/1 label validation and the one-class exclusion are
    all shared with classifier_auc/pr_threshold_stats.  DECIMAL(38,0)
    intermediates.

    Scale shape: one corpus-pass partial-agg groupBy, one cumulative
    window over the reduced frame, one rollup.  No joins, no driver
    pulls."""
    if quantize_x is None:
        score = F.col(score_col)
    else:
        if int(quantize_x) < 1:
            raise ValueError("average_precision: quantize_x must "
                             "be >= 1")
        score = F.round(F.col(score_col).cast("double")
                        * int(quantize_x)).cast("long")
    if int(scale) < 1:
        raise ValueError("average_precision: scale must be >= 1")
    g = [group_col] if group_col is not None else []
    c = (df.select(*g, score.alias("__s"),
                   _binary_label(label_col).alias("__l"))
         .groupBy(*g, "__s")
         .agg(F.sum("__l").cast("long").alias("__p"),
              F.sum(1 - F.col("__l")).cast("long").alias("__q")))
    wcum = (Window.partitionBy(*g).orderBy(F.desc("__s"))
            .rowsBetween(Window.unboundedPreceding, 0))
    c = (c.withColumn("tp", F.sum("__p").over(wcum).cast("long"))
          .withColumn("fp", F.sum("__q").over(wcum).cast("long")))
    term = F.expr(f"CAST(__p AS DECIMAL(38,0)) * tp * {int(scale)} "
                  "DIV (tp + fp)")
    out = (c.groupBy(*g)
           .agg(F.sum("__p").cast("long").alias("n_pos"),
                F.sum("__q").cast("long").alias("n_neg"),
                F.sum(term).alias("__apnum")))
    return (out.filter((F.col("n_pos") > 0) & (F.col("n_neg") > 0))
            .select(*g, "n_pos", "n_neg",
                    F.expr("__apnum DIV n_pos").cast("long")
                     .alias("ap_x")))


def ks_statistic(df_a: DataFrame, df_b: DataFrame, value_col: str,
                 group_col: str | None = None,
                 quantize_x: int | None = None,
                 scale: int = 1_000_000) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov statistic between two slices'
    value distributions, per group or globally: ``(group?, n_a, n_b,
    ks_x)`` with ``ks_x = max over values of |cdf_a - cdf_b| *
    scale`` — the continuous-score drift gate next to
    :func:`~cascading_flink_spark.extensions.corpus.corpus_drift`'s
    categorical total-variation (did this month's crawl shift the
    length/quality-score distribution per language?).

    Exact integer recipe: both sides reduce to per-(group, distinct
    value) counts (one partial agg each — the classifier_auc frame;
    ``quantize_x`` buckets raw doubles in-plan, same contract);
    cumulative counts ``ca, cb`` over the MERGED value axis make the
    sup-distance ``max |ca*n_b - cb*n_a|`` an exact integer — one
    cumulative window over the merged reduced frame, one max rollup,
    and ``ks_x`` is one truncating DIV by ``n_a*n_b``
    (DECIMAL(38,0) intermediates: exact to ~1e12 rows per side per
    group).  Groups present in only ONE side are EXCLUDED (KS
    undefined against an empty sample — the one-class convention).
    NULL values drop their row.

    Scale shape: two corpus-pass partial aggs, one union, one
    re-agg onto (group, value), one cumulative window + rollup on
    the quantization-bounded frame.  No joins, no driver pulls."""
    if int(scale) < 1:
        raise ValueError("ks_statistic: scale must be >= 1")
    if quantize_x is not None and int(quantize_x) < 1:
        raise ValueError("ks_statistic: quantize_x must be >= 1")

    def _counts(df, side):
        v = (F.col(value_col) if quantize_x is None
             else F.round(F.col(value_col).cast("double")
                          * int(quantize_x)).cast("long"))
        g = [group_col] if group_col is not None else []
        return (df.filter(F.col(value_col).isNotNull())
                .select(*g, v.alias("__v"))
                .groupBy(*g, "__v")
                .agg(F.count(F.lit(1)).cast("long").alias(side)))
    g = [group_col] if group_col is not None else []
    merged = (_counts(df_a, "__ca0")
              .unionByName(_counts(df_b, "__cb0")
                           .withColumnRenamed("__cb0", "__ca0")
                           .withColumn("__side", F.lit(1)),
                           allowMissingColumns=True)
              .withColumn("__side", F.coalesce("__side", F.lit(0))))
    c = (merged.groupBy(*g, "__v")
         .agg(F.sum(F.when(F.col("__side") == 0, F.col("__ca0"))
                    .otherwise(0)).cast("long").alias("__a"),
              F.sum(F.when(F.col("__side") == 1, F.col("__ca0"))
                    .otherwise(0)).cast("long").alias("__b")))
    wcum = (Window.partitionBy(*g).orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, 0))
    wall = (Window.partitionBy(*g)
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    c = (c.withColumn("__cuma", F.sum("__a").over(wcum).cast("long"))
          .withColumn("__cumb", F.sum("__b").over(wcum).cast("long"))
          .withColumn("n_a", F.sum("__a").over(wall).cast("long"))
          .withColumn("n_b", F.sum("__b").over(wall).cast("long")))
    out = (c.filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
           .groupBy(*g)
           .agg(F.max("n_a").alias("n_a"), F.max("n_b").alias("n_b"),
                F.max(F.expr(
                    "abs(CAST(__cuma AS DECIMAL(38,0)) * n_b "
                    "- CAST(__cumb AS DECIMAL(38,0)) * n_a)"))
                 .alias("__num")))
    return out.select(
        *g, "n_a", "n_b",
        F.expr(f"__num * {int(scale)} DIV "
               "(CAST(n_a AS DECIMAL(38,0)) * n_b)")
         .cast("long").alias("ks_x"))


def drift_series(df: DataFrame, key_col: str, ts_col: str = "ts",
                 bucket_s: int = 3600,
                 group_col: str | None = None,
                 scale: int = 1_000_000_000) -> DataFrame:
    """Consecutive-bucket drift series over an event stream, per
    group or globally: ``(group?, bucket_us, n, n_prev,
    tv_x1e6)`` — the total-variation distance between each time
    bucket's categorical key mix and the PREVIOUS bucket's — the
    batch monitoring series behind a "did the mix lurch this hour"
    dashboard (the streaming face is
    :func:`~cascading_flink_spark.streaming.stream_drift_monitor`;
    this one compares ADJACENT windows instead of a fixed
    reference, so slow seasonal rotation reads near zero while a
    step change spikes exactly one row).

    Determinism recipe: buckets are exact integer epoch-microsecond
    truncation (``epoch_us DIV (bucket_s * 1e6)``, no calendar
    functions; ``bucket_us`` is reported as that exact long — the
    sessionize ts_us convention, no timestamp round-trips); the
    per-(bucket, key) counts self-align by SHIFTING
    the frame one bucket forward and re-aggregating over the union
    (the psi_drift no-join merge); both mixes quantize integer
    (``c * scale DIV n`` — the corpus_drift recipe, scale a multiple
    of 1e6) and ``tv_x1e6 = sum |p - q| DIV 2 DIV (scale DIV
    1e6)``.  A bucket with NO predecessor data (the first bucket,
    or a bucket after an empty gap) is EXCLUDED — TV against an
    empty sample is undefined, and a gap is its own alert.  NULL
    keys/timestamps drop their row.

    Scale shape: one corpus-pass partial agg onto (group, bucket,
    key); one shifted union + re-agg; two bucket-total windows +
    one rollup, all on the buckets x keys reduced frame.  No joins,
    no driver pulls."""
    if int(bucket_s) < 1:
        raise ValueError("drift_series: bucket_s must be >= 1")
    if int(scale) < 1_000_000 or int(scale) % 1_000_000 != 0:
        raise ValueError("drift_series: scale must be a positive "
                         "multiple of 1e6 (output is x1e6)")
    g = [group_col] if group_col is not None else []
    bus = int(bucket_s) * 1_000_000
    c = (df.filter(F.col(key_col).isNotNull()
                   & F.col(ts_col).isNotNull())
         .select(*g,
                 F.expr(f"unix_micros(CAST({ts_col} AS TIMESTAMP)) "
                        f"DIV {bus} * {bus}").alias("__b"),
                 F.col(key_col).alias("__k"))
         .groupBy(*g, "__b", "__k")
         .agg(F.count(F.lit(1)).cast("long").alias("__c")))
    c = c.localCheckpoint(eager=False)
    cur = c.withColumn("__side", F.lit(0))
    prv = (c.withColumn("__b", F.col("__b") + bus)
           .withColumn("__side", F.lit(1)))
    m = (cur.unionByName(prv)
         .groupBy(*g, "__b", "__k")
         .agg(F.sum(F.when(F.col("__side") == 0, F.col("__c"))
                    .otherwise(0)).cast("long").alias("__a"),
              F.sum(F.when(F.col("__side") == 1, F.col("__c"))
                    .otherwise(0)).cast("long").alias("__p")))
    wall = (Window.partitionBy(*g, "__b")
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    s = int(scale)
    m = (m.withColumn("n", F.sum("__a").over(wall).cast("long"))
          .withColumn("n_prev", F.sum("__p").over(wall).cast("long"))
          .filter((F.col("n") > 0) & (F.col("n_prev") > 0)))
    down = s // 1_000_000
    return (m.withColumn("__pq", F.expr(
                f"abs(CAST(__a AS DECIMAL(38,0)) * {s} DIV n "
                f"- CAST(__p AS DECIMAL(38,0)) * {s} DIV n_prev)"))
            .groupBy(*g, "__b")
            .agg(F.max("n").alias("n"),
                 F.max("n_prev").alias("n_prev"),
                 F.sum(F.col("__pq").cast("decimal(38,0)"))
                  .alias("__sum"))
            .select(*g,
                    F.col("__b").cast("long").alias("bucket_us"),
                    "n", "n_prev",
                    F.expr(f"CAST(__sum DIV 2 DIV {down} AS BIGINT)")
                     .alias("tv_x1e6")))


def robust_spread(df: DataFrame, value_col: str,
                  group_col: str | None = None,
                  quantize_x: int | None = None) -> DataFrame:
    """Robust per-group location AND spread: ``(group?, n, median_x,
    mad_x)`` — the (lower) median and the median absolute deviation
    from it — the outlier-proof companion to
    :func:`trimmed_stats`'s trimmed means (a mean/std pair chases a
    single corrupted 2 GB document; median/MAD does not move).

    Exact integer recipe, twice through the trimmed_stats interval
    machinery: on the per-(group, distinct value) reduced frame each
    value occupies the rank interval ``[cum_before + 1, cum_before +
    cnt]``; the LOWER median (rank ``(n + 1) DIV 2`` — the exact
    integer convention, no averaging of middle pairs, documented) is
    the value whose interval contains that rank; the deviations
    ``|v - median|`` re-aggregate onto a second reduced frame and
    the SAME rank picks the MAD.  Values must be integer-valued
    (``quantize_x`` buckets raw doubles in-plan — outputs are then
    in quantized units).  NULL values drop their row.

    Scale shape: one corpus-pass partial agg; one cumulative window
    + rank pick on the reduced frame, one un-hinted group-key join
    back (the median frame is one row per group — broadcastable,
    AQE's call), one re-agg + second window on the deviation frame.
    No row-level sorts, no driver pulls."""
    if quantize_x is not None and int(quantize_x) < 1:
        raise ValueError("robust_spread: quantize_x must be >= 1")
    v = (F.col(value_col).cast("long") if quantize_x is None
         else F.round(F.col(value_col).cast("double")
                      * int(quantize_x)).cast("long"))
    g = [group_col] if group_col is not None else []

    def _median(frame, out):
        """frame: (*g, __v, __c) -> (*g, n, out) via the interval
        rank pick at (n + 1) DIV 2."""
        wcum = (Window.partitionBy(*g).orderBy("__v")
                .rowsBetween(Window.unboundedPreceding, -1))
        wall = (Window.partitionBy(*g)
                .rowsBetween(Window.unboundedPreceding,
                             Window.unboundedFollowing))
        x = (frame
             .withColumn("__bef", F.coalesce(
                 F.sum("__c").over(wcum), F.lit(0)).cast("long"))
             .withColumn("n", F.sum("__c").over(wall).cast("long"))
             .withColumn("__m", F.expr("(n + 1) DIV 2")))
        return (x.groupBy(*g)
                .agg(F.max("n").alias("n"),
                     F.max(F.when((F.col("__bef") < F.col("__m"))
                                  & (F.col("__bef") + F.col("__c")
                                     >= F.col("__m")), F.col("__v")))
                      .cast("long").alias(out)))
    c = (df.filter(F.col(value_col).isNotNull())
         .select(*g, v.alias("__v"))
         .groupBy(*g, "__v")
         .agg(F.count(F.lit(1)).cast("long").alias("__c")))
    c = c.localCheckpoint(eager=False)
    med = _median(c, "median_x")
    dev = (c.join(med.select(*g, "median_x"), g) if g
           else c.crossJoin(med.select("median_x")))
    dev = (dev.select(*g, F.abs(F.col("__v") - F.col("median_x"))
                      .alias("__v"), "__c")
           .groupBy(*g, "__v")
           .agg(F.sum("__c").cast("long").alias("__c")))
    mad = _median(dev, "mad_x").withColumnRenamed("n", "__n2")
    out = med.join(mad, g) if g else med.crossJoin(mad)
    return out.select(*g, "n", "median_x", "mad_x")


def wasserstein_distance(df_a: DataFrame, df_b: DataFrame,
                         value_col: str,
                         group_col: str | None = None,
                         quantize_x: int | None = None,
                         scale: int = 1_000_000) -> DataFrame:
    """One-dimensional Wasserstein-1 (earth-mover) distance between
    two slices' value distributions, per group or globally:
    ``(group?, n_a, n_b, w1_x)`` — the INTEGRAL of |cdf_a - cdf_b|
    over the value axis, in VALUE units x ``scale/1e6``... the drift
    score that weighs HOW FAR the mass moved where
    :func:`ks_statistic`'s sup only sees the single worst crossing
    (a +1-token shift of every document moves KS to its cap but W1
    to exactly 1 token).

    Exact integer recipe on :func:`ks_statistic`'s merged reduced
    frame: with cumulative counts ``ca, cb`` at each distinct value
    ``v`` and the NEXT distinct value ``v'`` from one lead window,
    ``W1 * n_a * n_b = sum of |ca*n_b - cb*n_a| * (v' - v)`` — every
    term an exact DECIMAL(38,0) product of nonnegative integers (the
    last value's lead is NULL and contributes nothing — both cdfs
    are 1 there), and ``w1_x = sum * scale DIV (n_a * n_b)`` is one
    truncating division, reported in value units scaled by 1e-6 of
    ``scale``.  Values must be integer-valued (``quantize_x``
    buckets raw doubles in-plan — w1_x is then in QUANTIZED units).
    One-sided groups are EXCLUDED; NULL values drop their row.
    Headroom: ``sum`` is bounded by ``n_a*n_b*value_range`` — keep
    that product under ~1e38.

    Scale shape: identical to ks_statistic — two corpus-pass partial
    aggs, one union + re-agg, one cumulative + one lead window on
    the quantization-bounded frame, one rollup.  No joins, no driver
    pulls."""
    if int(scale) < 1:
        raise ValueError("wasserstein_distance: scale must be >= 1")
    if quantize_x is not None and int(quantize_x) < 1:
        raise ValueError("wasserstein_distance: quantize_x must be "
                         ">= 1")

    def _counts(df, side):
        v = (F.col(value_col).cast("long") if quantize_x is None
             else F.round(F.col(value_col).cast("double")
                          * int(quantize_x)).cast("long"))
        g = [group_col] if group_col is not None else []
        return (df.filter(F.col(value_col).isNotNull())
                .select(*g, v.alias("__v"))
                .groupBy(*g, "__v")
                .agg(F.count(F.lit(1)).cast("long").alias("__c"))
                .withColumn("__side", F.lit(side)))
    g = [group_col] if group_col is not None else []
    merged = _counts(df_a, 0).unionByName(_counts(df_b, 1))
    c = (merged.groupBy(*g, "__v")
         .agg(F.sum(F.when(F.col("__side") == 0, F.col("__c"))
                    .otherwise(0)).cast("long").alias("__a"),
              F.sum(F.when(F.col("__side") == 1, F.col("__c"))
                    .otherwise(0)).cast("long").alias("__b")))
    wcum = (Window.partitionBy(*g).orderBy("__v")
            .rowsBetween(Window.unboundedPreceding, 0))
    wall = (Window.partitionBy(*g)
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    wlead = Window.partitionBy(*g).orderBy("__v")
    c = (c.withColumn("__cuma", F.sum("__a").over(wcum).cast("long"))
          .withColumn("__cumb", F.sum("__b").over(wcum).cast("long"))
          .withColumn("n_a", F.sum("__a").over(wall).cast("long"))
          .withColumn("n_b", F.sum("__b").over(wall).cast("long"))
          .withColumn("__nv", F.lead("__v").over(wlead)))
    # the last distinct value's lead is NULL and contributes 0 (both
    # cdfs are 1 past it) — kept as a zero term, NOT filtered, so a
    # single-distinct-value group still reports w1 = 0
    out = (c.filter((F.col("n_a") > 0) & (F.col("n_b") > 0))
           .groupBy(*g)
           .agg(F.max("n_a").alias("n_a"), F.max("n_b").alias("n_b"),
                F.sum(F.expr(
                    "CASE WHEN __nv IS NULL THEN CAST(0 AS "
                    "DECIMAL(38,0)) ELSE "
                    "abs(CAST(__cuma AS DECIMAL(38,0)) * n_b "
                    "- CAST(__cumb AS DECIMAL(38,0)) * n_a) "
                    "* (__nv - __v) END")).alias("__sum")))
    return out.select(
        *g, "n_a", "n_b",
        F.expr(f"__sum * {int(scale)} DIV "
               "(CAST(n_a AS DECIMAL(38,0)) * n_b)")
         .cast("long").alias("w1_x"))


def rate_confidence(df: DataFrame, label_col: str,
                    group_col: str | None = None,
                    z_x1000: int = 1960) -> DataFrame:
    """Wilson score interval for a per-group binary rate: ``(group?,
    n, n_pos, rate, lo, hi)`` — the uncertainty band every data card
    should print next to a defect/positive rate (a 3-of-7 slice and
    a 3000-of-7000 slice have the same rate and wildly different
    evidence; Wilson 1927 stays inside [0,1] and behaves at 0/1
    rates, unlike the normal approximation).

    Determinism recipe: the inputs are exact longs (n, n_pos) and the
    rational ``z = z_x1000/1000`` (default 1.960 ~ 95%); the interval
    is computed in doubles by ONE fixed expression tree spelled
    identically on both engines — ``center = (p + z^2/2n) / (1 +
    z^2/n)``, ``half = z * sqrt(p*(1-p)/n + z^2/(4n^2)) / (1 +
    z^2/n)`` — and rounded to 4dp at the OUTPUT only (the house
    float recipe: identical exact inputs + identical IEEE op
    sequence = identical doubles, and the 4dp rounding gives margin).
    Labels validate 0/1 in-plan (the classifier_auc contract).

    Scale shape: ONE partial-agg groupBy — the output frame is one
    row per group; no windows, no joins, no driver pulls."""
    if int(z_x1000) < 0:
        raise ValueError("rate_confidence: z_x1000 must be >= 0")
    z = int(z_x1000)
    g = [group_col] if group_col is not None else []
    t = (df.select(*g, _binary_label(label_col).alias("__l"))
         .groupBy(*g)
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum("__l").cast("long").alias("n_pos")))
    # one expression tree, spelled once and reused — the oracle twin
    # mirrors it token for token
    e = (f"CAST(n_pos AS DOUBLE) / n")
    z2 = f"(({z} / 1000.0) * ({z} / 1000.0))"
    denom = f"(1.0 + {z2} / n)"
    center = f"(({e} + {z2} / (2.0 * n)) / {denom})"
    half = (f"(({z} / 1000.0) * sqrt({e} * (1.0 - {e}) / n "
            f"+ {z2} / (4.0 * n * n)) / {denom})")
    return t.select(*g, "n", "n_pos",
                    F.expr(f"round({e}, 4)").alias("rate"),
                    F.expr(f"round({center} - {half}, 4)").alias("lo"),
                    F.expr(f"round({center} + {half}, 4)").alias("hi"))


def diversity_report(df: DataFrame, key_col: str,
                     group_col: str | None = None) -> DataFrame:
    """Diversity data card over a categorical key, per group or
    globally: ``(group?, n, n_keys, entropy_x1e6, norm_entropy_x1e6,
    eff_keys_x1e3, gini_x1e6)`` — Shannon entropy (nats), entropy
    normalized by ``ln(n_keys)``, the effective number of keys
    ``exp(H)`` (the "how many sources is this slice REALLY drawing
    from" readout — 50 registered crawls with eff_keys 2.1 is a
    monoculture), and the Gini coefficient of the key-count
    distribution — the diversity complement to
    :func:`concentration_report`'s HHI/top-share dominance card.

    Integer recipe: the corpus reduces to per-(group, key) counts —
    one partial-agg groupBy.  Entropy uses the DSIR ln recipe:
    ``H = ln(n) - (1/n) * sum(c * ln(c))`` with each ``ln`` rounded
    ONCE to 1e-6 (``round(ln(c) * 1e6)`` per distinct count value),
    so the weighted sum is an exact order-free DECIMAL(38,0) integer
    and ``entropy_x1e6`` is that long minus one truncating DIV —
    a single-key group lands on exactly 0.  ``norm_entropy_x1e6 =
    entropy * 1e6 DIV round(ln(n_keys) * 1e6)`` (0 when n_keys = 1;
    per-ln rounding can push it a unit or two past 1e6 at tiny n —
    deterministic on both engines, documented).  ``eff_keys_x1e3``
    is ONE ``exp`` of the exact entropy long — identical IEEE input
    + identical spelling, rounded to x1e3 at the output (the
    rate_confidence float recipe).  Gini sorts only the REDUCED
    frame: with keys ranked ``i`` by (count ASC, key ASC),
    ``gini_x1e6 = (2 * sum(i * c_i) - (n_keys + 1) * n) * 1e6 DIV
    (n_keys * n)`` — the exact mean-absolute-difference identity,
    one truncating division of DECIMAL(38,0)-exact terms.  NULL
    keys are excluded before counting (the concentration_report
    convention).

    Scale shape: one corpus-pass partial-agg groupBy; one
    row_number window + one rollup on the keys-per-group-bounded
    frame.  No driver pulls."""
    g = [group_col] if group_col is not None else []
    c = (df.filter(F.col(key_col).isNotNull())
         .groupBy(*g, F.col(key_col).alias("__k"))
         .agg(F.count(F.lit(1)).cast("long").alias("__c")))
    w = Window.partitionBy(*g).orderBy(F.asc("__c"), F.asc("__k"))
    c = (c.withColumn("__i", F.row_number().over(w).cast("long"))
          .withColumn("__lnc", F.expr(
              "CAST(round(ln(__c) * 1000000, 0) AS BIGINT)")))
    dec = "decimal(38,0)"
    t = (c.groupBy(*g)
         .agg(F.sum("__c").cast("long").alias("n"),
              F.count(F.lit(1)).cast("long").alias("n_keys"),
              F.sum((F.col("__c").cast(dec) * F.col("__lnc")))
               .alias("__slnc"),
              F.sum((F.col("__i").cast(dec) * F.col("__c")))
               .alias("__gnum")))
    t = t.withColumn("entropy_x1e6", F.expr(
        "CAST(round(ln(n) * 1000000, 0) AS BIGINT) "
        "- CAST(__slnc DIV n AS BIGINT)"))
    return t.select(
        *g, "n", "n_keys", "entropy_x1e6",
        F.when(F.col("n_keys") < 2, F.lit(0).cast("long"))
         .otherwise(F.expr(
             "CAST(CAST(entropy_x1e6 AS DECIMAL(38,0)) * 1000000 "
             "DIV CAST(round(ln(n_keys) * 1000000, 0) AS BIGINT) "
             "AS BIGINT)")).alias("norm_entropy_x1e6"),
        F.expr("CAST(round(exp(CAST(entropy_x1e6 AS DOUBLE) "
               "/ 1000000.0) * 1000, 0) AS BIGINT)")
         .alias("eff_keys_x1e3"),
        F.expr("CAST((2 * __gnum - CAST(n_keys + 1 AS DECIMAL(38,0)) "
               "* n) * 1000000 DIV (CAST(n_keys AS DECIMAL(38,0)) "
               "* n) AS BIGINT)").alias("gini_x1e6"))


def _two_sample_counts(df_a: DataFrame, df_b: DataFrame, key_col: str,
                       g: list) -> DataFrame:
    """Shared reduced frame for the two-sample categorical drift
    family (:func:`psi_drift`, :func:`chi2_drift`,
    :func:`js_divergence`): per-(group, key) counts of both sides on
    the UNION support — built by one partial agg per side + one
    union + re-agg (never a join) — with per-group totals attached
    and one-sided groups excluded (the KS convention).  Columns:
    ``(*g, __k, __a, __b, n_a, n_b)``."""

    def _counts(df, side):
        return (df.filter(F.col(key_col).isNotNull())
                .groupBy(*g, F.col(key_col).alias("__k"))
                .agg(F.count(F.lit(1)).cast("long").alias("__c"))
                .withColumn("__side", F.lit(side)))
    merged = _counts(df_a, 0).unionByName(_counts(df_b, 1))
    c = (merged.groupBy(*g, "__k")
         .agg(F.sum(F.when(F.col("__side") == 0, F.col("__c"))
                    .otherwise(0)).cast("long").alias("__a"),
              F.sum(F.when(F.col("__side") == 1, F.col("__c"))
                    .otherwise(0)).cast("long").alias("__b")))
    wall = (Window.partitionBy(*g)
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    return (c.withColumn("n_a", F.sum("__a").over(wall).cast("long"))
             .withColumn("n_b", F.sum("__b").over(wall).cast("long"))
             .filter((F.col("n_a") > 0) & (F.col("n_b") > 0)))


def psi_drift(df_a: DataFrame, df_b: DataFrame, key_col: str,
              group_col: str | None = None,
              scale: int = 1_000_000) -> DataFrame:
    """Population Stability Index between two slices' categorical
    distributions, per group or globally: ``(group?, n_a, n_b,
    n_keys, psi_x1e6)`` with ``PSI = sum over keys of (p - q) *
    ln(p/q)`` — the industry-standard drift score (PSI < 0.1 stable,
    0.1-0.25 drifting, > 0.25 act) next to
    :func:`~cascading_flink_spark.extensions.corpus.corpus_drift`'s
    total-variation and :func:`ks_statistic`'s continuous KS — the
    "did the source/domain/topic mix shift between this crawl and
    the last known-good one?" gate.

    Determinism recipe: both distributions quantize to integers
    first (``p = count * scale DIV total``, one truncating division
    per key — the corpus_drift recipe), zero and rounded-to-zero
    cells CLAMP to 1 quantum (``greatest(p, 1)``, the standard PSI
    epsilon floor: ln(0) is undefined and a vanished key IS the
    signal); ``ln`` is rounded ONCE to 1e-6 per quantized value
    (the DSIR ln recipe), so every term ``(p - q) * (lnp_x - lnq_x)``
    is exact — computed through a DECIMAL(38,0) intermediate, since
    at scale >= ~3e11 a long product would silently wrap on Spark
    while DuckDB raises (the classifier_auc overflow class) — and
    nonnegative (monotone rounding keeps both factors sharing a
    sign); ``psi_x1e6 = sum DIV scale`` is one truncating division
    of the exact DECIMAL(38,0) sum.  Support
    is the UNION of the two key sets; groups present in only one
    side are EXCLUDED (the KS convention).  NULL keys drop their
    row.

    Scale shape: two corpus-pass partial aggs, one union + re-agg
    onto (group, key) — no join builds the merged frame — then two
    group-total windows + one rollup on the keys-per-group-bounded
    frame.  No driver pulls."""
    if int(scale) < 1_000_000:
        raise ValueError("psi_drift: scale must be >= 1e6 (the "
                         "epsilon floor is 1/scale; coarser than "
                         "1e-6 distorts the reported PSI)")
    g = [group_col] if group_col is not None else []
    c = _two_sample_counts(df_a, df_b, key_col, g)
    s = int(scale)
    c = (c.withColumn("__p", F.expr(
            f"greatest(CAST(__a AS DECIMAL(38,0)) * {s} DIV n_a, 1)")
            .cast("long"))
          .withColumn("__q", F.expr(
            f"greatest(CAST(__b AS DECIMAL(38,0)) * {s} DIV n_b, 1)")
            .cast("long"))
          .withColumn("__t", F.expr(
            "CAST(__p - __q AS DECIMAL(38,0)) "
            "* (CAST(round(ln(__p) * 1000000, 0) AS "
            "BIGINT) - CAST(round(ln(__q) * 1000000, 0) AS BIGINT))")))
    return (c.groupBy(*g)
            .agg(F.max("n_a").alias("n_a"), F.max("n_b").alias("n_b"),
                 F.count(F.lit(1)).cast("long").alias("n_keys"),
                 F.sum(F.col("__t").cast("decimal(38,0)"))
                  .alias("__sum"))
            .select(*g, "n_a", "n_b", "n_keys",
                    F.expr(f"CAST(__sum DIV {s} AS BIGINT)")
                     .alias("psi_x1e6")))


def chi2_drift(df_a: DataFrame, df_b: DataFrame, key_col: str,
               group_col: str | None = None) -> DataFrame:
    """Chi-square homogeneity statistic between two slices'
    categorical distributions, per group or globally: ``(group?,
    n_a, n_b, n_keys, dof, chi2_x1e3)`` — the classical 2xK test
    statistic (compare ``chi2_x1e3 / 1000`` against a chi-square
    quantile at ``dof = n_keys - 1``), the count-scale-aware member
    of the drift family: unlike :func:`psi_drift`/TV it grows with
    sample size, so it answers "is this shift bigger than sampling
    noise?" rather than "how big is the shift?".

    NO logarithms — the 2xK identity clears each cell to pure
    rational arithmetic: ``chi2 = sum over keys of (ca*nb - cb*na)^2
    / (na * nb * (ca + cb))``.  The recipe keeps every cell exact as
    long as possible: per-cell ``(ca*nb - cb*na)^2 * 1000 DIV
    (ca + cb)`` is one truncating division of DECIMAL(38,0)-exact
    integers (spelled identically on both engines), the cell terms
    sum exactly, and ``chi2_x1e3`` is ONE final truncating DIV by
    ``na * nb``.  Headroom: the squared numerator is bounded by
    ``(na * nb)^2 * 1e3`` — keep ``na * nb`` under ~2e17 per group
    (e.g. two 4e8-row sides; sample or shard a group past that,
    where chi-square rejects everything anyway).  Zero-count cells
    need no epsilon (the term is finite by construction).
    One-sided groups are EXCLUDED; NULL keys drop their row.

    Scale shape: the shared two-sample reduced frame (two partial
    aggs + union + re-agg, no join) + two group-total windows + one
    rollup, all bounded by keys-per-group.  No driver pulls."""
    g = [group_col] if group_col is not None else []
    c = _two_sample_counts(df_a, df_b, key_col, g)
    c = c.withColumn("__t", F.expr(
        "(CAST(__a AS DECIMAL(38,0)) * n_b "
        "- CAST(__b AS DECIMAL(38,0)) * n_a) "))
    c = c.withColumn("__cell", F.expr(
        "__t * __t * 1000 DIV CAST(__a + __b AS DECIMAL(38,0))"))
    return (c.groupBy(*g)
            .agg(F.max("n_a").alias("n_a"), F.max("n_b").alias("n_b"),
                 F.count(F.lit(1)).cast("long").alias("n_keys"),
                 F.sum("__cell").alias("__sum"))
            .select(*g, "n_a", "n_b", "n_keys",
                    (F.col("n_keys") - 1).cast("long").alias("dof"),
                    F.expr("CAST(__sum DIV (CAST(n_a AS "
                           "DECIMAL(38,0)) * n_b) AS BIGINT)")
                     .alias("chi2_x1e3")))


def js_divergence(df_a: DataFrame, df_b: DataFrame, key_col: str,
                  group_col: str | None = None,
                  scale: int = 1_000_000) -> DataFrame:
    """Jensen-Shannon divergence between two slices' categorical
    distributions, per group or globally: ``(group?, n_a, n_b,
    n_keys, jsd_x1e6)`` — the SYMMETRIC, always-finite information
    divergence, bounded in ``[0, ln 2 ~ 0.693]`` (its square root is
    a true metric) — the drift score to reach for when supports
    genuinely differ: unlike :func:`psi_drift` it needs no epsilon
    floor (a one-sided key contributes exactly ``p * ln 2``), and
    unlike chi-square it does not blow up on rare cells.

    Determinism recipe: quantize both distributions
    (``p = count * scale DIV total`` per cell — the corpus_drift
    spelling), then ``2 * JSD = sum of p * (ln(2p) - ln(p+q)) +
    q * (ln(2q) - ln(p+q))`` with each ``ln`` of an exact integer
    rounded ONCE to 1e-6 (the DSIR recipe); zero cells short to 0
    in a CASE (ln never sees them).  Every term is exact through a
    DECIMAL(38,0) intermediate (the psi_drift overflow note) —
    the p-half runs NEGATIVE on cells where q > p (only the total
    is nonnegative, it is a sum of two whole KLs) — the sum is
    DECIMAL(38,0)-exact, clamped at 0 (per-ln rounding can dip an
    identical-distribution sum an epsilon below zero, and negative
    operands would split the engines' truncation conventions), and
    ``jsd_x1e6 = sum DIV (2 * scale)`` is one truncating division.
    One-sided groups are EXCLUDED; NULL keys drop their row.

    Scale shape: identical to :func:`psi_drift` — the shared
    two-sample reduced frame + one rollup.  No driver pulls."""
    if int(scale) < 1_000_000:
        raise ValueError("js_divergence: scale must be >= 1e6 "
                         "(coarser quantization distorts the "
                         "reported divergence)")
    g = [group_col] if group_col is not None else []
    c = _two_sample_counts(df_a, df_b, key_col, g)
    s = int(scale)
    c = (c.withColumn("__p", F.expr(
            f"CAST(CAST(__a AS DECIMAL(38,0)) * {s} DIV n_a "
            f"AS BIGINT)"))
          .withColumn("__q", F.expr(
            f"CAST(CAST(__b AS DECIMAL(38,0)) * {s} DIV n_b "
            f"AS BIGINT)"))
          .withColumn("__t", F.expr(
            "(CASE WHEN __p = 0 THEN CAST(0 AS DECIMAL(38,0)) "
            "ELSE CAST(__p AS DECIMAL(38,0)) * "
            "(CAST(round(ln(2 * __p) * 1000000, 0) AS BIGINT) "
            "- CAST(round(ln(__p + __q) * 1000000, 0) AS BIGINT)) "
            "END) + (CASE WHEN __q = 0 THEN CAST(0 AS DECIMAL(38,0)) "
            "ELSE CAST(__q AS DECIMAL(38,0)) * "
            "(CAST(round(ln(2 * __q) * 1000000, 0) AS BIGINT) "
            "- CAST(round(ln(__p + __q) * 1000000, 0) AS BIGINT)) "
            "END)")))
    return (c.groupBy(*g)
            .agg(F.max("n_a").alias("n_a"), F.max("n_b").alias("n_b"),
                 F.count(F.lit(1)).cast("long").alias("n_keys"),
                 F.sum(F.col("__t").cast("decimal(38,0)"))
                  .alias("__sum"))
            .select(*g, "n_a", "n_b", "n_keys",
                    F.expr("CAST(greatest(__sum, 0) DIV "
                           f"{2 * s} AS BIGINT)")
                     .alias("jsd_x1e6")))


def mean_confidence(df: DataFrame, value_col: str,
                    group_col: str | None = None,
                    z_x1000: int = 1960,
                    quantize_x: int | None = None) -> DataFrame:
    """Normal-approximation confidence interval for a per-group MEAN:
    ``(group?, n, mean, lo, hi)`` — the uncertainty band for
    continuous-valued data-card rows (mean length, mean quality
    score), completing :func:`rate_confidence`'s Wilson band for
    rates.  ``lo/hi = mean -/+ z * s / sqrt(n)`` with ``s`` the
    sample standard deviation and the rational ``z = z_x1000/1000``
    (default 1.960 ~ 95%).

    Determinism recipe: values must be integer-valued (the
    classifier_auc contract; ``quantize_x`` buckets raw doubles
    in-plan via ``round(v * q)`` — the reported mean/lo/hi are then
    in QUANTIZED units), so ``n``, ``sum`` and ``sum of squares``
    are exact DECIMAL(38,0) integers; the interval is ONE fixed
    IEEE expression tree spelled identically on both engines —
    ``se = sqrt((n*Sxx - S*S) / (n * n * (n - 1)))`` — rounded to
    4dp at the OUTPUT only (the rate_confidence float recipe).
    Exactness headroom: ``n * Sxx`` must fit DECIMAL(38,0)/HUGEINT —
    keep ``n * (n * max(v)^2)`` under ~1e38 per group (at 1e12 rows
    that allows |v| up to ~1e7 — quantize coarser past it).  Groups
    with n < 2 are EXCLUDED (s undefined — the one-class
    convention).  NULL values drop their row.

    Scale shape: ONE partial-agg groupBy — one row per group out;
    no windows, no joins, no driver pulls."""
    if int(z_x1000) < 0:
        raise ValueError("mean_confidence: z_x1000 must be >= 0")
    if quantize_x is not None and int(quantize_x) < 1:
        raise ValueError("mean_confidence: quantize_x must be >= 1")
    z = int(z_x1000)
    v = (F.col(value_col).cast("long") if quantize_x is None
         else F.round(F.col(value_col).cast("double")
                      * int(quantize_x)).cast("long"))
    g = [group_col] if group_col is not None else []
    dec = "decimal(38,0)"
    t = (df.filter(F.col(value_col).isNotNull())
         .select(*g, v.alias("__v"))
         .groupBy(*g)
         .agg(F.count(F.lit(1)).cast("long").alias("n"),
              F.sum(F.col("__v").cast(dec)).alias("__s"),
              F.sum(F.col("__v").cast(dec) * F.col("__v"))
               .alias("__sxx"))
         .filter(F.col("n") >= 2))
    # one expression tree, spelled once — the oracle mirrors it
    # token for token (the rate_confidence recipe)
    mean = "(CAST(__s AS DOUBLE) / CAST(n AS DOUBLE))"
    vnum = ("(CAST(n AS DOUBLE) * CAST(__sxx AS DOUBLE) "
            "- CAST(__s AS DOUBLE) * CAST(__s AS DOUBLE))")
    se = (f"sqrt({vnum} / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) "
          f"* CAST(n - 1 AS DOUBLE)))")
    half = f"(({z} / 1000.0) * {se})"
    return t.select(*g, "n",
                    F.expr(f"round({mean}, 4)").alias("mean"),
                    F.expr(f"round({mean} - {half}, 4)").alias("lo"),
                    F.expr(f"round({mean} + {half}, 4)").alias("hi"))
