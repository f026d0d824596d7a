"""As-of and range joins (extensions/temporal.py).

Semantics pinned against pandas.merge_asof-style expectations built by
hand; plan shape asserted shuffled-equi-join (never a nested loop) for
range_join.  Reference users hand-roll these over CoGroup+Buffer
(cascading/pipe/assembly has no temporal join); here they are first-class.
"""
from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cascading_flink_spark.extensions.temporal import asof_join, range_join
from __spark_entry__ import _t


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.fixture(scope="module")
def quotes(spark):
    return spark.createDataFrame([
        Row(sym="A", qts=_ts(1), px=1.0),
        Row(sym="A", qts=_ts(5), px=2.0),
        Row(sym="A", qts=_ts(9), px=3.0),
        Row(sym="B", qts=_ts(4), px=10.0),
    ])


@pytest.fixture(scope="module")
def trades(spark):
    return spark.createDataFrame([
        Row(sym="A", tts=_ts(0), qty=1),   # before any quote
        Row(sym="A", tts=_ts(5), qty=2),   # exact tie -> inclusive
        Row(sym="A", tts=_ts(7), qty=3),   # between quotes
        Row(sym="B", tts=_ts(30), qty=4),  # far after the only quote
        Row(sym="C", tts=_ts(2), qty=5),   # key with no quotes at all
    ])


def _collect(df, *order):
    return [r.asDict() for r in df.orderBy(*order).collect()]


def test_asof_backward(spark, trades, quotes):
    out = asof_join(trades, quotes, on="sym", left_ts="tts",
                    right_ts="qts", right_cols={"px": "px"})
    rows = _collect(out, "sym", "tts")
    assert [(r["sym"], r["qty"], r["px"]) for r in rows] == [
        ("A", 1, None), ("A", 2, 2.0), ("A", 3, 2.0),
        ("B", 4, 10.0), ("C", 5, None)]


def test_asof_forward(spark, trades, quotes):
    out = asof_join(trades, quotes, on="sym", left_ts="tts",
                    right_ts="qts", right_cols={"px": "px"},
                    direction="forward")
    rows = _collect(out, "sym", "tts")
    assert [(r["sym"], r["qty"], r["px"]) for r in rows] == [
        ("A", 1, 1.0), ("A", 2, 2.0), ("A", 3, 3.0),
        ("B", 4, None), ("C", 5, None)]


def test_asof_tolerance(spark, trades, quotes):
    out = asof_join(trades, quotes, on="sym", left_ts="tts",
                    right_ts="qts", right_cols={"px": "px"},
                    tolerance_seconds=2.0)
    rows = _collect(out, "sym", "tts")
    # B@30 matched quote@4 (gap 26s) without tolerance; now null.
    assert [(r["sym"], r["qty"], r["px"]) for r in rows] == [
        ("A", 1, None), ("A", 2, 2.0), ("A", 3, 2.0),
        ("B", 4, None), ("C", 5, None)]


def test_asof_default_right_cols_and_left_columns_preserved(
        spark, trades, quotes):
    out = asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts")
    assert out.columns == ["sym", "tts", "qty", "r_px"]


def test_asof_bad_direction(trades, quotes):
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="sym", left_ts="tts",
                  right_ts="qts", direction="sideways")


def test_range_join_exact_pairs(spark, trades, quotes):
    l = trades.withColumnRenamed("qty", "l_qty")
    r = quotes
    out = range_join(l, r, on="sym", left_ts="tts", right_ts="qts",
                     lower_seconds=0.0, upper_seconds=5.0)
    pairs = sorted((r["sym"], r["l_qty"], r["px"])
                   for r in (x.asDict() for x in out.collect()))
    # trade@0 -> quotes@1,5; trade@5 -> quote@5,9; trade@7 -> quote@9
    assert pairs == [("A", 1, 1.0), ("A", 1, 2.0), ("A", 2, 2.0),
                     ("A", 2, 3.0), ("A", 3, 3.0)]
    assert "px" in out.columns and out.columns.count("sym") == 1


def test_range_join_negative_window(spark, trades, quotes):
    out = range_join(trades, quotes, on="sym", left_ts="tts",
                     right_ts="qts", lower_seconds=-3.0, upper_seconds=-1.0)
    pairs = sorted((r["sym"], r["qty"], r["px"])
                   for r in (x.asDict() for x in out.collect()))
    # quote in [tts-3, tts-1]: trade@5 -> quote@... qts-tts in [-3,-1]
    # trade@5: quotes@{1? -4 no}  ... quote@ 5-3..5-1 = [2,4] -> none for A;
    # trade@7 -> quote@5 (delta -2); B trade@30 -> none; quote@4 for B trade? 4-30=-26 no
    assert pairs == [("A", 3, 2.0)]


def test_range_join_matches_brute_force(spark, sf_dir):
    """Bucketed equi-join == brute-force theta join on real events data."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    clicks = ev.filter(F.col("event_type") == "click") \
        .select(F.col("event_id").alias("click_id"), "user_id", "ts_us")
    buys = ev.filter(F.col("event_type") == "purchase") \
        .select(F.col("event_id").alias("purchase_id"), "user_id",
                F.col("ts_us").alias("p_ts_us"))
    got = range_join(clicks, buys, on="user_id", left_ts="ts_us",
                     right_ts="p_ts_us", lower_seconds=0,
                     upper_seconds=3600_000_000)
    brute = clicks.join(buys.withColumnRenamed("user_id", "u2"),
                        (F.col("user_id") == F.col("u2")) &
                        (F.col("p_ts_us") - F.col("ts_us") >= 0) &
                        (F.col("p_ts_us") - F.col("ts_us") <= 3600_000_000))
    assert sorted((r.click_id, r.purchase_id) for r in got.collect()) == \
        sorted((r.click_id, r.purchase_id) for r in brute.collect())


def test_range_join_same_lineage_shared_ts_name(spark, sf_dir):
    """Both sides split from ONE events scan AND the two timestamp columns
    share a name: the classic self-join ambiguity.  The qualified
    alias-first condition must neither degenerate to a trivially-true
    equals nor bind both timestamp refs to one side (regression for the
    pre-alias l[on] == r[on] construction)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "ts_us", F.unix_micros(F.col("ts").cast("timestamp")))
    clicks = ev.filter(F.col("event_type") == "click") \
        .select(F.col("event_id").alias("click_id"), "user_id", "ts_us")
    buys = ev.filter(F.col("event_type") == "purchase") \
        .select(F.col("event_id").alias("purchase_id"), "user_id", "ts_us")
    got = range_join(clicks, buys, on="user_id", left_ts="ts_us",
                     right_ts="ts_us", lower_seconds=0,
                     upper_seconds=3600_000_000)
    brute = clicks.join(
        buys.withColumnRenamed("user_id", "u2")
            .withColumnRenamed("ts_us", "p_ts_us"),
        (F.col("user_id") == F.col("u2")) &
        (F.col("p_ts_us") - F.col("ts_us") >= 0) &
        (F.col("p_ts_us") - F.col("ts_us") <= 3600_000_000))
    assert sorted((r.click_id, r.purchase_id)
                  for r in got.select("click_id", "purchase_id").collect()) \
        == sorted((r.click_id, r.purchase_id) for r in brute.collect())
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_plan_no_nested_loop(spark, trades, quotes):
    out = range_join(trades, quotes, on="sym", left_ts="tts",
                     right_ts="qts", lower_seconds=0.0, upper_seconds=5.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_range_join_validates(trades, quotes):
    with pytest.raises(ValueError):
        range_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts",
                   lower_seconds=5.0, upper_seconds=1.0)
    with pytest.raises(ValueError):
        range_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts",
                   lower_seconds=0.0, upper_seconds=1.0, how="left")


def test_asof_matches_duckdb_asof_join(spark, sf_dir):
    """Cross-engine pin on real data: DuckDB's native ASOF LEFT JOIN."""
    duckdb = pytest.importorskip("duckdb")
    ev = _t(spark, sf_dir, "events")
    buys = ev.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts")
    clicks = ev.filter(F.col("event_type") == "click") \
        .select("user_id", "ts",
                F.unix_micros(F.col("ts").cast("timestamp"))
                 .alias("click_ts_us"))
    got = asof_join(buys, clicks, on="user_id", left_ts="ts",
                    right_ts="ts", right_cols={"click_ts_us": "click_ts_us"})
    got_rows = sorted((r.event_id, r.click_ts_us) for r in got.collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{sf_dir}/events.parquet'")
    exp = con.execute("""
        SELECT p.event_id, epoch_us(c.ts) AS click_ts_us
        FROM (SELECT * FROM events WHERE event_type='purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='click') c
          ON p.user_id = c.user_id AND p.ts >= c.ts
    """).fetchall()
    assert got_rows == sorted(exp)


def test_asof_salted_matches_unsalted(spark, trades, quotes):
    """salt=N must be a pure execution-strategy change: identical output."""
    base = asof_join(trades, quotes, on="sym", left_ts="tts",
                     right_ts="qts", right_cols={"px": "px"})
    salted = asof_join(trades, quotes, on="sym", left_ts="tts",
                       right_ts="qts", right_cols={"px": "px"}, salt=4)
    assert _collect(salted, "sym", "tts") == _collect(base, "sym", "tts")


def test_asof_salt_validates(trades, quotes):
    with pytest.raises(ValueError):
        asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts",
                  salt=1)


def test_asof_hot_key_salted_1m(spark):
    """10^6 left rows on ONE key: salt=8 splits the per-key window across
    partitions (the unsalted plan would sort the whole key in one task).
    Every match is formula-checkable, so correctness is asserted
    distributively over the full million rows — no driver collect."""
    left = spark.range(1_000_000).select(
        F.lit("hot").alias("k"), F.col("id").cast("double").alias("lts"))
    right = (spark.range(1000)
             .select(F.lit("hot").alias("k"),
                     (F.col("id") * 1000).cast("double").alias("rts"),
                     (F.col("id") * 1000).cast("double").alias("px")))
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                    right_cols={"px": "px"}, salt=8)
    # backward match for lts=i is the greatest multiple of 1000 <= i
    bad = out.filter(F.col("px") != F.floor(F.col("lts") / 1000) * 1000)
    assert bad.count() == 0
    assert out.count() == 1_000_000
