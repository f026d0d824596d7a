"""Round-10 fixes and operators: ADVICE-r9 guards (cohort_retention
epoch scope, pagerank seed validation, dsir_score_expr length check),
margin_mine's banded default, pagerank dangling-mass redistribution,
DSIR mixture-of-targets."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from cascading_flink_spark.extensions import (
    cohort_retention, dsir_bucket_weights, dsir_score_expr,
    dsir_weight_array, margin_candidates, margin_mine, pagerank,
)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------- cohort_retention epoch scope

def test_cohort_retention_drops_negative_epochs(spark):
    wk = 7 * 86400 * 1_000_000
    rows = [
        # user 1: one pre-1970 event (must be IGNORED) + week-1 activity
        (1, datetime.datetime(1969, 12, 30)),
        (1, datetime.datetime(1970, 1, 10)),
        # user 2: week-1 and week-2 activity
        (2, datetime.datetime(1970, 1, 9)),
        (2, datetime.datetime(1970, 1, 16)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.cohort_period, r.period_offset): r.n_users
           for r in cohort_retention(df, period_us=wk).collect()}
    # both users cohort at period 1 (Jan 8-14); the 1969 event neither
    # creates a period -1/0 cohort nor pulls user 1 earlier
    assert out == {(1, 0): 2, (1, 1): 1}


def test_cohort_retention_epoch_boundary_row_kept(spark):
    wk = 7 * 86400 * 1_000_000
    df = spark.createDataFrame(
        [(1, datetime.datetime(1970, 1, 1))], "user_id long, ts timestamp")
    out = cohort_retention(df, period_us=wk).collect()
    assert len(out) == 1 and out[0].cohort_period == 0


# ------------------------------------------------ pagerank seed validation

def test_pagerank_raises_on_seed_missing_from_graph(spark):
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    with pytest.raises(Exception, match="seed must appear in the graph"):
        pagerank(e, iterations=1, seeds=[0, 99]).collect()


def test_pagerank_raises_on_duplicate_seeds(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="distinct"):
        pagerank(e, iterations=1, seeds=[0, 0])


def test_pagerank_seeded_still_green_when_seeds_present(spark):
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)],
                              "src long, dst long")
    out = {r.node: r.rank_x
           for r in pagerank(e, iterations=2, seeds=[0]).collect()}
    assert set(out) == {0, 1, 2} and out[0] > 0


# ------------------------------------------- dsir_score_expr length check

def test_dsir_score_expr_rejects_wrong_length_weight_array():
    with pytest.raises(ValueError, match="len\\(lr\\)"):
        dsir_score_expr(F.lit("hello world"), [0, 0, 0], c0=0, buckets=8)


# ----------------------------------------------- margin_mine banded default

def test_margin_candidates_plan_has_no_cartesian(spark, sf_dir):
    """The DEFAULT candidate stage (the only stage whose shape changes
    with the candidate strategy — downstream margin math is checkpoint-
    pinned and identical on every path) must be banded equality joins,
    never a cross join.  margin_mine's internal localCheckpoint
    truncates ITS executed plan to a Scan ExistingRDD, so the assertion
    targets the candidate frame the default routes through."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.filter("vec_id % 2 = 0")
    b = emb.filter("vec_id % 2 = 1")
    p = _plan(margin_candidates(a, b))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Generate posexplode" in p  # the banded signature explode


def test_margin_mine_default_routes_through_banded_candidates(spark, sf_dir):
    """Default output == explicitly passing margin_candidates — proves
    the no-args spelling mines over the banded graph, not a cross
    join, and finds a non-trivial pair set on the near-dup corpus."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.filter("vec_id % 2 = 0")
    b = emb.filter("vec_id % 2 = 1")
    dflt = sorted(map(tuple, margin_mine(
        a, b, k=4, threshold_x1e4=10000).collect()))
    viac = sorted(map(tuple, margin_mine(
        a, b, k=4, threshold_x1e4=10000,
        candidates=margin_candidates(a, b)).collect()))
    assert dflt == viac and dflt
    for id_a, id_b, *_ in dflt:
        assert id_a % 2 == 0 and id_b % 2 == 1


def test_margin_mine_candidates_and_exact_mutually_exclusive(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cand = emb.selectExpr("vec_id AS id_a", "vec_id + 1 AS id_b")
    with pytest.raises(ValueError, match="not both"):
        margin_mine(emb, emb, candidates=cand, exact=True)


def test_dsir_weight_array_roundtrips_into_score_expr(spark):
    raw = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "dd ee ff")], "doc_id long, text string")
    tgt = spark.createDataFrame([(1, "aa bb")], "doc_id long, text string")
    wt = dsir_bucket_weights(raw, tgt, buckets=16)
    lr, c0 = dsir_weight_array(wt, buckets=16)
    col = dsir_score_expr(F.lit("aa bb"), lr, c0, buckets=16)
    assert raw.select(col.alias("s")).first()["s"] is not None
