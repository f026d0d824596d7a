"""Giant-group-safe BufferJoin (stream_left) and join-key comparators.

The reference streams cogroup input 0 without materializing it and spills
collected rhs groups over 10k tuples (CoGroupBufferClosure.java:213-246,
SpillingTupleCollectionFactory.java:41-49); ``stream_left=True`` is the
Spark twin — input 0 arrives in Arrow-batch chunks, so one hot key cannot
OOM an executor.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cascading_flink_spark import (
    BufferJoin, CoGroup, DataFrameTap, Fields, FlowConnector, FlowDef,
    HashJoin, InnerJoin, Pipe,
)
from cascading_flink_spark.planner import PlannerError


def run(spark, tail, **sources):
    fd = FlowDef()
    for name, d in sources.items():
        fd.add_source(name, DataFrameTap(d))
    fd.add_tail(tail)
    return FlowConnector(spark).connect(fd).dataframe(tail.name)


def _make_count_fn():
    # defined inside a factory so pickling captures the closure, not a
    # reference to this (executor-unimportable) test module
    def count_fn(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # distributive over left chunks: one output row per call
        return pd.DataFrame({"id": [key[0]], "nl": [len(left)],
                             "nr": [len(right)]})
    return count_fn


@pytest.fixture(scope="module")
def lhs(spark):
    return spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, l string")


@pytest.fixture(scope="module")
def rhs(spark):
    return spark.createDataFrame([(2, "x"), (3, "y"), (4, "z")], "rid int, r string")


def test_streamed_matches_materialized_small(spark, lhs, rhs):
    """On small groups (one chunk per key) the streamed path must agree
    with the materialized path exactly."""
    jm = CoGroup([Pipe("L"), Pipe("R")], [Fields("id"), Fields("rid")],
                 joiner=BufferJoin(Fields("id", "nl", "nr"), _make_count_fn(),
                                   ["int", "long", "long"]))
    js = CoGroup([Pipe("L"), Pipe("R")], [Fields("id"), Fields("rid")],
                 joiner=BufferJoin(Fields("id", "nl", "nr"), _make_count_fn(),
                                   ["int", "long", "long"], stream_left=True))
    mat = {tuple(r) for r in run(spark, jm, L=lhs, R=rhs).collect()}
    str_ = {tuple(r) for r in run(spark, js, L=lhs, R=rhs).collect()}
    assert str_ == mat == {(1, 1, 0), (2, 1, 1), (3, 1, 1), (4, 0, 1)}


def test_giant_group_streams_in_chunks(spark):
    """One key holding 10^6 input-0 rows: the streamed path must call fn
    once per Arrow chunk (bounded memory), never with the whole group."""
    big = (spark.range(1_000_000)
           .select(F.lit(7).alias("k"), F.col("id").alias("v")))
    small = spark.createDataFrame([(7, "only")], "rk int, tag string")

    def chunk_fn(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [key[0]], "chunk_rows": [len(left)],
                             "nr": [len(right)]})

    j = CoGroup([Pipe("B"), Pipe("S")], [Fields("k"), Fields("rk")],
                joiner=BufferJoin(Fields("k", "chunk_rows", "nr"), chunk_fn,
                                  ["int", "long", "long"], stream_left=True))
    rows = run(spark, j, B=big, S=small).collect()
    total = sum(r["chunk_rows"] for r in rows)
    max_chunk = max(r["chunk_rows"] for r in rows)
    assert total == 1_000_000
    assert len(rows) > 10, "giant group was not chunked"
    assert max_chunk <= 10_000, f"chunk of {max_chunk} rows exceeds Arrow batch"
    assert all(r["nr"] == 1 for r in rows), "rhs group not visible in every chunk"


def test_streamed_nway(spark, lhs, rhs):
    m = spark.createDataFrame([(2, 20), (5, 50)], "mid int, mv int")

    def fn3(key, a, b, c):
        return pd.DataFrame({"id": [key[0]], "na": [len(a)], "nb": [len(b)],
                             "nc": [len(c)]})

    j = CoGroup([Pipe("L"), Pipe("R"), Pipe("M")],
                [Fields("id"), Fields("rid"), Fields("mid")],
                joiner=BufferJoin(Fields("id", "na", "nb", "nc"), fn3,
                                  ["int", "long", "long", "long"],
                                  stream_left=True))
    rows = {tuple(r) for r in run(spark, j, L=lhs, R=rhs, M=m).collect()}
    assert rows == {(1, 1, 0, 0), (2, 1, 1, 1), (3, 1, 1, 0), (4, 0, 1, 0),
                    (5, 0, 0, 1)}


def test_join_key_comparator_case_insensitive(spark):
    l = spark.createDataFrame([("Alice", 1), ("BOB", 2)], "name_l string, a int")
    r = spark.createDataFrame([("alice", 10), ("bob", 20), ("carol", 30)],
                              "name_r string, b int")
    j = CoGroup([Pipe("L"), Pipe("R")], [Fields("name_l"), Fields("name_r")],
                comparators={"name_l": "lower(name_l)",
                             "name_r": "lower(name_r)"})
    rows = {(row["name_l"], row["b"]) for row in run(spark, j, L=l, R=r).collect()}
    assert rows == {("Alice", 10), ("BOB", 20)}
    # HashJoin honors them too
    h = HashJoin([Pipe("L"), Pipe("R")], [Fields("name_l"), Fields("name_r")],
                 joiner=InnerJoin(),
                 comparators={"name_l": "lower(name_l)",
                              "name_r": "lower(name_r)"})
    hrows = {(row["name_l"], row["b"]) for row in run(spark, h, L=l, R=r).collect()}
    assert hrows == rows


def test_comparator_rejected_on_bufferjoin(spark, lhs, rhs):
    j = CoGroup([Pipe("L"), Pipe("R")], [Fields("id"), Fields("rid")],
                joiner=BufferJoin(Fields("id", "nl", "nr"), _make_count_fn(),
                                  ["int", "long", "long"]),
                comparators={"id": "id"})
    with pytest.raises(PlannerError, match="comparators"):
        run(spark, j, L=lhs, R=rhs)

def test_streamed_null_key_group_spans_batches(spark):
    """Null join keys form ONE cogroup (Cascading groups null tuples
    together).  The streamed path's group-change check must be NaN-safe:
    nulls surface as NaN in pandas groupby keys and NaN != NaN, so without
    normalization a null-key group spanning two Arrow batches was split —
    discarding rhs state and emitting a spurious empty-lhs call."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "100")
    try:
        big = (spark.range(500)
               .select(F.lit(None).cast("int").alias("k"),
                       F.col("id").alias("v")))
        small = spark.createDataFrame([(None, "null-tag")], "rk int, tag string")

        def chunk_fn(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"k": [key[0]], "nl": [len(left)],
                                 "nr": [len(right)]})

        j = CoGroup([Pipe("B"), Pipe("S")], [Fields("k"), Fields("rk")],
                    joiner=BufferJoin(Fields("k", "nl", "nr"), chunk_fn,
                                      ["int", "long", "long"],
                                      stream_left=True))
        rows = run(spark, j, B=big, S=small).collect()
        assert sum(r["nl"] for r in rows) == 500
        assert len(rows) >= 5, "null-key group did not span batches"
        # rhs state retained across every chunk of the null-key group
        assert all(r["nr"] == 1 for r in rows), [tuple(r) for r in rows]
        # no spurious empty-lhs emission mid-group
        assert all(r["nl"] > 0 for r in rows)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
