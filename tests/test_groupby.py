"""GroupBy family (SURVEY.md §2.1 #4-7): keyed agg, secondary sort,
reverse order, keyless/global, group-over-merge, buffers."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cascading_flink_spark import (
    AverageBy, CountBy, DataFrameTap, Each, Every, Fields, FirstBy,
    FlowConnector, FlowDef, GroupBy, MaxBy, MinBy, Pipe, SumBy, Unique,
)
from cascading_flink_spark.operations import (
    Average, Collect, Count, First, FirstNBuffer, Last, Max, MaxValue, Min,
    MinValue, PyBuffer, Sum,
)


def run(spark, tail, **sources):
    fd = FlowDef()
    for name, d in sources.items():
        fd.add_source(name, DataFrameTap(d))
    fd.add_tail(tail)
    return FlowConnector(spark).connect(fd).dataframe(tail.name)


@pytest.fixture(scope="module")
def sales(spark):
    return spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("a", 3, 5.0),
         ("b", 4, 7.0), ("b", 5, 3.0)],
        "k string, seq int, v double")


def test_keyed_agg_chain(spark, sales):
    g = GroupBy(Pipe("s"), Fields("k"))
    e1 = Every(g, Fields("v"), Sum("total"), Fields.ALL)
    e2 = Every(e1, Fields("v"), Count("n"), Fields.ALL)
    e3 = Every(e2, Fields("v"), Average("avg_v"), Fields.ALL)
    rows = {r["k"]: r for r in run(spark, e3, s=sales).collect()}
    assert rows["a"]["total"] == 35.0 and rows["a"]["n"] == 3
    assert rows["b"]["avg_v"] == 5.0


def test_min_max_value(spark, sales):
    g = GroupBy(Pipe("s"), Fields("k"))
    e = Every(g, Fields("v"), MinValue("lo"), Fields.ALL)
    e = Every(e, Fields("v"), MaxValue("hi"), Fields.ALL)
    rows = {r["k"]: (r["lo"], r["hi"]) for r in run(spark, e, s=sales).collect()}
    assert rows == {"a": (5.0, 20.0), "b": (3.0, 7.0)}


def test_sorted_first_last(spark, sales):
    g = GroupBy(Pipe("s"), Fields("k"), sort_fields=Fields("seq"))
    e = Every(g, Fields("v"), First("first_v"), Fields.ALL)
    e = Every(e, Fields("v"), Last("last_v"), Fields.ALL)
    rows = {r["k"]: (r["first_v"], r["last_v"]) for r in run(spark, e, s=sales).collect()}
    assert rows == {"a": (10.0, 5.0), "b": (7.0, 3.0)}


def test_reverse_sorted_first(spark, sales):
    g = GroupBy(Pipe("s"), Fields("k"), sort_fields=Fields("seq"), reverse_order=True)
    e = Every(g, Fields("v"), First("first_v"), Fields.ALL)
    rows = {r["k"]: r["first_v"] for r in run(spark, e, s=sales).collect()}
    assert rows == {"a": 5.0, "b": 3.0}


def test_collect_sorted(spark, sales):
    g = GroupBy(Pipe("s"), Fields("k"), sort_fields=Fields("seq"))
    e = Every(g, Fields("v"), Collect("vs"), Fields.ALL)
    rows = {r["k"]: r["vs"] for r in run(spark, e, s=sales).collect()}
    assert rows["a"] == [10.0, 20.0, 5.0]


def test_global_agg(spark, sales):
    g = GroupBy(Pipe("s"), Fields.NONE)
    e = Every(g, Fields("v"), Sum("total"), Fields.ALL)
    assert run(spark, e, s=sales).collect()[0]["total"] == 45.0


def test_global_sort(spark, sales):
    g = GroupBy(Pipe("s"), Fields.NONE, sort_fields=Fields("v"), reverse_order=True)
    vs = [r["v"] for r in run(spark, g, s=sales).collect()]
    assert vs == sorted(vs, reverse=True)


def test_group_over_merged_branches(spark, sales):
    a = Each(Pipe("s"), Fields("v"),
             __import__("cascading_flink_spark.operations", fromlist=["ExpressionFilter"]).ExpressionFilter("v >= 10"))
    b = Each(Pipe("s"), Fields("v"),
             __import__("cascading_flink_spark.operations", fromlist=["ExpressionFilter"]).ExpressionFilter("v < 10"))
    g = GroupBy([a, b], Fields("k"))
    e = Every(g, Fields("v"), Count("n"), Fields.ALL)
    rows = {r["k"]: r["n"] for r in run(spark, e, s=sales).collect()}
    assert rows == {"a": 3, "b": 2}


def test_firstn_buffer(spark, sales):
    g = GroupBy(Pipe("s"), Fields("k"), sort_fields=Fields("v"), reverse_order=True)
    e = Every(g, Fields.ALL, FirstNBuffer(2), Fields.ALL)
    out = run(spark, e, s=sales)
    rows = {(r["k"], r["v"]) for r in out.collect()}
    assert rows == {("a", 20.0), ("a", 10.0), ("b", 7.0), ("b", 3.0)}


def test_py_buffer_sorted_iteration(spark, sales):
    def delta(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "k": pdf["k"].iloc[:1],
            "span": [pdf["v"].iloc[-1] - pdf["v"].iloc[0]],
        })

    g = GroupBy(Pipe("s"), Fields("k"), sort_fields=Fields("seq"))
    e = Every(g, Fields.ALL, PyBuffer(Fields("k", "span"), delta,
                                      ["string", "double"]), Fields.ALL)
    rows = {r["k"]: r["span"] for r in run(spark, e, s=sales).collect()}
    assert rows == {"a": -5.0, "b": -4.0}


def test_aggregateby_sugar(spark, sales):
    rows = {r["k"]: r["n"] for r in run(spark, CountBy(Pipe("s"), Fields("k"), "n"), s=sales).collect()}
    assert rows == {"a": 3, "b": 2}
    rows = {r["k"]: r["t"] for r in run(spark, SumBy(Pipe("s"), Fields("k"), "v", "t"), s=sales).collect()}
    assert rows == {"a": 35.0, "b": 10.0}
    rows = {r["k"]: r["m"] for r in run(spark, MinBy(Pipe("s"), Fields("k"), "v", "m"), s=sales).collect()}
    assert rows == {"a": 5.0, "b": 3.0}
    rows = {r["k"]: r["fv"] for r in
            run(spark, FirstBy(Pipe("s"), Fields("k"), "v", "fv", sort_fields=Fields("seq")), s=sales).collect()}
    assert rows == {"a": 10.0, "b": 7.0}


def test_unique(spark, sales):
    u = Unique(Pipe("s"), Fields("k"))
    assert run(spark, u, s=sales).count() == 2


def test_groupby_num_partitions_hint(spark):
    """Per-grouping DOP hint — the reference's per-node setParallelism
    (FlinkFlowStep.java:426) — must appear as an explicit (AQE-exempt)
    repartition in the plan for both agg and buffer paths."""
    import pandas as pd
    from cascading_flink_spark import (DataFrameTap, Every, Fields, FlowDef,
                                       FlowConnector, GroupBy, Pipe)
    from cascading_flink_spark.operations import Count
    from cascading_flink_spark.operations.buffers import PyBuffer

    df = spark.range(500).selectExpr("id % 17 as k", "id as v")

    def run(tail):
        fd = FlowDef().add_source("d", DataFrameTap(df)).add_tail(tail)
        return FlowConnector(spark).connect(fd).dataframe(tail.name)

    agg = Every(GroupBy(Pipe("d"), Fields("k"), num_partitions=5),
                Fields.NONE, Count("n"), Fields.ALL)
    out = run(agg)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "REPARTITION_BY_NUM" in plan
    assert out.count() == 17

    def span(pdf):
        return pd.DataFrame({"k": pdf["k"].iloc[:1], "n": [len(pdf)]})
    buf = Every(GroupBy(Pipe("d"), Fields("k"), num_partitions=7),
                Fields.ALL, PyBuffer(Fields("k", "n"), span, ["long", "long"]),
                Fields.ALL)
    out2 = run(buf)
    assert sum(r["n"] for r in out2.collect()) == 500
