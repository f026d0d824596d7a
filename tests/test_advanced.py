"""n-way BufferJoin (tagged union), custom comparators, script aliases."""

from __future__ import annotations

import pandas as pd
import pytest

from cascading_flink_spark import (
    BufferJoin, CoGroup, DataFrameTap, Every, Fields, FlowConnector, FlowDef,
    GroupBy, Pipe,
)
from cascading_flink_spark.operations import Collect, First, ScriptFilter, ScriptFunction


def run(spark, tail, **sources):
    fd = FlowDef()
    for name, d in sources.items():
        fd.add_source(name, DataFrameTap(d))
    fd.add_tail(tail)
    return FlowConnector(spark).connect(fd).dataframe(tail.name)


@pytest.mark.slow  # r15: heavy, round-close full gate only
def test_nway_bufferjoin(spark):
    a = spark.createDataFrame([(1, "a1"), (2, "a2")], "k int, av string")
    b = spark.createDataFrame([(1, "b1"), (3, "b3")], "k int, bv string")
    c = spark.createDataFrame([(1, "c1"), (1, "c1b")], "k int, cv string")

    def fn(key, pa: pd.DataFrame, pb: pd.DataFrame, pc: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"k": [key[0]], "na": [len(pa)], "nb": [len(pb)],
                             "nc": [len(pc)]})

    j = CoGroup([Pipe("A"), Pipe("B"), Pipe("C")],
                [Fields("k"), Fields("k"), Fields("k")],
                declared_fields=Fields("ka", "av", "kb", "bv", "kc", "cv"),
                joiner=BufferJoin(Fields("k", "na", "nb", "nc"), fn,
                                  ["int", "long", "long", "long"]))
    rows = {r["k"]: (r["na"], r["nb"], r["nc"])
            for r in run(spark, j, A=a, B=b, C=c).collect()}
    assert rows == {1: (1, 1, 2), 2: (1, 0, 0), 3: (0, 1, 0)}


def test_custom_comparator_sort(spark):
    df = spark.createDataFrame(
        [("g", "bbbb"), ("g", "c"), ("g", "aa")], "k string, s string")
    # sort group values by LENGTH of s (custom comparator), not lexical
    g = GroupBy(Pipe("src"), Fields("k"), sort_fields=Fields("s"),
                comparators={"s": "length(s)"})
    e = Every(g, Fields("s"), Collect("ordered"), Fields.ALL)
    rows = run(spark, e, src=df).collect()
    assert rows[0]["ordered"] == ["c", "aa", "bbbb"]

    g2 = GroupBy(Pipe("src"), Fields("k"), sort_fields=Fields("s"),
                 comparators={"s": "length(s)"}, reverse_order=True)
    e2 = Every(g2, Fields("s"), First("longest"), Fields.ALL)
    assert run(spark, e2, src=df).collect()[0]["longest"] == "bbbb"


def test_script_aliases(spark):
    df = spark.createDataFrame([(1,), (5,)], "v int")
    p = Pipe("src")
    from cascading_flink_spark import Each
    fn = ScriptFunction(Fields("sq"), lambda pdf: pd.DataFrame({"sq": pdf["v"] ** 2}), ["long"])
    sq = Each(p, Fields("v"), fn, Fields.ALL)
    flt = Each(sq, Fields("sq"), ScriptFilter(lambda pdf: pdf["sq"] > 10))
    rows = run(spark, flt, src=df).collect()
    assert [(r["v"], r["sq"]) for r in rows] == [(5, 25)]


def test_intersect_except_rollup(spark):
    from cascading_flink_spark import Cube, Except, Intersect, Rollup
    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], "v int")
    b = spark.createDataFrame([(2,), (3,), (4,)], "v int")
    i = Intersect([Pipe("A"), Pipe("B")])
    assert sorted(r["v"] for r in run(spark, i, A=a, B=b).collect()) == [2, 3]
    e = Except([Pipe("A"), Pipe("B")])
    assert [r["v"] for r in run(spark, e, A=a, B=b).collect()] == [1]
    ea = Except([Pipe("A"), Pipe("B")], keep_duplicates=True)
    assert sorted(r["v"] for r in run(spark, ea, A=a, B=b).collect()) == [1, 2]

    sales = spark.createDataFrame(
        [("x", "p", 1.0), ("x", "q", 2.0), ("y", "p", 3.0)],
        "region string, product string, amt double")
    r = Rollup(Pipe("S"), Fields("region", "product"),
               {"total": "sum(amt)"})
    rows = {(x["region"], x["product"]): x["total"]
            for x in run(spark, r, S=sales).collect()}
    assert rows[("x", None)] == 3.0 and rows[(None, None)] == 6.0
    c = Cube(Pipe("S"), Fields("region", "product"), {"total": "sum(amt)"})
    crows = {(x["region"], x["product"]): x["total"]
             for x in run(spark, c, S=sales).collect()}
    assert crows[(None, "p")] == 4.0  # cube-only combination


def test_pivot(spark):
    from cascading_flink_spark import Pivot
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 3)], "k string, p string, v int")
    pv = Pivot(Pipe("S"), Fields("k"), "p", ["x", "y"], agg_expr="sum(v)")
    rows = {r["k"]: (r["x"], r["y"]) for r in run(spark, pv, S=df).collect()}
    assert rows == {"a": (1, 2), "b": (3, None)}
