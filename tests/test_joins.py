"""Join matrix (SURVEY.md §2.1 #8-14): CoGroup inner/left/right/outer/mixed,
keyless cross, self-join, HashJoin broadcast, BufferJoin, Merge."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cascading_flink_spark import (
    BufferJoin, CoGroup, DataFrameTap, Each, Every, Fields, FlowConnector,
    FlowDef, GroupBy, HashJoin, InnerJoin, LeftJoin, Merge, MixedJoin,
    OuterJoin, Pipe, RightJoin,
)
from cascading_flink_spark.operations import Count, Sum
from cascading_flink_spark.planner import PlannerError


def run(spark, tail, **sources):
    fd = FlowDef()
    for name, d in sources.items():
        fd.add_source(name, DataFrameTap(d))
    fd.add_tail(tail)
    return FlowConnector(spark).connect(fd).dataframe(tail.name)


@pytest.fixture(scope="module")
def lhs(spark):
    return spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, l string")


@pytest.fixture(scope="module")
def rhs(spark):
    return spark.createDataFrame([(2, "x"), (3, "y"), (4, "z")], "rid int, r string")


def test_cogroup_inner(spark, lhs, rhs):
    j = CoGroup([Pipe("L"), Pipe("R")], [Fields("id"), Fields("rid")])
    rows = {(r["id"], r["r"]) for r in run(spark, j, L=lhs, R=rhs).collect()}
    assert rows == {(2, "x"), (3, "y")}


def test_cogroup_left(spark, lhs, rhs):
    j = CoGroup([Pipe("L"), Pipe("R")], [Fields("id"), Fields("rid")], joiner=LeftJoin())
    rows = {(r["id"], r["r"]) for r in run(spark, j, L=lhs, R=rhs).collect()}
    assert rows == {(1, None), (2, "x"), (3, "y")}


def test_cogroup_right(spark, lhs, rhs):
    j = CoGroup([Pipe("L"), Pipe("R")], [Fields("id"), Fields("rid")], joiner=RightJoin())
    rows = {(r["rid"], r["l"]) for r in run(spark, j, L=lhs, R=rhs).collect()}
    assert rows == {(2, "b"), (3, "c"), (4, None)}


def test_cogroup_outer(spark, lhs, rhs):
    j = CoGroup([Pipe("L"), Pipe("R")], [Fields("id"), Fields("rid")], joiner=OuterJoin())
    assert run(spark, j, L=lhs, R=rhs).count() == 4


def test_cogroup_mixed_three_way(spark, lhs, rhs):
    j = CoGroup([Pipe("L"), Pipe("R"), Pipe("M")],
                [Fields("id"), Fields("rid"), Fields("mid")],
                joiner=MixedJoin([False, True, True]))
    m = lhs.sparkSession.createDataFrame([(2, "m2"), (5, "m5")], "mid int, m string")
    # Cascading flag convention: L required (False), R and M outer (True)
    # -> every L row emits, absent R/M null-padded
    rows = {(r["id"], r["r"], r["m"]) for r in run(spark, j, L=lhs, R=rhs, M=m).collect()}
    assert rows == {(1, None, None), (2, "x", "m2"), (3, "y", None)}


def test_cogroup_cross_keyless(spark, lhs, rhs):
    j = CoGroup([Pipe("L"), Pipe("R")], [Fields.NONE, Fields.NONE])
    assert run(spark, j, L=lhs, R=rhs).count() == 9


def test_self_join_needs_declared(spark, lhs):
    j = CoGroup([Pipe("L"), Pipe("L")], [Fields("id"), Fields("id")])
    with pytest.raises(PlannerError):
        run(spark, j, L=lhs)


def test_self_join_declared(spark, lhs):
    j = CoGroup([Pipe("L"), Pipe("L")], [Fields("id"), Fields("id")],
                declared_fields=Fields("id", "l", "id2", "l2"))
    rows = run(spark, j, L=lhs)
    assert rows.count() == 3
    assert rows.columns == ["id", "l", "id2", "l2"]


def test_num_self_joins(spark, lhs):
    j = CoGroup([Pipe("L")], [Fields("id")], num_self_joins=1,
                declared_fields=Fields("id", "l", "id2", "l2"))
    assert run(spark, j, L=lhs).count() == 3


def test_hashjoin_broadcast_plan(spark, lhs, rhs):
    j = HashJoin([Pipe("L"), Pipe("R")], [Fields("id"), Fields("rid")])
    df = run(spark, j, L=lhs, R=rhs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan
    assert df.count() == 2


def test_hashjoin_left(spark, lhs, rhs):
    j = HashJoin([Pipe("L"), Pipe("R")], [Fields("id"), Fields("rid")], joiner=LeftJoin())
    assert run(spark, j, L=lhs, R=rhs).count() == 3


def test_hashjoin_cross(spark, lhs, rhs):
    j = HashJoin([Pipe("L"), Pipe("R")], [Fields.NONE, Fields.NONE])
    assert run(spark, j, L=lhs, R=rhs).count() == 9


def test_nary_inner_chain(spark, lhs, rhs):
    m = lhs.sparkSession.createDataFrame([(2, 20), (3, 30)], "mid int, mv int")
    j = CoGroup([Pipe("L"), Pipe("R"), Pipe("M")],
                [Fields("id"), Fields("rid"), Fields("mid")])
    rows = {(r["id"], r["r"], r["mv"]) for r in run(spark, j, L=lhs, R=rhs, M=m).collect()}
    assert rows == {(2, "x", 20), (3, "y", 30)}


def test_bufferjoin_cogroup_apply(spark, lhs, rhs):
    def join_fn(key, left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # arbitrary join logic: emit key with left and right row counts
        return pd.DataFrame({"id": [key[0]], "nl": [len(left)], "nr": [len(right)]})

    j = CoGroup([Pipe("L"), Pipe("R")], [Fields("id"), Fields("rid")],
                joiner=BufferJoin(Fields("id", "nl", "nr"), join_fn,
                                  ["int", "long", "long"]))
    rows = {(r["id"], r["nl"], r["nr"]) for r in run(spark, j, L=lhs, R=rhs).collect()}
    assert rows == {(1, 1, 0), (2, 1, 1), (3, 1, 1), (4, 0, 1)}


def test_every_after_cogroup(spark, lhs, rhs):
    j = CoGroup([Pipe("L"), Pipe("R")], [Fields("id"), Fields("rid")])
    g = Every(GroupBy(j, Fields("id")), Fields("r"), Count("n"), Fields.ALL)
    rows = {r["id"]: r["n"] for r in run(spark, g, L=lhs, R=rhs).collect()}
    assert rows == {2: 1, 3: 1}


def test_merge_union(spark, lhs):
    a = Each(Pipe("L"), Fields("id"),
             __import__("cascading_flink_spark.operations", fromlist=["x"]).ExpressionFilter("id > 1"))
    b = Each(Pipe("L"), Fields("id"),
             __import__("cascading_flink_spark.operations", fromlist=["x"]).ExpressionFilter("id <= 1"))
    m = Merge([a, b])
    assert run(spark, m, L=lhs).count() == 3


def test_collision_without_declared_raises(spark, lhs):
    j = CoGroup([Pipe("L"), Pipe("L2")], [Fields("id"), Fields("id")])
    with pytest.raises(PlannerError):
        run(spark, j, L=lhs, L2=lhs)


def test_groupby_after_cogroup(spark, sf_dir_small_orders=None):
    """Join -> GroupBy over the join output (Cascading's
    CoGroupAfterEvery/GroupByAfterJoin platform shapes)."""
    o = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 7.0), (3, 20, 1.0), (4, 30, 2.0)],
        "okey int, cust int, amt double")
    c = spark.createDataFrame(
        [(10, "GOLD"), (20, "SILVER"), (30, "GOLD")], "ckey int, seg string")
    j = CoGroup([Pipe("o"), Pipe("c")], [Fields("cust"), Fields("ckey")],
                joiner=InnerJoin())
    g = Every(GroupBy(j, Fields("seg")), Fields("amt"),
              Sum(Fields("total"), "double"), Fields.ALL)
    got = {(r["seg"], r["total"]) for r in run(spark, g, o=o, c=c).collect()}
    assert got == {("GOLD", 14.0), ("SILVER", 1.0)}


def test_join_aggregated_branch_back(spark):
    """Fork: aggregate one branch, join it back to the detail rows
    (JoinsIntoCoGroup shape) — per-row share of group total."""
    o = spark.createDataFrame(
        [(1, 10, 5.0), (2, 10, 15.0), (3, 20, 4.0)],
        "okey int, cust int, amt double")
    detail = Pipe("o")
    tot = Every(GroupBy(Pipe("o"), Fields("cust")), Fields("amt"),
                Sum(Fields("cust_total"), "double"), Fields.ALL)
    j = CoGroup([detail, tot], [Fields("cust"), Fields("cust")],
                joiner=InnerJoin(), declared_fields=Fields(
                    "okey", "cust", "amt", "cust2", "cust_total"))
    got = {(r["okey"], r["amt"] / r["cust_total"])
           for r in run(spark, j, o=o).collect()}
    assert got == {(1, 0.25), (2, 0.75), (3, 1.0)}


def test_diamond_same_source_two_filters_join(spark):
    """Diamond: one source forked through two different filters, branches
    joined — planner memoization must keep the branches distinct."""
    from cascading_flink_spark.operations import ExpressionFilter
    from cascading_flink_spark.pipes import Rename
    d = spark.createDataFrame(
        [(1, 3), (2, 8), (3, 15), (4, 30)], "id int, v int")
    lo = Each(Pipe("d"), Fields("v"), ExpressionFilter("v >= 10"))
    lo2 = Rename(lo, Fields("id", "v"), Fields("lid", "lv"))
    hi = Each(Pipe("d"), Fields("v"), ExpressionFilter("v < 10"))
    j = CoGroup([lo2, hi], [Fields("lid"), Fields("id")], joiner=InnerJoin())
    got = {(r["id"], r["lv"], r["v"]) for r in run(spark, j, d=d).collect()}
    # lo2 keeps v<10 rows (ids 1,2); hi keeps v>=10 rows (ids 3,4) — no overlap
    assert got == set()
    # sanity: outer join sees all four ids across the two branches
    jo = CoGroup([lo2, hi], [Fields("lid"), Fields("id")], joiner=OuterJoin())
    rows = run(spark, jo, d=d).collect()
    ids = {r["lid"] or r["id"] for r in rows}
    assert ids == {1, 2, 3, 4}
