"""Golden-output fixture suite in the reference's test style (SURVEY.md §5:
small deterministic inputs, exact tuple-multiset assertions — the shape of
Cascading's platform compatibility suite, FIXTURES.md §1).

Fixtures mirror the platform suite's canonical tables: ``lower``/``upper``
(same keys, lower/upper-case chars, duplicate keys present) and ``nums``.
"""

from __future__ import annotations

import pytest

# Round-15 (VERDICT r14 Next #2): brute-force property/golden suite —
# skipped on the default path, runs under SPARK_GRAFT_FULL_TESTS=1 /
# --runslow (the round-close full gate).
pytestmark = pytest.mark.slow


from cascading_flink_spark import (
    CoGroup, DataFrameTap, Each, Every, Fields, FlowConnector, FlowDef,
    GroupBy, HashJoin, InnerJoin, LeftJoin, Merge, OuterJoin, Pipe,
    RightJoin, Unique,
)
from cascading_flink_spark.operations import (
    Count, ExpressionFilter, First, FirstNBuffer, Last, Sum,
)

LOWER = [(1, "a"), (1, "b"), (2, "b"), (3, "c"), (4, "d"), (5, "e")]
UPPER = [(1, "A"), (2, "B"), (3, "C"), (3, "C2"), (6, "F")]
NUMS = [(i,) for i in range(1, 11)]


def run(spark, tail, **sources):
    fd = FlowDef()
    for name, rows_schema in sources.items():
        rows, schema = rows_schema
        fd.add_source(name, DataFrameTap(spark.createDataFrame(rows, schema)))
    fd.add_tail(tail)
    return FlowConnector(spark).connect(fd).dataframe(tail.name)


def tuples(df):
    # str-keyed sort: tuples contain None (outer joins), which has no <
    return sorted((tuple(r) for r in df.collect()), key=str)


@pytest.fixture(scope="module")
def srcs():
    return {
        "lower": (LOWER, "num int, ch string"),
        "upper": (UPPER, "numU int, chU string"),
        "nums": (NUMS, "num int"),
    }


def test_golden_inner_join(spark, srcs):
    j = CoGroup([Pipe("lower"), Pipe("upper")], [Fields("num"), Fields("numU")])
    assert tuples(run(spark, j, **srcs)) == sorted([
        (1, "a", 1, "A"), (1, "b", 1, "A"), (2, "b", 2, "B"),
        (3, "c", 3, "C"), (3, "c", 3, "C2"),
    ], key=str)


def test_golden_left_join(spark, srcs):
    j = CoGroup([Pipe("lower"), Pipe("upper")], [Fields("num"), Fields("numU")],
                joiner=LeftJoin())
    assert tuples(run(spark, j, **srcs)) == sorted([
        (1, "a", 1, "A"), (1, "b", 1, "A"), (2, "b", 2, "B"),
        (3, "c", 3, "C"), (3, "c", 3, "C2"),
        (4, "d", None, None), (5, "e", None, None),
    ], key=str)


def test_golden_right_join(spark, srcs):
    j = CoGroup([Pipe("lower"), Pipe("upper")], [Fields("num"), Fields("numU")],
                joiner=RightJoin())
    assert tuples(run(spark, j, **srcs)) == sorted([
        (1, "a", 1, "A"), (1, "b", 1, "A"), (2, "b", 2, "B"),
        (3, "c", 3, "C"), (3, "c", 3, "C2"),
        (None, None, 6, "F"),
    ], key=str)


def test_golden_outer_join(spark, srcs):
    j = CoGroup([Pipe("lower"), Pipe("upper")], [Fields("num"), Fields("numU")],
                joiner=OuterJoin())
    assert tuples(run(spark, j, **srcs)) == sorted([
        (1, "a", 1, "A"), (1, "b", 1, "A"), (2, "b", 2, "B"),
        (3, "c", 3, "C"), (3, "c", 3, "C2"),
        (4, "d", None, None), (5, "e", None, None),
        (None, None, 6, "F"),
    ], key=str)


def test_golden_hashjoin_matches_cogroup(spark, srcs):
    cg = CoGroup([Pipe("lower"), Pipe("upper")], [Fields("num"), Fields("numU")])
    hj = HashJoin([Pipe("lower"), Pipe("upper")], [Fields("num"), Fields("numU")])
    assert tuples(run(spark, cg, **srcs)) == tuples(run(spark, hj, **srcs))


def test_golden_groupby_count_sum(spark, srcs):
    g = GroupBy(Pipe("lower"), Fields("num"))
    e = Every(g, Fields.NONE, Count("n"), Fields.ALL)
    e = Every(e, Fields("num"), Sum("s"), Fields.ALL)
    assert tuples(run(spark, e, **srcs)) == sorted([
        (1, 2, 2), (2, 1, 2), (3, 1, 3), (4, 1, 4), (5, 1, 5)], key=str)


def test_golden_sorted_group_first_last(spark, srcs):
    g = GroupBy(Pipe("lower"), Fields("num"), sort_fields=Fields("ch"))
    e = Every(g, Fields("ch"), First("first_ch"), Fields.ALL)
    e = Every(e, Fields("ch"), Last("last_ch"), Fields.ALL)
    rows = {r["num"]: (r["first_ch"], r["last_ch"])
            for r in run(spark, e, **srcs).collect()}
    assert rows[1] == ("a", "b")


def test_golden_merge_then_group(spark, srcs):
    a = Each(Pipe("nums"), Fields("num"), ExpressionFilter("num > 5"))
    b = Each(Pipe("nums"), Fields("num"), ExpressionFilter("num <= 5"))
    m = Merge([a, b])
    g = Every(GroupBy(m, Fields.NONE), Fields("num"), Sum("total"), Fields.ALL)
    assert run(spark, g, **srcs).collect()[0]["total"] == 55


def test_golden_global_sort_reverse(spark, srcs):
    g = GroupBy(Pipe("nums"), Fields.NONE, sort_fields=Fields("num"),
                reverse_order=True)
    assert [r["num"] for r in run(spark, g, **srcs).collect()] == list(range(10, 0, -1))


def test_golden_topk(spark, srcs):
    g = GroupBy(Pipe("nums"), Fields.NONE, sort_fields=Fields("num"),
                reverse_order=True)
    e = Every(g, Fields.ALL, FirstNBuffer(3), Fields.ALL)
    assert sorted(r["num"] for r in run(spark, e, **srcs).collect()) == [8, 9, 10]


def test_golden_unique(spark, srcs):
    u = Unique(Pipe("lower"), Fields("ch"))
    assert run(spark, u, **srcs).count() == 5  # a b c d e (b dup dropped)
