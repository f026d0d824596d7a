"""Coverage for the remaining SURVEY §2.2 rows: DateParser, FieldFormatter,
RegexMatcher, Status, assertions (strict + plan-time stripping), sink
parallelism."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from cascading_flink_spark import (
    DataFrameTap, Each, Fields, FlowConnector, FlowDef, Hfs, ParquetScheme,
    Pipe, SinkMode, TextDelimited,
)
from cascading_flink_spark.operations import (
    AssertionLevel, AssertNotNull, AssertSizeEquals, DateParser,
    FieldFormatter, RegexMatcher, Status,
)


def run(spark, df, tail, assertion_level=AssertionLevel.STRICT):
    fd = (FlowDef().add_source("src", DataFrameTap(df)).add_tail(tail)
          .set_assertion_level(assertion_level))
    return FlowConnector(spark).connect(fd).dataframe(tail.name)


def test_date_parser(spark):
    df = spark.createDataFrame([("2024/03/05",), ("1999/12/31",)], "d string")
    p = Each(Pipe("src"), Fields("d"), DateParser(Fields("ts"), "yyyy/MM/dd"),
             Fields.ALL)
    rows = run(spark, df, p).collect()
    assert {r["ts"].year for r in rows} == {2024, 1999}
    # parity mode: epoch millis long
    p2 = Each(Pipe("src"), Fields("d"),
              DateParser(Fields("ms"), "yyyy/MM/dd", as_long=True), Fields.ALL)
    rows2 = run(spark, df, p2).collect()
    assert all(isinstance(r["ms"], int) for r in rows2)
    assert any(r["ms"] == 946598400000 for r in rows2)  # 1999-12-31 UTC


def test_date_parser_millis_preserved(spark):
    """Cascading's DateParser emits FULL epoch millis; sub-second precision
    must survive as_long parity mode."""
    # .123: the IEEE double of the fractional second is 122.999...e-3, so a
    # floor(double*1000) path would emit 122 — unix_millis must stay exact
    df = spark.createDataFrame(
        [("2024/03/05 10:00:00.123",), ("2024/03/05 10:00:00.001",),
         ("2024/03/05 10:00:00.999",)], "d string")
    p = Each(Pipe("src"), Fields("d"),
             DateParser(Fields("ms"), "yyyy/MM/dd HH:mm:ss.SSS", as_long=True),
             Fields.ALL)
    got = sorted(r["ms"] for r in run(spark, df, p).collect())
    assert got == [1709632800001, 1709632800123, 1709632800999]


def test_intermediate_every_selector_rejected(spark):
    """Selectors on intermediate Everys in a chain would be silently
    ignored (the chain compiles to one aggregation) — reject at plan time."""
    from cascading_flink_spark import Every, GroupBy
    from cascading_flink_spark.operations import Count, Sum
    from cascading_flink_spark.planner import PlannerError

    df = spark.createDataFrame([(1, 2)], "k int, v int")
    g = GroupBy(Pipe("src"), Fields("k"))
    e1 = Every(g, Fields("v"), Count("n"), Fields("k", "n"))  # non-ALL
    e2 = Every(e1, Fields("v"), Sum("s"), Fields.ALL)
    with pytest.raises(PlannerError, match="intermediate Everys"):
        run(spark, df, e2)


def test_field_formatter(spark):
    df = spark.createDataFrame([(1, "a")], "n int, s string")
    p = Each(Pipe("src"), Fields("n", "s"),
             FieldFormatter(Fields("fmt"), "%d::%s"), Fields.RESULTS)
    assert run(spark, df, p).collect()[0]["fmt"] == "1::a"


def test_regex_matcher_whole_tuple(spark):
    df = spark.createDataFrame([(1, "ab"), (2, "abc")], "n int, s string")
    # full-tuple anchored match "1<TAB>ab"
    keep = Each(Pipe("src"), Fields("n", "s"), RegexMatcher(r"1\tab"))
    assert [r["n"] for r in run(spark, df, keep).collect()] == [1]
    # RegexFilter-style find would have matched both; matcher is anchored
    keep2 = Each(Pipe("src"), Fields("n", "s"), RegexMatcher(r"\d\ta"))
    assert run(spark, df, keep2).count() == 0


def test_status_noop(spark):
    df = spark.createDataFrame([(1,), (2,)], "v int")
    p = Each(Pipe("src"), Fields.ALL, Status())
    assert run(spark, df, p).count() == 2


def test_assertion_raises_and_strips(spark):
    df = spark.createDataFrame([(1, "x"), (2, None)], "v int, s string")
    failing = Each(Pipe("src"), Fields("s"), AssertNotNull())
    with pytest.raises(Exception) as exc:
        run(spark, df, failing).collect()
    assert "AssertNotNull" in str(exc.value)
    # stripped below the flow's assertion level (reference FlinkConnector:126)
    stripped = Each(Pipe("src"), Fields("s"), AssertNotNull())
    out = run(spark, df, stripped, assertion_level=AssertionLevel.NONE)
    assert out.count() == 2
    # static arity assertion passes at plan time
    ok = Each(Pipe("src"), Fields("v", "s"), AssertSizeEquals(2))
    assert run(spark, df, ok).count() == 2


def test_sink_parallelism(spark, tmp_path):
    df = spark.createDataFrame([(i,) for i in range(100)], "v int").repartition(8)
    scheme = ParquetScheme()
    scheme.num_sink_parts = 1  # Scheme.getNumSinkParts (reference :378-458)
    out = str(tmp_path / "one_part")
    Hfs(scheme, out, SinkMode.REPLACE).write(df)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(files) == 1
    assert spark.read.parquet(out).count() == 100


def test_regex_replace_first_group_refs_and_newlines(spark):
    """replace-first must keep the user's group numbering ($1 = their
    first group) and find occurrences after a newline."""
    from cascading_flink_spark.operations import RegexReplace
    df = spark.createDataFrame([("a1 b2",), ("x\nfoo9",)], ["s"])
    head = Pipe("src")
    rep = Each(head, Fields("s"),
               RegexReplace(Fields("out"), r"(\d+)", "<$1>",
                            replace_all=False),
               Fields.RESULTS)
    fd = FlowDef().add_source("src", DataFrameTap(df)).add_tail(rep)
    got = {r["out"] for r in
           FlowConnector(spark).connect(fd).dataframe(rep.name).collect()}
    # only the FIRST number is wrapped; the group ref resolves to the
    # user's digits, and the newline row still matches
    assert got == {"a<1> b2", "x\nfoo<9>"}


def test_regex_filter_null_arg_never_matches(spark):
    """NULL arguments match nothing: keep-match drops them, remove-match
    keeps them — never a silent three-valued drop in both modes."""
    from cascading_flink_spark.operations import RegexFilter
    df = spark.createDataFrame([("ERROR x",), ("ok",), (None,)], ["s"])
    head = Pipe("src")
    keep_match = Each(head, Fields("s"), RegexFilter("ERROR"))
    fd = FlowDef().add_source("src", DataFrameTap(df)).add_tail(keep_match)
    got = {r["s"] for r in
           FlowConnector(spark).connect(fd).dataframe(keep_match.name).collect()}
    assert got == {"ERROR x"}
    rm = Each(head, Fields("s"), RegexFilter("ERROR", remove_match=True))
    fd2 = FlowDef().add_source("src", DataFrameTap(df)).add_tail(rm)
    got2 = {r["s"] for r in
            FlowConnector(spark).connect(fd2).dataframe(rm.name).collect()}
    assert got2 == {"ok", None}


def test_every_after_hashjoin(spark):
    """The planner supports HashJoin-rooted Every chains; assembly must
    accept them too."""
    from cascading_flink_spark import Every, HashJoin
    from cascading_flink_spark.operations import Count, Sum
    L = spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], ["k", "v"])
    R = spark.createDataFrame([(1, "a"), (2, "b")], ["rk", "tag"])
    j = HashJoin([Pipe("L"), Pipe("R")], [Fields("k"), Fields("rk")])
    e = Every(j, Fields("v"), Sum("total"), Fields.ALL)
    fd = (FlowDef().add_source("L", DataFrameTap(L))
          .add_source("R", DataFrameTap(R)).add_tail(e))
    got = {(r["k"], r["total"]) for r in
           FlowConnector(spark).connect(fd).dataframe(e.name).collect()}
    assert got == {(1, 15.0), (2, 1.0)}


def test_hashjoin_arity_validation():
    from cascading_flink_spark import HashJoin
    with pytest.raises(ValueError, match="one entry per pipe"):
        HashJoin([Pipe("a"), Pipe("b")], [Fields("id")])


def test_self_join_flat_key_spellings(spark):
    """num_self_joins accepts Fields('id'), ['id'] and [Fields('id')]
    spellings identically (the flat forms used to become a duplicated
    two-field key)."""
    from cascading_flink_spark import CoGroup
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    outs = []
    for spec in (Fields("id"), ["id"], [Fields("id")]):
        j = CoGroup([Pipe("src")], spec, num_self_joins=1,
                    declared_fields=Fields("id", "v", "id2", "v2"))
        fd = FlowDef().add_source("src", DataFrameTap(df)).add_tail(j)
        rows = {tuple(r) for r in
                FlowConnector(spark).connect(fd).dataframe(j.name).collect()}
        outs.append(rows)
    assert outs[0] == outs[1] == outs[2] == {(1, "a", 1, "a"), (2, "b", 2, "b")}
