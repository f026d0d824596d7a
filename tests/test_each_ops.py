"""Each-hosted Functions/Filters: selector splicing + built-in operations
(SURVEY.md §2.2), verified against plain-Spark oracles."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cascading_flink_spark import (
    Coerce, DataFrameTap, Discard, Each, Fields, FlowConnector, FlowDef,
    Pipe, Rename, Retain,
)
from cascading_flink_spark.fields import FieldsResolutionError
from cascading_flink_spark.operations import (
    And, DateFormatter, ExpressionFilter, ExpressionFunction, FieldJoiner,
    FilterNull, Identity, Insert, Limit, Not, PyFilter, PyFunction,
    RegexFilter, RegexParser, RegexReplace, RegexSplitter, Sample, SetValue,
    UnGroup,
)


def run(spark, df, tail, **sources):
    fd = FlowDef()
    if not sources:
        sources = {"src": df}
    for name, d in sources.items():
        fd.add_source(name, DataFrameTap(d))
    fd.add_tail(tail)
    return FlowConnector(spark).connect(fd).dataframe(tail.name)


@pytest.fixture(scope="module")
def people(spark):
    return spark.createDataFrame(
        [(1, "alice smith", "2024-01-15", 10.5),
         (2, "bob jones", "2024-02-20", 20.0),
         (3, None, "2024-03-25", 30.25)],
        "id int, name string, day string, amount double")


def test_expression_function_all_selector(spark, people):
    p = Each(Pipe("src"), Fields("amount"),
             ExpressionFunction(Fields("doubled"), "amount * 2"), Fields.ALL)
    out = run(spark, people, p)
    assert out.columns == ["id", "name", "day", "amount", "doubled"]
    assert {r["doubled"] for r in out.collect()} == {21.0, 40.0, 60.5}


def test_swap_selector(spark, people):
    p = Each(Pipe("src"), Fields("amount"),
             ExpressionFunction(Fields("cents"), "cast(amount * 100 as int)"),
             Fields.SWAP)
    out = run(spark, people, p)
    assert out.columns == ["id", "name", "day", "cents"]


def test_replace_selector(spark, people):
    p = Each(Pipe("src"), Fields("amount"),
             ExpressionFunction(Fields("amount"), "amount + 1"), Fields.REPLACE)
    out = run(spark, people, p)
    assert out.columns == ["id", "name", "day", "amount"]
    assert {r["amount"] for r in out.collect()} == {11.5, 21.0, 31.25}


def test_explicit_output_selector(spark, people):
    p = Each(Pipe("src"), Fields("name"),
             RegexParser(Fields("first"), r"^(\w+)"), Fields("id", "first"))
    out = run(spark, people, p)
    assert out.columns == ["id", "first"]


def test_regex_parser_groups(spark, people):
    p = Each(Pipe("src"), Fields("day"),
             RegexParser(Fields("y", "m"), r"^(\d+)-(\d+)", [1, 2]), Fields.RESULTS)
    rows = run(spark, people, p).collect()
    assert {(r["y"], r["m"]) for r in rows} == {("2024", "01"), ("2024", "02"), ("2024", "03")}


def test_regex_splitter(spark, people):
    p = Each(Pipe("src"), Fields("day"),
             RegexSplitter(Fields("y", "m", "d"), "-"), Fields.RESULTS)
    rows = run(spark, people, p).collect()
    assert ("2024", "02", "20") in {(r["y"], r["m"], r["d"]) for r in rows}


def test_regex_replace_and_filter(spark, people):
    clean = Each(Pipe("src"), Fields("name"),
                 RegexReplace(Fields("name"), r"\s+", "_"), Fields.REPLACE)
    keep = Each(clean, Fields("name"), RegexFilter("^alice"))
    rows = run(spark, people, keep).collect()
    assert [r["name"] for r in rows] == ["alice_smith"]


def test_insert_and_field_joiner(spark, people):
    ins = Each(Pipe("src"), Fields.NONE, Insert(Fields("tag"), "x"), Fields.ALL)
    j = Each(ins, Fields("id", "tag"), FieldJoiner(Fields("key"), ":"), Fields.ALL)
    rows = run(spark, people, j).collect()
    assert {r["key"] for r in rows} == {"1:x", "2:x", "3:x"}


def test_date_formatter(spark, people):
    cast = Each(Pipe("src"), Fields("day"),
                ExpressionFunction(Fields("ts"), "to_timestamp(day)"), Fields.ALL)
    fmt = Each(cast, Fields("ts"), DateFormatter(Fields("month"), "yyyy-MM"), Fields.ALL)
    rows = run(spark, people, fmt).collect()
    assert {r["month"] for r in rows} == {"2024-01", "2024-02", "2024-03"}


def test_filter_null_and_logic(spark, people):
    p = Each(Pipe("src"), Fields("name"), FilterNull())
    assert run(spark, people, p).count() == 2
    q = Each(Pipe("src"), Fields("name"), Not(FilterNull()))
    assert run(spark, people, q).count() == 1
    r = Each(Pipe("src"), Fields("amount"),
             And(ExpressionFilter("amount > 15"), ExpressionFilter("amount < 25")))
    # And removes when ALL children remove: amount in (15,25) removed
    assert run(spark, people, r).count() == 2


def test_expression_filter_removes(spark, people):
    p = Each(Pipe("src"), Fields("amount"), ExpressionFilter("amount > 15"))
    rows = run(spark, people, p).collect()
    assert [r["id"] for r in rows] == [1]


def test_set_value(spark, people):
    p = Each(Pipe("src"), Fields("amount"),
             SetValue(Fields("big"), ExpressionFilter("amount <= 15")), Fields.ALL)
    rows = {r["id"]: r["big"] for r in run(spark, people, p).collect()}
    assert rows == {1: False, 2: True, 3: True}


def test_limit_and_sample(spark, people):
    p = Each(Pipe("src"), Fields.ALL, Limit(2))
    assert run(spark, people, p).count() == 2
    s = Each(Pipe("src"), Fields("id"), Sample(0.5, seed=7))
    n = run(spark, people, s).count()
    assert 0 <= n <= 3
    # deterministic across runs
    assert run(spark, people, s).count() == n


def test_retain_discard_rename_coerce(spark, people):
    r = Retain(Pipe("src"), Fields("id", "amount"))
    assert run(spark, people, r).columns == ["id", "amount"]
    d = Discard(Pipe("src"), Fields("day"))
    assert run(spark, people, d).columns == ["id", "name", "amount"]
    rn = Rename(Pipe("src"), Fields("name"), Fields("full_name"))
    assert "full_name" in run(spark, people, rn).columns
    c = Coerce(Pipe("src"), Fields("amount"), ["int"])
    out = run(spark, people, c)
    assert dict(out.dtypes)["amount"] == "int"
    assert out.columns == ["id", "name", "day", "amount"]


def test_ungroup(spark):
    df = spark.createDataFrame([(1, "a", "b")], "k int, v1 string, v2 string")
    p = Each(Pipe("src"), Fields.ALL,
             UnGroup(Fields("k", "v"), Fields("k"), [["v1"], ["v2"]]),
             Fields.RESULTS)
    rows = {(r["k"], r["v"]) for r in run(spark, df, p).collect()}
    assert rows == {(1, "a"), (1, "b")}


def test_py_function_and_filter(spark, people):
    fn = PyFunction(Fields("upper_name"),
                    lambda pdf: pd.DataFrame({"upper_name": pdf["name"].str.upper()}),
                    types=["string"])
    p = Each(Pipe("src"), Fields("name"), fn, Fields.ALL)
    rows = run(spark, people, p).collect()
    assert {r["upper_name"] for r in rows} == {"ALICE SMITH", "BOB JONES", None}

    flt = PyFilter(lambda pdf: pdf["amount"] > 15)
    q = Each(Pipe("src"), Fields("amount"), flt)
    assert run(spark, people, q).count() == 2


def test_unknown_field_raises_at_plan_time(spark, people):
    p = Each(Pipe("src"), Fields("missing"), ExpressionFilter("true"))
    with pytest.raises(FieldsResolutionError):
        run(spark, people, p)
