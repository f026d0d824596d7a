"""End-to-end WordCount — the reference's own example flow
(``/root/reference/example/WordCount.java:36-64``): Each(RegexSplitGenerator)
-> GroupBy -> Every(Count), through the full DSL + planner + flow runner."""

from __future__ import annotations

import pytest

from cascading_flink_spark import (
    DataFrameTap, Each, Every, Fields, FlowConnector, FlowDef, GroupBy, Pipe,
)
from cascading_flink_spark.operations import Count, RegexSplitGenerator

from conftest import load


def test_wordcount_end_to_end(spark, sf_dir):
    docs = load(spark, sf_dir, "documents").limit(200)

    head = Pipe("docs")
    tokens = Each(head, Fields("text"), RegexSplitGenerator(Fields("word"), r"[^a-zA-Z0-9']+"),
                  Fields.RESULTS)
    grouped = GroupBy(tokens, Fields("word"))
    counted = Every(grouped, Fields.VALUES, Count("count"), Fields.ALL)

    flow_def = (FlowDef("wordcount")
                .add_source(head, DataFrameTap(docs))
                .add_tail(counted))
    flow = FlowConnector(spark).connect(flow_def)
    result = flow.dataframe(counted.name)

    assert set(result.columns) == {"word", "count"}
    rows = {r["word"]: r["count"] for r in result.collect()}
    assert len(rows) > 0

    # oracle: plain Spark SQL on the same input
    from pyspark.sql import functions as F
    oracle = (docs.select(F.explode(F.split("text", r"[^a-zA-Z0-9']+")).alias("word"))
              .filter(F.col("word") != "")
              .groupBy("word").count())
    expect = {r["word"]: r["count"] for r in oracle.collect()}
    assert rows == expect


def test_wordcount_empty_tokens_dropped(spark):
    df = spark.createDataFrame([("a  b",), ("  ",), ("c",)], "text string")
    head = Pipe("t")
    tokens = Each(head, Fields("text"),
                  RegexSplitGenerator(Fields("word"), r"\s+"), Fields.RESULTS)
    flow = (FlowConnector(spark)
            .connect(FlowDef().add_source(head, DataFrameTap(df)).add_tail(tokens)))
    words = [r["word"] for r in flow.dataframe(tokens.name).collect()]
    assert sorted(words) == ["a", "b", "c"]
