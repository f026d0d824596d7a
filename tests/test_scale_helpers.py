"""Scale helpers: semi/anti joins, salted aggregation, bucketed co-located
joins — correctness vs plain-Spark oracles plus plan assertions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cascading_flink_spark import (
    AntiJoin, BucketedTap, CoGroup, DataFrameTap, Fields, FlowConnector,
    FlowDef, Pipe, SemiJoin,
)
from cascading_flink_spark.extensions import salted_agg, salted_broadcast_left


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
    return spark.createDataFrame([(2, "x"), (2, "x2"), (4, "z")], "rid int, r string")


def test_semi_join(spark, lhs, rhs):
    j = CoGroup([Pipe("L"), Pipe("R")], [Fields("id"), Fields("rid")],
                joiner=SemiJoin())
    out = run(spark, j, L=lhs, R=rhs)
    assert out.columns == ["id", "l"]
    # no multiplicity: id=2 appears once despite two matches
    assert [r["id"] for r in out.collect()] == [2]


def test_anti_join(spark, lhs, rhs):
    j = CoGroup([Pipe("L"), Pipe("R")], [Fields("id"), Fields("rid")],
                joiner=AntiJoin())
    out = run(spark, j, L=lhs, R=rhs)
    assert sorted(r["id"] for r in out.collect()) == [1, 3]


def test_salted_agg_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    salted = salted_agg(li, ["l_returnflag"],
                        {"n": "count()", "qty": "sum(l_quantity)",
                         "lo": "min(l_discount)", "hi": "max(l_discount)",
                         "avg_q": "avg(l_quantity)"}, salt_buckets=8)
    plain = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"), F.sum("l_quantity").alias("qty"),
        F.min("l_discount").alias("lo"), F.max("l_discount").alias("hi"),
        F.avg("l_quantity").alias("avg_q"))
    s = {r["l_returnflag"]: r for r in salted.collect()}
    p = {r["l_returnflag"]: r for r in plain.collect()}
    assert set(s) == set(p)
    for k in s:
        assert s[k]["n"] == p[k]["n"]
        assert abs(s[k]["qty"] - p[k]["qty"]) < 1e-6
        assert s[k]["lo"] == p[k]["lo"] and s[k]["hi"] == p[k]["hi"]
        assert abs(s[k]["avg_q"] - p[k]["avg_q"]) < 1e-9


def test_salted_broadcast_left(spark, lhs, rhs):
    out = salted_broadcast_left(lhs.withColumnRenamed("id", "k"),
                                rhs.withColumnRenamed("rid", "k"), on="k")
    rows = sorted((r["k"], r["r"]) for r in out.collect())
    assert rows == [(2, "x"), (2, "x2")]


def test_bucketed_join_no_shuffle(spark, tmp_path):
    # warehouse dir is a static conf; tables land in ./spark-warehouse
    import shutil
    for t in ("bt_a", "bt_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    a = spark.range(0, 1000).select(F.col("id").alias("k"),
                                    (F.col("id") % 7).alias("va"))
    b = spark.range(0, 1000).select(F.col("id").alias("k"),
                                    (F.col("id") % 11).alias("vb"))
    ta = BucketedTap("bt_a", ["k"], num_buckets=8, sort_cols=["k"])
    tb = BucketedTap("bt_b", ["k"], num_buckets=8, sort_cols=["k"])
    ta.write(a)
    tb.write(b)
    # force the sort-merge path (tiny test tables would broadcast, which
    # bypasses bucketing); at real scale both sides exceed the threshold
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ta.read(spark).join(tb.read(spark), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan[:2000]}"
        assert "SortMergeJoin" in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_exact_dedup_pairs(spark):
    from cascading_flink_spark.extensions import exact_dedup_pairs
    docs = spark.createDataFrame(
        [(1, "same  text"), (2, "same text"), (3, "other"), (4, "SAME TEXT")],
        "doc_id long, text string")
    # normalization: whitespace collapsed + lower-cased -> 1,2,4 identical
    pairs = {(r["keep_id"], r["dup_id"]) for r in exact_dedup_pairs(docs).collect()}
    assert pairs == {(1, 2), (1, 4)}


def test_stratified_sample(spark):
    from cascading_flink_spark.extensions import stratified_sample
    df = spark.createDataFrame([(i, "a" if i % 2 else "b") for i in range(2000)],
                               "id long, s string")
    out = stratified_sample(df, "s", {"a": 0.25, "b": 1.0}, key_cols=["id"])
    counts = {r["s"]: r["count"] for r in out.groupBy("s").count().collect()}
    assert counts["b"] == 1000                    # frac 1.0 keeps all
    assert 150 <= counts["a"] <= 350              # ~25% of 1000
    # deterministic across invocations
    again = stratified_sample(df, "s", {"a": 0.25, "b": 1.0}, key_cols=["id"])
    assert {r["id"] for r in out.collect()} == {r["id"] for r in again.collect()}
    # unknown strata dropped
    out2 = stratified_sample(df, "s", {"zzz": 0.5}, key_cols=["id"])
    assert out2.count() == 0


def test_paragraph_dedup_reassembly(spark):
    from cascading_flink_spark.extensions import paragraph_dedup
    rows = [
        ("d1", "common header text\n\nunique alpha body\n\ncommon footer"),
        ("d2", "common header text\n\nunique beta body\n\ncommon footer"),
        ("d3", "common header text"),            # fully boilerplate
        ("d4", "solo document entirely unique"),
        ("d5", "dup dup\n\ndup dup"),            # within-doc duplicate
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in paragraph_dedup(df).collect()}

    # every distinct paragraph survives exactly once, corpus-wide
    all_kept = [p for r in out.values() for p in r["clean_text"].split("\n\n")]
    assert len(all_kept) == len(set(all_kept))
    assert set(all_kept) == {"common header text", "unique alpha body",
                             "unique beta body", "common footer",
                             "solo document entirely unique", "dup dup"}
    # reassembly preserves original order of surviving segments
    for did, r in out.items():
        orig = dict(rows)[did].split("\n\n")
        kept = r["clean_text"].split("\n\n")
        assert [p for p in orig if p in kept][:len(kept)] == kept \
            or kept == [p for p in orig if p in kept]
    # within-doc dup collapses; unique doc intact
    assert out["d4"]["clean_text"] == "solo document entirely unique"
    assert out["d5"]["clean_text"] == "dup dup" and out["d5"]["n_kept"] == 1
    # deterministic across invocations
    again = {r["doc_id"]: r["clean_text"]
             for r in paragraph_dedup(df).collect()}
    assert again == {k: v["clean_text"] for k, v in out.items()}


def test_paragraph_dedup_window_mode(spark):
    from cascading_flink_spark.extensions import paragraph_dedup
    rows = [("a", "w1 w2 w3 w4"), ("b", "w1 w2 w3 w4"), ("c", "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in
           paragraph_dedup(df, window_words=2).collect()}
    # the two identical docs share their 2-word windows: each window kept
    # exactly once corpus-wide
    kept_total = sum(r["n_kept"] for r in out.values()
                     if r["doc_id"] in ("a", "b"))
    assert kept_total == 2
    # empty text yields one empty segment kept for exactly one doc
    assert sum(1 for r in out.values() if r["clean_text"] == "") <= 1


def test_salted_agg_null_semantics(spark):
    """avg/count must skip NULL values exactly as plain aggregates do."""
    from pyspark.sql import functions as F
    from cascading_flink_spark.extensions import salted_agg
    df = spark.createDataFrame(
        [("a", 2.0), ("a", None), ("b", 4.0)], "k string, v double")
    got = {r["k"]: (r["m"], r["c"]) for r in
           salted_agg(df, ["k"], {"m": "avg(v)", "c": "count(v)"}).collect()}
    plain = {r["k"]: (r["m"], r["c"]) for r in
             df.groupBy("k").agg(F.avg("v").alias("m"),
                                 F.count("v").alias("c")).collect()}
    assert got == plain and got["a"] == (2.0, 1)


def test_dedup_keep_best_string_ids(spark):
    """String doc ids keep string cluster ids (NULL sentinel for
    unpaired) instead of nulled-out long casts."""
    from cascading_flink_spark.extensions import dedup_keep_best
    docs = spark.createDataFrame(
        [("da", "xx"), ("db", "xxxx"), ("dc", "solo")],
        ["doc_id", "text"]).withColumn(
        "n_chars", F.length("text"))
    pairs = spark.createDataFrame([("da", "db")], ["id_a", "id_b"])
    out = {r["doc_id"]: r for r in dedup_keep_best(docs, pairs).collect()}
    assert out["da"]["cluster_id"] == "da" == out["db"]["cluster_id"]
    assert out["db"]["kept"] and not out["da"]["kept"]   # longer wins
    assert out["dc"]["cluster_id"] is None and out["dc"]["kept"]


def test_simhash_max_hamming_validated(spark):
    from cascading_flink_spark.extensions import simhash_dup_pairs
    import pytest as _pytest
    df = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    with _pytest.raises(ValueError, match="pigeonhole"):
        simhash_dup_pairs(df, max_hamming=4)
