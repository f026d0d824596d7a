"""Structured Streaming: file-source flows through the batch DSL, windowed
aggregations with watermarks, and the memory sink (availableNow trigger)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from cascading_flink_spark import Each, Every, Fields, FlowDef, GroupBy, Pipe
from cascading_flink_spark.operations import Count, ExpressionFilter, Sum
from cascading_flink_spark.streaming import (
    FileStreamTap, MemorySink, StreamingFlowConnector, tumbling_window_agg,
    with_watermark,
)

from conftest import load


@pytest.fixture()
def stream_dir(spark, sf_dir, tmp_path):
    """Stage the events table as a streaming-source directory."""
    src = str(tmp_path / "events_in")
    ev = load(spark, sf_dir, "events") if False else None
    # events table has TIMESTAMP(NANOS); restage through __spark_entry__'s
    # loader which normalizes to micros
    import __spark_entry__ as entry
    entry._t(spark, sf_dir, "events").write.mode("overwrite").parquet(src)
    return src


def test_streaming_flow_dsl_agg(spark, stream_dir, tmp_path):
    schema = spark.read.parquet(stream_dir).schema
    head = Pipe("events")
    filt = Each(head, Fields("value"), ExpressionFilter("value < 0"))
    g = GroupBy(filt, Fields("event_type"))
    e = Every(g, Fields.NONE, Count("n"), Fields.ALL)
    e2 = Every(e, Fields("value"), Sum("total"), Fields.ALL)

    fd = (FlowDef("stream_agg")
          .add_source(head, FileStreamTap(stream_dir, schema=schema))
          .add_tail(e2))
    fd.add_sink(e2, MemorySink(output_mode="complete"))

    flow = StreamingFlowConnector(spark).connect(fd)
    assert flow.dataframe(e2.name).isStreaming
    flow.start(trigger="availableNow")
    flow.await_termination(60)

    got = {r["event_type"]: (r["n"], r["total"])
           for r in spark.sql(f"SELECT * FROM {e2.name}").collect()}
    expect = {r["event_type"]: (r["n"], r["total"]) for r in
              spark.read.parquet(stream_dir).filter("value >= 0")
              .groupBy("event_type")
              .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
              .collect()}
    assert set(got) == set(expect)
    for k in got:
        assert got[k][0] == expect[k][0]
        assert abs(got[k][1] - expect[k][1]) < 1e-6


def test_streaming_tumbling_window_watermark(spark, stream_dir):
    schema = spark.read.parquet(stream_dir).schema
    sdf = FileStreamTap(stream_dir, schema=schema).read(spark)
    win = tumbling_window_agg(sdf, "ts", "1 hour", ["event_type"],
                              {"n": "count(1)"}, watermark="1 hour")
    assert win.isStreaming
    q = (win.writeStream.format("memory").outputMode("append")
         .queryName("win_agg").trigger(availableNow=True).start())
    q.awaitTermination(60)
    rows = spark.sql("SELECT * FROM win_agg").collect()
    # with watermark + availableNow, closed windows are emitted
    assert len(rows) > 0
    assert {"window_start", "window_end", "event_type", "n"} <= set(rows[0].asDict())

    batch = (spark.read.parquet(stream_dir)
             .groupBy(F.window("ts", "1 hour"), "event_type").count())
    # append mode withholds windows newer than the watermark; emitted ones
    # must match the batch computation
    bmap = {(r["window"]["start"], r["event_type"]): r["count"] for r in batch.collect()}
    for r in rows:
        assert bmap[(r["window_start"], r["event_type"])] == r["n"]


def test_stream_static_join(spark, stream_dir, sf_dir):
    """Stream-static join: streaming events enriched with a static dim —
    the streaming face of the HashJoin/broadcast pattern."""
    from pyspark.sql import functions as F
    schema = spark.read.parquet(stream_dir).schema
    sdf = FileStreamTap(stream_dir, schema=schema).read(spark)
    static_types = spark.createDataFrame(
        [("click", "ui"), ("view", "ui"), ("purchase", "commerce"),
         ("signup", "growth"), ("error", "ops")],
        "event_type string, category string")
    joined = (sdf.join(F.broadcast(static_types), "event_type")
              .groupBy("category").agg(F.count(F.lit(1)).alias("n")))
    q = (joined.writeStream.format("memory").outputMode("complete")
         .queryName("ss_join").trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {r["category"]: r["n"] for r in spark.sql("SELECT * FROM ss_join").collect()}
    batch = spark.read.parquet(stream_dir).join(static_types, "event_type") \
        .groupBy("category").count()
    expect = {r["category"]: r["count"] for r in batch.collect()}
    assert got == expect


def test_stream_stream_join(spark, tmp_path, sf_dir):
    """Stream-stream join with watermarks + event-time range bound."""
    from pyspark.sql import functions as F
    from cascading_flink_spark.streaming import stream_stream_join
    import __spark_entry__ as entry
    ev = entry._t(spark, sf_dir, "events")
    clicks_dir = str(tmp_path / "clicks")
    purch_dir = str(tmp_path / "purchases")
    ev.filter("event_type = 'click'") \
      .select("user_id", F.col("ts").alias("click_ts")) \
      .write.mode("overwrite").parquet(clicks_dir)
    ev.filter("event_type = 'purchase'") \
      .select(F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"),
              "value") \
      .write.mode("overwrite").parquet(purch_dir)

    cs = FileStreamTap(clicks_dir, schema=spark.read.parquet(clicks_dir).schema).read(spark)
    ps = FileStreamTap(purch_dir, schema=spark.read.parquet(purch_dir).schema).read(spark)
    ps = ps.withColumnRenamed("p_user", "user_id")
    joined = stream_stream_join(cs, ps, "user_id", "click_ts", "purchase_ts",
                                watermark="2 hours", time_bound="interval 30 minutes")
    assert joined.isStreaming
    q = (joined.writeStream.format("memory").outputMode("append")
         .queryName("ssj").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT count(*) n FROM ssj").collect()[0]["n"]

    bc = spark.read.parquet(clicks_dir)
    bp = spark.read.parquet(purch_dir).withColumnRenamed("p_user", "user_id")
    expect = (bc.join(bp, (bc.user_id == bp.user_id) &
                      (bp.purchase_ts >= F.expr("click_ts - interval 30 minutes")) &
                      (bp.purchase_ts <= F.expr("click_ts + interval 30 minutes")))
              .count())
    assert got == expect and got > 0


def test_dsl_stream_static_cogroup(spark, stream_dir):
    """The pipe DSL planner compiles unchanged when one input is a stream:
    CoGroup(stream, static) -> stream-static join."""
    from cascading_flink_spark import CoGroup, DataFrameTap, FlowDef
    from cascading_flink_spark.streaming import (
        FileStreamTap, MemorySink, StreamingFlowConnector)
    schema = spark.read.parquet(stream_dir).schema
    static = spark.createDataFrame(
        [("click", 1.0), ("purchase", 5.0), ("view", 0.5), ("signup", 2.0),
         ("error", 0.0)], "etype string, weight double")
    ev = Pipe("events")
    st = Pipe("weights")
    j = CoGroup([ev, st], [Fields("event_type"), Fields("etype")])
    fd = (FlowDef("dsl_ss")
          .add_source(ev, FileStreamTap(stream_dir, schema=schema))
          .add_source(st, DataFrameTap(static))
          .add_tail(j))
    fd.add_sink(j, MemorySink(output_mode="append"))
    flow = StreamingFlowConnector(spark).connect(fd)
    assert flow.dataframe(j.name).isStreaming
    flow.start(trigger="availableNow")
    flow.await_termination(120)
    got = spark.sql(f"SELECT count(*) n FROM {j.name}").collect()[0]["n"]
    expect = spark.read.parquet(stream_dir).count()  # every event has a weight
    assert got == expect


@pytest.mark.slow  # r15: heavy, round-close full gate only
def test_streaming_checkpoint_no_reprocess(spark, stream_dir, tmp_path):
    """Restarting a checkpointed streaming flow must not reprocess data the
    first run already committed (file-source + file-sink exactly-once)."""
    schema = spark.read.parquet(stream_dir).schema
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        sdf = FileStreamTap(stream_dir, schema=schema).read(spark)
        q = (sdf.select("event_id")
             .writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    n1 = spark.read.parquet(out_dir).count()
    run_once()   # restart against the same checkpoint: nothing new to do
    n2 = spark.read.parquet(out_dir).count()
    total = spark.read.parquet(stream_dir).count()
    assert n1 == total and n2 == total  # no duplicates on restart


def test_stream_exact_dedup(spark, sf_dir, tmp_path):
    """Duplicate content arriving within the watermark is dropped; the
    surviving set matches batch exact-dedup on the same data."""
    from cascading_flink_spark.streaming import stream_exact_dedup

    docs = load(spark, sf_dir, "documents") \
        .select("doc_id", "text") \
        .withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000) + F.col("doc_id")))
    src = str(tmp_path / "docs_in")
    docs.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_exact_dedup(stream, ts_col="ts", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)

    # output schema matches the batch twin: no helper fp column
    assert "fp" not in spark.table("dedup_out").columns
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), r"\s+", " ")))
    got = spark.sql("SELECT text FROM dedup_out") \
               .select(F.md5(norm).alias("fp")).collect()
    fps = [r["fp"] for r in got]
    # append-mode emission is exactly-once per fingerprint
    assert len(fps) == len(set(fps))
    # and covers every distinct content fingerprint from the batch rule
    expect = {r["fp"] for r in
              spark.read.parquet(src).select(F.md5(norm).alias("fp"))
              .distinct().collect()}
    assert set(fps) == expect
    spark.catalog.dropTempView("dedup_out")


def test_stream_chunk_packer_batch_parity(spark, sf_dir, tmp_path):
    """A single-batch stream through stream_chunk_packer must reproduce
    chunk_corpus exactly: same (md5, id) packing order, same offsets and
    chunk spans (one constant key = the batch operator's global order)."""
    from cascading_flink_spark.extensions import chunk_corpus
    from cascading_flink_spark.streaming import stream_chunk_packer

    docs = (load(spark, sf_dir, "documents")
            .select("doc_id", "text").limit(200)
            .withColumn("shard", F.lit("all")))
    src = str(tmp_path / "pack_in")
    docs.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = stream_chunk_packer(stream, context_len=512, key_col="shard")
    q = (out.writeStream.format("memory").queryName("pack_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)

    got = {r["doc_id"]: (r["n_tokens"], r["start_offset"],
                         r["first_chunk"], r["last_chunk"])
           for r in spark.sql("SELECT * FROM pack_out").collect()}
    expect = {str(r["doc_id"]): (r["n_tokens"], r["start_offset"],
                                 r["first_chunk"], r["last_chunk"])
              for r in chunk_corpus(spark.read.parquet(src),
                                    context_len=512).collect()}
    assert got == expect
    spark.catalog.dropTempView("pack_out")


def test_stream_chunk_packer_state_carries_across_batches(spark, tmp_path):
    """The running offset persists in state: a second micro-batch's first
    document starts exactly where the first batch's total ended."""
    from cascading_flink_spark.streaming import stream_chunk_packer

    src = tmp_path / "pack2_in"
    src.mkdir()
    d1 = spark.createDataFrame([("a", "one two three", "k")],
                               "doc_id string, text string, shard string")
    d2 = spark.createDataFrame([("b", "four five", "k")],
                               "doc_id string, text string, shard string")
    d1.coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))

    schema = spark.read.parquet(str(src / "f1")).schema
    ckpt = str(tmp_path / "ckpt2")
    out_dir = str(tmp_path / "pack2_out")

    def run_once():
        stream = (spark.readStream.schema(schema)
                  .parquet(str(src / "*")))
        out = stream_chunk_packer(stream, context_len=4, key_col="shard")
        q = (out.writeStream.format("parquet")
             .option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()                                              # batch 1: doc a
    d2.coalesce(1).write.mode("overwrite").parquet(str(src / "f2"))
    run_once()                                              # batch 2: doc b

    rows = {r["doc_id"]: (r["start_offset"], r["first_chunk"], r["last_chunk"])
            for r in spark.read.parquet(out_dir).collect()}
    # doc a: 3 tokens at offset 0 (chunk 0); doc b resumes at offset 3 and
    # spans the chunk boundary at 4 (chunks 0..1)
    assert rows == {"a": (0, 0, 0), "b": (3, 0, 1)}


def test_stream_token_quota_batch_parity(spark, sf_dir, tmp_path):
    """A single-batch stream through stream_token_quota must admit exactly
    token_budget_mixture's set (same md5-greedy prefix per language)."""
    from cascading_flink_spark.extensions import token_budget_mixture
    from cascading_flink_spark.streaming import stream_token_quota

    docs = (load(spark, sf_dir, "documents")
            .select("doc_id", "lang", "text").limit(300))
    src = str(tmp_path / "quota_in")
    docs.write.mode("overwrite").parquet(src)

    budgets = {"en": 800, "de": 400}
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = stream_token_quota(stream, budgets)
    q = (out.writeStream.format("memory").queryName("quota_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)

    got = {r["doc_id"] for r in spark.sql("SELECT * FROM quota_out").collect()}
    toks = F.when(F.trim("text") == "", F.lit(0)) \
            .otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
    batch_in = spark.read.parquet(src).select(
        "doc_id", "lang", toks.cast("long").alias("n_tokens"))
    expect = {str(r["doc_id"]) for r in
              token_budget_mixture(batch_in, budgets).collect()}
    assert got == expect and expect
    spark.catalog.dropTempView("quota_out")


def test_stream_token_quota_state_blocks_across_batches(spark, tmp_path):
    """Once a key's budget is spent in batch 1, batch 2's documents for
    that key are rejected; an unlisted key never emits."""
    from cascading_flink_spark.streaming import stream_token_quota

    src = tmp_path / "quota2_in"
    src.mkdir()
    d1 = spark.createDataFrame([("a", "en", "one two three")],
                               "doc_id string, lang string, text string")
    d2 = spark.createDataFrame([("b", "en", "four five"),
                                ("c", "xx", "zz zz")],
                               "doc_id string, lang string, text string")
    d1.coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))
    schema = spark.read.parquet(str(src / "f1")).schema
    ckpt = str(tmp_path / "qckpt")
    out_dir = str(tmp_path / "quota2_out")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        out = stream_token_quota(stream, {"en": 3})
        q = (out.writeStream.format("parquet")
             .option("checkpointLocation", ckpt)
             .option("path", out_dir)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(60)

    run_once()                       # admits doc a (3 tokens = budget)
    d2.coalesce(1).write.mode("overwrite").parquet(str(src / "f2"))
    run_once()                       # b would overshoot; xx unlisted
    rows = spark.read.parquet(out_dir).collect()
    assert {r["doc_id"] for r in rows} == {"a"}
    assert rows[0]["running_total"] == 3


# ---------------------------------------------------------------- round 6:
# multi-batch golden fixtures with mid-sequence checkpoint restarts — the
# cross-batch semantics the single-batch parity tests can't see.  All
# expected values are pinned literals (md5 orders precomputed by hand).

def _run_available_now(spark, schema, src_glob, ckpt, out_dir, build):
    stream = spark.readStream.schema(schema).parquet(src_glob)
    q = (build(stream).writeStream.format("parquet")
         .option("checkpointLocation", ckpt)
         .option("path", out_dir)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)


def test_stream_chunk_packer_three_batch_golden(spark, tmp_path):
    """3 file-stream batches, restart between each: every document's
    (start_offset, first_chunk, last_chunk) must land exactly where the
    continuous packing sequence puts it, with the within-batch md5 order
    (a2 < a1 < a3; b1 < b2) and the state-carried running offset both
    pinned as literals."""
    from cascading_flink_spark.streaming import stream_chunk_packer

    src = tmp_path / "pack3_in"
    src.mkdir()
    batches = [
        [("a1", "t t", "k"), ("a2", "t t t", "k"), ("a3", "t", "k")],
        [("b1", "t t t", "k"), ("b2", "t t t t t", "k")],
        [("c1", "t t", "k")],
    ]
    sch = "doc_id string, text string, shard string"
    spark.createDataFrame(batches[0], sch).coalesce(1) \
        .write.parquet(str(src / "f0"))
    schema = spark.read.parquet(str(src / "f0")).schema
    ckpt, out_dir = str(tmp_path / "pack3_ck"), str(tmp_path / "pack3_out")

    for i, batch in enumerate(batches):
        if i:  # batch 0 already written; each loop turn is a restart
            spark.createDataFrame(batch, sch).coalesce(1) \
                .write.parquet(str(src / f"f{i}"))
        _run_available_now(
            spark, schema, str(src / "*"), ckpt, out_dir,
            lambda s: stream_chunk_packer(s, context_len=4, key_col="shard"))

    rows = {r["doc_id"]: (r["start_offset"], r["first_chunk"], r["last_chunk"])
            for r in spark.read.parquet(out_dir).collect()}
    assert rows == {
        "a2": (0, 0, 0), "a1": (3, 0, 1), "a3": (5, 1, 1),   # batch 1
        "b1": (6, 1, 2), "b2": (9, 2, 3),                     # batch 2
        "c1": (14, 3, 3),                                     # batch 3
    }


def test_stream_token_quota_three_batch_golden(spark, tmp_path):
    """3 batches against budget en=9 with restarts in between: batch 1
    admits the md5-prefix d2,d4,d1 (cum 4,7,8) and blocks d3 (would be
    10); batch 2 admits e3 (cum 9) and the overshooting e1 blocks the
    rest of its batch (the documented mid-batch nuance); batch 3 is
    rejected outright — the budget is exactly spent."""
    from cascading_flink_spark.streaming import stream_token_quota

    src = tmp_path / "quota3_in"
    src.mkdir()
    w = lambda n: " ".join(["t"] * n)
    batches = [
        [("d1", "en", w(1)), ("d2", "en", w(4)),
         ("d3", "en", w(2)), ("d4", "en", w(3))],
        [("e1", "en", w(3)), ("e2", "en", w(1)), ("e3", "en", w(1))],
        [("f1", "en", w(1))],
    ]
    sch = "doc_id string, lang string, text string"
    spark.createDataFrame(batches[0], sch).coalesce(1) \
        .write.parquet(str(src / "f0"))
    schema = spark.read.parquet(str(src / "f0")).schema
    ckpt, out_dir = str(tmp_path / "quota3_ck"), str(tmp_path / "quota3_out")

    for i, batch in enumerate(batches):
        if i:
            spark.createDataFrame(batch, sch).coalesce(1) \
                .write.parquet(str(src / f"f{i}"))
        _run_available_now(
            spark, schema, str(src / "*"), ckpt, out_dir,
            lambda s: stream_token_quota(s, {"en": 9}))

    rows = {r["doc_id"]: r["running_total"]
            for r in spark.read.parquet(out_dir).collect()}
    assert rows == {"d2": 4, "d4": 7, "d1": 8, "e3": 9}


def test_stream_token_quota_md5_order_across_arrow_chunks(spark, tmp_path):
    """Admission must follow the WHOLE micro-batch's md5 order even when
    the batch spans several Arrow chunks (regression: per-chunk sorting
    admitted a chunk-order-greedy set).  With maxRecordsPerBatch=2 the 8
    docs arrive as 4 chunks in file order; chunk-greedy would admit
    {g0,g1,g3,g2}, global md5 order admits {g3,g0,g5,g4}."""
    from cascading_flink_spark.streaming import stream_token_quota

    docs = [(f"g{i}", "en", "t t") for i in range(8)]
    src = str(tmp_path / "arrow_in")
    spark.createDataFrame(docs, "doc_id string, lang string, text string") \
        .coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = spark.readStream.schema(schema).parquet(src)
        out = stream_token_quota(stream, {"en": 8})
        q = (out.writeStream.format("memory").queryName("arrow_quota")
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(60)
        got = {r["doc_id"] for r in
               spark.sql("SELECT * FROM arrow_quota").collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
        spark.catalog.dropTempView("arrow_quota")
    assert got == {"g3", "g0", "g5", "g4"}


def test_stream_decontaminate_matches_batch(spark, sf_dir, tmp_path):
    """The streaming gate admits exactly the ids the batch decontaminate
    keeps — same shingle semantics, same min_shared rule."""
    from cascading_flink_spark.extensions import decontaminate
    from cascading_flink_spark.streaming import stream_decontaminate

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    # benchmark = a slice of the corpus itself -> guaranteed contamination
    bench = (docs.filter(F.col("doc_id") % 50 == 0)
             .select(F.col("doc_id").alias("bench_id"),
                     F.col("text")))
    src = str(tmp_path / "stream_in")
    docs.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_decontaminate(stream, bench, n=8, min_shared=1,
                               bench_id_col="bench_id")
    q = (out.writeStream.format("memory").queryName("decon_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)

    got = {r["doc_id"] for r in
           spark.sql("SELECT doc_id FROM decon_out").collect()}
    expect = {r["doc_id"] for r in
              decontaminate(spark.read.parquet(src), bench, n=8,
                            min_shared=1, bench_text_col="text",
                            bench_id_col="bench_id").collect()}
    assert got == expect
    # the gate actually dropped something (bench slice is non-empty)
    assert len(got) < docs.count()
    spark.catalog.dropTempView("decon_out")


def test_stream_decontaminate_min_shared_counts_per_bench_doc(spark, tmp_path):
    """min_shared thresholds per SINGLE benchmark document (the batch
    rule): one gram shared with each of two bench docs must NOT trip
    min_shared=2, two grams with one bench doc must."""
    from cascading_flink_spark.extensions import decontaminate
    from cascading_flink_spark.streaming import stream_decontaminate

    docs = spark.createDataFrame(
        [("x", "aa bb cc xx ee ff gg"),      # 1 gram with A, 1 with B
         ("y", "aa bb cc dd"),               # 2 grams with A
         ("z", "zz zz zz zz")],              # clean
        ["doc_id", "text"])
    bench = spark.createDataFrame(
        [("A", "aa bb cc dd"), ("B", "ee ff gg")],
        ["bench_id", "text"])
    src = str(tmp_path / "ms_in")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_decontaminate(stream, bench, n=3, min_shared=2,
                               bench_id_col="bench_id")
    q = (out.writeStream.format("memory").queryName("ms_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM ms_out").collect()}
    assert got == {"x", "z"}
    expect = {r["doc_id"] for r in
              decontaminate(spark.read.parquet(src), bench, n=3,
                            min_shared=2, bench_text_col="text",
                            bench_id_col="bench_id").collect()}
    assert got == expect
    spark.catalog.dropTempView("ms_out")


def test_stream_decontaminate_default_bench_ids(spark, tmp_path):
    """Without bench_id_col, each benchmark ROW is its own document —
    two grams shared with one row must trip min_shared=2 (a per-gram id
    assignment would make min_shared > 1 unreachable)."""
    from cascading_flink_spark.streaming import stream_decontaminate
    docs = spark.createDataFrame(
        [("y", "aa bb cc dd"), ("z", "clean words only here")],
        ["doc_id", "text"])
    bench = spark.createDataFrame([("aa bb cc dd",)], ["text"])
    src = str(tmp_path / "dflt_in")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_decontaminate(stream, bench, n=3, min_shared=2)
    q = (out.writeStream.format("memory").queryName("dflt_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {r["doc_id"] for r in
           spark.sql("SELECT doc_id FROM dflt_out").collect()}
    assert got == {"z"}
    spark.catalog.dropTempView("dflt_out")


def test_stream_token_quota_null_text_does_not_poison_batch(spark, tmp_path):
    """A null-text document must not turn the cumsum into NaN and reject
    every later document in the micro-batch."""
    from cascading_flink_spark.streaming import stream_token_quota
    docs = spark.createDataFrame(
        [(1, "en", "three short words"), (2, "en", None),
         (3, "en", "more words arrive here")],
        ["doc_id", "lang", "text"])
    src = str(tmp_path / "nq_in")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_token_quota(stream, {"en": 1000}, key_col="lang")
    q = (out.writeStream.format("memory").queryName("nq_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {r["doc_id"] for r in spark.sql("SELECT doc_id FROM nq_out").collect()}
    assert got == {"1", "3"}
    spark.catalog.dropTempView("nq_out")


def test_stream_rolling_stats_batch_parity(spark, sf_dir, tmp_path):
    """A single-batch stream through stream_rolling_stats must equal the
    batch rolling_stats output row-for-row (ids here are same-length
    strings, so the stream's string tie-break equals the numeric one)."""
    from cascading_flink_spark.extensions import rolling_stats
    from cascading_flink_spark.streaming import stream_rolling_stats

    ev = (load(spark, sf_dir, "events")
          .filter(F.col("user_id") < 20)
          .select("user_id", "event_id", "ts", "value"))
    src = str(tmp_path / "roll_in")
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_rolling_stats(stream, window_rows=3)
    q = (out.writeStream.format("memory").queryName("roll_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)

    got = {r["event_id"]: (r["mov_sum_cents"], r["mov_min_cents"],
                           r["mov_max_cents"], r["mov_n"],
                           r["delta_cents"], r["cum_n"])
           for r in spark.sql("SELECT * FROM roll_out").collect()}
    expect = {str(r["event_id"]): (r["mov_sum_cents"], r["mov_min_cents"],
                                   r["mov_max_cents"], r["mov_n"],
                                   r["delta_cents"], r["cum_n"])
              for r in rolling_stats(
                  spark.read.parquet(src), window_rows=3).collect()}
    assert got == expect and expect
    spark.catalog.dropTempView("roll_out")


def test_stream_rolling_stats_three_batch_golden(spark, tmp_path):
    """3 batches with checkpoint restarts: the trailing frame, prev value
    and running count must carry across batches exactly — frames span
    batch boundaries (e3's frame = [d2's 300, e2's 100, e3's 400])."""
    from cascading_flink_spark.streaming import stream_rolling_stats

    src = tmp_path / "roll3_in"
    src.mkdir()
    import datetime as _dt
    mk = lambda i, s, v: ("u", f"e{i}",
                          _dt.datetime(2024, 1, 1, 0, 0, s), v)
    batches = [
        [mk(1, 1, 1.0), mk(2, 2, 3.0)],
        [mk(3, 4, 4.0), mk(4, 3, 1.0)],   # e4 sorts before e3 by ts
        [mk(5, 5, None)],                  # null value rides through
    ]
    sch = ("user_id string, event_id string, ts timestamp, value double")
    from pyspark.sql import functions as SF
    def write(i):
        spark.createDataFrame(batches[i], sch).coalesce(1) \
            .write.parquet(str(src / f"f{i}"))
    write(0)
    schema = spark.read.parquet(str(src / "f0")).schema
    ckpt, out_dir = str(tmp_path / "roll3_ck"), str(tmp_path / "roll3_out")

    for i in range(len(batches)):
        if i:
            write(i)
        _run_available_now(
            spark, schema, str(src / "*"), ckpt, out_dir,
            lambda s: stream_rolling_stats(s, key_col="user_id",
                                           window_rows=3))

    rows = {r["event_id"]: (r["mov_sum_cents"], r["mov_n"],
                            r["delta_cents"], r["cum_n"])
            for r in spark.read.parquet(out_dir).collect()}
    assert rows == {
        "e1": (100, 1, None, 1),
        "e2": (400, 2, 200, 2),
        # batch 2 sorts by ts: e4 (t=3, 1.00) then e3 (t=4, 4.00);
        # frames carry batch 1's values
        "e4": (500, 3, -200, 3),          # [100, 300, 100]
        "e3": (800, 3, 300, 4),           # [300, 100, 400]
        # batch 3: null value occupies a frame slot, sum skips it,
        # delta from a non-null prev to null is NULL
        "e5": (500, 3, None, 5),          # [100, 400, None]
    }


def test_stream_domain_quota_batch_parity(spark, sf_dir, tmp_path):
    """A single-batch stream through stream_domain_quota must admit
    exactly domain_quota's set (same seeded md5 order per domain)."""
    from cascading_flink_spark.extensions import domain_quota
    from cascading_flink_spark.streaming import stream_domain_quota

    docs = (load(spark, sf_dir, "documents")
            .select("doc_id", "source").limit(300))
    src = str(tmp_path / "dq_in")
    docs.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    out = stream_domain_quota(stream, max_docs=5)
    q = (out.writeStream.format("memory").queryName("dq_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)

    got = {r["doc_id"] for r in spark.sql("SELECT * FROM dq_out").collect()}
    expect = {str(r["doc_id"]) for r in
              domain_quota(spark.read.parquet(src), "source", 5).collect()}
    assert got == expect and expect
    spark.catalog.dropTempView("dq_out")


def test_stream_domain_quota_three_batch_golden(spark, tmp_path):
    """3 batches, restart between each, max_docs=3: domain k fills in
    batch 1 (md5 order a1<a4<a2, a3 blocked), domain m tops up across
    batches (b1 then b3<b2) and rejects batch 3 outright.  Ranks pinned
    as literals from the precomputed md5(quota#id) order."""
    from cascading_flink_spark.streaming import stream_domain_quota

    src = tmp_path / "dq3_in"
    src.mkdir()
    batches = [
        [("a1", "k"), ("a2", "k"), ("a3", "k"), ("a4", "k"), ("b1", "m")],
        [("c1", "k"), ("b2", "m"), ("b3", "m")],
        [("d1", "m")],
    ]
    sch = "doc_id string, dom string"
    spark.createDataFrame(batches[0], sch).coalesce(1) \
        .write.parquet(str(src / "f0"))
    schema = spark.read.parquet(str(src / "f0")).schema
    ckpt, out_dir = str(tmp_path / "dq3_ck"), str(tmp_path / "dq3_out")

    for i, batch in enumerate(batches):
        if i:
            spark.createDataFrame(batch, sch).coalesce(1) \
                .write.parquet(str(src / f"f{i}"))
        _run_available_now(
            spark, schema, str(src / "*"), ckpt, out_dir,
            lambda s: stream_domain_quota(s, max_docs=3, domain_col="dom"))

    rows = {r["doc_id"]: (r["domain"], r["admitted_rank"])
            for r in spark.read.parquet(out_dir).collect()}
    assert rows == {
        "a1": ("k", 1), "a4": ("k", 2), "a2": ("k", 3),
        "b1": ("m", 1), "b3": ("m", 2), "b2": ("m", 3),
    }


def test_stream_domain_quota_rejects_bad_max(spark):
    from cascading_flink_spark.streaming import stream_domain_quota
    import pytest as _pytest
    df = spark.readStream.format("rate").load()
    with _pytest.raises(ValueError):
        stream_domain_quota(df, max_docs=0)


def test_stream_embedding_gate_drops_planted_dups(spark, sf_dir, tmp_path):
    """A stream carrying noisy copies of reference vectors plus fresh
    vectors: copies are dropped, fresh vectors pass; parity with the same
    stateless join run in batch."""
    import numpy as np
    from cascading_flink_spark.streaming import stream_embedding_gate

    emb = load(spark, sf_dir, "embeddings")
    ref = emb.filter(F.col("vec_id") < 100).cache()
    rng = np.random.default_rng(5)
    base = {r["vec_id"]: np.array(r["embedding"], dtype=np.float32)
            for r in ref.limit(10).collect()}
    rows = [(int(v) + 5000,
             (x + rng.normal(0, 0.005, x.shape).astype(np.float32)).tolist())
            for v, x in base.items()]          # near-dups of the reference
    fresh = [(int(r["vec_id"]) + 9000, r["embedding"])
             for r in emb.filter(F.col("vec_id").between(200, 209)).collect()]
    batch_in = spark.createDataFrame(rows + fresh,
                                     "vec_id long, embedding array<float>")
    src = str(tmp_path / "eg_in")
    batch_in.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch_in.schema).parquet(src)
    out = stream_embedding_gate(stream, ref, threshold=0.98)
    q = (out.writeStream.format("memory").queryName("eg_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {r["vec_id"] for r in spark.sql("SELECT * FROM eg_out").collect()}
    spark.catalog.dropTempView("eg_out")

    batch_out = {r["vec_id"] for r in
                 stream_embedding_gate(batch_in, ref, threshold=0.98).collect()}
    assert got == batch_out                       # stream == batch (stateless)
    assert {v for v, _ in fresh} <= got           # fresh vectors pass
    planted = {v for v, _ in rows}
    assert len(planted & got) <= 2, planted & got  # near-dups gated (LSH recall)


def _raster72(base: int, bump: int | None = None) -> bytes:
    """9x8 raw grayscale raster in the synthetic family's arithmetic;
    bumping one cell (+40) moves at most 2 dHash bits."""
    return bytes(((base * 7 + i * 13 +
                   (40 if bump is not None and i == bump else 0)) % 256)
                 for i in range(72))


def test_stream_media_dedup_exact_horizon(spark, tmp_path):
    """Repeats of the same perceptual hash within the watermark are
    dropped; survivors carry the batch family's exact dHash values."""
    from cascading_flink_spark.extensions.multimodal import dhash_bytes
    from cascading_flink_spark.streaming import stream_media_dedup

    rows = [(i, _raster72(i % 3), 1_700_000_000 + i) for i in range(9)]
    df = spark.createDataFrame(
        rows, "media_id long, payload binary, sec long") \
        .withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    src = str(tmp_path / "media_in")
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_media_dedup(stream, ts_col="ts", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("media_dedup_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)

    got = spark.sql("SELECT dhash FROM media_dedup_out").collect()
    hashes = sorted(r["dhash"] for r in got)
    expect = sorted({dhash_bytes(_raster72(b))[0] for b in range(3)})
    assert hashes == expect                 # one survivor per distinct hash
    spark.catalog.dropTempView("media_dedup_out")


def test_stream_media_dedup_reference_gate_exact(spark, tmp_path):
    """The chained per-band anti-joins drop exactly the stream images
    within max_hamming of SOME reference image — verified against a
    brute-force Hamming computation on the same hashes."""
    from cascading_flink_spark.extensions.multimodal import dhash_bytes
    from cascading_flink_spark.streaming import stream_media_dedup

    ref_rows = [(100 + b, _raster72(b)) for b in range(4)]
    reference = spark.createDataFrame(ref_rows,
                                      "media_id long, payload binary")
    # stream: near-dups of each reference base (one bumped cell) plus
    # genuinely far images (descending ramps: dHash bits ~all inverted
    # vs the ascending reference family)
    stream_rows = ([(b, _raster72(b, bump=(b * 31) % 72)) for b in range(4)]
                   + [(10 + b, bytes(((b * 7 + (72 - i) * 13) % 256)
                                     for i in range(72)))
                      for b in range(4)])
    df = spark.createDataFrame(stream_rows,
                               "media_id long, payload binary") \
        .withColumn("ts", F.timestamp_seconds(F.lit(1_700_000_000)
                                              + F.col("media_id")))
    src = str(tmp_path / "gate_in")
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_media_dedup(stream, ts_col="ts", watermark="1 hour",
                             reference=reference, max_hamming=4)
    q = (out.writeStream.format("memory").queryName("media_gate_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)

    got = {r["media_id"] for r in
           spark.sql("SELECT media_id FROM media_gate_out").collect()}
    ref_hashes = [dhash_bytes(p)[0] for _, p in ref_rows]
    expect = set()
    for mid, p in stream_rows:
        h = dhash_bytes(p)[0]
        if all(bin((h ^ r) & ((1 << 64) - 1)).count("1") > 4
               for r in ref_hashes):
            expect.add(mid)
    assert got == expect
    assert got == {10, 11, 12, 13}          # the gate dropped all near-dups
    spark.catalog.dropTempView("media_gate_out")


def test_stream_media_dedup_state_across_batches(spark, tmp_path):
    """The dedup state store persists across micro-batches: a duplicate
    hash arriving in a later batch within the watermark is dropped."""
    from cascading_flink_spark.streaming import stream_media_dedup

    src = tmp_path / "media2_in"
    src.mkdir()
    mk = lambda rows: spark.createDataFrame(
        rows, "media_id long, payload binary, sec long") \
        .withColumn("ts", F.timestamp_seconds("sec")).drop("sec")
    d1 = mk([(1, _raster72(0), 1_700_000_000)])
    d2 = mk([(2, _raster72(0), 1_700_000_060),    # dup of batch-1 hash
             (3, _raster72(1), 1_700_000_061)])   # new hash
    d1.coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))

    schema = spark.read.parquet(str(src / "f1")).schema
    ckpt = str(tmp_path / "media2_ckpt")
    out_dir = str(tmp_path / "media2_out")

    def run_once():
        stream = spark.readStream.schema(schema).parquet(str(src / "*"))
        out = stream_media_dedup(stream, ts_col="ts", watermark="1 hour")
        q = (out.writeStream.format("parquet").option("path", out_dir)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_once()
    d2.coalesce(1).write.mode("overwrite").parquet(str(src / "f2"))
    run_once()

    got = sorted(r["media_id"]
                 for r in spark.read.parquet(out_dir).collect())
    assert got == [1, 3]                    # 2 deduped across batches


def test_kmeans_assign_streaming_parity(spark, sf_dir, tmp_path):
    """kmeans_assign is a stateless map-side projection, so the SAME
    trained centroids route a stream to byte-identical assignments as the
    batch path — the train-in-batch / assign-on-stream inference pattern."""
    from cascading_flink_spark.extensions import kmeans_assign

    emb = load(spark, sf_dir, "embeddings").limit(200)
    src = str(tmp_path / "km_in")
    emb.write.mode("overwrite").parquet(src)

    # any fixed centroid set works for the parity pin; unit-ish rows keep
    # the cosine well-conditioned
    cents = [list(r["embedding"]) for r in
             spark.read.parquet(src).orderBy("vec_id").limit(3).collect()]
    cents = [[float(x) for x in c] for c in cents]

    stream = spark.readStream.schema(spark.read.parquet(src).schema) \
                  .parquet(src)
    out = kmeans_assign(stream, cents).select("vec_id", "cluster", "sim")
    q = (out.writeStream.format("memory").queryName("km_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)

    got = sorted(map(tuple,
                     spark.sql("SELECT * FROM km_out").collect()))
    expect = sorted(map(tuple,
                        kmeans_assign(spark.read.parquet(src), cents)
                        .select("vec_id", "cluster", "sim").collect()))
    assert got == expect and len(expect) == 200
    spark.catalog.dropTempView("km_out")


def test_hash_embed_streaming_parity(spark, sf_dir, tmp_path):
    """hash_embed's Arrow pass is stateless, so the featurizer runs on a
    Structured Streaming frame unchanged and produces byte-identical
    vectors to batch — embed-on-ingest with zero state."""
    from cascading_flink_spark.extensions import hash_embed

    docs = (load(spark, sf_dir, "documents")
            .select("doc_id", F.coalesce("text", F.lit("")).alias("text"))
            .limit(150))
    src = str(tmp_path / "he_in")
    docs.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema) \
                  .parquet(src)
    out = hash_embed(stream, dim=16).select("doc_id", "emb")
    q = (out.writeStream.format("memory").queryName("he_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)

    got = {r["doc_id"]: list(r["emb"])
           for r in spark.sql("SELECT * FROM he_out").collect()}
    expect = {r["doc_id"]: list(r["emb"])
              for r in hash_embed(spark.read.parquet(src), dim=16)
              .select("doc_id", "emb").collect()}
    assert got == expect and len(expect) == 150
    spark.catalog.dropTempView("he_out")


def test_stream_session_transitions_batch_parity(spark, sf_dir, tmp_path):
    """A single-batch stream's partial counts, aggregated over keys,
    must equal the batch session_transitions n_trans matrix exactly
    (event_id strings here are same-length digits, so the stream's
    string tie-break equals the numeric one)."""
    from cascading_flink_spark.extensions import session_transitions
    from cascading_flink_spark.streaming import stream_session_transitions

    gap = 6 * 3600 * 1_000_000
    ev = (load(spark, sf_dir, "events")
          .filter((F.col("user_id") < 40)
                  & (F.col("event_id") >= 100) & (F.col("event_id") < 1000))
          .select("user_id", "event_id", "ts", "event_type"))
    src = str(tmp_path / "str_in")
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_session_transitions(stream, gap_us=gap)
    q = (out.writeStream.format("memory").queryName("str_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)

    got = {}
    for r in spark.sql("SELECT * FROM str_out").collect():
        k = (r["from_type"], r["to_type"])
        got[k] = got.get(k, 0) + r["n_trans"]
    expect = {(r["from_type"], r["to_type"]): r["n_trans"]
              for r in session_transitions(
                  spark.read.parquet(src), gap_us=gap).collect()}
    assert got == expect and expect
    spark.catalog.dropTempView("str_out")


def test_stream_session_transitions_boundary_counts_once(spark, tmp_path):
    """2 batches with a checkpoint restart: the pair that straddles the
    batch boundary (a->b within gap) is counted exactly once via the
    carried (last_us, last_type) state; a beyond-gap arrival opens a
    new session and contributes nothing."""
    from cascading_flink_spark.streaming import stream_session_transitions
    import datetime as _dt

    src = tmp_path / "str2_in"
    src.mkdir()
    mk = lambda i, s, t: (1, f"e{i}", _dt.datetime(2024, 1, 1, 0, 0, s), t)
    batches = [
        [mk(1, 1, "a"), mk(2, 2, "b")],       # a->b in batch 1
        [mk(3, 3, "a"),                        # b->a straddles the boundary
         mk(4, 50, "b")],                      # 47s > 10s gap: no transition
    ]
    sch = "user_id long, event_id string, ts timestamp, event_type string"
    def write(i):
        spark.createDataFrame(batches[i], sch).coalesce(1) \
            .write.parquet(str(src / f"f{i}"))
    write(0)
    schema = spark.read.parquet(str(src / "f0")).schema
    ckpt, out_dir = str(tmp_path / "str2_ck"), str(tmp_path / "str2_out")

    for i in range(len(batches)):
        if i:
            write(i)
        _run_available_now(
            spark, schema, str(src / "*"), ckpt, out_dir,
            lambda s: stream_session_transitions(s, gap_us=10_000_000))

    got = {}
    for r in spark.read.parquet(out_dir).collect():
        k = (r["from_type"], r["to_type"])
        got[k] = got.get(k, 0) + r["n_trans"]
    assert got == {("a", "b"): 1, ("b", "a"): 1}


def test_stream_session_funnel_batch_parity(spark, sf_dir, tmp_path):
    """A single-batch stream's per-key partials, summed per step, must
    equal the batch session_funnel n_sessions exactly (same digit-width
    event_id caveat as the transitions twin)."""
    from cascading_flink_spark.extensions import session_funnel
    from cascading_flink_spark.streaming import stream_session_funnel

    gap = 6 * 3600 * 1_000_000
    steps = ["view", "click", "purchase"]
    ev = (load(spark, sf_dir, "events")
          .filter((F.col("user_id") < 40)
                  & (F.col("event_id") >= 100) & (F.col("event_id") < 1000))
          .select("user_id", "event_id", "ts", "event_type"))
    src = str(tmp_path / "sfn_in")
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_session_funnel(stream, steps, gap_us=gap)
    q = (out.writeStream.format("memory").queryName("sfn_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)

    got = {}
    for r in spark.sql("SELECT * FROM sfn_out").collect():
        got[r["step_name"]] = got.get(r["step_name"], 0) + r["n_new"]
    expect = {r["step_name"]: r["n_sessions"]
              for r in session_funnel(spark.read.parquet(src), steps,
                                      gap_us=gap).collect()
              if r["n_sessions"]}
    assert got == expect and expect
    spark.catalog.dropTempView("sfn_out")


def test_stream_session_funnel_boundary_completes_once(spark, tmp_path):
    """2 batches with a checkpoint restart: a funnel prefix straddling
    the batch boundary completes exactly once via the carried
    (last_us, mask, times) state; a beyond-gap arrival resets the
    session and the stale prefix never completes."""
    from cascading_flink_spark.streaming import stream_session_funnel
    import datetime as _dt

    src = tmp_path / "sfn2_in"
    src.mkdir()
    mk = lambda u, i, s, t: (u, f"e{i}", _dt.datetime(2024, 1, 1, 0, 0, s), t)
    batches = [
        # u1: view+click in batch 1; u2: view only
        [mk(1, 1, 1, "view"), mk(1, 2, 2, "click"), mk(2, 3, 1, "view")],
        # u1: purchase within gap -> completes step 3 once;
        # u2: click BEYOND the 10s gap -> new session, no step 2
        [mk(1, 4, 5, "purchase"), mk(2, 5, 30, "click")],
    ]
    sch = "user_id long, event_id string, ts timestamp, event_type string"
    def write(i):
        spark.createDataFrame(batches[i], sch).coalesce(1) \
            .write.parquet(str(src / f"f{i}"))
    write(0)
    schema = spark.read.parquet(str(src / "f0")).schema
    ckpt, out_dir = str(tmp_path / "sfn2_ck"), str(tmp_path / "sfn2_out")

    for i in range(len(batches)):
        if i:
            write(i)
        _run_available_now(
            spark, schema, str(src / "*"), ckpt, out_dir,
            lambda s: stream_session_funnel(
                s, ["view", "click", "purchase"], gap_us=10_000_000))

    got = {}
    for r in spark.read.parquet(out_dir).collect():
        k = (r["key"], r["step"])
        got[k] = got.get(k, 0) + r["n_new"]
    assert got == {("1", 1): 1, ("1", 2): 1, ("1", 3): 1, ("2", 1): 1}


def test_stream_label_agreement_batch_parity(spark, sf_dir, tmp_path):
    """A single-batch stream's latest row per item equals the batch
    label_agreement exactly (string-cast item/label — the documented
    streaming trade)."""
    from cascading_flink_spark.extensions import label_agreement
    from cascading_flink_spark.streaming import stream_label_agreement

    ev = (load(spark, sf_dir, "events")
          .filter(F.col("user_id") < 40)
          .select(F.col("user_id").cast("string").alias("item"),
                  F.col("event_type").alias("label")))
    src = str(tmp_path / "sla_in")
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_label_agreement(stream, "item", "label")
    q = (out.writeStream.format("memory").queryName("sla_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)

    got = {r.item: (r.n_votes, r.n_labels, r.majority_label,
                    r.majority_n, r.agreement_x1e6)
           for r in spark.sql("SELECT * FROM sla_out").collect()}
    expect = {r.item: (r.n_votes, r.n_labels, r.majority_label,
                       r.majority_n, r.agreement_x1e6)
              for r in label_agreement(spark.read.parquet(src),
                                       "item", "label").collect()}
    assert got == expect and expect
    spark.catalog.dropTempView("sla_out")


@pytest.mark.slow  # r15: heavy, round-close full gate only
def test_stream_label_agreement_restart_accumulates(spark, tmp_path):
    """2 batches with a checkpoint restart: the carried histogram
    accumulates (no double counting, no reset), NULL votes are
    ignored, and a 2-2 tie resolves label-ASC; untouched items emit
    no new row in batch 2."""
    from cascading_flink_spark.streaming import stream_label_agreement

    src = tmp_path / "sla2_in"
    src.mkdir()
    sch = "item string, label string"
    batches = [
        [("a", "good"), ("a", "bad"), ("b", "spam"), ("b", None)],
        [("a", "bad"), ("a", "good")],   # a ends 2-2 -> 'bad' wins ASC
    ]
    def write(i):
        spark.createDataFrame(batches[i], sch).coalesce(1) \
            .write.parquet(str(src / f"f{i}"))
    write(0)
    schema = spark.read.parquet(str(src / "f0")).schema
    ckpt = str(tmp_path / "sla2_ck")
    out_dir = str(tmp_path / "sla2_out")

    for i in range(len(batches)):
        if i:
            write(i)
        _run_available_now(
            spark, schema, str(src / "*"), ckpt, out_dir,
            lambda s: stream_label_agreement(s, "item", "label"))

    rows = spark.read.parquet(out_dir).collect()
    by_item = {}
    for r in rows:
        by_item.setdefault(r.item, []).append(r)
    # latest row per item = the one with the largest n_votes
    latest = {i: max(rs, key=lambda r: r.n_votes)
              for i, rs in by_item.items()}
    a = latest["a"]
    assert (a.n_votes, a.n_labels, a.majority_label, a.majority_n,
            a.agreement_x1e6) == (4, 2, "bad", 2, 500_000)
    b = latest["b"]
    assert (b.n_votes, b.n_labels, b.majority_label,
            b.agreement_x1e6) == (1, 1, "spam", 1_000_000)
    # b got no batch-2 votes: exactly one emitted row ever
    assert len(by_item["b"]) == 1


def test_stream_score_monitor_batch_parity(spark, sf_dir, tmp_path):
    """Each emitted (window, group) row is bit-identical to the batch
    calibration machinery over the same rows: per-window n/pos_rate/
    mean/brier recomputed with plain integer Python over the staged
    events must match exactly."""
    from cascading_flink_spark.streaming import stream_score_monitor
    import __spark_entry__ as entry

    ev = (entry._t(spark, sf_dir, "events")
          .filter(F.col("user_id") < 60)
          .select("ts", "user_id", "event_type", "value"))
    # deterministic pseudo-probability + label from stable columns
    ev = (ev.withColumn("p", (F.col("user_id") * 37 % 1001)
                        / F.lit(1000.0))
          .withColumn("label", (F.col("user_id") % 3 == 0)
                      .cast("int")))
    src = str(tmp_path / "ssm_in")
    ev.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_score_monitor(stream, "p", "label", ts_col="ts",
                               window="1 hour", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("ssm_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {(r.window_start, r.n, r.pos_rate_x, r.mean_score_x,
            r.brier_x)
           for r in spark.sql("SELECT * FROM ssm_out").collect()}

    import collections
    SC = 1_000_000
    acc = collections.defaultdict(lambda: [0, 0, 0, 0])
    for r in spark.read.parquet(src).collect():
        sq = round((r.user_id * 37 % 1001) / 1000.0 * SC)
        l = 1 if r.user_id % 3 == 0 else 0
        key = r.ts.replace(minute=0, second=0, microsecond=0)
        a = acc[key]
        a[0] += 1
        a[1] += l
        a[2] += sq
        a[3] += (sq - l * SC) ** 2
    expect = {(k, n, p * SC // n, ss // n, s2 // (n * SC))
              for k, (n, p, ss, s2) in acc.items()}
    # append mode withholds windows newer than the final watermark;
    # every EMITTED row must be bit-identical to the batch arithmetic,
    # and all but the watermark-horizon tail must be emitted
    assert got and got <= expect
    assert len(got) >= len(expect) - 3
    spark.catalog.dropTempView("ssm_out")


def test_stream_drift_monitor_batch_parity(spark, sf_dir, tmp_path):
    """Each emitted (window) row is bit-identical to the same
    arithmetic in plain integer Python over the staged events: the
    reference quantizes/clamps/rounds-ln ONCE on the static side,
    every event's surprisal is an exact long, xent is one truncating
    DIV; OOV keys take the floor surprisal and count in n_oov."""
    import math
    from cascading_flink_spark.streaming import stream_drift_monitor
    import __spark_entry__ as entry

    ev = (entry._t(spark, sf_dir, "events")
          .filter(F.col("user_id") < 80)
          .select("ts", "event_type"))
    src = str(tmp_path / "sdm_in")
    ev.write.mode("overwrite").parquet(src)
    # reference: the event-type mix of a DIFFERENT user slice, with
    # one type filtered out so the stream contains genuine OOV keys
    ref = (entry._t(spark, sf_dir, "events")
           .filter((F.col("user_id") >= 80) & (F.col("user_id") < 200)
                   & (F.col("event_type") != "click"))
           .select("event_type"))

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_drift_monitor(stream, ref, "event_type", ts_col="ts",
                               window="1 hour", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("sdm_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {(r.window_start, r.n, r.n_oov, r.xent_x1e6)
           for r in spark.sql("SELECT * FROM sdm_out").collect()}

    SC = 1_000_000
    refc = {}
    for r in ref.collect():
        refc[r.event_type] = refc.get(r.event_type, 0) + 1
    t = sum(refc.values())
    lnq = {k: math.floor(math.log(max(c * SC // t, 1)) * SC + 0.5)
           for k, c in refc.items()}
    ln_s = math.floor(math.log(SC) * SC + 0.5)
    import collections
    acc = collections.defaultdict(lambda: [0, 0, 0])
    for r in spark.read.parquet(src).collect():
        key = r.ts.replace(minute=0, second=0, microsecond=0)
        a = acc[key]
        a[0] += 1
        a[1] += 1 if r.event_type not in lnq else 0
        a[2] += ln_s - lnq.get(r.event_type, 0)
    expect = {(k, n, oov, ss // n) for k, (n, oov, ss) in acc.items()}
    assert got and got <= expect
    assert len(got) >= len(expect) - 3
    # the OOV path is genuinely exercised
    assert any(oov > 0 for _k, _n, oov, _x in got)
    spark.catalog.dropTempView("sdm_out")


def test_stream_drift_monitor_guards(spark, sf_dir):
    from cascading_flink_spark.streaming import stream_drift_monitor
    import __spark_entry__ as entry
    ev = entry._t(spark, sf_dir, "events").select("ts", "event_type")
    with pytest.raises(ValueError, match="scale"):
        stream_drift_monitor(ev, ev, "event_type", scale=1000)


# ------------------------------------------------ stream_psi_monitor


def _psi_model(window_counts: dict, ref_counts: dict, s=1_000_000):
    """Plain integer-Python twin of the psi_drift spelling over the
    reference support + pooled OOV cell."""
    import math
    n = sum(window_counts.values())
    tot = sum(ref_counts.values())
    psi = 0
    for k, c in ref_counts.items():
        p = max(window_counts.get(k, 0) * s // n, 1)
        q = max(c * s // tot, 1)
        psi += (p - q) * (math.floor(math.log(p) * s + 0.5)
                          - math.floor(math.log(q) * s + 0.5))
    oov = sum(c for k, c in window_counts.items()
              if k not in ref_counts)
    p = max(oov * s // n, 1)
    psi += (p - 1) * (math.floor(math.log(p) * s + 0.5) - 0)
    return n, oov, psi // s


@pytest.mark.slow  # r15: heavy, round-close full gate only
def test_stream_psi_monitor_batch_parity(spark, sf_dir, tmp_path):
    """Each emitted window row is bit-identical to the integer-Python
    psi_drift spelling over the staged events, and — on the no-OOV
    steady state — to the BATCH psi_drift operator run per window
    (the two-sample twin pin)."""
    from cascading_flink_spark.extensions import psi_drift
    from cascading_flink_spark.streaming import stream_psi_monitor
    import __spark_entry__ as entry

    ev = (entry._t(spark, sf_dir, "events")
          .filter(F.col("user_id") < 8)
          .select("ts", "event_type"))
    src = str(tmp_path / "spm_in")
    ev.write.mode("overwrite").parquet(src)
    # reference: a different user slice — FULL event-type support, so
    # the stream has no OOV keys and batch parity is exact
    ref = (entry._t(spark, sf_dir, "events")
           .filter(F.col("user_id") >= 8)
           .select("event_type"))

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_psi_monitor(stream, ref, "event_type", ts_col="ts",
                             window="1 hour", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("spm_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.window_start: (r.n, r.n_oov, r.n_keys, r.psi_x1e6)
           for r in spark.sql("SELECT * FROM spm_out").collect()}

    refc = {}
    for r in ref.collect():
        refc[r.event_type] = refc.get(r.event_type, 0) + 1
    import collections
    wc = collections.defaultdict(lambda: collections.defaultdict(int))
    for r in spark.read.parquet(src).collect():
        wc[r.ts.replace(minute=0, second=0, microsecond=0)][
            r.event_type] += 1
    assert got
    for w, (n, oov, nk, psi) in got.items():
        en, eoov, epsi = _psi_model(wc[w], refc)
        assert (n, oov, psi) == (en, eoov, epsi), w
        assert nk == len(refc) + (1 if oov else 0)
        assert oov == 0  # full-support reference: the steady state
        # the BATCH psi_drift twin on this window's rows
        wrows = spark.read.parquet(src).filter(
            (F.col("ts") >= F.lit(w))
            & (F.col("ts") < F.lit(w) + F.expr("INTERVAL 1 HOUR")))
        b = psi_drift(wrows.select("event_type"), ref,
                      "event_type").collect()[0]
        assert (b.n_a, b.n_keys, b.psi_x1e6) == (n, nk, psi), w
    # all but the watermark-horizon tail must be emitted
    assert len(got) >= len(wc) - 3
    spark.catalog.dropTempView("spm_out")


def test_stream_psi_monitor_oov_pooling(spark, tmp_path):
    """Stream keys outside the reference support pool into ONE floored
    OOV cell (the documented trade vs batch's per-key floor): n_oov
    counts them, n_keys grows by one, and the psi matches the pooled
    model exactly.  NULL stream keys drop their row entirely — batch
    psi_drift parity (ADVICE r13): they count into neither n, n_oov,
    nor any vocab cell."""
    import datetime
    from cascading_flink_spark.streaming import stream_psi_monitor

    t0 = datetime.datetime(2024, 1, 1, 0, 30)
    t2 = datetime.datetime(2024, 1, 1, 2, 0)
    rows = ([("a", t0)] * 6 + [("b", t0)] * 2
            + [("zz", t0)] * 2 + [("ww", t0)]
            # NULL keys must vanish without touching n/n_oov/psi
            + [(None, t0)] * 4
            # sentinel in a later window pushes the watermark past
            # window 0's end so append mode emits it
            + [("a", t2)])
    src = str(tmp_path / "spo_in")
    spark.createDataFrame(rows, "k string, ts timestamp") \
        .write.parquet(src)
    ref = spark.createDataFrame(
        [("a",)] * 5 + [("b",)] * 5, "k string")

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_psi_monitor(stream, ref, "k", ts_col="ts",
                             window="1 hour", watermark="0 seconds")
    q = (out.writeStream.format("memory").queryName("spo_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows_out = [r for r in
                spark.sql("SELECT * FROM spo_out").collect()
                if r.window_start == t0.replace(minute=0)]
    assert len(rows_out) == 1
    r = rows_out[0]
    n, oov, psi = _psi_model({"a": 6, "b": 2, "zz": 2, "ww": 1},
                             {"a": 5, "b": 5})
    assert (r.n, r.n_oov, r.n_keys, r.psi_x1e6) == (n, oov, 3, psi)
    assert r.n_oov == 3 and r.psi_x1e6 > 0
    spark.catalog.dropTempView("spo_out")


@pytest.mark.slow  # r15: heavy, round-close full gate only
def test_stream_psi_monitor_restart_no_double_emission(spark, tmp_path):
    """2 batches with a checkpoint restart: a window emits exactly
    once (when the watermark passes its end), accumulates across
    batches before that, and the restart neither re-emits nor resets
    state."""
    import datetime
    from cascading_flink_spark.streaming import stream_psi_monitor

    src = tmp_path / "spr_in"
    src.mkdir()
    h0 = datetime.datetime(2024, 1, 1, 0, 0)
    h1 = datetime.datetime(2024, 1, 1, 1, 0)
    h3 = datetime.datetime(2024, 1, 1, 3, 0)
    sch = "k string, ts timestamp"
    batches = [
        [("a", h0), ("a", h0), ("b", h0),               # window 0
         ("a", h1)],                                     # window 1 opens
        [("b", h1), ("b", h1),                           # window 1 grows
         ("a", h3)],                                     # pushes wm past 1
    ]

    def write(i):
        spark.createDataFrame(batches[i], sch).coalesce(1) \
            .write.parquet(str(src / f"f{i}"))
    write(0)
    schema = spark.read.parquet(str(src / "f0")).schema
    ref = spark.createDataFrame([("a",)] * 3 + [("b",)] * 3, "k string")
    ckpt = str(tmp_path / "spr_ck")
    out_dir = str(tmp_path / "spr_out")

    for i in range(len(batches)):
        if i:
            write(i)
        _run_available_now(
            spark, schema, str(src / "*"), ckpt, out_dir,
            lambda s: stream_psi_monitor(
                s, ref, "k", ts_col="ts", window="1 hour",
                watermark="0 seconds"))

    rows = spark.read.parquet(out_dir).collect()
    by_w = {r.window_start: r for r in rows}
    assert len(rows) == len(by_w), "a window emitted twice"
    # window 0 closed in batch 1 with batch-1 data only
    r0 = by_w[h0]
    n, oov, psi = _psi_model({"a": 2, "b": 1}, {"a": 3, "b": 3})
    assert (r0.n, r0.n_oov, r0.psi_x1e6) == (n, oov, psi)
    # window 1 closed in batch 2 having ACCUMULATED both batches'
    # rows across the restart (1 a from batch 1 + 2 b from batch 2)
    r1 = by_w[h1]
    n, oov, psi = _psi_model({"a": 1, "b": 2}, {"a": 3, "b": 3})
    assert (r1.n, r1.n_oov, r1.psi_x1e6) == (n, oov, psi)


def test_stream_psi_monitor_guards(spark, sf_dir):
    from cascading_flink_spark.streaming import stream_psi_monitor
    import __spark_entry__ as entry
    ev = entry._t(spark, sf_dir, "events").select("ts", "event_type")
    with pytest.raises(ValueError, match="scale"):
        stream_psi_monitor(ev, ev, "event_type", scale=1000)
    with pytest.raises(ValueError, match="max_keys"):
        stream_psi_monitor(
            ev, entry._t(spark, sf_dir, "events")
            .select(F.col("user_id").cast("string")
                    .alias("event_type")),
            "event_type", max_keys=5)
    with pytest.raises(ValueError, match="empty"):
        stream_psi_monitor(ev, ev.filter("event_type IS NULL"),
                           "event_type")


def test_stream_psi_monitor_grouped(spark, tmp_path):
    """group_col: each (window, group) row scores its own group's
    distribution against the shared reference — pinned against the
    pooled model per group."""
    import datetime
    from cascading_flink_spark.streaming import stream_psi_monitor

    t0 = datetime.datetime(2024, 3, 1, 0, 15)
    t2 = datetime.datetime(2024, 3, 1, 2, 0)
    rows = ([("en", "a", t0)] * 8 + [("en", "b", t0)] * 2
            + [("de", "a", t0)] * 3 + [("de", "b", t0)] * 7
            + [("en", "a", t2), ("de", "a", t2)])   # watermark push
    src = str(tmp_path / "spg_in")
    spark.createDataFrame(rows, "g string, k string, ts timestamp") \
        .write.parquet(src)
    ref = spark.createDataFrame([("a",)] * 5 + [("b",)] * 5,
                                "k string")
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_psi_monitor(stream, ref, "k", ts_col="ts",
                             window="1 hour", watermark="0 seconds",
                             group_col="g")
    q = (out.writeStream.format("memory").queryName("spg_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    w0 = t0.replace(minute=0)
    got = {r.g: (r.n, r.n_oov, r.psi_x1e6)
           for r in spark.sql("SELECT * FROM spg_out").collect()
           if r.window_start == w0}
    exp = {"en": _psi_model({"a": 8, "b": 2}, {"a": 5, "b": 5}),
           "de": _psi_model({"a": 3, "b": 7}, {"a": 5, "b": 5})}
    assert got == exp and got["en"][2] > 0 and got["de"][2] > 0
    spark.catalog.dropTempView("spg_out")


# ------------------------------------------------- stream_ks_monitor


def _ks_model(win_vals: list, ref_vals: list, s=1_000_000):
    """Integer-Python twin of the ks_statistic spelling restricted to
    the reference grid (the monitor's documented evaluation axis)."""
    grid = sorted(set(ref_vals))
    n, n_ref = len(win_vals), len(ref_vals)
    num = 0
    for t in grid:
        ca = sum(1 for v in win_vals if v <= t)
        cb = sum(1 for v in ref_vals if v <= t)
        num = max(num, abs(ca * n_ref - cb * n))
    nov = sum(1 for v in win_vals if v not in set(grid))
    return n, nov, num * s // (n * n_ref)


def test_stream_ks_monitor_batch_parity(spark, sf_dir, tmp_path):
    """On windows whose values all lie ON the reference grid (here:
    integer n_chars with a full-support reference slice) each emitted
    row is bit-identical to the BATCH ks_statistic over the same rows
    — the continuous-score twin pin, VERDICT r13 Next #8."""
    from cascading_flink_spark.extensions import ks_statistic
    from cascading_flink_spark.streaming import stream_ks_monitor
    import __spark_entry__ as entry

    ev = (entry._t(spark, sf_dir, "events")
          .filter(F.col("user_id") % 2 == 0)
          .select("ts", (F.col("user_id") % 5).alias("score")))
    src = str(tmp_path / "skm_in")
    ev.write.mode("overwrite").parquet(src)
    # reference: the odd-user slice with FULL 0-4 support (user_id
    # spans 0-14 even at sf0.001), so every window value lies on the
    # grid and batch parity is exact
    ref = (entry._t(spark, sf_dir, "events")
           .filter(F.col("user_id") % 2 == 1)
           .select((F.col("user_id") % 5).alias("score")))

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_ks_monitor(stream, ref, "score", ts_col="ts",
                            window="1 hour", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("skm_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.window_start: (r.n, r.n_nov, r.ks_x)
           for r in spark.sql("SELECT * FROM skm_out").collect()}

    ref_vals = [r.score for r in ref.collect()]
    import collections
    wv = collections.defaultdict(list)
    for r in spark.read.parquet(src).collect():
        wv[r.ts.replace(minute=0, second=0, microsecond=0)].append(
            r.score)
    assert got
    checked_batch = 0
    for w, (n, nov, ks) in got.items():
        assert (n, nov, ks) == _ks_model(wv[w], ref_vals), w
        assert nov == 0  # full-support reference: the steady state
        if checked_batch < 4:  # batch twin on a few windows
            wrows = spark.read.parquet(src).filter(
                (F.col("ts") >= F.lit(w))
                & (F.col("ts") < F.lit(w) + F.expr("INTERVAL 1 HOUR")))
            b = ks_statistic(wrows.select("score"),
                             spark.createDataFrame(
                                 [(v,) for v in ref_vals],
                                 "score long"),
                             "score").collect()[0]
            assert (b.n_a, b.ks_x) == (n, ks), w
            checked_batch += 1
    assert checked_batch
    assert len(got) >= len(wv) - 3
    spark.catalog.dropTempView("skm_out")


def test_stream_ks_monitor_novel_values_and_nulls(spark, tmp_path):
    """Window values off the reference grid register at the next cut
    up (exact CDF contribution, sup lower-bounded — the documented
    trade) and count into n_nov; NULL values drop their row (batch
    parity)."""
    import datetime
    from cascading_flink_spark.streaming import stream_ks_monitor

    t0 = datetime.datetime(2024, 1, 1, 0, 30)
    t2 = datetime.datetime(2024, 1, 1, 2, 0)
    rows = ([(10, t0)] * 3 + [(20, t0)] * 2
            + [(15, t0)] * 2          # novel: between grid cuts
            + [(99, t0)]              # novel: above the grid
            + [(None, t0)] * 3        # dropped rows
            + [(10, t2)])             # watermark sentinel
    src = str(tmp_path / "skn_in")
    spark.createDataFrame(rows, "score long, ts timestamp") \
        .write.parquet(src)
    ref = spark.createDataFrame(
        [(10,)] * 5 + [(20,)] * 5, "score long")

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_ks_monitor(stream, ref, "score", ts_col="ts",
                            window="1 hour", watermark="0 seconds")
    q = (out.writeStream.format("memory").queryName("skn_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows_out = [r for r in
                spark.sql("SELECT * FROM skn_out").collect()
                if r.window_start == t0.replace(minute=0)]
    assert len(rows_out) == 1
    r = rows_out[0]
    win = [10, 10, 10, 20, 20, 15, 15, 99]
    n, nov, ks = _ks_model(win, [10] * 5 + [20] * 5)
    assert (r.n, r.n_nov, r.ks_x) == (n, nov, ks)
    assert r.n == 8 and r.n_nov == 3  # NULLs gone, novels counted
    spark.catalog.dropTempView("skn_out")


@pytest.mark.slow  # r15: heavy, round-close full gate only
def test_stream_ks_monitor_restart_no_double_emission(spark, tmp_path):
    """2 batches with a checkpoint restart: a window emits exactly
    once, accumulates across batches before the watermark passes, and
    the restart neither re-emits nor resets state."""
    import datetime
    from cascading_flink_spark.streaming import stream_ks_monitor

    src = tmp_path / "skr_in"
    src.mkdir()
    h0 = datetime.datetime(2024, 1, 1, 0, 0)
    h1 = datetime.datetime(2024, 1, 1, 1, 0)
    h3 = datetime.datetime(2024, 1, 1, 3, 0)
    sch = "score long, ts timestamp"
    batches = [
        [(10, h0), (10, h0), (20, h0),                  # window 0
         (10, h1)],                                      # window 1 opens
        [(20, h1), (20, h1),                             # window 1 grows
         (10, h3)],                                      # pushes wm past 1
    ]

    def write(i):
        spark.createDataFrame(batches[i], sch).coalesce(1) \
            .write.parquet(str(src / f"f{i}"))
    write(0)
    schema = spark.read.parquet(str(src / "f0")).schema
    ref = spark.createDataFrame([(10,)] * 3 + [(20,)] * 3,
                                "score long")
    ckpt = str(tmp_path / "skr_ck")
    out_dir = str(tmp_path / "skr_out")

    for i in range(len(batches)):
        if i:
            write(i)
        _run_available_now(
            spark, schema, str(src / "*"), ckpt, out_dir,
            lambda s: stream_ks_monitor(
                s, ref, "score", ts_col="ts", window="1 hour",
                watermark="0 seconds"))

    rows = spark.read.parquet(out_dir).collect()
    by_w = {r.window_start: r for r in rows}
    assert len(rows) == len(by_w), "a window emitted twice"
    rv = [10] * 3 + [20] * 3
    assert (by_w[h0].n, by_w[h0].n_nov, by_w[h0].ks_x) \
        == _ks_model([10, 10, 20], rv)
    # window 1 accumulated across the restart: 1x10 + 2x20
    assert (by_w[h1].n, by_w[h1].n_nov, by_w[h1].ks_x) \
        == _ks_model([10, 20, 20], rv)


def test_stream_ks_monitor_guards(spark, sf_dir):
    from cascading_flink_spark.streaming import stream_ks_monitor
    import __spark_entry__ as entry
    ev = entry._t(spark, sf_dir, "events").select(
        "ts", F.col("user_id").alias("score"))
    with pytest.raises(ValueError, match="scale"):
        stream_ks_monitor(ev, ev, "score", scale=0)
    with pytest.raises(ValueError, match="quantize_x"):
        stream_ks_monitor(ev, ev, "score", quantize_x=0)
    with pytest.raises(ValueError, match="max_keys"):
        stream_ks_monitor(ev, ev, "score", max_keys=3)
    with pytest.raises(ValueError, match="empty"):
        stream_ks_monitor(ev, ev.filter("score IS NULL"), "score")


# ------------------------------------------------- stream_w1_monitor


def _w1_model(win_vals: list, ref_vals: list, s=1_000_000):
    """Integer-Python twin of the wasserstein_distance spelling
    restricted to the reference grid."""
    grid = sorted(set(ref_vals))
    n, n_ref = len(win_vals), len(ref_vals)
    tot = 0
    for i in range(len(grid) - 1):
        ca = sum(1 for v in win_vals if v <= grid[i])
        cb = sum(1 for v in ref_vals if v <= grid[i])
        tot += abs(ca * n_ref - cb * n) * (grid[i + 1] - grid[i])
    nov = sum(1 for v in win_vals if v not in set(grid))
    return n, nov, tot * s // (n * n_ref)


def test_stream_w1_monitor_batch_parity(spark, sf_dir, tmp_path):
    """On windows whose values all lie ON the reference grid each
    emitted row is bit-identical to the BATCH wasserstein_distance
    over the same rows — the magnitude-weighted twin pin."""
    from cascading_flink_spark.extensions import wasserstein_distance
    from cascading_flink_spark.streaming import stream_w1_monitor
    import __spark_entry__ as entry

    ev = (entry._t(spark, sf_dir, "events")
          .filter(F.col("user_id") % 2 == 0)
          .select("ts", (F.col("user_id") % 5 * 7).alias("score")))
    src = str(tmp_path / "swm_in")
    ev.write.mode("overwrite").parquet(src)
    ref = (entry._t(spark, sf_dir, "events")
           .filter(F.col("user_id") % 2 == 1)
           .select((F.col("user_id") % 5 * 7).alias("score")))

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_w1_monitor(stream, ref, "score", ts_col="ts",
                            window="1 hour", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("swm_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.window_start: (r.n, r.n_nov, r.w1_x)
           for r in spark.sql("SELECT * FROM swm_out").collect()}

    ref_vals = [r.score for r in ref.collect()]
    import collections
    wv = collections.defaultdict(list)
    for r in spark.read.parquet(src).collect():
        wv[r.ts.replace(minute=0, second=0, microsecond=0)].append(
            r.score)
    assert got
    checked = 0
    for w, (n, nov, w1) in got.items():
        assert (n, nov, w1) == _w1_model(wv[w], ref_vals), w
        assert nov == 0
        if checked < 4:
            wrows = spark.read.parquet(src).filter(
                (F.col("ts") >= F.lit(w))
                & (F.col("ts") < F.lit(w) + F.expr("INTERVAL 1 HOUR")))
            b = wasserstein_distance(
                wrows.select("score"),
                spark.createDataFrame([(v,) for v in ref_vals],
                                      "score long"),
                "score").collect()[0]
            assert (b.n_a, b.w1_x) == (n, w1), w
            checked += 1
    assert checked
    spark.catalog.dropTempView("swm_out")


def test_stream_w1_monitor_shift_sensitivity(spark, tmp_path):
    """The monitor's reason to exist: a uniform +1-cell shift of the
    whole distribution moves W1 by the full mass while KS stays at
    one cell's gap — plus novel/NULL handling and the single-cut
    degenerate grid (w1_x = 0 by construction)."""
    import datetime
    from cascading_flink_spark.streaming import (stream_ks_monitor,
                                                 stream_w1_monitor)

    t0 = datetime.datetime(2024, 1, 1, 0, 30)
    t2 = datetime.datetime(2024, 1, 1, 2, 0)
    # reference uniform on {0,10,20,30}; window = same shape shifted
    # one cell up ({10,20,30}) + a novel 35 + NULLs
    rows = ([(10, t0)] * 2 + [(20, t0)] * 2 + [(30, t0)] * 2
            + [(35, t0)] + [(None, t0)] * 2 + [(10, t2)])
    src = str(tmp_path / "sws_in")
    spark.createDataFrame(rows, "score long, ts timestamp") \
        .write.parquet(src)
    ref = spark.createDataFrame(
        [(0,)] * 3 + [(10,)] * 3 + [(20,)] * 3 + [(30,)] * 3,
        "score long")

    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_w1_monitor(stream, ref, "score", ts_col="ts",
                            window="1 hour", watermark="0 seconds")
    q = (out.writeStream.format("memory").queryName("sws_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    r = [r for r in spark.sql("SELECT * FROM sws_out").collect()
         if r.window_start == t0.replace(minute=0)][0]
    win = [10, 10, 20, 20, 30, 30, 35]
    rv = [0] * 3 + [10] * 3 + [20] * 3 + [30] * 3
    assert (r.n, r.n_nov, r.w1_x) == _w1_model(win, rv)
    assert r.n == 7 and r.n_nov == 1 and r.w1_x > 0
    spark.catalog.dropTempView("sws_out")


def test_stream_w1_monitor_guards(spark, sf_dir):
    from cascading_flink_spark.streaming import stream_w1_monitor
    import __spark_entry__ as entry
    ev = entry._t(spark, sf_dir, "events").select(
        "ts", F.col("user_id").alias("score"))
    with pytest.raises(ValueError, match="scale"):
        stream_w1_monitor(ev, ev, "score", scale=0)
    with pytest.raises(ValueError, match="max_keys"):
        stream_w1_monitor(ev, ev, "score", max_keys=3)
    with pytest.raises(ValueError, match="empty"):
        stream_w1_monitor(ev, ev.filter("score IS NULL"), "score")
