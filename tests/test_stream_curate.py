"""stream_curate: the streaming curation pipeline twin.  Single-batch
parity with the batch stage composition, URL-horizon dedup, and quota
state carrying across micro-batches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cascading_flink_spark.extensions import token_budget_mixture
from cascading_flink_spark.extensions.decontam import decontaminate
from cascading_flink_spark.extensions.text import (blocklist_hits_expr,
                                                   clean_text_expr,
                                                   gopher_pass_expr,
                                                   token_count)
from cascading_flink_spark.streaming import stream_curate

from conftest import load

GK = dict(min_words=10, max_words=500, min_stop_hits=0)


def _run_stream(spark, src, bench, budgets, name, **kw):
    stream = spark.readStream.schema(spark.read.parquet(src).schema) \
                  .parquet(src)
    out = stream_curate(stream, bench, budgets, gopher_kwargs=GK, **kw)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.sql(f"SELECT * FROM {name}").collect()
    spark.catalog.dropTempView(name)
    return rows


def test_single_batch_parity_with_batch_stages(spark, sf_dir, tmp_path):
    """One micro-batch, no URL column: stream_curate admits exactly the
    batch composition clean -> gate -> decontaminate -> budget mixture
    (content dedup is a no-op on a corpus without exact repeats)."""
    docs = (load(spark, sf_dir, "documents")
            .select("doc_id", "lang", "text").limit(300)
            .withColumn("ts", F.timestamp_seconds(F.col("doc_id") + 1)))
    src = str(tmp_path / "cur_in")
    docs.write.mode("overwrite").parquet(src)
    bench = (load(spark, sf_dir, "documents")
             .filter("doc_id % 50 = 0").select("doc_id", "text").limit(5))

    budgets = {"en": 900, "de": 500}
    got = {r["doc_id"] for r in
           _run_stream(spark, src, bench, budgets, "cur_par")}

    b = spark.read.parquet(src).withColumn(
        "text", clean_text_expr(F.coalesce("text", F.lit(""))))
    b = b.filter(gopher_pass_expr(F.col("text"), **GK))
    b = decontaminate(b, bench, n=8)
    b = b.withColumn("n_tokens", token_count(F.col("text")).cast("long"))
    expect = {str(r["doc_id"]) for r in
              token_budget_mixture(b, budgets).collect()}
    assert got == expect and expect


def test_url_dedup_keeps_one_per_canonical_url(spark, tmp_path):
    text_a = ("the quick brown fox jumps over the lazy dog and then "
              "runs far away into the green forest to rest a while")
    text_b = ("a different second document about cooking pasta with "
              "fresh tomatoes garlic and olive oil for dinner tonight")
    rows = [
        (1, text_a, "en", "https://www.a.example.com/x?utm_source=rss"),
        (2, text_b, "en", "https://a.example.com/x#frag"),  # same canonical
        (3, text_b, "en", "https://b.example.com/y"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, url string"
    ).withColumn("ts", F.timestamp_seconds(F.col("doc_id")))
    src = str(tmp_path / "cur_url")
    df.write.mode("overwrite").parquet(src)
    bench = spark.createDataFrame([(9, "nothing shared")],
                                  "doc_id long, text string")

    got = {r["doc_id"] for r in
           _run_stream(spark, src, bench, {"en": 10_000}, "cur_url",
                       url_col="url")}
    # exactly one of the canonical-URL pair {1, 2} survives, plus 3
    assert "3" in got and len(got & {"1", "2"}) == 1 and len(got) == 2


def test_quota_state_blocks_across_batches(spark, tmp_path):
    text = ("ten short words make up this tiny test document here "
            "and a few more so the gate passes fine today")  # 21 tokens
    mk = lambda i: (i, text, "en", None)
    schema = "doc_id long, text string, lang string, url string"
    b1 = spark.createDataFrame([mk(1), mk(2)], schema).withColumn(
        "ts", F.timestamp_seconds(F.col("doc_id")))
    b2 = spark.createDataFrame([mk(3)], schema).withColumn(
        "ts", F.timestamp_seconds(F.col("doc_id")))
    src = str(tmp_path / "cur_state")
    ckpt = str(tmp_path / "cur_ckpt")
    bench = spark.createDataFrame([(9, "nothing shared")],
                                  "doc_id long, text string")
    # docs are exact content repeats — pass url_col so the dedup stage
    # keys on URL (all NULL -> one canonical group would collapse them;
    # give each a distinct url instead)
    b1 = b1.withColumn("url", F.concat(F.lit("https://e.com/"),
                                       F.col("doc_id").cast("string")))
    b2 = b2.withColumn("url", F.concat(F.lit("https://e.com/"),
                                       F.col("doc_id").cast("string")))

    budgets = {"en": 45}  # fits two 21-token docs, not three
    out_dir = str(tmp_path / "cur_out")

    def run_batch(df, sub):
        df.coalesce(1).write.mode("overwrite").parquet(f"{src}/{sub}")
        stream = spark.readStream.schema(df.schema).parquet(f"{src}/*")
        out = stream_curate(stream, bench, budgets, gopher_kwargs=GK,
                            url_col="url")
        q = (out.writeStream.format("parquet")
             .option("checkpointLocation", ckpt).option("path", out_dir)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(120)

    run_batch(b1, "f1")
    assert {r["doc_id"] for r in spark.read.parquet(out_dir).collect()} \
        == {"1", "2"}
    run_batch(b2, "f2")
    # 42 of 45 tokens already spent -> doc 3's 21 tokens are rejected
    assert {r["doc_id"] for r in spark.read.parquet(out_dir).collect()} \
        == {"1", "2"}


# -------------------------------------------------------- stream_pack_bins

def test_stream_pack_bins_single_batch_parity(spark, sf_dir, tmp_path):
    """One micro-batch, one key: identical bins to the batch twin run as
    a single sequential walk (bucket_chars=0 — the md5-prefix bucket
    order IS the md5 order, so only the bucket resets differ and a
    single bucket removes them)."""
    from cascading_flink_spark.extensions import pack_bins
    from cascading_flink_spark.streaming import stream_pack_bins

    docs = (load(spark, sf_dir, "documents")
            .select("doc_id", "text").limit(200)
            .withColumn("lang", F.lit("en")))
    src = str(tmp_path / "pb_in")
    docs.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(spark.read.parquet(src).schema) \
                  .parquet(src)
    out = stream_pack_bins(stream, capacity=256)
    q = (out.writeStream.format("memory").queryName("pb_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: (r["n_tokens"], r["bin"], r["offset_in_bin"])
           for r in spark.sql("SELECT * FROM pb_out").collect()}
    spark.catalog.dropTempView("pb_out")

    expect = {str(r.doc_id): (r.n_tokens, r.bin, r.offset_in_bin)
              for r in pack_bins(spark.read.parquet(src), 256,
                                 bucket_chars=0).collect()}
    assert got == expect and got


def test_stream_pack_bins_fill_carries_across_batches(spark, tmp_path):
    from cascading_flink_spark.streaming import stream_pack_bins

    schema = "doc_id string, lang string, text string"
    b1 = spark.createDataFrame([("a", "en", "one two three")], schema)
    b2 = spark.createDataFrame([("b", "en", "four five"),
                                ("c", "en", "six seven eight nine")], schema)
    src = tmp_path / "pb2_in"
    src.mkdir()
    ckpt = str(tmp_path / "pb2_ckpt")
    out_dir = str(tmp_path / "pb2_out")
    b1.coalesce(1).write.mode("overwrite").parquet(str(src / "f1"))

    def run_once():
        stream = spark.readStream.schema(b1.schema).parquet(str(src / "*"))
        q = (stream_pack_bins(stream, capacity=6).writeStream
             .format("parquet").option("checkpointLocation", ckpt)
             .option("path", out_dir)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination(60)

    run_once()          # a: 3 tokens -> bin 0 @ 0 (fill 3)
    b2.coalesce(1).write.mode("overwrite").parquet(str(src / "f2"))
    run_once()          # md5 order in batch 2 is (c, b):
    #   c: 4 tokens, fill 3+4 > 6 -> bin 1 @ 0 (fill 4)
    #   b: 2 tokens, fits        -> bin 1 @ 4
    rows = {r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()}
    import hashlib
    order = sorted(["b", "c"],
                   key=lambda s: hashlib.md5(s.encode()).hexdigest())
    assert (rows["a"]["bin"], rows["a"]["offset_in_bin"]) == (0, 0)
    first, second = order
    sizes = {"b": 2, "c": 4}
    fill = 3
    expected = {}
    cur_bin = 0
    for d in order:
        n = sizes[d]
        if fill > 0 and fill + n > 6:
            cur_bin += 1
            fill = 0
        expected[d] = (cur_bin, fill)
        fill += n
    for d in ("b", "c"):
        assert (rows[d]["bin"], rows[d]["offset_in_bin"]) == expected[d]
