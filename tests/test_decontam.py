"""Benchmark decontamination (extensions/decontam.py)."""
from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cascading_flink_spark.extensions.decontam import (
    bloom_might_contain, build_bloom_bitmap, contamination_pairs,
    decontaminate, decontaminate_bloom)


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame([
        Row(doc_id=1, text="the quick brown fox jumps over the lazy dog"),
        Row(doc_id=2, text="pack my box with five dozen liquor jugs now"),
        Row(doc_id=3, text="a quick brown fox jumps over a lazy cat"),
        Row(doc_id=4, text="completely unrelated content about spark plans"),
    ])


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame([
        # 5-gram "quick brown fox jumps over" appears in docs 1 and 3
        Row(doc_id=100, text="quick brown fox jumps over everything"),
        Row(doc_id=101, text="five dozen liquor jugs now please"),
    ])


def test_contamination_pairs(spark, corpus, bench):
    out = contamination_pairs(corpus, bench, n=5)
    got = sorted((r.doc_id, r.bench_id, r.shared_grams)
                 for r in out.collect())
    # doc1 x bench100: 'quick brown fox jumps over' = 1 shared 5-gram
    # doc2 x bench101: 'five dozen liquor jugs now' = 1
    # doc3 x bench100: 'quick brown fox jumps over' = 1
    assert got == [(1, 100, 1), (2, 101, 1), (3, 100, 1)]


def test_decontaminate_removes_contaminated(spark, corpus, bench):
    out = decontaminate(corpus, bench, n=5)
    assert sorted(r.doc_id for r in out.collect()) == [4]
    # higher threshold: nothing shares >= 2 grams -> nothing removed
    out2 = decontaminate(corpus, bench, n=5, min_shared=2)
    assert sorted(r.doc_id for r in out2.collect()) == [1, 2, 3, 4]


def test_corpus_side_never_shuffled_before_probe(spark, corpus, bench):
    """The gram probe and the anti-join must both be broadcast joins —
    the 100 TB corpus side must reach them with no Exchange other than
    the explicit fan-out repartition."""
    out = decontaminate(corpus, bench, n=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan
    pairs_plan = contamination_pairs(corpus, bench, n=5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in pairs_plan
    assert "SortMergeJoin" not in pairs_plan


def test_multi_gram_overlap_counts(spark):
    corpus = spark.range(1).select(
        F.lit(1).alias("doc_id"),
        F.lit("a b c d e f g").alias("text"))
    bench = spark.range(1).select(
        F.lit(9).alias("doc_id"),
        F.lit("a b c d e f").alias("text"))
    # corpus 4-grams: abcd bcde cdef defg; bench: abcd bcde cdef -> 3 shared
    out = contamination_pairs(corpus, bench, n=4)
    assert [(r.doc_id, r.bench_id, r.shared_grams)
            for r in out.collect()] == [(1, 9, 3)]


def test_matches_duckdb_on_real_docs(spark, sf_dir):
    duckdb = pytest.importorskip("duckdb")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    got = sorted((r.doc_id, r.bench_id, r.shared_grams) for r in
                 contamination_pairs(corpus, bench, n=8).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    exp = con.execute("""
        WITH toks AS (SELECT doc_id,
                             regexp_split_to_array(lower(trim(text)), '\\s+') AS t
                      FROM documents),
        sh AS (SELECT doc_id, list_distinct([array_to_string(t[i:i+7], ' ')
                      for i in range(1, greatest(len(t)-7, 0)+1)]) AS s
               FROM toks),
        inv AS (SELECT doc_id, unnest(s) AS g FROM sh)
        SELECT c.doc_id, b.doc_id AS bench_id, count(*) AS shared
        FROM (SELECT * FROM inv WHERE doc_id % 20 <> 0) c
        JOIN (SELECT * FROM inv WHERE doc_id % 20 = 0) b USING (g)
        GROUP BY 1, 2
    """).fetchall()
    assert got == sorted(exp)


# ---------------------------------------------------------------- bloom

def test_bloom_equals_exact(spark, sf_dir):
    """decontaminate_bloom output is IDENTICAL to decontaminate — the
    bitmap only prunes the verify join's input, never the answer."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    exact = sorted(r.doc_id for r in
                   decontaminate(corpus, bench, n=6, min_shared=2)
                   .select("doc_id").collect())
    got = sorted(r.doc_id for r in
                 decontaminate_bloom(corpus, bench, n=6, min_shared=2)
                 .select("doc_id").collect())
    assert got == exact and len(exact) > 0


def test_bloom_exact_under_saturated_bitmap(spark, corpus, bench):
    """A deliberately undersized bitmap (256 bits for hundreds of grams =
    near-total false-positive rate) must still return the exact answer:
    the verify join is the decider, the bloom only a prefilter."""
    exact = sorted(r.doc_id for r in
                   decontaminate(corpus, bench, n=5).collect())
    got = sorted(r.doc_id for r in
                 decontaminate_bloom(corpus, bench, n=5,
                                     m_bits=256, k=2).collect())
    assert got == exact


def test_bloom_bitmap_bounds(spark, bench):
    """Driver pull is bounded by the FILTER size (m_bits/64 longs), and
    every set bit round-trips through the membership predicate (no false
    negatives by construction)."""
    grams = bench.select(F.explode(F.split(F.lower("text"), " "))
                         .alias("__g")).distinct()
    bm = build_bloom_bitmap(grams, "__g", m_bits=1024, k=3)
    assert len(bm) == 1024 // 64
    from pyspark.sql import types as T
    bloom_df = spark.createDataFrame(
        [(bm,)], T.StructType([T.StructField(
            "__bloom", T.ArrayType(T.LongType(), False), False)]))
    misses = (grams.crossJoin(F.broadcast(bloom_df))
              .filter(~bloom_might_contain(F.col("__g"), F.col("__bloom"),
                                           1024, 3))
              .count())
    assert misses == 0
    with pytest.raises(ValueError):
        build_bloom_bitmap(grams, "__g", m_bits=100)


def test_bloom_corpus_side_unshuffled_before_prefilter(spark, corpus, bench):
    """The corpus must reach the bloom probe through a broadcast
    (BroadcastNestedLoopJoin on the 1-row bitmap) with no Exchange before
    it: the filter is map-side.  The exact verify join downstream is
    allowed to shuffle — that is the design."""
    out = decontaminate_bloom(corpus, bench, n=5, m_bits=1 << 14)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    # the bitmap probe itself is codegen bit arithmetic, not a UDF
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bloom_no_false_negatives_property(spark):
    """Property pin (hypothesis): for ARBITRARY key sets and filter
    geometries, every inserted key passes the membership predicate —
    Bloom filters must never have a false negative, which is the entire
    correctness argument for the prefilter (the verify join only ever
    removes false POSITIVES)."""
    hypothesis = pytest.importorskip("hypothesis")
    from hypothesis import given, settings, strategies as st
    from pyspark.sql import types as T

    @settings(max_examples=5, deadline=None)
    @given(st.lists(st.text(min_size=0, max_size=30), min_size=1,
                    max_size=40, unique=True),
           st.sampled_from([64, 256, 1024]),
           st.integers(1, 5))
    def check(keys, m_bits, k):
        df = spark.createDataFrame([(x,) for x in keys], "g string")
        bm = build_bloom_bitmap(df, "g", m_bits=m_bits, k=k)
        bloom_df = spark.createDataFrame(
            [(bm,)], T.StructType([T.StructField(
                "__bloom", T.ArrayType(T.LongType(), False), False)]))
        misses = (df.crossJoin(F.broadcast(bloom_df))
                  .filter(~bloom_might_contain(F.col("g"),
                                               F.col("__bloom"), m_bits, k))
                  .count())
        assert misses == 0

    check()


def test_bloom_k_zero_raises(spark):
    """k=0 would hash nothing: an all-clean empty bitmap and a None
    predicate that crashes filter() obscurely (ADVICE r8) — both builder
    and probe must refuse up front."""
    from pyspark.sql import functions as F2
    from cascading_flink_spark.extensions.decontam import (
        bloom_might_contain, build_bloom_bitmap)
    d = spark.createDataFrame([("a",)], "g string")
    with pytest.raises(ValueError, match="k must be >= 1"):
        build_bloom_bitmap(d, "g", m_bits=128, k=0)
    with pytest.raises(ValueError, match="k must be >= 1"):
        bloom_might_contain(F2.col("g"), F2.lit([0]), m_bits=128, k=0)
