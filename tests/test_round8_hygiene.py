"""Round-8 hygiene pins (VERDICT r7 "What's wrong" / ADVICE r7).

1. `_fan_out` must NOT add a full-corpus exchange when the input already
   carries the session's parallelism (it previously repartitioned
   unconditionally — a whole extra shuffle on the hottest input path of
   every shingling/hashing operator at 100 TB).
2. Operator-internal pins (shingle/funnel/sketch/packing intermediates)
   must not accumulate in the cached-query registry across repeated
   operator calls: they are localCheckpoint-scoped now, so the
   CacheManager stays empty and block lifetime follows the returned
   frame (ContextCleaner frees on GC).
3. The dup-span family counts empty/NULL docs as ZERO tokens (the
   library-wide text._tokens() convention), not [""].
4. heavy_hitters carries NULL keys / row counts in dedicated columns —
   in-band sentinel-looking string keys are reportable like any other.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from cascading_flink_spark.extensions.dedup import (
    _fan_out, dup_spans, gram_novelty, strip_dup_spans,
)


def test_fan_out_skips_repartition_when_well_split(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    target = spark.sparkContext.defaultParallelism
    wide = docs.repartition(target + 4)
    assert _fan_out(wide) is wide, \
        "well-split input must pass through untouched (no extra Exchange)"
    narrow = docs.coalesce(1)
    assert _fan_out(narrow).rdd.getNumPartitions() == target


def test_operator_caches_leave_query_cache_empty(spark, sf_dir):
    from cascading_flink_spark.extensions.analytics import (
        event_funnel, heavy_hitters,
    )
    from cascading_flink_spark.extensions.packing import (
        chunk_corpus, pack_bins,
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    spark.catalog.clearCache()
    from cascading_flink_spark.extensions.similarity import kmeans_md5
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    for _ in range(3):
        chunk_corpus(docs, context_len=64).count()
        pack_bins(docs, capacity=128).count()
        heavy_hitters(events.select("event_type"), "event_type", k=5).count()
        event_funnel(events, ["view", "click"]).count()
        kmeans_md5(emb, k=4, iterations=1).count()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty(), \
        "operator-internal pins must not pile up in the cached-query registry"


def test_remaining_operator_pins_leave_query_cache_empty(spark, sf_dir):
    """Round-9 sweep of the persist() stragglers the round-8 pass missed
    (banded minhash/simhash signatures, winnow fingerprints, dedup
    cluster edges, IVF cells, bigram_lm count partials, embedding-dup
    signatures, dsir doc partials): all localCheckpoint-scoped now."""
    from cascading_flink_spark.extensions import (
        bigram_lm_scores, dedup_clusters, dsir_weights,
        embedding_dup_pairs, ivf_topk, minhash_lsh_pairs,
        simhash_dup_pairs, winnow_pairs,
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter("vec_id < 3").selectExpr("vec_id as query_id",
                                            "embedding")
    spark.catalog.clearCache()
    pairs = minhash_lsh_pairs(docs, n=3, num_hashes=16, bands=4,
                              threshold=0.5)
    pairs.count()
    simhash_dup_pairs(docs, max_hamming=3).count()
    winnow_pairs(docs, k=4, w=5).count()
    dedup_clusters(pairs).count()
    ivf_topk(emb, q, k=5, n_centroids=4, n_probe=2).count()
    bigram_lm_scores(docs).count()
    embedding_dup_pairs(emb, threshold=0.4, exact=False).count()
    dsir_weights(docs.filter("doc_id % 7 <> 0"),
                 docs.filter("doc_id % 7 = 0"), buckets=64).count()
    cm = spark._jsparkSession.sharedState().cacheManager()
    assert cm.isEmpty(), \
        "no operator may leave entries in the cached-query registry"


def test_dup_span_family_empty_and_null_docs_zero_tokens(spark):
    rows = [(1, None), (2, ""), (3, "   "),
            (4, "a b c d e f g h a b c d e f g h"),
            (5, "a b c d e f g h x y z")]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    s = {r["doc_id"]: r for r in
         strip_dup_spans(df, k=8, min_docs=2).collect()}
    for i in (1, 2, 3):
        assert s[i]["n_tokens_kept"] == 0
        assert s[i]["n_tokens_removed"] == 0
        assert s[i]["clean_text"] == ""
    assert s[4]["n_tokens_removed"] == 0      # owner keeps its text
    assert s[5]["n_tokens_removed"] == 8      # the shared 8-gram drops
    # case: gram keys fold case (docs 4/6 dedup) but reassembly keeps
    # the survivor's ORIGINAL case
    up = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "A B C D E F G H x Y z")],
        "doc_id int, text string")
    u = {r["doc_id"]: r for r in
         strip_dup_spans(up, k=8, min_docs=2).collect()}
    assert u[1]["clean_text"] == "a b c d e f g h"   # owner untouched
    assert u[2]["clean_text"] == "x Y z"             # case preserved
    g = {r["doc_id"]: r for r in gram_novelty(df, k=8).collect()}
    for i in (1, 2, 3):
        assert g[i]["n_grams"] == 0 and g[i]["novelty_x10000"] == 0
    spans = dup_spans(df, k=8, min_docs=2).collect()
    assert {r["doc_id"] for r in spans} == {4, 5}


def test_heavy_hitters_reports_sentinel_looking_keys_and_nulls(spark):
    rows = ([("\x00__rows__",)] * 40 + [("\x00__null__",)] * 30 +
            [(None,)] * 25 + [(f"k{i}",) for i in range(5)])
    df = spark.createDataFrame(rows, "k string").repartition(4)
    got = {r["key"]: r["n"] for r in heavy_hitters_call(df)}
    assert got["\x00__rows__"] == 40
    assert got["\x00__null__"] == 30
    assert got[None] == 25
    assert sum(got.values()) == 95  # the k{i} singletons fall below n/k


def heavy_hitters_call(df):
    from cascading_flink_spark.extensions.analytics import heavy_hitters
    return heavy_hitters(df, "k", k=5).collect()
