"""Benchmark decontamination: remove training documents that overlap an
evaluation/benchmark set (the GPT-3/PaLM-style word-n-gram overlap check).

Scale design (the 100 TB story): the benchmark side is tiny (eval sets are
megabytes) while the corpus is the 100 TB side — so the gram join MUST be
a broadcast: the corpus is scanned once, shingled map-side, and probed
against the broadcast benchmark gram table with no corpus shuffle at all.
The only shuffle is the groupBy over *matching* grams, which is bounded by
true contamination (rare by construction).  The final anti-join in
:func:`decontaminate` broadcasts the contaminated-id set, again leaving
the corpus unshuffled.  Plan shape (two BroadcastHashJoins, zero corpus
exchanges) is asserted in ``tests/test_decontam.py``.

Shingling reuses :func:`~.dedup._word_shingles` — the same distinct
word-n-gram definition as the Jaccard/MinHash family, so one oracle
convention covers all of them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _fan_out, _word_shingles


def contamination_pairs(corpus: DataFrame, benchmark: DataFrame,
                        n: int = 8,
                        text_col: str = "text", id_col: str = "doc_id",
                        bench_text_col: str | None = None,
                        bench_id_col: str | None = None) -> DataFrame:
    """(id_col, bench_id, shared_grams) for every corpus document sharing
    at least one distinct word ``n``-gram with a benchmark document.

    ``shared_grams`` counts DISTINCT shared grams (shingles are distinct
    per document), so it is a set-overlap size, not an occurrence count."""
    bench_text_col = bench_text_col or text_col
    bench_id_col = bench_id_col or id_col
    bench_grams = benchmark.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(_word_shingles(bench_text_col, n)).alias("__g"))
    corpus_grams = _fan_out(corpus).select(
        F.col(id_col).alias("__cid"),
        F.explode(_word_shingles(text_col, n)).alias("__g"))
    hits = corpus_grams.join(F.broadcast(bench_grams), "__g")
    return (hits.groupBy("__cid", "bench_id")
                .agg(F.count(F.lit(1)).alias("shared_grams"))
                .select(F.col("__cid").alias(id_col), "bench_id",
                        "shared_grams"))


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  n: int = 8, min_shared: int = 1,
                  text_col: str = "text", id_col: str = "doc_id",
                  bench_text_col: str | None = None,
                  bench_id_col: str | None = None) -> DataFrame:
    """The corpus minus every document contaminated by the benchmark
    (>= ``min_shared`` distinct shared word ``n``-grams with ANY single
    benchmark document).  Corpus rows pass through unshuffled:
    contaminated ids are a broadcast anti-join."""
    pairs = contamination_pairs(corpus, benchmark, n=n, text_col=text_col,
                                id_col=id_col,
                                bench_text_col=bench_text_col,
                                bench_id_col=bench_id_col)
    bad = (pairs.filter(F.col("shared_grams") >= int(min_shared))
                .select(id_col).distinct())
    return corpus.join(F.broadcast(bad), on=id_col, how="left_anti")
