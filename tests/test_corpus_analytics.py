"""Unit tests for corpus statistics (repetition / tfidf / commonness) and
event analytics (funnel / histogram) on tiny hand-computed frames."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from cascading_flink_spark.extensions import (
    event_funnel, repetition_stats, tfidf_topterms, unigram_commonness,
    value_histogram,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


class TestRepetitionStats:
    def test_hand_computed(self, spark):
        out = {r["doc_id"]: r for r in repetition_stats(_docs(spark, [
            "a b a b a",          # 5 tokens, 2 distinct; bigrams: a b(x2), b a(x2)
            "x y z",              # no repetition
            "",                   # empty
            "solo",               # single token -> no bigrams
        ])).collect()}
        d0 = out[0]
        assert (d0["n_tokens"], d0["n_distinct"]) == (5, 2)
        assert d0["dup_token_ratio"] == pytest.approx(1 - 2 / 5)
        assert (d0["n_bigrams"], d0["top_bigram_n"]) == (4, 2)
        assert d0["top_bigram_frac"] == pytest.approx(0.5)
        d1 = out[1]
        assert d1["dup_token_ratio"] == 0.0 and d1["top_bigram_n"] == 1
        assert out[2]["n_tokens"] == 0 and out[2]["n_bigrams"] == 0
        assert out[3]["n_tokens"] == 1 and out[3]["top_bigram_frac"] == 0.0

    def test_repetitive_doc_flags_higher(self, spark):
        out = {r["doc_id"]: r for r in repetition_stats(_docs(spark, [
            "spam spam spam spam spam spam",
            "the quick brown fox jumps high",
        ])).collect()}
        assert out[0]["dup_token_ratio"] > out[1]["dup_token_ratio"]
        assert out[0]["top_bigram_frac"] == 1.0


class TestTfidfTopterms:
    def test_distinctive_term_wins(self, spark):
        # "zebra" appears only in doc 0; "common" in all docs.
        docs = _docs(spark, [
            "common zebra", "common word word", "common filler here",
        ])
        top = tfidf_topterms(docs, k=1).collect()
        by_doc = {r["doc_id"]: r for r in top}
        assert by_doc[0]["term"] == "zebra"
        assert by_doc[0]["df_docs"] == 1
        # tf=1, N=3, df=1 -> 1 * 4 / 2 = 2.0
        assert by_doc[0]["tfidf"] == pytest.approx(2.0)
        # doc 1: "word" tf=2 df=1 -> 4.0 beats "common" tf=1 df=3 -> 1.0
        assert by_doc[1]["term"] == "word"

    def test_k_and_tie_break(self, spark):
        docs = _docs(spark, ["b a", "a b"])  # identical scores everywhere
        top = tfidf_topterms(docs, k=2)
        rows = [(r["doc_id"], r["term"]) for r in top.collect()]
        # both docs emit both terms; equal scores break on term asc
        assert sorted(rows) == [(0, "a"), (0, "b"), (1, "a"), (1, "b")]


class TestUnigramCommonness:
    def test_hand_computed(self, spark):
        # corpus freqs: the=3, rare=1
        docs = _docs(spark, ["the the rare", "the"])
        out = {r["doc_id"]: r for r in unigram_commonness(docs).collect()}
        # doc0: 2*3 + 1*1 = 7 over 3 tokens
        assert out[0]["freq_sum"] == 7 and out[0]["n_tokens"] == 3
        assert out[0]["commonness"] == pytest.approx(2.33)
        assert out[1]["commonness"] == pytest.approx(3.0)
        # rare-token doc scores lower than common-token doc
        assert out[0]["commonness"] < out[1]["commonness"]


def _events(spark, rows):
    base = datetime.datetime(2024, 1, 1)
    return spark.createDataFrame([
        Row(user_id=u, event_type=t,
            ts=base + datetime.timedelta(minutes=m), value=float(v))
        for (u, t, m, v) in rows])


class TestEventFunnel:
    def test_strict_ordering(self, spark):
        ev = _events(spark, [
            (1, "view", 0, 1), (1, "click", 5, 1), (1, "purchase", 9, 1),
            # user 2 clicks BEFORE viewing -> drops out at step 2
            (2, "click", 0, 1), (2, "view", 5, 1), (2, "purchase", 9, 1),
            # user 3 views only
            (3, "view", 0, 1),
        ])
        out = {r["step_name"]: r["n_users"] for r in event_funnel(
            ev, ["view", "click", "purchase"]).collect()}
        assert out == {"view": 3, "click": 1, "purchase": 1}

    def test_equal_ts_not_counted(self, spark):
        # strict '>' — a click at the same instant as the view is ambiguous
        # ordering, so it does not convert.
        ev = _events(spark, [(1, "view", 0, 1), (1, "click", 0, 1)])
        out = {r["step_name"]: r["n_users"] for r in event_funnel(
            ev, ["view", "click"]).collect()}
        assert out == {"view": 1, "click": 0}

    def test_empty_steps_raises(self, spark):
        with pytest.raises(ValueError):
            event_funnel(_events(spark, [(1, "view", 0, 1)]), [])


class TestValueHistogram:
    def test_bins_and_negatives(self, spark):
        ev = _events(spark, [
            (1, "a", 0, 0.0), (1, "a", 0, 9.99), (1, "a", 0, 10.0),
            (1, "b", 0, -0.5),
        ])
        rows = {(r["grp"], r["bin"]): (r["bin_lo"], r["n"])
                for r in value_histogram(ev, width=10.0).collect()}
        assert rows[("a", 0)] == (0.0, 2)
        assert rows[("a", 1)] == (10.0, 1)
        assert rows[("b", -1)] == (-10.0, 1)  # floor, not trunc


class TestGroupQuantiles:
    def test_hand_computed(self, spark):
        from cascading_flink_spark.extensions import group_quantiles
        ev = _events(spark, [(1, "a", 0, v) for v in range(1, 11)])  # 1..10
        rows = {(r["grp"], r["p"]): r["q"]
                for r in group_quantiles(ev, "value", "event_type",
                                         ps=[0.5, 0.9, 1.0]).collect()}
        # ceil(.5*10)=5 -> 5.0; ceil(.9*10)=9 -> 9.0; ceil(1*10)=10 -> 10.0
        assert rows == {("a", 0.5): 5.0, ("a", 0.9): 9.0, ("a", 1.0): 10.0}

    def test_quantile_is_data_member(self, spark):
        from cascading_flink_spark.extensions import group_quantiles
        ev = _events(spark, [(1, "a", 0, v * 0.37) for v in range(40)]
                     + [(1, "b", 0, v * 1.91) for v in range(7)])
        vals = {round(v * 0.37, 10) for v in range(40)} \
            | {round(v * 1.91, 10) for v in range(7)}
        for r in group_quantiles(ev).collect():
            assert round(r["q"], 10) in vals  # discrete: no interpolation


class TestDedupKeepBest:
    def test_keeps_longest_per_cluster_and_singletons(self, spark):
        from cascading_flink_spark.extensions import dedup_keep_best
        docs = spark.createDataFrame(
            [Row(doc_id=i, text=t, n_chars=len(t)) for i, t in enumerate([
                "aa bb cc dd",     # 0: cluster with 1 (longer wins)
                "aa bb cc dd ee",  # 1: longest -> kept
                "zz yy xx",        # 2: singleton
            ])])
        pairs = spark.createDataFrame([Row(id_a=0, id_b=1)])
        out = {r["doc_id"]: r for r in dedup_keep_best(docs, pairs).collect()}
        assert out[0]["cluster_id"] == 0 and not out[0]["kept"]
        assert out[1]["cluster_id"] == 0 and out[1]["kept"]
        assert out[2]["cluster_id"] == -1 and out[2]["kept"]

    def test_tie_breaks_on_id(self, spark):
        from cascading_flink_spark.extensions import dedup_keep_best
        docs = spark.createDataFrame(
            [Row(doc_id=i, text="same len", n_chars=8) for i in (5, 9)])
        pairs = spark.createDataFrame([Row(id_a=5, id_b=9)])
        out = {r["doc_id"]: r["kept"]
               for r in dedup_keep_best(docs, pairs).collect()}
        assert out == {5: True, 9: False}


def test_ngram_counts_prunes_min_count(spark):
    from cascading_flink_spark.extensions import ngram_counts
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "x y")],
        "doc_id long, text string")
    rows = {r["gram"]: (r["n_docs"], r["n_occurrences"])
            for r in ngram_counts(df, n=2, min_count=2).collect()}
    assert rows == {"a b": (2, 2)}  # singletons pruned


def test_ngram_counts_thresholds_on_distinct_docs(spark):
    """A gram repeated min_count times inside ONE document must not
    survive — the threshold is document frequency, not occurrences
    (the contamination-probe contract)."""
    from cascading_flink_spark.extensions import ngram_counts
    df = spark.createDataFrame(
        [(1, "p q p q p q"), (2, "r s"), (3, "r s")],
        "doc_id long, text string")
    rows = {r["gram"]: (r["n_docs"], r["n_occurrences"])
            for r in ngram_counts(df, n=2, min_count=2).collect()}
    # "p q" occurs 3x but only in doc 1 -> pruned; "q p" 2x one doc -> pruned
    assert rows == {"r s": (2, 2)}


def test_inverted_index_caps_postings_keeps_full_df(spark):
    from cascading_flink_spark.extensions import inverted_index
    df = spark.createDataFrame(
        [(i, "common term%d" % (i % 2)) for i in range(10)],
        "doc_id long, text string")
    rows = {r["term"]: r for r in
            inverted_index(df, max_postings=3).collect()}
    assert rows["common"]["df"] == 10          # df counts ALL docs
    assert len(rows["common"]["postings"]) == 3  # postings capped
    assert rows["common"]["postings"] == [0, 1, 2]  # lowest ids, sorted


def test_inverted_index_hot_term_no_window_sort(spark):
    """One stopword in >50% of a 40k-doc corpus: the partial top-N merge
    must (a) stay exact — global N smallest ids, exact df — across many
    partitions/Arrow chunks, and (b) compile to a plan with NO window
    over the term groups (the skew hazard the r5 formulation had: a hot
    term's full posting set sorting in one task)."""
    from cascading_flink_spark.extensions import inverted_index
    docs = spark.range(40_000).selectExpr(
        "id AS doc_id",
        "concat('hot w', CAST(id % 7919 AS STRING),"
        " IF(id % 2 = 0, ' even', '')) AS text").repartition(16)
    idx = inverted_index(docs, max_postings=5)
    plan = idx._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    rows = {r["term"]: r for r in idx.collect()}
    assert rows["hot"]["df"] == 40_000
    assert rows["hot"]["postings"] == [0, 1, 2, 3, 4]
    assert rows["even"]["df"] == 20_000
    assert rows["even"]["postings"] == [0, 2, 4, 6, 8]
    assert rows["w123"]["df"] == 40_000 // 7919 + (1 if 123 < 40_000 % 7919 else 0)


def test_group_centroids_mean_per_dim(spark):
    from cascading_flink_spark.extensions import group_centroids
    df = spark.createDataFrame(
        [(1, [1.0, 3.0]), (1, [3.0, 5.0]), (2, [10.0, 20.0])],
        "label int, embedding array<double>")
    rows = {r["label"]: r for r in
            group_centroids(df, "label", dim=2).collect()}
    assert rows[1]["n"] == 2 and rows[1]["centroid"] == [2.0, 4.0]
    assert rows[2]["n"] == 1 and rows[2]["centroid"] == [10.0, 20.0]


def test_bm25_ranks_by_relevance(spark):
    from cascading_flink_spark.extensions import bm25_scores
    import pytest as _pt
    df = spark.createDataFrame(
        [(1, "data data data filler filler"),
         (2, "data filler filler filler filler"),
         (3, "nothing relevant here at all")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["score_x10000"]
            for r in bm25_scores(df, ["data"]).collect()}
    assert set(rows) == {1, 2}          # non-matching doc absent
    assert rows[1] > rows[2] > 0        # higher tf ranks higher
    with _pt.raises(ValueError):
        bm25_scores(df, [])


def test_bigram_lm_scores_ranks_oov(spark):
    from cascading_flink_spark.extensions import bigram_lm_scores
    # "the cat sat" phrasing repeats across docs; zq doc is OOV junk
    rows = [("a", "the cat sat on the mat"),
            ("b", "the cat sat on the rug"),
            ("c", "the cat sat on the mat again"),
            ("d", "zq xv qj wk zq bn"),
            ("e", "x")]                      # single token: no bigrams
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}
    assert "e" not in out                    # no bigrams -> dropped
    assert out["d"]["n_bigrams"] == 5
    # every bigram in d is a singleton; a/b/c share most bigrams -> the
    # OOV doc must score strictly worse (higher nll)
    common_max = max(out[k]["nll_x10000"] for k in ("a", "b", "c"))
    assert out["d"]["nll_x10000"] > common_max
    # deterministic
    again = {r["doc_id"]: r["nll_x10000"]
             for r in bigram_lm_scores(df).collect()}
    assert again == {k: v["nll_x10000"] for k, v in out.items()}


def test_group_quantiles_binned_equals_exact(spark):
    import random
    from cascading_flink_spark.extensions import (
        group_quantiles, group_quantiles_binned)
    rng = random.Random(5)
    rows = []
    # continuous group, duplicate-heavy group, constant group, tiny group
    rows += [("cont", rng.uniform(0, 1000)) for _ in range(3000)]
    rows += [("dups", float(rng.randint(1, 5))) for _ in range(3000)]
    rows += [("const", 42.0) for _ in range(500)]
    rows += [("tiny", 7.0)]
    rows += [("cont", None), ("nulls", None), ("nulls", 3.0)]
    df = spark.createDataFrame(rows, "event_type string, value double")
    ps = [0.1, 0.5, 0.9, 0.99]
    exact = {(r["grp"], r["p"]): r["q"]
             for r in group_quantiles(df, "value", "event_type", ps,
                                      strategy="onepass").collect()}
    binned = {(r["grp"], r["p"]): r["q"]
              for r in group_quantiles_binned(df, "value", "event_type",
                                              ps, bins=32).collect()}
    assert binned == exact
    # degenerate bins=1 must still be exact (pure fallback to one bin)
    one = {(r["grp"], r["p"]): r["q"]
           for r in group_quantiles_binned(df, "value", "event_type",
                                           ps, bins=1).collect()}
    assert one == exact


def test_oov_stats_hand_fixture(spark):
    """min_df=2 head vocab = {a, b}; OOV occurrences counted exactly,
    ratio is integer floor-division x10000."""
    from cascading_flink_spark.extensions import oov_stats
    df = spark.createDataFrame(
        [(1, "a b a rare1"), (2, "a b"), (3, "b zzz zzz"), (4, "   ")],
        "doc_id long, text string")
    rows = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_x10000"])
            for r in oov_stats(df, min_df=2).collect()}
    assert rows == {
        1: (4, 1, 2500),    # rare1 appears in 1 doc only
        2: (2, 0, 0),
        3: (3, 2, 6666),    # zzz twice in one doc -> df=1 -> OOV
    }
    assert 4 not in rows    # whitespace-only doc emits nothing


def test_oov_stats_case_folds(spark):
    from cascading_flink_spark.extensions import oov_stats
    df = spark.createDataFrame(
        [(1, "Tok tok"), (2, "TOK")], "doc_id long, text string")
    rows = {r["doc_id"]: r["n_oov"] for r in oov_stats(df, min_df=2).collect()}
    assert rows == {1: 0, 2: 0}


def test_bpe_train_sennrich_example(spark):
    """The classic BPE walk-through: corpus {low x5, lower x2, newest x6,
    widest x3} — first merges must be (e,s), (es,t), (est,EOW) ... (the
    published order, count ties broken lexicographically)."""
    from cascading_flink_spark.extensions import bpe_train
    rows = ([("a%d" % i, "low") for i in range(5)]
            + [("b%d" % i, "lower") for i in range(2)]
            + [("c%d" % i, "newest") for i in range(6)]
            + [("d%d" % i, "widest") for i in range(3)])
    df = spark.createDataFrame(rows, "doc_id string, text string")
    merges = bpe_train(df, num_merges=4)
    assert merges[0] == ("e", "s")          # 9 occurrences
    assert merges[1] == ("es", "t")         # 9
    assert merges[2] == ("est", "▁")   # 9 (end-of-word)
    assert merges[3] == ("l", "o")          # 7


def test_bpe_encode_matches_python_model(spark, sf_dir):
    """Distributed encoding must equal the driver-side model word-by-word
    (same merges, same inference rule)."""
    from cascading_flink_spark.extensions import (bpe_encode, bpe_train,
                                                  encode_word)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60).cache()
    merges = bpe_train(docs, num_merges=50)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    got = {r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["fertility_x100"])
           for r in bpe_encode(docs, merges).collect()}
    for r in docs.collect():
        ws = (r["text"] or "").lower().split()
        n_bpe = sum(len(encode_word(w, ranks)) for w in ws)
        want = (len(ws), n_bpe,
                0 if not ws else n_bpe * 100 // len(ws))
        assert got[r["doc_id"]] == want, r["doc_id"]


def test_bpe_more_merges_lower_fertility(spark, sf_dir):
    from cascading_flink_spark.extensions import bpe_encode, bpe_train
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100).cache()
    few = bpe_train(docs, num_merges=10)
    many = bpe_train(docs, num_merges=200)
    tot = lambda m: sum(r["n_bpe_tokens"]
                        for r in bpe_encode(docs, m).collect())
    assert tot(many) < tot(few)


def test_bpe_train_scan_order_free(spark, sf_dir):
    """The md5-ordered sample makes the merge table independent of
    physical partitioning."""
    from cascading_flink_spark.extensions import bpe_train
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a = bpe_train(docs, num_merges=30)
    b = bpe_train(docs.repartition(13), num_merges=30)
    assert a == b


# ------------------------------------------------------- heavy_hitters

def _exact_hitters(spark, df, key_col, k):
    tot = df.count()
    return {(r["key"], r["n"]) for r in
            df.groupBy(F.col(key_col).cast("string").alias("key"))
              .agg(F.count(F.lit(1)).alias("n"))
              .filter(F.col("n") * k > tot).collect()}


def test_heavy_hitters_identical_to_exact_groupby(spark):
    from cascading_flink_spark.extensions import heavy_hitters
    import random
    rng = random.Random(7)
    # zipf-ish: few heavy keys, long uniform tail across many partitions
    rows = ([("mega",)] * 4000 + [("big",)] * 900
            + [(f"mid{i % 7}",) for i in range(700)]
            + [(f"tail{rng.randrange(3000)}",) for _ in range(4000)])
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k string").repartition(16)
    got = {(r["key"], r["n"]) for r in heavy_hitters(df, "k", k=50).collect()}
    assert got == _exact_hitters(spark, df, "k", 50) and ("mega", 4000) in got


def test_heavy_hitters_counts_null_keys(spark):
    from cascading_flink_spark.extensions import heavy_hitters
    rows = [(None,)] * 500 + [(f"k{i}",) for i in range(400)]
    df = spark.createDataFrame(rows, "k string").repartition(8)
    out = heavy_hitters(df, "k", k=3).collect()
    assert [(r["key"], r["n"]) for r in out] == [(None, 500)]
    assert out[0]["share_x10000"] == 500 * 10000 // 900


def test_heavy_hitters_small_capacity_still_exact(spark):
    """capacity == k is the tight MG bound: the guarantee must still
    hold (superset of true > n/k keys survives the per-partition
    sketches), so the verified output stays identical to exact."""
    from cascading_flink_spark.extensions import heavy_hitters
    rows = ([("a",)] * 300 + [("b",)] * 200
            + [(f"t{i}",) for i in range(450)])
    df = spark.createDataFrame(rows, "k string").repartition(16)
    got = {(r["key"], r["n"]) for r in
           heavy_hitters(df, "k", k=5, capacity=5).collect()}
    assert got == _exact_hitters(spark, df, "k", 5)


def test_heavy_hitters_validates_args(spark):
    from cascading_flink_spark.extensions import heavy_hitters
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", k=1)
    with pytest.raises(ValueError):
        heavy_hitters(df, "k", k=10, capacity=5)
