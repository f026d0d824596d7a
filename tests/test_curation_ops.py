"""Unit tests for the round-6 session-2 curation operators: Gopher-style
quality rules, token blocklist stats, and per-key moving-frame rolling
statistics — all on tiny hand-computed frames."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Row

from cascading_flink_spark.extensions import (
    blocklist_stats, gopher_quality, rolling_stats,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


class TestGopherQuality:
    def test_word_count_band(self, spark):
        out = {r["doc_id"]: r for r in gopher_quality(_docs(spark, [
            "one two three",            # 3 words
            "a b c d e f",              # 6 words
            "",                         # empty
        ]), min_words=4, max_words=5).collect()}
        assert not out[0]["ok_words"] and out[0]["n_words"] == 3
        assert not out[1]["ok_words"] and out[1]["n_words"] == 6
        assert out[2]["n_words"] == 0 and not out[2]["ok_words"]

    def test_mean_word_len_boundaries_inclusive(self, spark):
        # "ab ab" -> 4 chars / 2 words = 2.00 exactly; both boundaries
        # are inclusive integer cross-multiplications
        out = {r["doc_id"]: r for r in gopher_quality(_docs(spark, [
            "ab ab",                # mean 2.00
            "a a",                  # mean 1.00
            "abcdef abcdef",        # mean 6.00
        ]), min_words=1, max_words=100,
            min_mean_word_len_x100=200,
            max_mean_word_len_x100=200).collect()}
        assert out[0]["ok_word_len"] and out[0]["mean_word_len_x100"] == 200
        assert not out[1]["ok_word_len"]
        assert not out[2]["ok_word_len"]

    def test_symbol_ratio_counts_hashes_and_ellipses(self, spark):
        # 2 '#' chars + 1 '...' run over 4 words = 0.75 -> 7500 x10000
        out = {r["doc_id"]: r for r in gopher_quality(_docs(spark, [
            "ok# then# more... words",
            "clean words only here",
        ]), min_words=1, max_symbol_ratio_x10000=5000).collect()}
        assert out[0]["symbol_ratio_x10000"] == 7500
        assert not out[0]["ok_symbols"]
        assert out[1]["symbol_ratio_x10000"] == 0 and out[1]["ok_symbols"]

    def test_alpha_word_ratio_unicode(self, spark):
        # 2 of 4 words carry a letter -> 0.5; the non-Latin word counts
        # as alphabetic (\p{L}, not ASCII \w)
        out = {r["doc_id"]: r for r in gopher_quality(_docs(spark, [
            "word 123 456 789",
            "你好 123",
        ]), min_words=1, min_alpha_word_ratio_x10000=5000).collect()}
        assert out[0]["alpha_word_ratio_x10000"] == 2500
        assert not out[0]["ok_alpha"]
        assert out[1]["alpha_word_ratio_x10000"] == 5000
        assert out[1]["ok_alpha"]

    def test_stop_hits_count_distinct_markers(self, spark):
        out = {r["doc_id"]: r for r in gopher_quality(_docs(spark, [
            "the the the the",          # one DISTINCT marker
            "the cat and it was fine",  # the, and, it, was = 4
        ]), min_words=1, min_stop_hits=2).collect()}
        assert out[0]["n_stop_hits"] == 1 and not out[0]["ok_stopwords"]
        assert out[1]["n_stop_hits"] == 4 and out[1]["ok_stopwords"]

    def test_line_rules(self, spark):
        bullets = "- one thing\n- another thing\n- third thing"
        ells = "first line...\nsecond line...\nthird stays"
        out = {r["doc_id"]: r for r in gopher_quality(_docs(spark, [
            bullets, ells, "plain one-line doc",
        ]), min_words=1, max_bullet_line_ratio_x10000=9000,
            max_ellipsis_line_ratio_x10000=3000).collect()}
        assert out[0]["n_lines"] == 3 and not out[0]["ok_lines"]
        # 2/3 ellipsis-ended > 0.3
        assert not out[1]["ok_lines"]
        assert out[2]["ok_lines"]

    def test_pass_is_conjunction(self, spark):
        good = "the quick brown fox jumps over the lazy dog again today"
        out = gopher_quality(_docs(spark, [good]), min_words=5,
                             max_words=100, min_stop_hits=1).collect()[0]
        assert out["pass"] and all(
            out[c] for c in ("ok_words", "ok_word_len", "ok_symbols",
                             "ok_alpha", "ok_stopwords", "ok_lines"))


class TestBlocklistStats:
    def test_token_membership_not_substring(self, spark):
        # "classic" must NOT trip an "ass" entry — membership is by
        # whole lower-cased token
        out = {r["doc_id"]: r for r in blocklist_stats(_docs(spark, [
            "classic glass art",
            "bad ass attitude",
        ]), ["ass"]).collect()}
        assert out[0]["n_hits"] == 0 and out[0]["kept"] == 1
        assert out[1]["n_hits"] == 1 and out[1]["kept"] == 0

    def test_counts_total_vs_distinct(self, spark):
        out = blocklist_stats(_docs(spark, [
            "Spam SPAM eggs spam scam",
        ]), ["spam", "scam", "ham"]).collect()[0]
        assert out["n_hits"] == 4          # 3x spam + 1x scam
        assert out["n_terms"] == 2         # spam, scam
        assert out["kept"] == 0

    def test_empty_and_clean(self, spark):
        out = {r["doc_id"]: r for r in blocklist_stats(_docs(spark, [
            "", "perfectly fine text",
        ]), ["bad"]).collect()}
        assert out[0]["n_hits"] == 0 and out[0]["kept"] == 1
        assert out[1]["kept"] == 1

    def test_empty_terms_raises(self, spark):
        with pytest.raises(ValueError):
            blocklist_stats(_docs(spark, ["x"]), [])


class TestRollingStats:
    def _events(self, spark, rows):
        return spark.createDataFrame(
            [Row(user_id=u, event_id=i,
                 ts=datetime.datetime(2024, 1, 1, 0, 0, s), value=v)
             for u, i, s, v in rows])

    def test_hand_computed_frames(self, spark):
        out = {r["event_id"]: r for r in rolling_stats(self._events(spark, [
            # user 1: values 1.00, 2.00, 3.00, 4.00 at t=0..3
            (1, 10, 0, 1.0), (1, 11, 1, 2.0), (1, 12, 2, 3.0),
            (1, 13, 3, 4.0),
            (2, 20, 0, 10.0),
        ]), window_rows=3).collect()}
        assert (out[10]["mov_sum_cents"], out[10]["mov_n"]) == (100, 1)
        assert (out[12]["mov_sum_cents"], out[12]["mov_n"]) == (600, 3)
        # frame slides: rows 11..13 only
        assert (out[13]["mov_sum_cents"], out[13]["mov_min_cents"],
                out[13]["mov_max_cents"]) == (900, 200, 400)
        assert out[10]["delta_cents"] is None
        assert out[13]["delta_cents"] == 100
        assert out[13]["cum_n"] == 4
        assert out[20]["mov_n"] == 1 and out[20]["cum_n"] == 1

    def test_timestamp_ties_break_by_id(self, spark):
        out = {r["event_id"]: r for r in rolling_stats(self._events(spark, [
            (1, 2, 0, 5.0), (1, 1, 0, 3.0),     # same ts; id orders 1 then 2
        ]), window_rows=2).collect()}
        assert out[1]["cum_n"] == 1 and out[1]["delta_cents"] is None
        assert out[2]["cum_n"] == 2 and out[2]["delta_cents"] == 200

    def test_half_cent_rounding_is_floor_plus_half(self, spark):
        # the binning is defined as the IEEE result of floor(x*100+0.5),
        # not decimal rounding: 2.675 is stored as 2.67499..., but
        # 2.675*100 rounds to exactly 267.5, so +0.5 -> 268.0 -> 268.
        # Any IEEE engine (Spark, DuckDB, numpy) computes the identical
        # chain, which is the property the oracle hash relies on.
        out = {r["event_id"]: r for r in rolling_stats(self._events(spark, [
            (1, 1, 0, 0.005), (1, 2, 1, 2.675),
        ]), window_rows=2).collect()}
        assert out[1]["value_cents"] == 1
        assert out[2]["value_cents"] == 268

    def test_window_rows_validation(self, spark):
        with pytest.raises(ValueError):
            rolling_stats(self._events(spark, [(1, 1, 0, 1.0)]),
                          window_rows=0)


def test_compression_stats_matches_zlib_model(spark, sf_dir):
    """Byte-exact vs the Python zlib model (same library, level 6), and
    junk must compress far below prose."""
    import zlib
    from cascading_flink_spark.extensions import compression_stats
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(80)
    got = {r["doc_id"]: (r["n_bytes"], r["n_compressed"], r["ratio_x10000"])
           for r in compression_stats(docs).collect()}
    for r in docs.collect():
        raw = (r["text"] or "").encode("utf-8")
        nc = 0 if not raw else len(zlib.compress(raw, 6))
        want = (len(raw), nc, 0 if not raw else nc * 10000 // len(raw))
        assert got[r["doc_id"]] == want, r["doc_id"]


def test_compression_stats_flags_repetitive_junk(spark):
    from cascading_flink_spark.extensions import compression_stats
    df = spark.createDataFrame(
        [(1, "spam " * 400),
         (2, "The quick brown fox jumps over the lazy dog; meanwhile a "
             "barge drifted past the estuary carrying seventeen crates "
             "of mismatched porcelain."),
         (3, "")],
        "doc_id long, text string")
    rows = {r["doc_id"]: r["ratio_x10000"]
            for r in compression_stats(df).collect()}
    assert rows[1] < rows[2] / 5, rows     # junk compresses ~an order better
    assert rows[3] == 0


def test_hot_keys_fixture(spark):
    from cascading_flink_spark.extensions import hot_keys
    df = spark.createDataFrame(
        [(k,) for k in ["a"] * 6 + ["b"] * 3 + [None] * 2 + ["c"]],
        "k string")
    rows = [(r["key"], r["n"], r["share_x10000"])
            for r in hot_keys(df, "k", top=3).collect()]
    assert rows == [("a", 6, 5000), ("b", 3, 2500), (None, 2, 1666)]


def test_hot_keys_plan_take_ordered(spark, sf_dir):
    """Top-N must compile to TakeOrderedAndProject (no global sort) with
    the total broadcast back."""
    from cascading_flink_spark.extensions import hot_keys
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    plan = hot_keys(ev, "event_type")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan[:3000]
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan



def test_clean_text_folds(spark):
    """Each fold class: control chars dropped, zero-width dropped, curly
    quotes/dashes folded, ellipsis expanded, NBSP and runs collapsed."""
    from cascading_flink_spark.extensions import clean_text
    rows = [
        (1, "a\u0001b\u007fc"),
        (2, "A\u200bB\ufeffC"),
        (3, "\u2018x\u2019 \u201cy\u201d"),
        (4, "a \u2013 b \u2014 c"),
        (5, "wait\u2026 what"),
        (6, "a\u00a0b   c\t\nd"),
        (7, "  already clean  "),
        (8, ""),
        (9, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["changed"])
           for r in clean_text(df).collect()}
    assert got[1] == ("abc", True)
    assert got[2] == ("ABC", True)
    assert got[3] == ("'x' \"y\"", True)
    assert got[4] == ("a - b - c", True)
    assert got[5] == ("wait... what", True)
    assert got[6] == ("a b c d", True)
    assert got[7] == ("already clean", True)   # trim counts as a change
    assert got[8] == ("", False)
    # NULL coalesces to '' (compression_stats convention): a filter on
    # either polarity of `changed` must not silently drop the row
    assert got[9] == ("", False)


def test_clean_text_idempotent(spark, sf_dir):
    """Cleaning twice must equal cleaning once (the pipeline is a
    normal form)."""
    from cascading_flink_spark.extensions import clean_text
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    once = clean_text(docs)
    twice = clean_text(once.select("doc_id",
                                   once["clean_text"].alias("text")))
    a = {r["doc_id"]: r["clean_text"] for r in once.collect()}
    b = {r["doc_id"]: r["clean_text"] for r in twice.collect()}
    assert a == b
    assert not any(r["changed"] for r in twice.collect())


# ------------------------------------------------------------------
# quality_classifier: fastText-style linear scorer, pinned to an exact
# Python model (same md5 buckets, same integer arithmetic).

def _classifier_model(texts, fw=None, bw=None, bias=0, n_buckets=64):
    """Pure-Python twin of quality_classifier."""
    import hashlib
    import re

    from cascading_flink_spark.extensions import (
        DEFAULT_FEATURE_WEIGHTS, default_bucket_weights,
    )
    from cascading_flink_spark.extensions.text import EN_MARKERS

    fw = {**DEFAULT_FEATURE_WEIGHTS, **(fw or {})}
    bw = bw if bw is not None else default_bucket_weights(n_buckets)

    def tdiv(a, b):  # Spark DIV / DuckDB //: truncation toward zero
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    out = []
    for i, t in enumerate(texts):
        t = t or ""
        toks = t.strip().split() if t.strip() else []
        ltoks = t.lower().strip().split() if t.lower().strip() else []
        stripped = re.sub(r"\s+", "", t)
        ns, nw1 = len(stripped), max(len(toks), 1)
        ns1 = max(ns, 1)
        np_ = ns - len(re.sub(r"[^\w]", "", stripped, flags=re.UNICODE))
        nd = len(re.sub(r"[^0-9]", "", stripped))
        nst = sum(1 for w in ltoks if w in EN_MARKERS)
        na = sum(1 for w in toks if re.search(r"[^\W\d_]", w, re.UNICODE))
        wsum = sum(
            bw[int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % n_buckets]
            for w in ltoks)
        feats = {
            "mean_word_len_x100": tdiv(ns * 100, nw1),
            "punct_ratio_x10000": tdiv(np_ * 10000, ns1),
            "digit_ratio_x10000": tdiv(nd * 10000, ns1),
            "stopword_ratio_x10000": tdiv(nst * 10000, nw1),
            "alpha_word_ratio_x10000": tdiv(na * 10000, nw1),
        }
        bag = tdiv(wsum * 10000, nw1)
        score = bias + sum(fw[k] * v for k, v in feats.items()) + bag
        out.append((i, *feats.values(), bag, score, int(score >= 0)))
    return out


def test_quality_classifier_matches_python_model(spark):
    from cascading_flink_spark.extensions import quality_classifier
    texts = [
        "the cat sat on the mat and it was good",
        "x" * 50,
        "123 456 789",
        "!!! ??? ...",
        "",
        "   ",
        None,
        "naïve café résumé über",          # non-ASCII letters
        "mixed 123 text!! with, punct.",
        "the the the the the",
    ]
    from pyspark.sql import Row
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = sorted(tuple(r) for r in
                 quality_classifier(df, bias=-12500).collect())
    want = sorted(_classifier_model(texts, bias=-12500))
    assert got == want


def test_quality_classifier_custom_weights_and_validation(spark):
    from pyspark.sql import Row

    from cascading_flink_spark.extensions import quality_classifier
    df = spark.createDataFrame([Row(doc_id=0, text="the a b")])
    # all-zero weights + bias decides alone
    row = quality_classifier(
        df, feature_weights={k: 0 for k in (
            "mean_word_len_x100", "punct_ratio_x10000",
            "digit_ratio_x10000", "stopword_ratio_x10000",
            "alpha_word_ratio_x10000")},
        bucket_weights=[0] * 64, bias=7).collect()[0]
    assert row["score"] == 7 and row["kept"] == 1
    with pytest.raises(ValueError):
        quality_classifier(df, feature_weights={"nope": 1}).collect()
    with pytest.raises(ValueError):
        quality_classifier(df, bucket_weights=[1, 2, 3]).collect()


def test_load_fasttext_weights_fixture_end_to_end(spark):
    """VERDICT r7 Next #6: external weight import in the public fastText
    .vec text format, splatted into the unchanged quality_classifier
    signature, still exact-integer — pinned against the Python model."""
    import os

    from pyspark.sql import Row

    from cascading_flink_spark.extensions import (
        load_fasttext_weights, quality_classifier,
    )
    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "quality_weights.vec")
    w = load_fasttext_weights(path)
    # the fixture's float coefficients became exact ints at scale 10000
    assert w["bias"] == 500
    assert w["feature_weights"]["punct_ratio_x10000"] == -6
    assert len(w["bucket_weights"]) == 64
    assert all(isinstance(x, int) for x in w["bucket_weights"])

    texts = ["the cat sat on the mat", "12345!!!", "", None,
             "naïve café 99 bottles of beer on the wall"]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    got = sorted(tuple(r) for r in quality_classifier(df, **w).collect())
    want = sorted(_classifier_model(
        texts, fw=w["feature_weights"], bw=w["bucket_weights"],
        bias=w["bias"]))
    assert got == want


def test_load_fasttext_weights_validation(tmp_path):
    import pytest as _pytest

    from cascading_flink_spark.extensions import load_fasttext_weights

    def write(name, body):
        p = tmp_path / name
        p.write_text(body)
        return str(p)

    with _pytest.raises(ValueError, match="dim=2"):
        load_fasttext_weights(write("d.vec", "1 2\nb_0 0.1 0.2\n"))
    with _pytest.raises(ValueError, match="unknown feature"):
        load_fasttext_weights(write("f.vec", "1 1\nf_nope 0.1\n"))
    with _pytest.raises(ValueError, match="out of range"):
        load_fasttext_weights(write("b.vec", "1 1\nb_64 0.1\n"))
    with _pytest.raises(ValueError, match="unrecognised term"):
        load_fasttext_weights(write("t.vec", "1 1\nwhat 0.1\n"))
    with _pytest.raises(ValueError, match="declares 3 rows"):
        load_fasttext_weights(write("n.vec", "3 1\nb_0 0.1\n"))
