"""Round-7 session-4 operators: c4_rules, sample_k_per_group,
cardinality_report, dup_spans."""
from __future__ import annotations

import pyspark.sql.functions as F

from cascading_flink_spark.extensions import (
    c4_rules, cardinality_report, dup_spans, sample_k_per_group,
    strip_dup_spans,
)

def load(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------- c4_rules

def _c4_fixture(spark):
    rows = [
        # keeps both lines, 2 sentences
        (1, "This is a good line.\nAnother proper sentence here!"),
        # line too short / no terminal punct -> all dropped
        (2, "short line\nno punct here at all"),
        # javascript line dropped, other kept
        (3, "Please enable JavaScript to view.\nA real content sentence."),
        # lorem ipsum page flagged
        (4, "A fine long sentence stands here.\nlorem ipsum dolor sit amet."),
        # curly brace page flagged
        (5, "function f() { return 1; }\nText sentence survives though."),
        # null text
        (6, None),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_c4_line_and_page_rules(spark):
    out = c4_rules(_c4_fixture(spark), min_line_words=3,
                   min_sentences=2).orderBy("doc_id").collect()
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["n_kept_lines"] == 2
    assert by_id[1]["n_sentences"] == 2
    assert by_id[1]["pass"] == 1
    assert by_id[2]["n_kept_lines"] == 0
    assert by_id[2]["pass"] == 0
    # javascript mention drops only that line
    assert by_id[3]["n_kept_lines"] == 1
    assert by_id[4]["has_lorem"] == 1 and by_id[4]["pass"] == 0
    assert by_id[5]["has_curly"] == 1 and by_id[5]["pass"] == 0
    # NULL text coalesces like clean_text: one empty line, nothing kept
    assert by_id[6]["n_kept_lines"] == 0 and by_id[6]["pass"] == 0


def test_c4_clean_text_joins_kept_lines(spark):
    out = {r["doc_id"]: r["clean_text"]
           for r in c4_rules(_c4_fixture(spark)).collect()}
    assert out[1] == "This is a good line.\nAnother proper sentence here!"
    assert out[3] == "A real content sentence."
    assert out[2] == ""


# ------------------------------------------------------- sample_k_per_group

def test_sample_k_per_group_exact_k(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    out = sample_k_per_group(ev, "event_type", 5, ["event_id"])
    sizes = {r["event_type"]: r["n"] for r in
             out.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    full = {r["event_type"]: r["n"] for r in
            ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    for g, n in sizes.items():
        assert n == min(5, full[g])
    # deterministic: rerun picks the identical rows
    a = sorted(r["event_id"] for r in out.collect())
    b = sorted(r["event_id"] for r in
               sample_k_per_group(ev, "event_type", 5, ["event_id"]).collect())
    assert a == b


def test_sample_k_per_group_plan_has_window_group_limit(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    plan = sample_k_per_group(ev, "event_type", 5, ["event_id"]) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan


# ------------------------------------------------------- cardinality_report

def test_cardinality_report_exact_matches_manual(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    out = {r["event_type"]: r for r in
           cardinality_report(ev, "event_type", ["user_id"]).collect()}
    manual = {r["event_type"]: r for r in
              ev.groupBy("event_type")
                .agg(F.count("*").alias("n_rows"),
                     F.count_distinct("user_id").alias("d")).collect()}
    for g, r in manual.items():
        assert out[g]["n_rows"] == r["n_rows"]
        assert out[g]["user_id_distinct"] == r["d"]


def test_cardinality_report_approx_within_bound(spark, sf_dir):
    ev = load(spark, sf_dir, "events")
    exact = {r["event_type"]: r["user_id_distinct"] for r in
             cardinality_report(ev, "event_type", ["user_id"]).collect()}
    approx = {r["event_type"]: r["user_id_distinct"] for r in
              cardinality_report(ev, "event_type", ["user_id"],
                                 exact=False, rsd=0.05).collect()}
    for g, e in exact.items():
        assert abs(approx[g] - e) <= max(2, 0.25 * e)


# --------------------------------------------------------------- dup_spans

def test_dup_spans_worked_example(spark):
    # shared 4-token run "a b c d" in docs 1+2; doc 3 unrelated
    rows = [
        (1, "x a b c d y z q"),
        (2, "p a b c d r s t"),
        (3, "completely different tokens only here now ok fine"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dup_spans(df, k=4, min_docs=2).orderBy("doc_id").collect()
    # only the k-gram "a b c d" (positions 1..4) is shared
    assert [r["doc_id"] for r in out] == [1, 2]
    for r in out:
        assert (r["span_start"], r["span_end"], r["span_tokens"],
                r["n_grams"]) == (1, 4, 4, 1)


def test_dup_spans_merges_overlapping_grams(spark):
    # docs share a 6-token run -> three 4-grams merge into one span
    shared = "alpha beta gamma delta epsilon zeta"
    rows = [(1, "x " + shared + " tail1 t2 t3"),
            (2, shared + " other suffix words here")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dup_spans(df, k=4, min_docs=2).collect()}
    assert out[1]["span_start"] == 1 and out[1]["span_end"] == 6
    assert out[1]["span_tokens"] == 6 and out[1]["n_grams"] == 3
    assert out[2]["span_start"] == 0 and out[2]["span_end"] == 5


def test_dup_spans_distinct_islands_stay_separate(spark):
    # two shared runs separated by a gap > k stay two spans
    rows = [(1, "a b c d GAP1 GAP2 GAP3 GAP4 GAP5 w x y z"),
            (2, "a b c d OTHER1 OTHER2 OTHER3 OTHER4 OTHER5 w x y z")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dup_spans(df, k=4, min_docs=2)
    per_doc = {r["doc_id"]: r["n"] for r in
               out.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert per_doc == {1: 2, 2: 2}


def test_dup_spans_short_docs_yield_nothing(spark):
    rows = [(1, "a b c"), (2, "a b c")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert dup_spans(df, k=4, min_docs=2).count() == 0


def test_dup_spans_no_self_duplication(spark):
    # a doc repeating its own phrase does NOT create spans (min_docs is
    # counted over distinct docs)
    rows = [(1, "a b c d e f a b c d e f"),
            (2, "totally unrelated words that never repeat anywhere else")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    assert dup_spans(df, k=4, min_docs=2).count() == 0


# ------------------------------------------------------------ plan quality

def test_c4_rules_plan_is_map_only(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    plan = c4_rules(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # zero shuffles: pure per-row projection


def test_dup_spans_plan_no_cartesian_and_partitioned_windows(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    plan = dup_spans(docs, k=8)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    # the island windows must partition by doc id (never a global window)
    assert "windowspecdefinition(id#" in plan


# --------------------------------------------------------- strip_dup_spans

def test_strip_dup_spans_owner_keeps_text(spark):
    rows = [(1, "x a b c d y z q"),
            (2, "p a b c d r s t"),
            (3, "completely different tokens only here now ok fine")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in strip_dup_spans(df, k=4, min_docs=2)
           .collect()}
    assert out[1]["clean_text"] == "x a b c d y z q"      # canonical owner
    assert out[2]["clean_text"] == "p r s t"              # span dropped
    assert out[2]["n_tokens_removed"] == 4
    assert out[3]["n_tokens_removed"] == 0                # untouched


def test_strip_dup_spans_total_tokens_conserved(spark, sf_dir):
    docs = load(spark, sf_dir, "documents")
    out = strip_dup_spans(docs, k=8)
    row = out.agg(F.sum(F.col("n_tokens_kept") +
                        F.col("n_tokens_removed")).alias("s")).first()
    toks = docs.select(F.size(F.split(F.lower(F.trim("text")), r"\s+"))
                       .alias("n")).agg(F.sum("n").alias("s")).first()
    assert row["s"] == toks["s"]


def test_strip_dup_spans_fully_removed_doc_is_empty_string(spark):
    # doc 2 is a verbatim copy of doc 1's full text -> every token covered
    rows = [(1, "a b c d e f"), (2, "a b c d e f")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in strip_dup_spans(df, k=4, min_docs=2)
           .collect()}
    assert out[1]["clean_text"] == "a b c d e f"
    assert out[2]["clean_text"] == "" and out[2]["n_tokens_kept"] == 0


# ------------------------------------------------------ streaming parity

def test_c4_rules_streams_as_is(spark, sf_dir, tmp_path):
    """c4_rules is a stateless projection, so it applies to a streaming
    frame unchanged: one availableNow micro-batch reproduces the batch
    output exactly (the streaming-twin contract, with no twin needed)."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text") \
        .limit(200)
    src = str(tmp_path / "c4_in")
    docs.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    q = (c4_rules(stream).writeStream.format("memory")
         .queryName("c4_stream").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["doc_id"], r["n_kept_lines"], r["pass"], r["clean_text"])
           for r in spark.sql("SELECT * FROM c4_stream").collect()}
    spark.catalog.dropTempView("c4_stream")
    want = {(r["doc_id"], r["n_kept_lines"], r["pass"], r["clean_text"])
            for r in c4_rules(spark.read.parquet(src)).collect()}
    assert got == want


# ------------------------------------------------------------ gram_novelty

def test_gram_novelty_worked_example(spark):
    from cascading_flink_spark.extensions import gram_novelty
    rows = [(1, "a b c d e"),          # grams: "a b c", "b c d", "c d e"
            (2, "x b c d y"),          # shares "b c d" with doc 1
            (3, "p q")]                # too short: 0 grams
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in gram_novelty(df, k=3).collect()}
    assert out[1]["n_grams"] == 3 and out[1]["n_novel_grams"] == 2
    assert out[1]["novelty_x10000"] == 6666          # floor(2/3 * 10000)
    assert out[2]["n_novel_grams"] == 2
    assert out[3]["n_grams"] == 0 and out[3]["novelty_x10000"] == 0


def test_gram_novelty_all_unique_is_10000(spark):
    from cascading_flink_spark.extensions import gram_novelty
    rows = [(1, "completely original text with many tokens here"),
            (2, "another entirely different document body right now")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    for r in gram_novelty(df, k=3).collect():
        assert r["novelty_x10000"] == 10000


def test_c4_rules_crlf_lines(spark):
    """CRLF line endings: the \\r is consumed at the split, so the
    terminal-punct test sees the true last character (Java's $ would
    otherwise match before a trailing \\r while RE2 engines would not)."""
    rows = [(1, "A good crlf sentence here.\r\nshort\r\nAnother kept one!")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    r = c4_rules(df).collect()[0]
    assert r["n_lines"] == 3 and r["n_kept_lines"] == 2
    assert "\r" not in r["clean_text"]


def test_minhash_recall_query_shape(spark, sf_dir):
    import sys
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as entry
    rows = entry.queries()["minhash_recall"](spark, sf_dir).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0 <= r["n_hit"] <= r["n_true"]
    assert r["recall_x10000"] == (r["n_hit"] * 10000 //
                                  max(r["n_true"], 1))
