"""Round-12 operator tests: ADVICE-r11 fixes (classifier_auc int64
overflow + quantize_x guard, ndcg_at_k judged-but-unretrieved queries,
sessionize keep_cols collision guard) and the VERDICT-r11 board."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


# -------------------------------------- classifier_auc overflow guard

def test_classifier_auc_numerator_past_int64(spark):
    """ADVICE r11 (medium): at np*nq > ~4.6e12 per group the old
    ``__num2 * 1000000`` int64 numerator wrapped SILENTLY under
    non-ANSI arithmetic.  4.6M rows with 100 distinct scores puts
    np*nq at ~5.3e12 — past the wrap point — and the DECIMAL(38,0)
    path must still match the exact Python Mann-Whitney value."""
    n = 4_600_000
    df = (spark.range(n)
          .select(((F.col("id") % 100) >= 50).cast("long")
                  .alias("label"),
                  (F.col("id") % 100).cast("long").alias("score")))
    from cascading_flink_spark.extensions import classifier_auc
    [row] = classifier_auc(df, "score", "label").collect()

    # Direct integer model: scores cycle id % 100 (n/100 rows each),
    # every positive (score >= 50) outranks every negative — a
    # perfect classifier, so num2 = 2 * np * nq, the numerator's
    # maximum, and num2 * 1e6 is provably past int64.
    per = n // 100
    np_ = nq_ = per * 50
    num2 = 2 * np_ * nq_
    assert num2 * 1_000_000 > 2**63 - 1  # old int64 path would wrap
    expect = num2 * 1_000_000 // (2 * np_ * nq_)
    assert row.auc_x1e6 == expect == 1_000_000
    assert (row.n_pos, row.n_neg) == (np_, nq_)


def test_classifier_auc_quantize_x(spark):
    """VERDICT r11 #5: raw continuous scores must be bucketable
    in-plan — quantize_x=100 ties scores within 1/200 and the result
    matches the direct Python model on the rounded scores."""
    import random
    rng = random.Random(12)
    rows = [(round(rng.uniform(0, 1), 6), rng.randint(0, 1))
            for _ in range(400)]
    df = spark.createDataFrame(rows, "score double, label int")
    from cascading_flink_spark.extensions import classifier_auc
    [row] = classifier_auc(df, "score", "label", quantize_x=100) \
        .collect()

    # Python model: round-half-away (matches Spark HALF_UP / DuckDB
    # round for positive scores), then tie-correct Mann-Whitney.
    import math
    def q(x):
        return math.floor(x * 100 + 0.5)
    pos = sorted(q(s) for s, l in rows if l == 1)
    neg = sorted(q(s) for s, l in rows if l == 0)
    num2 = 0
    for p in pos:
        below = sum(1 for v in neg if v < p)
        ties = sum(1 for v in neg if v == p)
        num2 += 2 * below + ties
    expect = num2 * 1_000_000 // (2 * len(pos) * len(neg))
    assert row.auc_x1e6 == expect
    assert (row.n_pos, row.n_neg) == (len(pos), len(neg))


def test_classifier_auc_quantize_x_validates(spark):
    from cascading_flink_spark.extensions import classifier_auc
    df = spark.createDataFrame([(0.5, 1)], "score double, label int")
    with pytest.raises(ValueError, match="quantize_x"):
        classifier_auc(df, "score", "label", quantize_x=0)


# ------------------------------- ndcg_at_k: unretrieved judged query

def test_ndcg_zero_for_judged_but_unretrieved_query(spark):
    """ADVICE r11: a query with positive judgments but zero retrieved
    rows must report ndcg 0, not vanish from the eval."""
    from cascading_flink_spark.extensions import ndcg_at_k
    results = spark.createDataFrame(
        [("q1", "d1", 0.9), ("q1", "d2", 0.8)],
        "query_id string, vec_id string, sim double")
    qrels = spark.createDataFrame(
        [("q1", "d1", 2), ("q2", "d9", 3), ("q3", "d7", 0)],
        "query_id string, vec_id string, rel int")
    out = {r.query_id: r for r in ndcg_at_k(results, qrels, k=3)
           .collect()}
    assert out["q1"].ndcg_x1e6 == 1_000_000  # only judged doc at rank 1
    assert out["q2"].ndcg_x1e6 == 0          # judged, never retrieved
    assert out["q2"].dcg_x == 0 and out["q2"].idcg_x > 0
    assert "q3" not in out                   # idcg 0: still excluded


# -------------------------- ngram_containment verbatim-collapse path

def _containment_rows(df, **kw):
    from cascading_flink_spark.extensions import ngram_containment_pairs
    return sorted((r.id_a, r.id_b, r.n_common, r.containment)
                  for r in ngram_containment_pairs(df, **kw).collect())


def test_ngram_containment_collapse_matches_raw(spark):
    """VERDICT r11 What's-wrong #1: collapse_exact=True must be a pure
    PLAN change — bit-identical output to the raw per-member path on a
    corpus dense in verbatim copies (exact-copy pairs, the
    multiplicity^2 case, directed superset pairs across copy
    groups)."""
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away home tonight")
    sup = base + " with extra trailing navigation chrome appended here"
    other = ("completely different text about spark shuffles and "
             "partition pruning at scale today")
    rep = " ".join(["alpha beta gamma"] * 6)   # shingle-set size 3
    rows = [(1, base), (2, base), (3, base),      # 3 verbatim copies
            (4, sup), (5, sup),                   # 2 copies of superset
            (6, other), (7, rep), (8, rep)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got_collapse = _containment_rows(df, n=3, threshold=0.8,
                                     collapse_exact=True)
    got_raw = _containment_rows(df, n=3, threshold=0.8,
                                collapse_exact=False)
    assert got_collapse == got_raw
    byp = {(a, b): (nc, c) for a, b, nc, c in got_collapse}
    # copies of base are mutually contained at exactly 1.0 (the
    # shingler emits DISTINCT shingles, so identical docs always tie)
    for p in [(1, 2), (2, 1), (1, 3), (7, 8), (8, 7)]:
        assert p in byp and byp[p][1] == 1.0
    # base is inside sup (directed), sup NOT inside base
    assert (1, 4) in byp and (1, 5) in byp
    assert (4, 1) not in byp
    assert not any(a == 6 or b == 6 for a, b in byp)


def test_ngram_jaccard_collapse_matches_raw(spark):
    """Round 12 extends the verbatim collapse to the Jaccard twin —
    bit-identical pairs on a copy-dense corpus (the dedup_soft /
    cluster_split / dedup_clusters upstream), including pairs whose
    members interleave in id order across copy groups."""
    from cascading_flink_spark.extensions import ngram_jaccard_pairs
    a = "the quick brown fox jumps over the lazy dog tonight"
    b = "the quick brown fox jumps over the lazy dog today instead"
    c = "unrelated text about catalyst plans and shuffle partitions"
    rows = [(1, a), (4, a), (7, a),       # copies of a, interleaved ids
            (2, b), (5, b),               # copies of the near-dup b
            (3, c), (6, c)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for t in (0.5, 0.8):
        got_c = sorted((r.id_a, r.id_b, r.jaccard) for r in
                       ngram_jaccard_pairs(df, n=3, threshold=t,
                                           collapse_exact=True).collect())
        got_r = sorted((r.id_a, r.id_b, r.jaccard) for r in
                       ngram_jaccard_pairs(df, n=3, threshold=t,
                                           collapse_exact=False).collect())
        assert got_c == got_r
    pairs = {(x, y): j for x, y, j in got_c}
    assert pairs[(1, 4)] == 1.0 and pairs[(3, 6)] == 1.0
    assert all(x < y for x, y in pairs)


def test_ngram_containment_collapse_plan_no_per_member_intersect(spark):
    """The verify stage's array_intersect must run at representative
    level — the plan still has no cartesian, and the collapsed path
    is the default (round 13: the probe-gated 'auto', which collapses
    whenever verbatim copies exist and is a no-op otherwise)."""
    import inspect
    from cascading_flink_spark.extensions import ngram_containment_pairs
    sig = inspect.signature(ngram_containment_pairs)
    assert sig.parameters["collapse_exact"].default == "auto"


# ----------------------- dedup_clusters unified onto stars CC (#4)

def test_dedup_clusters_distributed_path_is_stars(spark):
    """VERDICT r11 #4: above the driver cutoff dedup_clusters delegates
    to connected_components(strategy='stars') — equality pin vs the
    union-find path on a fixture with a long chain (the giant-cluster
    pathology hash-min needed diameter rounds for), ids DESCENDING
    along the chain (the adversarial layout)."""
    from cascading_flink_spark.extensions.dedup import dedup_clusters
    chain = [(i + 1, i) for i in range(1, 16)]       # 16..1 path
    extra = [(100, 101), (102, 101), (200, 300)]
    pairs = spark.createDataFrame(chain + extra, "id_a long, id_b long")
    uf = {r.id: r.cluster_id
          for r in dedup_clusters(pairs).collect()}
    # force the distributed path; log2(16) = 4 star rounds suffice
    dist = {r.id: r.cluster_id
            for r in dedup_clusters(pairs, driver_cutoff_edges=0,
                                    max_iterations=6).collect()}
    assert dist == uf
    assert uf[16] == 1 and uf[102] == 100 and uf[300] == 200


def test_dedup_clusters_distributed_string_ids(spark):
    """The stars path must keep the id column's own type (the r10/r11
    connected_components contract)."""
    from cascading_flink_spark.extensions.dedup import dedup_clusters
    pairs = spark.createDataFrame(
        [("b.com", "a.com"), ("c.com", "b.com")], "id_a string, id_b string")
    out = dedup_clusters(pairs, driver_cutoff_edges=0, max_iterations=4)
    got = {r.id: r.cluster_id for r in out.collect()}
    assert got == {"a.com": "a.com", "b.com": "a.com", "c.com": "a.com"}
    [t] = {f.dataType.simpleString() for f in out.schema}
    assert t == "string"


def test_stars_check_convergence_raises_on_small_budget(spark):
    from cascading_flink_spark.extensions import connected_components
    chain = [(i + 1, i) for i in range(1, 16)]
    e = spark.createDataFrame(chain, "src long, dst long")
    with pytest.raises(RuntimeError, match="not converged"):
        connected_components(e, rounds=1, strategy="stars",
                             check_convergence=True).collect()
    with pytest.raises(ValueError, match="check_convergence"):
        connected_components(e, rounds=4, check_convergence=True)


# --------------------------------------------- plan-shape assertions

def test_round12_ops_plan_shapes(spark, sf_dir):
    """The round-12 operators must stay equi-join-only: no cartesian,
    no broadcast nested loop anywhere in their physical plans."""
    from cascading_flink_spark.extensions import (
        dup_substring_spans, mrr_at_k, ngram_jaccard_pairs,
        recall_at_k, strip_dup_substrings)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    res = spark.createDataFrame([(1, 10, 0.9)],
                                "query_id long, vec_id long, sim double")
    qrels = spark.createDataFrame([(1, 10, 2)],
                                  "query_id long, vec_id long, rel long")
    for df in (dup_substring_spans(docs, min_len=12),
               strip_dup_substrings(docs, min_len=12),
               ngram_jaccard_pairs(docs, n=3, threshold=0.5),
               mrr_at_k(res, qrels), recall_at_k(res, qrels)):
        p = _plan(df)
        assert "CartesianProduct" not in p
        assert "BroadcastNestedLoopJoin" not in p


# ------------------------------------ sessionize keep_cols collisions

def test_sessionize_keep_cols_collision_guard(spark):
    from cascading_flink_spark.extensions import sessionize
    ev = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:00", "view")],
        "user_id int, event_id int, ts string, etype string")
    for bad in (["session_n"], ["__rn"], ["ts_us"], ["user_id"],
                ["ts"], ["etype", "etype"]):
        with pytest.raises(ValueError, match="keep_cols"):
            sessionize(ev, key_col="user_id", ts_col="ts",
                       id_col="event_id", keep_cols=bad)
    # the legitimate passthrough still works
    rows = sessionize(ev, key_col="user_id", ts_col="ts",
                      id_col="event_id", keep_cols=["etype"]).collect()
    assert rows[0].etype == "view"
