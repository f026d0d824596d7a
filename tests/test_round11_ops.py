"""Round-11 operator tests: ADVICE-r10 fixes (string-id connected
components, corpus_drift scale divisibility, streaming chunk-order
independence) and the VERDICT-r10 board (log-round CC twin, flagship
margin-drop join strategy)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------ connected_components id typing

def test_connected_components_string_node_ids(spark):
    """ADVICE r10: comp must keep the node column's own type — a long
    cast would NULL out hostname-style ids under non-ANSI casting."""
    from cascading_flink_spark.extensions import connected_components
    e = spark.createDataFrame(
        [("a.com", "b.com"), ("b.com", "c.com"), ("x.org", "y.org")],
        "src string, dst string")
    out = {r.node: r.comp for r in connected_components(e, rounds=3)
           .collect()}
    assert out == {"a.com": "a.com", "b.com": "a.com", "c.com": "a.com",
                   "x.org": "x.org", "y.org": "x.org"}
    [comp_type] = [f.dataType.simpleString()
                   for f in connected_components(e, rounds=1).schema
                   if f.name == "comp"]
    assert comp_type == "string"


def test_connected_components_stars_log_rounds_on_path(spark):
    """Alternating large/small-star halves the problem each round
    (log2(16) = 4 rounds converge the 16-node path) while hash-min
    (one hop per round) still carries stale labels.  Ids are laid out
    DESCENDING along the path so the min sits at the far end — the
    adversarial layout where label-only accelerations (pointer
    jumping, one-hook contraction) measurably degrade to linear (the
    reason strategy='stars' rewrites edges)."""
    from cascading_flink_spark.extensions import connected_components
    e = spark.createDataFrame([(15 - i, 15 - i - 1) for i in range(15)],
                              "src long, dst long")
    slow = {r.node: r.comp for r in connected_components(
        e, rounds=4, strategy="hashmin").collect()}
    fast = {r.node: r.comp for r in connected_components(
        e, rounds=4, strategy="stars").collect()}
    assert fast == {i: 0 for i in range(16)}
    assert slow[15] != 0  # 15 hops away, only 4 covered


@pytest.mark.slow  # r15: heavy, round-close full gate only
def test_connected_components_stars_equals_hashmin_converged(spark):
    """The kmeans production/gated-twin convention: on a converged
    graph the two strategies agree exactly (same min-member
    representative)."""
    from cascading_flink_spark.extensions import connected_components
    import random
    rng = random.Random(11)
    edges = [(rng.randrange(60), rng.randrange(60)) for _ in range(45)]
    e = spark.createDataFrame(edges, "src long, dst long")
    a = {r.node: r.comp for r in connected_components(
        e, rounds=60, strategy="hashmin").collect()}
    b = {r.node: r.comp for r in connected_components(
        e, rounds=7, strategy="stars").collect()}
    assert a == b


def test_connected_components_stars_two_islands_and_strings(spark):
    """Stars keeps hashmin's semantics on islands and non-numeric
    ids (comp stays in the node column's own type; greatest/least and
    min order strings)."""
    from cascading_flink_spark.extensions import connected_components
    e = spark.createDataFrame(
        [("a.com", "b.com"), ("b.com", "c.com"), ("x.org", "y.org")],
        "src string, dst string")
    out = {r.node: r.comp for r in connected_components(
        e, rounds=3, strategy="stars").collect()}
    assert out == {"a.com": "a.com", "b.com": "a.com", "c.com": "a.com",
                   "x.org": "x.org", "y.org": "x.org"}


def test_connected_components_strategy_validation(spark):
    from cascading_flink_spark.extensions import connected_components
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError, match="strategy"):
        connected_components(e, strategy="bigstar")


# ------------------------------------------ corpus_drift scale guard

def test_corpus_drift_rejects_non_multiple_scale(spark):
    """ADVICE r10: a scale that is not a multiple of 1e6 would silently
    rescale the reported drift by scale/(1e6*down)."""
    from cascading_flink_spark.extensions import corpus_drift
    df = spark.createDataFrame([("a", "x y")], "source string, text string")
    with pytest.raises(ValueError, match="multiple"):
        corpus_drift(df, scale=1_500_000)
    # exact multiples stay accepted
    assert corpus_drift(df, scale=2_000_000).collect()[0].tv_x1e6 == 0


# -------------------------------------------- clustering_coefficient

def test_clustering_coefficient_hand_graph(spark):
    """Triangle 1-2-3 plus pendant 4 off node 1: nodes 2,3 have cc 1
    (every wedge closed), node 1 has 1 triangle over C(3,2)=3 wedges,
    the pendant has deg 1 -> 0 by convention."""
    from cascading_flink_spark.extensions import clustering_coefficient
    e = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (1, 4)],
                              "src long, dst long")
    got = {r.node: (r.deg, r.n_triangles, r.cc_x1e6)
           for r in clustering_coefficient(e).collect()}
    assert got == {1: (3, 1, 333_333), 2: (2, 1, 1_000_000),
                   3: (2, 1, 1_000_000), 4: (1, 0, 0)}


# --------------------------------------------------- dedup_soft_weights

def test_dedup_soft_weights_cluster_math(spark):
    """Every doc appears exactly once; a near-dup cluster's members
    share the min-member cluster_id and carry 1e6 DIV size; singletons
    keep themselves at 1e6."""
    from cascading_flink_spark.extensions import dedup_soft_weights
    dup = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(1, dup), (2, dup), (3, dup),
            (4, "completely different text with no overlap at all here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.cluster_id, r.cluster_size, r.w_x1e6)
           for r in dedup_soft_weights(df, n=3, threshold=0.8).collect()}
    assert got == {1: (1, 3, 333_333), 2: (1, 3, 333_333),
                   3: (1, 3, 333_333), 4: (4, 1, 1_000_000)}


# -------------------------------------------------- upsample_mixture

def test_upsample_mixture_epoch_math_and_budget_bound(spark):
    from cascading_flink_spark.extensions import upsample_mixture
    rows = [("en", i, 10) for i in range(10)] \
        + [("de", 100 + i, 7) for i in range(4)] \
        + [("zh", 200, 5)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, "
                                     "n_tokens long")
    # en: T=100, budget 250 -> 2 epochs + 50-token prefix;
    # de: T=28, budget 14 -> pure downsample; zh absent -> dropped
    out = upsample_mixture(df, {"en": 250, "de": 14})
    rowso = out.collect()
    assert all(r.lang != "zh" for r in rowso)
    en = [r for r in rowso if r.lang == "en"]
    # every en doc >= 2 repeats, prefix docs get 3; emitted extra mass
    # is the admitted prefix: <= 50, > 50 - 10
    assert {r.n_repeats for r in en} <= {2, 3} and len(en) == 10
    extra = sum(r.n_tokens for r in en if r.n_repeats == 3)
    assert 40 < extra <= 50
    de = [r for r in rowso if r.lang == "de"]
    assert all(r.n_repeats == 1 for r in de)
    assert 7 <= sum(r.n_tokens for r in de) <= 14


def test_upsample_mixture_degenerates_to_token_budget(spark):
    """budget < corpus: identical admitted set as token_budget_mixture,
    all n_repeats = 1 (same seed -> same md5 prefix)."""
    from cascading_flink_spark.extensions import (token_budget_mixture,
                                                  upsample_mixture)
    rows = [("en", i, (i * 13) % 9 + 1) for i in range(50)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, "
                                     "n_tokens long")
    up = upsample_mixture(df, {"en": 60}, seed="mixture")
    tb = token_budget_mixture(df, {"en": 60}, seed="mixture")
    assert {r.doc_id for r in up.collect()} \
        == {r.doc_id for r in tb.collect()}
    assert {r.n_repeats for r in up.collect()} == {1}


# --------------------------------------------------------- ndcg_at_k

def test_ndcg_hand_fixture(spark):
    """Exact integer NDCG: unjudged candidate scores 0, an unretrieved
    judged doc still raises the ideal, weights are the Python-rounded
    1e6/log2(i+1) literals."""
    import math
    from cascading_flink_spark.extensions import ndcg_at_k
    res = spark.createDataFrame(
        [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7)],
        "query_id long, vec_id long, sim double")
    qrels = spark.createDataFrame(
        [(1, 10, 3), (1, 12, 1), (1, 13, 2)],   # 13 never retrieved
        "query_id long, vec_id long, rel long")
    w = [int(round(1_000_000 / math.log2(i + 1))) for i in range(1, 4)]
    dcg = 3 * w[0] + 0 * w[1] + 1 * w[2]
    idcg = 3 * w[0] + 2 * w[1] + 1 * w[2]
    [r] = ndcg_at_k(res, qrels, k=3).collect()
    assert (r.dcg_x, r.idcg_x, r.ndcg_x1e6) == (
        dcg, idcg, dcg * 1_000_000 // idcg)


def test_ndcg_perfect_ranking_is_1e6_and_no_positives_excluded(spark):
    from cascading_flink_spark.extensions import ndcg_at_k
    res = spark.createDataFrame(
        [(1, 10, 0.9), (1, 11, 0.8), (2, 10, 0.9)],
        "query_id long, vec_id long, sim double")
    qrels = spark.createDataFrame(
        [(1, 10, 2), (1, 11, 1), (2, 10, 0)],   # query 2: idcg 0
        "query_id long, vec_id long, rel long")
    got = {r.query_id: r.ndcg_x1e6
           for r in ndcg_at_k(res, qrels, k=3).collect()}
    assert got == {1: 1_000_000}


def test_ngram_containment_plan_cartesian_free(spark, sf_dir):
    """Candidates come from an EQUALITY join on the shingle key (A's
    rarest prefix vs the full inverted index) — never a cross join."""
    from cascading_flink_spark.extensions import ngram_containment_pairs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _plan(ngram_containment_pairs(docs, n=3, threshold=0.6))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


# --------------------------------------------------- classifier_auc

def _auc_model(pairs):
    """Brute-force tie-correct Mann-Whitney, integer-exact."""
    pos = [s for s, l in pairs if l == 1]
    neg = [s for s, l in pairs if l == 0]
    num2 = sum(2 if p > n else (1 if p == n else 0)
               for p in pos for n in neg)
    return num2 * 1_000_000 // (2 * len(pos) * len(neg))


def test_classifier_auc_matches_bruteforce_model(spark):
    import random
    from cascading_flink_spark.extensions import classifier_auc
    rng = random.Random(31)
    rows = [(i, "g%d" % (i % 3), rng.randrange(20), rng.randrange(2))
            for i in range(300)]
    df = spark.createDataFrame(rows,
                               "id long, g string, s int, label int")
    got = {r.g: (r.auc_x1e6, r.n_pos, r.n_neg)
           for r in classifier_auc(df, "s", "label", group_col="g")
           .collect()}
    for g in ("g0", "g1", "g2"):
        sub = [(s, l) for _, gg, s, l in rows if gg == g]
        np_, nq_ = sum(l for _, l in sub), sum(1 - l for _, l in sub)
        assert got[g] == (_auc_model(sub), np_, nq_)


def test_classifier_auc_endpoints_and_one_class(spark):
    from cascading_flink_spark.extensions import classifier_auc
    rows = [  # g=perfect: all pos above all neg; g=rev: reversed;
              # g=tied: every score equal; g=onecls: positives only
        ("perfect", 10, 1), ("perfect", 9, 1), ("perfect", 2, 0),
        ("perfect", 1, 0),
        ("rev", 1, 1), ("rev", 2, 1), ("rev", 9, 0), ("rev", 10, 0),
        ("tied", 5, 1), ("tied", 5, 0), ("tied", 5, 1), ("tied", 5, 0),
        ("onecls", 3, 1), ("onecls", 4, 1),
    ]
    df = spark.createDataFrame(rows, "g string, s int, label int")
    got = {r.g: r.auc_x1e6
           for r in classifier_auc(df, "s", "label", group_col="g")
           .collect()}
    assert got == {"perfect": 1_000_000, "rev": 0, "tied": 500_000}


def test_classifier_auc_plan_windows_reduced_frame(spark, sf_dir):
    """The cumsum window must run over the (group, distinct score)
    partial-agg frame, not the raw rows: exactly two hash exchanges
    ((g, score) partials, then g), no single-partition exchange, and a
    column-pruned scan."""
    from cascading_flink_spark.extensions import classifier_auc
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "lang", "n_chars") \
        .withColumn("label", (F.col("doc_id") % 5 < 2).cast("int"))
    p = _plan(classifier_auc(docs, "n_chars", "label", group_col="lang"))
    assert p.count("Exchange hashpartitioning") == 2
    assert "Exchange SinglePartition" not in p
    # children print below their parent: the (lang, __s) partial-agg
    # exchange must sit BELOW the Window (the window consumes the
    # reduced frame), and the window must order by the distinct-score
    # column, not a raw one
    assert p.index("Window") < p.rindex("Exchange hashpartitioning")
    assert ", __s#" in p[p.index("windowspecdefinition"):
                         p.index("windowspecdefinition") + 120]


def test_classifier_auc_rejects_bad_labels(spark):
    from cascading_flink_spark.extensions import classifier_auc
    df = spark.createDataFrame([("g", 1, 2)], "g string, s int, label int")
    with pytest.raises(Exception, match="labels must be 0/1"):
        classifier_auc(df, "s", "label", group_col="g").collect()


# --------------------------------------------- ngram_containment_pairs

def test_ngram_containment_catches_superset_jaccard_misses(spark):
    """The motivating case: a short doc engulfed by a long one has
    containment 1.0 but Jaccard 0.5 — a 0.8 Jaccard dedup misses it,
    the directed containment pair catches exactly one direction."""
    from cascading_flink_spark.extensions import (ngram_containment_pairs,
                                                  ngram_jaccard_pairs)
    rows = [(1, "a b c d e"),                 # 3 shingles, all inside 2
            (2, "a b c d e f g h"),           # 6 shingles
            (3, "x y z w v u")]               # unrelated
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): (r.n_common, r.containment)
           for r in ngram_containment_pairs(df, n=3,
                                            threshold=0.8).collect()}
    assert got == {(1, 2): (3, 1.0)}
    assert ngram_jaccard_pairs(df, n=3, threshold=0.8).count() == 0


def test_ngram_containment_mutual_on_equal_docs(spark):
    from cascading_flink_spark.extensions import ngram_containment_pairs
    rows = [(1, "p q r s"), (2, "p q r s")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.containment
           for r in ngram_containment_pairs(df, n=3,
                                            threshold=0.9).collect()}
    assert got == {(1, 2): 1.0, (2, 1): 1.0}


def test_ngram_containment_threshold_boundary(spark):
    """A doc sharing exactly t of its shingles must survive at == t
    (the epsilon guard on the prefix length)."""
    from cascading_flink_spark.extensions import ngram_containment_pairs
    # doc 1: 5 shingles, 4 shared with doc 2 -> containment 0.8 exactly
    rows = [(1, "a b c d e f g"),             # shingles: abc bcd cde def efg
            (2, "a b c d e f x y z")]         # abc bcd cde def + others
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.containment
           for r in ngram_containment_pairs(df, n=3,
                                            threshold=0.8).collect()}
    assert got.get((1, 2)) == 0.8


# ------------------------------------------------------ kcenter_select

def _kcenter_model(vecs: dict, k: int, scale: int = 1_000_000):
    """Plain-Python farthest-point twin of kcenter_select."""
    import hashlib

    def r(x):  # Spark F.round = HALF_UP on doubles
        import decimal
        return int(decimal.Decimal(repr(x)).quantize(
            0, rounding=decimal.ROUND_HALF_UP))

    sv = {i: [r(x * scale) for x in v] for i, v in vecs.items()}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    first = min(sv, key=lambda i: (
        hashlib.md5(str(i).encode()).hexdigest(), i))
    state = {i: [d2(v, sv[first]), first, 1] for i, v in sv.items()}
    for rk in range(2, k + 1):
        far = max(state, key=lambda i: (state[i][0], -i))
        for i, v in sv.items():
            nd = d2(v, sv[far])
            if nd < state[i][0]:
                state[i] = [nd, far, rk]
    return {i: tuple(s) for i, s in state.items()}


def test_kcenter_matches_python_model(spark):
    import random
    from cascading_flink_spark.extensions import kcenter_select
    rng = random.Random(23)
    vecs = {i: [rng.uniform(-1, 1) for _ in range(8)] for i in range(40)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id long, embedding array<double>")
    got = {r.vec_id: (r.dist_x, r.center, r.center_rank)
           for r in kcenter_select(df, k=5, vec_col="embedding")
           .collect()}
    assert got == _kcenter_model(vecs, 5)


def test_kcenter_validation(spark):
    from cascading_flink_spark.extensions import kcenter_select
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        kcenter_select(df, k=2)
    with pytest.raises(ValueError, match="k must"):
        kcenter_select(df, k=0)


# ------------------------------------------------------ session_funnel

def test_session_funnel_hand_fixture(spark):
    """Strictly-ordered prefix within ONE session: wrong order, equal
    timestamps, and cross-session step pairs must not count."""
    import datetime
    from cascading_flink_spark.extensions import session_funnel

    def ts(s):
        return datetime.datetime(2024, 1, 1, 0, 0, 0) \
            + datetime.timedelta(seconds=s)

    rows = [
        # u1: clean view -> click -> purchase, one session
        (1, 1, ts(0), "view"), (1, 2, ts(10), "click"),
        (1, 3, ts(20), "purchase"),
        # u2: click BEFORE view, purchase after — click leg must fail
        (2, 4, ts(0), "click"), (2, 5, ts(10), "view"),
        (2, 6, ts(20), "purchase"),
        # u3: click at the SAME instant as view — not strictly after
        (3, 7, ts(0), "view"), (3, 8, ts(0), "click"),
        # u4: view and click in DIFFERENT sessions (gap > gap_us)
        (4, 9, ts(0), "view"), (4, 10, ts(5000), "click"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
              "event_type string")
    out = {r.step_name: r.n_sessions for r in session_funnel(
        df, ["view", "click", "purchase"],
        gap_us=1000 * 1_000_000).collect()}
    assert out == {"view": 4, "click": 1, "purchase": 1}


def test_session_funnel_rejects_quoted_step_names(spark):
    from cascading_flink_spark.extensions import session_funnel
    df = spark.createDataFrame(
        [(1, 1, __import__("datetime").datetime(2024, 1, 1), "a")],
        "user_id long, event_id long, ts timestamp, event_type string")
    with pytest.raises(ValueError, match="quotes"):
        session_funnel(df, ["it's"])


def test_session_funnel_single_hash_exchange(spark, sf_dir):
    """The whole composition — session window + every funnel-stage
    window + the per-session rollup — must ride ONE hash exchange on
    user_id (the stage windows refine the same partitioning)."""
    from cascading_flink_spark.extensions import session_funnel
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    p = _plan(session_funnel(ev, ["view", "click", "purchase"],
                             gap_us=6 * 3600 * 1_000_000))
    assert p.count("Exchange hashpartitioning") == 1


# -------------------------------------------------- bm25_multi_scores

def test_bm25_multi_matches_single_query(spark, sf_dir):
    """Each query's scores out of the one-pass batch operator equal the
    single-query bm25_scores exactly."""
    from cascading_flink_spark.extensions import (bm25_multi_scores,
                                                  bm25_scores)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    multi = bm25_multi_scores(docs, {7: ["the", "data"], 9: ["data"]})
    got7 = {r.doc_id: r.score_x10000 for r in multi
            .filter(F.col("query_id") == 7).collect()}
    got9 = {r.doc_id: r.score_x10000 for r in multi
            .filter(F.col("query_id") == 9).collect()}
    want7 = {r.doc_id: r.score_x10000
             for r in bm25_scores(docs, ["the", "data"]).collect()}
    want9 = {r.doc_id: r.score_x10000
             for r in bm25_scores(docs, ["data"]).collect()}
    assert got7 == want7 and got9 == want9 and want7 and want9


def test_bm25_multi_scan_count_independent_of_query_count(spark, sf_dir):
    """The corpus-pass count must not grow with |queries| — the whole
    point of the batch operator (the per-query grid join is a
    broadcast of a bounded literal)."""
    from cascading_flink_spark.extensions import bm25_multi_scores
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    one = _plan(bm25_multi_scores(docs, {0: ["the"]}))
    five = _plan(bm25_multi_scores(
        docs, {i: ts for i, ts in enumerate(
            [["the"], ["data"], ["model"], ["system"], ["the", "data"]])}))
    assert one.count("Scan parquet") == five.count("Scan parquet")
    assert "BroadcastHashJoin" in five


def test_bm25_multi_validation(spark):
    from cascading_flink_spark.extensions import bm25_multi_scores
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_multi_scores(df, {})
    with pytest.raises(ValueError, match="term"):
        bm25_multi_scores(df, {0: []})


# ----------------------- flagship margin drop set: no broadcast hint

def test_flagship_margin_drop_join_not_force_broadcast(spark, sf_dir):
    """VERDICT r10 #5: the mined-pair drop set is data-bounded (pivot
    slice size), so the left_anti must NOT carry an explicit broadcast
    hint — AQE picks the strategy.  Assert on the ANALYZED plan: no
    hint survives above the margin-stage anti join (physical broadcast
    chosen by size/AQE is fine)."""
    from cascading_flink_spark.extensions.curation import curate_corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 20 == 0).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    _, stages = curate_corpus(
        corpus, bench,
        gopher_kwargs=dict(min_words=30, max_words=120,
                           min_mean_word_len_x100=300,
                           max_mean_word_len_x100=450, min_stop_hits=1),
        blocklist_terms=["dup"], url_col=None, use_md5=True,
        total_budget=8000, test_frac=0.2, context_len=512,
        margin_kwargs=dict(side_a="en", k=4, threshold_x1e4=9000, dim=16),
        return_stages=True)
    analyzed = (stages["margin_mined"]._jdf.queryExecution()
                .analyzed().toString())
    assert "UnresolvedHint" not in analyzed
    assert "ResolvedHint (strategy=broadcast)" not in analyzed
