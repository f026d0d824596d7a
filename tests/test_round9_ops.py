"""Round-9 operators: DSIR importance resampling (dsir.py), integer
PageRank (graph.py), span-level decontamination (decontam.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from cascading_flink_spark.extensions import (
    contamination_spans, dsir_bucket_weights, dsir_select, dsir_weights,
    pagerank, strip_spans_against,
)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------------------------------ DSIR

@pytest.fixture(scope="module")
def dsir_docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "the quick brown fox likes the quick brown cat"),
        (4, "sphinx of black quartz judge my vow"),
        (5, "the lazy dog sleeps all day the lazy dog"),
        (6, None),
        (7, "   "),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_dsir(raw_rows, tgt_rows, buckets, alpha=1, ngrams=2, seed="dsir"):
    """Reference Python model of dsir_weights' integer recipe."""
    import hashlib

    def feats(text):
        toks = (text or "").strip().lower().split()
        grams = list(toks)
        if ngrams >= 2:
            grams += [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        return [int(hashlib.md5(f"{seed}#{g}".encode()).hexdigest()[:8],
                    16) % buckets for g in grams]

    rf, tf = {}, {}
    rawf = {i: feats(t) for i, t in raw_rows}
    for fs in rawf.values():
        for b in fs:
            rf[b] = rf.get(b, 0) + 1
    for _, t in tgt_rows:
        for b in feats(t):
            tf[b] = tf.get(b, 0) + 1
    lr = {b: math.floor((math.log(tf.get(b, 0) + alpha)
                         - math.log(rf.get(b, 0) + alpha)) * 1e6 + 0.5)
          for b in set(rf) | set(tf)}
    c0 = math.floor((math.log(sum(rf.values()) + alpha * buckets)
                     - math.log(sum(tf.values()) + alpha * buckets))
                    * 1e6 + 0.5)
    out = {}
    for i, fs in rawf.items():
        out[i] = (len(fs), sum(lr[b] for b in fs) + len(fs) * c0)
    return out


def test_dsir_weights_match_python_model(spark, dsir_docs):
    raw = dsir_docs.filter("doc_id % 2 = 1")     # 1,3,5,7
    tgt = dsir_docs.filter("doc_id % 2 = 0")     # 2,4,6
    got = {r.doc_id: (r.n_feats, r.logw_x1e6)
           for r in dsir_weights(raw, tgt, buckets=64).collect()}
    exp = _py_dsir([(r.doc_id, r.text) for r in raw.collect()],
                   [(r.doc_id, r.text) for r in tgt.collect()], buckets=64)
    assert got == exp
    # featureless raw doc scores zero with zero features
    assert got[7] == (0, 0)


def test_dsir_weights_partition_independent(spark, dsir_docs):
    raw = dsir_docs.filter("doc_id % 2 = 1")
    tgt = dsir_docs.filter("doc_id % 2 = 0")
    a = sorted(map(tuple, dsir_weights(raw, tgt, buckets=64).collect()))
    b = sorted(map(tuple, dsir_weights(raw.repartition(5), tgt,
                                       buckets=64).collect()))
    assert a == b


def test_dsir_target_like_docs_score_higher(spark):
    """A raw doc written in the target's vocabulary must outscore one
    written in the raw pool's own vocabulary — the whole point."""
    tgt = spark.createDataFrame(
        [(100 + i, "alpha beta gamma delta epsilon zeta") for i in range(5)],
        "doc_id long, text string")
    raw = spark.createDataFrame(
        [(1, "alpha beta gamma delta"),
         (2, "xylophone quartz vortex jackdaw"),
         (3, "xylophone quartz vortex jackdaw")],
        "doc_id long, text string")
    w = {r.doc_id: r.logw_x1e6
         for r in dsir_weights(raw, tgt, buckets=256).collect()}
    assert w[1] > w[2] == w[3]
    top = dsir_select(raw, tgt, 1, buckets=256).collect()
    assert [r.doc_id for r in top] == [1]


def test_dsir_plan_shapes(spark, dsir_docs):
    """Scoring stays JVM-side: broadcast weight-table join, no Python
    eval, no windows; selection plans as TakeOrderedAndProject."""
    raw = dsir_docs.filter("doc_id % 2 = 1")
    tgt = dsir_docs.filter("doc_id % 2 = 0")
    p = _plan(dsir_weights(raw, tgt, buckets=64))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Window" not in p
    assert "BroadcastHashJoin" in p
    # top-k never plans a global sort: TakeOrderedAndProject carries the
    # ordering (the reattach join may sort-merge locally, which is fine)
    ps = _plan(dsir_select(raw, tgt, 2, buckets=64))
    assert "TakeOrderedAndProject" in ps


def test_dsir_prefitted_weight_table_reuse(spark, dsir_docs):
    raw = dsir_docs.filter("doc_id % 2 = 1")
    tgt = dsir_docs.filter("doc_id % 2 = 0")
    wt = dsir_bucket_weights(raw, tgt, buckets=64)
    a = sorted(map(tuple,
                   dsir_weights(raw, tgt, buckets=64).collect()))
    b = sorted(map(tuple,
                   dsir_weights(raw, tgt, buckets=64,
                                weight_table=wt).collect()))
    assert a == b
    # weight-table invariants: every bucket row carries both counts
    rows = wt.collect()
    assert all(r.t_f >= 0 and r.r_f >= 0 for r in rows)
    assert all(r.t_f + r.r_f > 0 for r in rows)   # only observed buckets


def test_dsir_validations(spark, dsir_docs):
    raw = dsir_docs.filter("doc_id % 2 = 1")
    tgt = dsir_docs.filter("doc_id % 2 = 0")
    with pytest.raises(ValueError):
        dsir_bucket_weights(raw, tgt, buckets=1)
    with pytest.raises(ValueError):
        dsir_bucket_weights(raw, tgt, ngrams=3)
    with pytest.raises(ValueError):
        dsir_bucket_weights(raw, tgt, alpha=0)
    with pytest.raises(ValueError):
        dsir_select(raw, tgt, 0)


# -------------------------------------------------------------- pagerank

def test_pagerank_star_graph_hand_check(spark):
    """3 -> 0, 2 -> 0, 1 -> 0, 0 -> 1 (star into 0, 0 points at 1):
    replay the integer arithmetic by hand for one iteration."""
    edges = spark.createDataFrame(
        [(3, 0), (2, 0), (1, 0), (0, 1)], "src long, dst long")
    out = {r.node: r.rank_x
           for r in pagerank(edges, iterations=1).collect()}
    # n=4, r0 = 250000 each, base = 1000000*15 DIV 400 = 37500
    # contrib per edge = (250000*85) DIV (100*1) = 212500
    assert out == {0: 37500 + 3 * 212500,   # 675000
                   1: 37500 + 212500,        # 250000
                   2: 37500, 3: 37500}


def test_pagerank_deterministic_and_partition_independent(spark):
    rows = [(i % 37, (i * 11 + 3) % 37) for i in range(400)]
    e = spark.createDataFrame(rows, "src long, dst long")
    a = sorted(map(tuple, pagerank(e, iterations=3).collect()))
    b = sorted(map(tuple, pagerank(e.repartition(7),
                                   iterations=3).collect()))
    assert a == b and len(a) == 37


def test_pagerank_mass_and_positivity(spark):
    rows = [(i % 20, (i * 7 + 1) % 20) for i in range(100)]
    e = spark.createDataFrame(rows, "src long, dst long")
    out = pagerank(e, iterations=4).collect()
    total = sum(r.rank_x for r in out)
    # dangling drop + floor loss only ever SHRINK mass
    assert 0 < total <= 1_000_000
    assert all(r.rank_x > 0 for r in out)


def test_pagerank_sink_node_receives_but_never_sends(spark):
    """A pure sink keeps base + incoming; its mass is dropped, not
    redistributed (the documented simplified formulation)."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    out = {r.node: r.rank_x
           for r in pagerank(edges, iterations=2).collect()}
    assert set(out) == {1, 2, 3}
    assert out[3] > out[1]        # sink accumulates, source decays to base


def test_pagerank_plan_no_python_no_window(spark):
    e = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    p = _plan(pagerank(e, iterations=2))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
    assert "Window" not in p


def test_pagerank_validations(spark):
    e = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        pagerank(e, iterations=-1)
    with pytest.raises(ValueError):
        pagerank(e, damping_x100=101)
    with pytest.raises(ValueError):
        pagerank(e, scale=0)


# ------------------------------------------- span-level decontamination

@pytest.fixture(scope="module")
def span_corpus(spark):
    corp = spark.createDataFrame([
        (1, "intro words here THE SECRET BENCHMARK ANSWER trailing prose"),
        (2, "completely original text with no overlap at all whatsoever"),
        (3, "the secret benchmark answer"),           # fully contaminated
        (4, ""),
        (5, None),
    ], "doc_id long, text string")
    ref = spark.createDataFrame([
        (100, "leading context the secret benchmark answer and more"),
    ], "ref_id long, body string")
    return corp, ref


def test_strip_spans_against_semantics(spark, span_corpus):
    corp, ref = span_corpus
    out = {r.doc_id: r for r in strip_spans_against(
        corp, ref, k=4, ref_text_col="body", ref_id_col="ref_id").collect()}
    assert set(out) == {1, 2, 3, 4, 5}                # every row survives
    # case-insensitive gram match removed the quoted span, original case
    # kept elsewhere
    assert out[1].clean_text == "intro words here trailing prose"
    assert out[1].n_tokens_removed == 4
    assert out[2].clean_text == \
        "completely original text with no overlap at all whatsoever"
    assert out[2].n_tokens_removed == 0
    assert out[3].clean_text == "" and out[3].n_tokens_removed == 4
    assert out[4].clean_text == "" and out[4].n_tokens_kept == 0
    assert out[5].clean_text == "" and out[5].n_tokens_removed == 0


def test_strip_spans_token_conservation(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corp = docs.filter("doc_id % 10 <> 0")
    ref = docs.filter("doc_id % 10 = 0")
    out = strip_spans_against(corp, ref, k=4)
    chk = (out.join(corp.select("doc_id", F.when(
                F.trim(F.coalesce("text", F.lit(""))) == "", 0)
            .otherwise(F.size(F.split(F.trim(F.col("text")), r"\s+")))
            .alias("n_total")), "doc_id")
           .filter(F.col("n_tokens_kept") + F.col("n_tokens_removed")
                   != F.col("n_total")))
    assert chk.count() == 0


def test_contamination_spans_islands(spark, span_corpus):
    corp, ref = span_corpus
    spans = contamination_spans(
        corp, ref, k=4, ref_text_col="body", ref_id_col="ref_id").collect()
    by_doc = {r.doc_id: r for r in spans}
    assert set(by_doc) == {1, 3}
    # doc 1: the 4-gram starts at token 3 (0-based), one island of 1 gram
    assert (by_doc[1].span_start, by_doc[1].span_end,
            by_doc[1].span_tokens, by_doc[1].n_grams) == (3, 6, 4, 1)
    assert (by_doc[3].span_start, by_doc[3].span_end) == (0, 3)


def test_span_decontam_corpus_unshuffled_before_probe(spark, span_corpus):
    """broadcast_ref=True keeps the corpus side exchange-free up to the
    gram probe: the only joins are broadcast ones (decontaminate's
    contract, extended to spans)."""
    corp, ref = span_corpus
    p = _plan(contamination_spans(corp, ref, k=4, ref_text_col="body",
                                  ref_id_col="ref_id"))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


# ------------------------------------------------ map-only DSIR scorer

def test_dsir_score_expr_parity_with_join_path(spark, sf_dir):
    """The literal-array fold scores BIT-IDENTICALLY to the broadcast
    join path on real documents — the streaming gate's exactness
    contract."""
    from cascading_flink_spark.extensions import (
        dsir_bucket_weights, dsir_score_expr, dsir_weight_array)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = docs.filter("doc_id % 7 <> 0")
    tgt = docs.filter("doc_id % 7 = 0")
    wt = dsir_bucket_weights(raw, tgt, buckets=256)
    lr, c0 = dsir_weight_array(wt, buckets=256)
    join_path = {r.doc_id: r.logw_x1e6
                 for r in dsir_weights(raw, tgt, buckets=256,
                                       weight_table=wt).collect()}
    map_path = {r.doc_id: r.w for r in raw.select(
        "doc_id", dsir_score_expr(F.col("text"), lr, c0,
                                  buckets=256).alias("w")).collect()}
    assert join_path == map_path and len(join_path) > 50


@pytest.mark.slow  # r15: heavy, round-close full gate only
def test_stream_dsir_gate_parity_and_threshold(spark, sf_dir, tmp_path):
    """The streaming gate admits exactly the batch filter's rows
    (stateless map, no state store), and the score column rides along."""
    from cascading_flink_spark.extensions import (
        dsir_bucket_weights, dsir_weight_array)
    from cascading_flink_spark.streaming import stream_dsir_gate
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = docs.filter("doc_id % 7 <> 0").select("doc_id", "text")
    tgt = docs.filter("doc_id % 7 = 0")
    wt = dsir_bucket_weights(raw, tgt, buckets=256)
    lr, c0 = dsir_weight_array(wt, buckets=256)
    cut = 0
    src = str(tmp_path / "dsir_in")
    raw.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(raw.schema).parquet(src)
    out = stream_dsir_gate(stream, lr, c0, cut, buckets=256)
    q = (out.writeStream.format("memory").queryName("dsir_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {r["doc_id"]: r["logw_x1e6"]
           for r in spark.sql("SELECT * FROM dsir_out").collect()}
    spark.catalog.dropTempView("dsir_out")
    batch = {r["doc_id"]: r["logw_x1e6"]
             for r in stream_dsir_gate(raw, lr, c0, cut,
                                       buckets=256).collect()}
    assert got == batch and got
    # the threshold actually gates: some rows fall below
    assert len(got) < raw.count()
    assert all(v >= cut for v in got.values())


# ------------------------------------------------------------------ HITS

def test_hits_hub_authority_separation(spark):
    """Bipartite-ish graph: 1,2,3 all point at 9 and 10; nothing points
    back.  Sources become pure hubs (auth 0), sinks pure authorities
    (hub 0), and the L-inf rescale puts the max of each vector at
    scale."""
    from cascading_flink_spark.extensions import hits
    edges = spark.createDataFrame(
        [(1, 9), (1, 10), (2, 9), (2, 10), (3, 9)], "src long, dst long")
    out = {r.node: (r.hub_x, r.auth_x)
           for r in hits(edges, iterations=2).collect()}
    assert out[9][0] == 0 and out[10][0] == 0          # sinks: no hub
    assert out[1][1] == 0 and out[2][1] == 0 == out[3][1]
    assert max(h for h, _ in out.values()) == 1_000_000
    assert max(a for _, a in out.values()) == 1_000_000
    # 1 links to both top authorities; 3 only to one -> weaker hub
    assert out[1][0] == out[2][0] > out[3][0]
    # 9 has 3 in-links vs 10's 2 -> stronger authority
    assert out[9][1] > out[10][1]


def test_hits_deterministic_partition_independent(spark):
    from cascading_flink_spark.extensions import hits
    rows = [(i % 23, (i * 5 + 2) % 23) for i in range(150)]
    e = spark.createDataFrame(rows, "src long, dst long")
    a = sorted(map(tuple, hits(e, iterations=2).collect()))
    b = sorted(map(tuple, hits(e.repartition(6), iterations=2).collect()))
    assert a == b and len(a) == 23


def test_hits_plan_and_validations(spark):
    from cascading_flink_spark.extensions import hits
    e = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    p = _plan(hits(e, iterations=1))
    assert "BatchEvalPython" not in p and "Window" not in p
    with pytest.raises(ValueError):
        hits(e, iterations=0)
    with pytest.raises(ValueError):
        hits(e, scale=0)


# ----------------------------------------- group_quantiles approx path

def test_group_quantiles_approx_rank_error_bound(spark, sf_dir):
    """The sketch path honors approx_percentile's rank guarantee: the
    returned value's true rank sits within n/accuracy of ceil(p*n) —
    and the plan has no Window at all (pure partial agg)."""
    from cascading_flink_spark.extensions import group_quantiles
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    acc = 100
    out = group_quantiles(ev, strategy="approx",
                          approx_accuracy=acc)
    rows = out.collect()
    assert rows
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    vals = {}
    for r in ev.select("event_type", "value").filter(
            "value IS NOT NULL").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    for v in vals.values():
        v.sort()
    import bisect
    for r in rows:
        v = vals[r.grp]
        n = len(v)
        true_rank = bisect.bisect_right(v, r.q)
        assert abs(true_rank - r.p * n) <= n / acc + 1, \
            (r.grp, r.p, r.q, true_rank, n)


def test_group_quantiles_rejects_unknown_strategy(spark, sf_dir):
    from cascading_flink_spark.extensions import group_quantiles
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    with pytest.raises(ValueError):
        group_quantiles(ev, strategy="nope")


# ---------------------------------------------- DSIR flagship stage

@pytest.mark.slow  # r15: heavy, round-close full gate only
def test_curation_dsir_stage_selects_and_chains(spark, sf_dir):
    """The opt-in DSIR stage caps the decontaminated corpus at keep_n
    target-like docs; downstream stages run on the selected set only,
    and the stage frame appears in the stages dict."""
    from cascading_flink_spark.extensions import curate_corpus
    from cascading_flink_spark.extensions.text import clean_text_expr
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .withColumn("url", F.lit("https://ex.com/a"))
    cleaned = clean_text_expr(F.coalesce("text", F.lit("")))
    bench = docs.filter("doc_id % 20 = 0").select(
        "doc_id", cleaned.alias("text"))
    target = docs.filter("doc_id % 13 = 0").select(
        "doc_id", cleaned.alias("text"))
    corpus = docs.filter("doc_id % 20 <> 0")
    packed, stages = curate_corpus(
        corpus, bench, use_md5=True, url_col=None,
        gopher_kwargs=dict(min_words=1, max_words=10**6,
                           min_mean_word_len_x100=0,
                           max_mean_word_len_x100=10**6,
                           min_stop_hits=0),
        dsir_kwargs=dict(target=target, keep_n=10, buckets=128),
        total_budget=100000, test_frac=0.2, context_len=64,
        return_stages=True)
    assert "dsir_selected" in stages
    sel = stages["dsir_selected"]
    n_sel = sel.count()
    assert 0 < n_sel <= 10
    assert n_sel <= stages["decontaminated"].count()
    # selected ids are exactly the top-10 dsir weights of the decon set
    from cascading_flink_spark.extensions import dsir_select
    expect = {r.doc_id for r in dsir_select(
        stages["decontaminated"], target, 10, buckets=128).collect()}
    assert {r.doc_id for r in sel.select("doc_id").collect()} == expect
    # the packed output only contains selected docs
    out_ids = {r.doc_id for r in packed.collect()}
    assert out_ids <= expect


# ------------------------------------------------------------ margin_mine

def test_margin_mine_mutual_best_and_hub_deflation(spark):
    """Hand-built geometry: a1/b1 are a clean mutual pair; b_hub is near
    BOTH a2 and a3 (a hub), so even though a2's best is b_hub, the
    margin deflates it below the clean pair's."""
    from cascading_flink_spark.extensions import margin_mine
    import math
    def unit(theta, phi=0.0):
        return [math.cos(theta), math.sin(theta) * math.cos(phi),
                math.sin(theta) * math.sin(phi), 0.0]
    a = spark.createDataFrame([
        (0, unit(0.00)),            # pairs with b 1
        (2, unit(1.00)),            # hub-adjacent
        (4, unit(1.05)),            # hub-adjacent
    ], "vec_id long, embedding array<double>")
    b = spark.createDataFrame([
        (1, unit(0.02)),            # the clean partner of a0
        (3, unit(1.02)),            # the hub: near a2 AND a4
        (5, unit(2.2)),             # far from everything
    ], "vec_id long, embedding array<double>")
    out = {(r.id_a, r.id_b): r.margin_x1e4
           for r in margin_mine(a, b, k=2, threshold_x1e4=0,
                                exact=True).collect()}
    assert (0, 1) in out
    # the hub pair may be mutual-best too, but its margin must be lower
    for pair, m in out.items():
        if pair != (0, 1):
            assert m < out[(0, 1)], (pair, m, out)


def test_margin_mine_candidates_path_matches_exact_on_full_graph(spark, sf_dir):
    """Passing the full cross product as candidates reproduces the
    exact path bit-for-bit (the ANN-candidates hook changes candidate
    GENERATION only, never the margin math)."""
    from cascading_flink_spark.extensions import margin_mine
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.filter("vec_id % 2 = 0").limit(40)
    b = emb.filter("vec_id % 2 = 1").limit(40)
    cand = (a.selectExpr("vec_id AS id_a")
             .crossJoin(b.selectExpr("vec_id AS id_b")))
    exact = sorted(map(tuple, margin_mine(
        a, b, k=3, threshold_x1e4=0, exact=True).collect()))
    viac = sorted(map(tuple, margin_mine(
        a, b, k=3, threshold_x1e4=0, candidates=cand).collect()))
    assert exact == viac and exact


def test_margin_mine_validations(spark, sf_dir):
    from cascading_flink_spark.extensions import margin_mine
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError):
        margin_mine(emb, emb, k=0)


# ---------------------------------------------------------- triangles

def test_triangle_count_hand_graph(spark):
    """K4 minus one edge: nodes {0,1,2,3}, all pairs except (2,3) —
    exactly 2 triangles (0,1,2) and (0,1,3); nodes 0,1 sit in both."""
    from cascading_flink_spark.extensions import triangle_count
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3),
         (1, 0),          # parallel reverse edge collapses
         (2, 2)],         # self loop drops
        "src long, dst long")
    out = {r.node: r.n_triangles
           for r in triangle_count(edges).collect()}
    assert out == {0: 2, 1: 2, 2: 1, 3: 1}


def test_triangle_count_matches_networkx_free_model(spark):
    """Random-ish graph vs a pure-Python triangle counter."""
    from cascading_flink_spark.extensions import triangle_count
    from itertools import combinations
    rows = [((i * 7) % 19, (i * 11 + 3) % 19) for i in range(60)]
    e = spark.createDataFrame(rows, "src long, dst long")
    got = {r.node: r.n_triangles for r in triangle_count(e).collect()}
    adj = {}
    for s, d in rows:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    exp = {n: 0 for n in adj}
    for a, b, c in combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            for n in (a, b, c):
                exp[n] += 1
    assert got == exp


def test_triangle_count_partition_independent_no_python(spark):
    from cascading_flink_spark.extensions import triangle_count
    rows = [((i * 5) % 17, (i * 3 + 1) % 17) for i in range(50)]
    e = spark.createDataFrame(rows, "src long, dst long")
    a = sorted(map(tuple, triangle_count(e).collect()))
    b = sorted(map(tuple, triangle_count(e.repartition(5)).collect()))
    assert a == b
    p = _plan(triangle_count(e))
    assert "BatchEvalPython" not in p and "Window" not in p


# ----------------------------------------------------- cohort retention

def test_cohort_retention_hand_events(spark):
    """Two cohorts: users 1,2 first active week 0 (user 1 returns weeks
    1 and 2, user 2 never returns); user 3 first active week 1."""
    from cascading_flink_spark.extensions import cohort_retention
    W = 7 * 86400
    rows = [(1, 0), (2, 3600), (1, W + 10), (1, 2 * W + 10),
            (3, W + 50), (1, 20)]          # dup week-0 activity collapses
    df = spark.createDataFrame(
        [(u, s) for u, s in rows], "user_id long, secs long"
    ).selectExpr("user_id", "timestamp_seconds(secs) AS ts")
    out = {(r.cohort_period, r.period_offset):
           (r.n_users, r.cohort_size, r.retention_x1e4)
           for r in cohort_retention(df).collect()}
    assert out == {
        (0, 0): (2, 2, 10000),
        (0, 1): (1, 2, 5000),
        (0, 2): (1, 2, 5000),
        (1, 0): (1, 1, 10000),
    }


def test_cohort_retention_offset0_equals_cohort_size(spark, sf_dir):
    from cascading_flink_spark.extensions import cohort_retention
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = cohort_retention(ev).collect()
    assert rows
    for r in rows:
        if r.period_offset == 0:
            assert r.n_users == r.cohort_size and r.retention_x1e4 == 10000
        assert 0 <= r.n_users <= r.cohort_size
    with pytest.raises(ValueError):
        cohort_retention(ev, period_us=0)


# ------------------------------------------------------------ dsir_sample

def test_dsir_sample_gumbel_limits_and_determinism(spark, sf_dir):
    """temperature -> 0 recovers the deterministic top-k; a huge
    temperature drowns the weights in Gumbel noise (selection differs
    from top-k); the draw is seeded/partition-independent."""
    from cascading_flink_spark.extensions import dsir_sample, dsir_select
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = docs.filter("doc_id % 7 <> 0")
    tgt = docs.filter("doc_id % 7 = 0")
    topk = {r.doc_id for r in dsir_select(raw, tgt, 20,
                                          buckets=256).collect()}
    cold = {r.doc_id for r in dsir_sample(raw, tgt, 20,
                                          temperature=1e-9,
                                          buckets=256).collect()}
    assert cold == topk
    hot = {r.doc_id for r in dsir_sample(raw, tgt, 20,
                                         temperature=1e9,
                                         buckets=256).collect()}
    assert hot != topk
    a = {r.doc_id for r in dsir_sample(raw, tgt, 20,
                                       buckets=256).collect()}
    b = {r.doc_id for r in dsir_sample(raw.repartition(7), tgt, 20,
                                       buckets=256).collect()}
    assert a == b and len(a) == 20
    with pytest.raises(ValueError):
        dsir_sample(raw, tgt, 0)
    with pytest.raises(ValueError):
        dsir_sample(raw, tgt, 5, temperature=0)


# ------------------------------------------- personalized/weighted PR

def test_pagerank_personalized_seed_proximity(spark):
    """Chain 0 -> 1 -> 2 -> 3 with seed {0}: replay the seeded integer
    arithmetic by hand for all three iterations (the init pulse travels
    the chain while the teleport base refills only the seed)."""
    from cascading_flink_spark.extensions import pagerank
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3)],
                              "src long, dst long")
    out = {r.node: r.rank_x
           for r in pagerank(e, iterations=3, seeds=[0]).collect()}
    # r0 = [1e6, 0, 0, 0]; base(seed) = 1e6*15 DIV 100 = 150000
    # iter1: [150000, 850000, 0, 0]
    # iter2: [150000, 127500, 722500, 0]
    # iter3: [150000, 127500, 108375, 614125]
    assert out == {0: 150000, 1: 127500, 2: 108375, 3: 614125}
    # unweighted unpersonalized on the same graph differs
    plain = {r.node: r.rank_x for r in pagerank(e, iterations=3).collect()}
    assert plain != out


def test_pagerank_weighted_favors_heavy_edge(spark):
    """0 sends to 1 (weight 9) and 2 (weight 1): node 1 receives 9x
    node 2's contribution, replayed by hand for one iteration."""
    from cascading_flink_spark.extensions import pagerank
    e = spark.createDataFrame([(0, 1, 9), (0, 2, 1)],
                              "src long, dst long, w long")
    out = {r.node: r.rank_x
           for r in pagerank(e, iterations=1, weight_col="w").collect()}
    # n=3, r0 = 333333 each, base = 1000000*15 DIV 300 = 50000
    # contrib(0->1) = (333333*85*9) DIV (100*10) = 254999
    # contrib(0->2) = (333333*85*1) DIV (100*10) = 28333
    assert out == {0: 50000, 1: 50000 + 254999, 2: 50000 + 28333}


def test_pagerank_weight1_equals_unweighted(spark):
    from cascading_flink_spark.extensions import pagerank
    rows = [(i % 13, (i * 5 + 1) % 13, 1) for i in range(60)]
    e = spark.createDataFrame(rows, "src long, dst long, w long")
    a = sorted(map(tuple, pagerank(e, iterations=2,
                                   weight_col="w").collect()))
    b = sorted(map(tuple, pagerank(e.drop("w"), iterations=2).collect()))
    assert a == b
    with pytest.raises(ValueError):
        pagerank(e, seeds=[])


# ------------------------------------------- code-review regressions

def test_dsir_prefitted_table_scores_unseen_buckets(spark):
    """Scoring a NEW shard against a table fitted elsewhere: grams in
    buckets the fit never saw carry lr=0 but still count toward n_feats
    and the n*c0 term — batch must stay bit-identical to the map-only
    scorer (the stream gate) on cross-shard input."""
    from cascading_flink_spark.extensions import (
        dsir_bucket_weights, dsir_score_expr, dsir_weight_array,
        dsir_weights)
    fit_raw = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "beta gamma delta")],
        "doc_id long, text string")
    tgt = spark.createDataFrame(
        [(9, "alpha alpha beta")], "doc_id long, text string")
    wt = dsir_bucket_weights(fit_raw, tgt, buckets=64)
    # the new shard introduces grams the fit never observed
    shard = spark.createDataFrame(
        [(5, "alpha zzz_unseen qqq_nova beta")],
        "doc_id long, text string")
    got = {r.doc_id: (r.n_feats, r.logw_x1e6)
           for r in dsir_weights(shard, tgt, buckets=64,
                                 weight_table=wt).collect()}
    lr, c0 = dsir_weight_array(wt, buckets=64)
    exp = {r.doc_id: (r.n, r.w) for r in shard.select(
        "doc_id",
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("__t"),
        dsir_score_expr(F.col("text"), lr, c0, buckets=64).alias("w"))
        .selectExpr("doc_id", "__t * 2 - 1 AS n", "w").collect()}
    # n_feats = unigrams + bigrams = t + (t-1)
    assert got == exp, (got, exp)
    assert got[5][0] == 7                   # 4 unigrams + 3 bigrams


def test_margin_mine_short_side_uses_actual_counts(spark):
    """One b-vector with k=4: its 'k-sum' covers a single cosine, so a
    perfect mutual pair's margin must be the true avg-based value
    (2*cx*1*1*1e4 DIV (sx*1 + sy*1)), not the 2k-inflated one."""
    from cascading_flink_spark.extensions import margin_mine
    a = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<double>")
    b = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    out = {(r.id_a, r.id_b): r.margin_x1e4
           for r in margin_mine(a, b, k=4, threshold_x1e4=0,
                                exact=True).collect()}
    # pair (0,1): cx=10000; x-side neighbours of 0: only b1 (cx 10000),
    # y-side neighbours of 1: a0 (10000) + a2 (0) -> sy=10000, ny=2
    # margin = (10000*2*1*2*10000) DIV (10000*2 + 10000*1) = 13333
    assert out == {(0, 1): 13333}


def test_pagerank_zero_weight_raises(spark):
    from cascading_flink_spark.extensions import pagerank
    import py4j
    e = spark.createDataFrame([(0, 1, 0)], "src long, dst long, w long")
    with pytest.raises(Exception, match="positive"):
        pagerank(e, iterations=1, weight_col="w").collect()


def test_span_decontam_k_zero_raises(spark, span_corpus):
    corp, ref = span_corpus
    with pytest.raises(ValueError, match="k must be >= 1"):
        strip_spans_against(corp, ref, k=0, ref_text_col="body",
                            ref_id_col="ref_id")
    with pytest.raises(ValueError, match="k must be >= 1"):
        contamination_spans(corp, ref, k=0, ref_text_col="body",
                            ref_id_col="ref_id")
