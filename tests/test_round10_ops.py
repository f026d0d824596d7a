"""Round-10 fixes and operators: ADVICE-r9 guards (cohort_retention
epoch scope, pagerank seed validation, dsir_score_expr length check),
margin_mine's banded default, pagerank dangling-mass redistribution,
DSIR mixture-of-targets."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from cascading_flink_spark.extensions import (
    cohort_retention, dsir_bucket_weights, dsir_score_expr,
    dsir_weight_array, margin_candidates, margin_mine, pagerank,
)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


# ------------------------------------------- cohort_retention epoch scope

def test_cohort_retention_drops_negative_epochs(spark):
    wk = 7 * 86400 * 1_000_000
    rows = [
        # user 1: one pre-1970 event (must be IGNORED) + week-1 activity
        (1, datetime.datetime(1969, 12, 30)),
        (1, datetime.datetime(1970, 1, 10)),
        # user 2: week-1 and week-2 activity
        (2, datetime.datetime(1970, 1, 9)),
        (2, datetime.datetime(1970, 1, 16)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.cohort_period, r.period_offset): r.n_users
           for r in cohort_retention(df, period_us=wk).collect()}
    # both users cohort at period 1 (Jan 8-14); the 1969 event neither
    # creates a period -1/0 cohort nor pulls user 1 earlier
    assert out == {(1, 0): 2, (1, 1): 1}


def test_cohort_retention_epoch_boundary_row_kept(spark):
    wk = 7 * 86400 * 1_000_000
    df = spark.createDataFrame(
        [(1, datetime.datetime(1970, 1, 1))], "user_id long, ts timestamp")
    out = cohort_retention(df, period_us=wk).collect()
    assert len(out) == 1 and out[0].cohort_period == 0


# ------------------------------------------------ pagerank seed validation

def test_pagerank_raises_on_seed_missing_from_graph(spark):
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    with pytest.raises(Exception, match="seed must appear in the graph"):
        pagerank(e, iterations=1, seeds=[0, 99]).collect()


def test_pagerank_raises_on_duplicate_seeds(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="distinct"):
        pagerank(e, iterations=1, seeds=[0, 0])


def test_pagerank_seeded_still_green_when_seeds_present(spark):
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)],
                              "src long, dst long")
    out = {r.node: r.rank_x
           for r in pagerank(e, iterations=2, seeds=[0]).collect()}
    assert set(out) == {0, 1, 2} and out[0] > 0


# -------------------------------------- pagerank dangling redistribution

@pytest.mark.slow  # r15: heavy, round-close full gate only
def test_pagerank_redistribute_preserves_mass_within_truncation(spark):
    """Chain 0->1->2: node 2 is dangling.  With redistribute, total mass
    stays within n-per-DIV truncation loss of scale each iteration;
    with drop it visibly shrinks."""
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    it = 3
    kept = sum(r.rank_x for r in pagerank(
        e, iterations=it, dangling="redistribute").collect())
    dropped = sum(r.rank_x for r in pagerank(
        e, iterations=it, dangling="drop").collect())
    scale = 1_000_000
    # each iteration loses < 3 units per node to the three DIVs
    assert scale - kept < it * 3 * 3 + 3
    assert dropped < kept  # drop really drops mass


@pytest.mark.slow  # r15: heavy, round-close full gate only
def test_pagerank_redistribute_no_danglers_equals_drop(spark):
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 0)],
                              "src long, dst long")
    a = sorted(map(tuple, pagerank(e, iterations=3,
                                   dangling="redistribute").collect()))
    b = sorted(map(tuple, pagerank(e, iterations=3).collect()))
    assert a == b


def test_pagerank_dangling_validation(spark):
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="dangling"):
        pagerank(e, dangling="bounce")


# ------------------------------------------- dsir_score_expr length check

def test_dsir_score_expr_rejects_wrong_length_weight_array():
    with pytest.raises(ValueError, match="len\\(lr\\)"):
        dsir_score_expr(F.lit("hello world"), [0, 0, 0], c0=0, buckets=8)


# ----------------------------------------------- margin_mine banded default

def test_margin_candidates_plan_has_no_cartesian(spark, sf_dir):
    """The DEFAULT candidate stage (the only stage whose shape changes
    with the candidate strategy — downstream margin math is checkpoint-
    pinned and identical on every path) must be banded equality joins,
    never a cross join.  margin_mine's internal localCheckpoint
    truncates ITS executed plan to a Scan ExistingRDD, so the assertion
    targets the candidate frame the default routes through."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.filter("vec_id % 2 = 0")
    b = emb.filter("vec_id % 2 = 1")
    p = _plan(margin_candidates(a, b))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "Generate posexplode" in p  # the banded signature explode


def test_margin_mine_default_routes_through_banded_candidates(spark, sf_dir):
    """Default output == explicitly passing margin_candidates — proves
    the no-args spelling mines over the banded graph, not a cross
    join, and finds a non-trivial pair set on the near-dup corpus."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    a = emb.filter("vec_id % 2 = 0")
    b = emb.filter("vec_id % 2 = 1")
    dflt = sorted(map(tuple, margin_mine(
        a, b, k=4, threshold_x1e4=10000).collect()))
    viac = sorted(map(tuple, margin_mine(
        a, b, k=4, threshold_x1e4=10000,
        candidates=margin_candidates(a, b)).collect()))
    assert dflt == viac and dflt
    for id_a, id_b, *_ in dflt:
        assert id_a % 2 == 0 and id_b % 2 == 1


def test_margin_mine_candidates_and_exact_mutually_exclusive(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cand = emb.selectExpr("vec_id AS id_a", "vec_id + 1 AS id_b")
    with pytest.raises(ValueError, match="not both"):
        margin_mine(emb, emb, candidates=cand, exact=True)


# ----------------------------------- label_propagation / k_core

def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: by round 3 each clique
    carries its own minimum id as the community label — the
    within-clique majority (3 votes) outvotes the bridge (1 vote) once
    labels start agreeing.  (3-cliques would NOT separate: in round 1
    every neighbour label is distinct, so the min tie-break leaks the
    bridge label into the far clique — a known property of the
    min-tie-break variant, and why the fixture uses 4-cliques.)"""
    from cascading_flink_spark.extensions import label_propagation
    import itertools
    cl1 = list(itertools.combinations([0, 1, 2, 3], 2))
    cl2 = list(itertools.combinations([10, 11, 12, 13], 2))
    bridge = [(3, 10)]
    e = spark.createDataFrame(cl1 + cl2 + bridge, "src long, dst long")
    out = {r.node: r.label
           for r in label_propagation(e, iterations=3).collect()}
    assert all(out[v] == 0 for v in (0, 1, 2, 3)), out
    assert all(out[v] == 10 for v in (10, 11, 12, 13)), out


def test_label_propagation_validation(spark):
    from cascading_flink_spark.extensions import label_propagation
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="iterations"):
        label_propagation(e, iterations=0)


def test_k_core_peels_tendrils_keeps_clique(spark):
    """A 4-clique with a pendant chain: the 3-core is exactly the
    clique (every member at degree 3); the chain peels away, and the
    peel CASCADES (the chain's inner node only drops once its outer
    neighbour is gone — needs >1 round)."""
    from cascading_flink_spark.extensions import k_core
    clique = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]
    chain = [(3, 4), (4, 5)]
    e = spark.createDataFrame(clique + chain, "src long, dst long")
    out = {r.node: r.deg for r in k_core(e, k=3, rounds=4).collect()}
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_k_core_validations(spark):
    from cascading_flink_spark.extensions import k_core
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="k must"):
        k_core(e, k=0)
    with pytest.raises(ValueError, match="rounds"):
        k_core(e, rounds=0)


# ----------------------------------- graph family: no single-task stages

@pytest.mark.slow  # r15: heavy, round-close full gate only
def test_graph_family_plans_have_no_single_partition_exchange(spark, sf_dir):
    """The scaling claim (README graph rows) rests on every shuffle
    hash-partitioning across the cluster: a SinglePartition exchange or
    a partition-less window would serialize an iteration at 1000x.
    triangle_count/hits/pagerank executed plans must contain neither
    (the broadcast 1-row aggregates plan as BroadcastExchange, which is
    fine and expected)."""
    from cascading_flink_spark.extensions import hits, triangle_count
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    edges = ev.select(
        (F.col("user_id") % 50).alias("src"),
        ((F.col("user_id") * 7 + F.col("event_id")) % 50).alias("dst"))
    from cascading_flink_spark.extensions import (
        bfs_distances, connected_components, k_core, label_propagation,
        link_candidates)
    for df in (pagerank(edges, iterations=2),
               pagerank(edges, iterations=2, dangling="redistribute"),
               hits(edges, iterations=1),
               triangle_count(edges),
               label_propagation(edges, iterations=2),
               k_core(edges, k=3, rounds=2),
               bfs_distances(edges, seeds=[0, 1], max_hops=2),
               connected_components(edges, rounds=2),
               link_candidates(edges, min_common=2)):
        p = _plan(df)
        assert "Exchange SinglePartition" not in p, p[:2000]
        assert "Window" not in p


# ---------------------------------------------- weighted_sample

def test_weighted_sample_is_seeded_and_exact_k(spark):
    from cascading_flink_spark.extensions import weighted_sample
    df = spark.createDataFrame([(i, i % 5 + 1) for i in range(40)],
                               "doc_id long, w long")
    a = sorted(r.doc_id for r in weighted_sample(df, "w", k=10).collect())
    b = sorted(r.doc_id for r in weighted_sample(df, "w", k=10).collect())
    c = sorted(r.doc_id for r in weighted_sample(
        df, "w", k=10, seed="other").collect())
    assert a == b and len(a) == 10 and len(set(a)) == 10
    assert a != c  # a fresh seed is an independent draw


def test_weighted_sample_favours_heavy_rows(spark):
    """ES property: one row carrying ~99% of the total weight wins the
    k=1 draw for most seeds (exact p would be 0.99 per draw)."""
    from cascading_flink_spark.extensions import weighted_sample
    df = spark.createDataFrame([(0, 2970)] + [(i, 1) for i in range(1, 31)],
                               "doc_id long, w long")
    wins = sum(
        weighted_sample(df, "w", k=1, seed=f"s{j}").collect()[0].doc_id == 0
        for j in range(12))
    assert wins >= 9  # P(<9 of 12 at p=.99) is astronomically small


def test_weighted_sample_plan_is_take_ordered(spark, sf_dir):
    from cascading_flink_spark.extensions import weighted_sample
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _plan(weighted_sample(docs.select("doc_id", "n_chars"),
                              "n_chars", k=50))
    assert "TakeOrderedAndProject" in p
    assert "Exchange hashpartitioning" not in p


def test_weighted_sample_grouped_exact_k_and_short_groups(spark):
    from cascading_flink_spark.extensions import weighted_sample
    rows = [(i, "big", 1 + i % 3) for i in range(20)] + \
           [(100, "tiny", 5), (101, "tiny", 5)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w long")
    out = {}
    for r in weighted_sample(df, "w", k=4, group_col="g").collect():
        out.setdefault(r.g, set()).add(r.doc_id)
    assert len(out["big"]) == 4
    assert out["tiny"] == {100, 101}  # short group returns all rows


def test_weighted_sample_grouped_plan_window_group_limit(spark, sf_dir):
    from cascading_flink_spark.extensions import weighted_sample
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _plan(weighted_sample(docs.select("doc_id", "lang", "n_chars"),
                              "n_chars", k=10, group_col="lang"))
    assert "WindowGroupLimit" in p


def test_weighted_sample_validations(spark):
    from cascading_flink_spark.extensions import weighted_sample
    df = spark.createDataFrame([(1, 0)], "doc_id long, w long")
    with pytest.raises(ValueError, match="k must"):
        weighted_sample(df, "w", k=0)
    with pytest.raises(Exception, match="positive"):
        weighted_sample(df, "w", k=1).collect()


# ------------------------------------------------- corpus_drift

def test_corpus_drift_exact_tv_disjoint_and_identical(spark):
    from cascading_flink_spark.extensions import corpus_drift
    # disjoint vocab: each slice is TV 0.5 from the pooled corpus
    df = spark.createDataFrame([("a", "x x"), ("b", "y y")],
                               "source string, text string")
    out = {r.slice: (r.n_tokens, r.vocab, r.tv_x1e6)
           for r in corpus_drift(df).collect()}
    assert out == {"a": (2, 1, 500_000), "b": (2, 1, 500_000)}
    # identical slices: zero drift
    same = spark.createDataFrame([("a", "x y"), ("b", "x y")],
                                 "source string, text string")
    outs = {r.slice: r.tv_x1e6 for r in corpus_drift(same).collect()}
    assert outs == {"a": 0, "b": 0}


def test_corpus_drift_absent_terms_contribute_q(spark):
    """Slice a = 'x', slice b = 'x y': corpus q(x)=2/3, q(y)=1/3.
    a: p(x)=1, TV = (|1-2/3| + |0-1/3|)/2 = 1/3."""
    from cascading_flink_spark.extensions import corpus_drift
    df = spark.createDataFrame([("a", "x"), ("b", "x y")],
                               "source string, text string")
    out = {r.slice: r.tv_x1e6 for r in corpus_drift(df).collect()}
    assert out["a"] == 333_333
    assert out["b"] in (166_666, 166_667)  # truncation of 1/6


def test_corpus_drift_reference_union_support(spark):
    """Slice 'x z' vs reference 'x y': q(x)=q(y)=1/2; slice-only z
    contributes full p=1/2, reference-only y full q=1/2.
    TV = (|1/2-1/2| + |1/2-0| + |0-1/2|)/2 = 1/2."""
    from cascading_flink_spark.extensions import corpus_drift
    df = spark.createDataFrame([("a", "x z")], "source string, text string")
    ref = spark.createDataFrame([("r", "x y")], "source string, text string")
    out = corpus_drift(df, reference=ref).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.slice, r.n_tokens, r.vocab, r.tv_x1e6) == ("a", 2, 2, 500_000)
    # identical reference -> zero drift
    z = corpus_drift(df, reference=df).collect()[0]
    assert z.tv_x1e6 == 0


def test_corpus_drift_validation(spark):
    from cascading_flink_spark.extensions import corpus_drift
    df = spark.createDataFrame([("a", "x")], "source string, text string")
    with pytest.raises(ValueError, match="scale"):
        corpus_drift(df, scale=1000)


# ------------------------------------------- quantile_normalize

def test_quantile_normalize_grouped_endpoints_and_ties(spark):
    from cascading_flink_spark.extensions import quantile_normalize
    rows = [(1, "a", 10.0), (2, "a", 20.0), (3, "a", 20.0),
            (4, "a", 30.0), (5, "b", 99.0)]
    df = spark.createDataFrame(rows, "doc_id long, g string, s double")
    out = {r.doc_id: r.q_x1e6 for r in quantile_normalize(
        df, "s", id_col="doc_id", group_col="g").collect()}
    # group a: ranks 1..4 -> 0, 333333, 666666, 1000000 (tie 20.0
    # breaks by doc_id: 2 before 3); singleton group b -> 0
    assert out == {1: 0, 2: 333_333, 3: 666_666, 4: 1_000_000, 5: 0}


@pytest.mark.slow  # r15: heavy, round-close full gate only
def test_quantile_normalize_global_matches_grouped_single_group(spark):
    from cascading_flink_spark.extensions import quantile_normalize
    rows = [(i, float(i * 7 % 13)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, s double")
    glob = {r.doc_id: r.q_x1e6 for r in quantile_normalize(
        df, "s", id_col="doc_id", group_col=None).collect()}
    one = {r.doc_id: r.q_x1e6 for r in quantile_normalize(
        df.withColumn("g", F.lit("x")), "s", id_col="doc_id",
        group_col="g").collect()}
    assert glob == one and len(glob) == 40
    assert min(glob.values()) == 0 and max(glob.values()) == 1_000_000


def test_quantile_normalize_grouped_window_plan_single_exchange(spark,
                                                                sf_dir):
    """The opt-in strategy='window' path keeps its one-shuffle plan."""
    from cascading_flink_spark.extensions import quantile_normalize
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = _plan(quantile_normalize(docs, "n_chars", group_col="lang",
                                 strategy="window"))
    assert "Exchange SinglePartition" not in p
    assert p.count("Exchange hashpartitioning") == 1


def test_quantile_normalize_grouped_default_no_megakey_sort(spark):
    """The DEFAULT grouped path must never sort a whole group in one
    task: one group = 90% of the rows, and the plan's only windows over
    the fact table partition by (group, __bk) — a window partitioned by
    the group alone with the score in its ORDER BY is the mega-key sort
    this strategy exists to avoid."""
    import re
    from cascading_flink_spark.extensions import quantile_normalize
    rows = [(i, "hot" if i % 10 else f"g{i % 7}",
             float((i * 37) % 211)) for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, g string, s double")
    out = quantile_normalize(df, "s", id_col="doc_id", group_col="g",
                             buckets=8, sample_cap=64)
    p = _plan(out)
    assert "Exchange SinglePartition" not in p
    assert not re.findall(r"windowspecdefinition\(g#\d+, (?!__bk)", p)
    # and the bucketed result equals the naive window twin exactly
    a = {r.doc_id: r.q_x1e6 for r in out.collect()}
    b = {r.doc_id: r.q_x1e6
         for r in quantile_normalize(df, "s", id_col="doc_id",
                                     group_col="g",
                                     strategy="window").collect()}
    assert a == b


def test_grouped_rank_matches_window_rank(spark):
    """grouped_rank == row_number() OVER (PARTITION BY g ORDER BY s, id)
    for ANY boundary count, including buckets=1 (no boundaries) and
    more buckets than rows."""
    from cascading_flink_spark.extensions import grouped_rank
    rows = [(i, f"g{i % 3}", float((i * 13) % 7)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, g string, s double")
    w = Window.partitionBy("g").orderBy(F.col("s").asc(),
                                        F.col("doc_id").asc())
    want = {r.doc_id: r.rk for r in df.withColumn(
        "rk", F.row_number().over(w).cast("long")).collect()}
    for bk, cap in [(1, 16), (4, 8), (128, 4096)]:
        got = {r.doc_id: r.rank_out for r in grouped_rank(
            df, "g", "s", id_col="doc_id", rank_col="rank_out",
            buckets=bk, sample_cap=cap).collect()}
        assert got == want, (bk, cap)


# ------------------------------------------- connected_components

def test_connected_components_two_islands(spark):
    from cascading_flink_spark.extensions import connected_components
    e = spark.createDataFrame([(5, 3), (3, 7), (10, 11)],
                              "src long, dst long")
    out = {r.node: r.comp
           for r in connected_components(e, rounds=3).collect()}
    assert out == {3: 3, 5: 3, 7: 3, 10: 10, 11: 10}


def test_connected_components_horizon_is_hop_bounded(spark):
    """Min labels move one hop per round: on the path 3-2-1-0 the far
    node still carries a stale label at rounds=1 but converges at 3."""
    from cascading_flink_spark.extensions import connected_components
    e = spark.createDataFrame([(3, 2), (2, 1), (1, 0)],
                              "src long, dst long")
    r1 = {r.node: r.comp
          for r in connected_components(e, rounds=1).collect()}
    assert r1 == {0: 0, 1: 0, 2: 1, 3: 2}
    r3 = {r.node: r.comp
          for r in connected_components(e, rounds=3).collect()}
    assert r3 == {0: 0, 1: 0, 2: 0, 3: 0}


def test_connected_components_validation(spark):
    from cascading_flink_spark.extensions import connected_components
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="rounds"):
        connected_components(e, rounds=0)


def test_connected_components_agrees_with_dedup_cc_on_converged_graph(spark):
    """Cross-family pin: on a graph whose diameter fits the horizon,
    hash-min CC and the dedup family's exact union-find clustering
    (same min-member convention) assign identical representatives."""
    from cascading_flink_spark.extensions import connected_components
    from cascading_flink_spark.extensions.dedup import dedup_clusters
    pairs = [(1, 2), (2, 3), (8, 9), (4, 8)]
    e = spark.createDataFrame(pairs, "src long, dst long")
    cc = {r.node: r.comp
          for r in connected_components(e, rounds=4).collect()}
    uf = {r.id: r.cluster_id for r in dedup_clusters(
        spark.createDataFrame(pairs, "id_a long, id_b long")).collect()}
    assert cc == uf


# ------------------------------------------- link_candidates

def test_link_candidates_path_and_triangle(spark):
    from cascading_flink_spark.extensions import link_candidates
    # path 0-1-2: (0,2) share neighbour 1 (deg 2), not adjacent ->
    # jaccard 1.0, adamic-adar = 1e12 DIV round(ln(2)*1e6) = 1/ln2 x1e6
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out = [(r.id_a, r.id_b, r.n_common, r.jaccard_x1e6, r.aa_x1e6)
           for r in link_candidates(e, min_common=1).collect()]
    assert out == [(0, 2, 1, 1_000_000, 1_442_695)]
    # triangle: every pair adjacent -> no predictions
    t = spark.createDataFrame([(0, 1), (1, 2), (0, 2)],
                              "src long, dst long")
    assert link_candidates(t, min_common=1).count() == 0


def test_link_candidates_jaccard_partial_overlap(spark):
    """Square 0-1-2-3-0: (0,2) share {1,3}, degs 2+2, union 2 ->
    jaccard 1.0; same for (1,3)."""
    from cascading_flink_spark.extensions import link_candidates
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (3, 0), (0, 4)],
                              "src long, dst long")
    out = {(r.id_a, r.id_b): (r.n_common, r.jaccard_x1e6, r.aa_x1e6)
           for r in link_candidates(e, min_common=2).collect()}
    # 0 now has deg 3 (extra pendant 4): union(0,2) = 3+2-2 = 3.
    # AA: (0,2) via centers 1,3 (deg 2 each) = 2/ln2 x1e6;
    #     (1,3) via centers 0 (deg 3) and 2 (deg 2) = 1/ln3 + 1/ln2
    assert out == {(0, 2): (2, 666_666, 2_885_390),
                   (1, 3): (2, 1_000_000, 910_239 + 1_442_695)}


def test_link_candidates_degree_cap_suppresses_hub_centers(spark):
    """A star hub above the cap contributes no wedges as CENTER, so
    its leaf pairs are not candidates — but a small center still is."""
    from cascading_flink_spark.extensions import link_candidates
    hub = [(100, i) for i in range(5)]  # deg 5 > cap 4
    side = [(0, 200), (1, 200)]         # 200 is a small center
    e = spark.createDataFrame(hub + side, "src long, dst long")
    out = {(r.id_a, r.id_b)
           for r in link_candidates(e, min_common=1,
                                    degree_cap=4).collect()}
    # leaf pairs through the capped hub (e.g. (2,3)) are suppressed;
    # (0,1) survives via center 200, and (100,200) via centers 0 and 1
    # (the hub still appears as an ENDPOINT, only its center role is cut)
    assert out == {(0, 1), (100, 200)}
    assert (2, 3) not in out and (3, 4) not in out


def test_link_candidates_validation(spark):
    from cascading_flink_spark.extensions import link_candidates
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="min_common"):
        link_candidates(e, min_common=0)
    with pytest.raises(ValueError, match="degree_cap"):
        link_candidates(e, degree_cap=1)


# ------------------------------------------------ bfs_distances

def test_bfs_distances_chain_layers(spark):
    """Chain 0-1-2-3-4 from seed 0: dist == index, node 4 absent at
    max_hops=3, present at 4; undirected default reaches backwards."""
    from cascading_flink_spark.extensions import bfs_distances
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (3, 4)],
                              "src long, dst long")
    out = {r.node: r.dist
           for r in bfs_distances(e, seeds=[2], max_hops=3).collect()}
    assert out == {2: 0, 1: 1, 3: 1, 0: 2, 4: 2}
    out3 = {r.node: r.dist
            for r in bfs_distances(e, seeds=[0], max_hops=3).collect()}
    assert out3 == {0: 0, 1: 1, 2: 2, 3: 3}  # node 4 unreached
    out4 = {r.node: r.dist
            for r in bfs_distances(e, seeds=[0], max_hops=4).collect()}
    assert out4[4] == 4


def test_bfs_distances_directed_respects_edge_direction(spark):
    from cascading_flink_spark.extensions import bfs_distances
    e = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    out = {r.node: r.dist for r in bfs_distances(
        e, seeds=[1], max_hops=2, directed=True).collect()}
    assert out == {1: 0, 2: 1}  # 0 is upstream only


def test_bfs_distances_multi_seed_takes_min(spark):
    from cascading_flink_spark.extensions import bfs_distances
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (3, 4)],
                              "src long, dst long")
    out = {r.node: r.dist for r in bfs_distances(
        e, seeds=[0, 4], max_hops=2).collect()}
    assert out == {0: 0, 4: 0, 1: 1, 3: 1, 2: 2}


def test_bfs_distances_validations(spark):
    from cascading_flink_spark.extensions import bfs_distances
    e = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="max_hops"):
        bfs_distances(e, seeds=[0], max_hops=0)
    with pytest.raises(ValueError, match="non-empty"):
        bfs_distances(e, seeds=[])
    with pytest.raises(ValueError, match="distinct"):
        bfs_distances(e, seeds=[0, 0])
    with pytest.raises(Exception, match="seed must appear"):
        bfs_distances(e, seeds=[0, 99], max_hops=1).collect()


# ------------------------------------------- sessionize / session_stats

def test_sessionize_gap_boundaries_and_seq(spark):
    """Hand fixture: user 1 has a 3-event burst, a >gap break, then 2
    more; equal-timestamp events share a session and order by id."""
    from cascading_flink_spark.extensions import sessionize
    base = 1_000_000_000
    rows = [
        (1, 10, base), (1, 11, base),          # tie: same session, id order
        (1, 12, base + 50),                    # within gap
        (1, 13, base + 200),                   # > gap of 100 -> session 2
        (1, 14, base + 250),
        (2, 20, base),                         # other key independent
    ]
    df = spark.createDataFrame(
        [(u, i, t) for u, i, t in rows], "user_id long, event_id long, us long"
    ).select("user_id", "event_id",
             F.timestamp_micros(F.col("us")).alias("ts"))
    out = {r.event_id: (r.session_n, r.session_seq)
           for r in sessionize(df, gap_us=100).collect()}
    assert out == {10: (1, 1), 11: (1, 2), 12: (1, 3),
                   13: (2, 1), 14: (2, 2), 20: (1, 1)}


def test_sessionize_gap_is_strictly_greater(spark):
    from cascading_flink_spark.extensions import sessionize
    df = spark.createDataFrame(
        [(1, 1, 0), (1, 2, 100)], "user_id long, event_id long, us long"
    ).select("user_id", "event_id",
             F.timestamp_micros(F.col("us")).alias("ts"))
    out = {r.event_id: r.session_n
           for r in sessionize(df, gap_us=100).collect()}
    assert out == {1: 1, 2: 1}  # gap == gap_us stays in-session


def test_sessionize_drops_null_key_and_ts(spark):
    from cascading_flink_spark.extensions import sessionize
    df = spark.createDataFrame(
        [(1, 1, 0), (None, 2, 0), (1, 3, None)],
        "user_id long, event_id long, us long"
    ).select("user_id", "event_id",
             F.timestamp_micros(F.col("us")).alias("ts"))
    assert [r.event_id for r in sessionize(df).collect()] == [1]


def test_sessionize_validation(spark):
    from cascading_flink_spark.extensions import sessionize
    df = spark.createDataFrame([(1, 1, 0)],
                               "user_id long, event_id long, us long")
    with pytest.raises(ValueError, match="gap_us"):
        sessionize(df, gap_us=0)


def test_session_stats_aggregates_labels(spark):
    from cascading_flink_spark.extensions import session_stats
    base = 1_000_000_000
    rows = [(1, 10, base), (1, 11, base + 50), (1, 12, base + 500)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, us long"
    ).select("user_id", "event_id",
             F.timestamp_micros(F.col("us")).alias("ts"))
    out = {r.session_n: (r.n_events, r.start_us, r.end_us, r.duration_us)
           for r in session_stats(df, gap_us=100).collect()}
    assert out == {1: (2, base, base + 50, 50),
                   2: (1, base + 500, base + 500, 0)}


def test_sessionize_single_window_partitioning(spark, sf_dir):
    """Both labels come out of ONE window pass: exactly one
    hashpartitioning exchange on the key, no SinglePartition."""
    from cascading_flink_spark.extensions import sessionize
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    p = _plan(sessionize(ev))
    assert "Exchange SinglePartition" not in p
    assert p.count("Exchange hashpartitioning") == 1


# ------------------------------------------- session_transitions

def test_session_transitions_counts_and_probs(spark):
    """user 1: a->b->a within gap, then a break, then b->b; user 2
    contributes one a->b.  Expect from a: {b:2} (a->a never adjacent),
    from b: {a:1, b:1} with p = 500000 each."""
    from cascading_flink_spark.extensions import session_transitions
    rows = [
        (1, 1, "a", 0), (1, 2, "b", 10), (1, 3, "a", 20),
        (1, 4, "b", 500),            # gap 480 > 100: no transition
        (1, 5, "b", 550),            # b->b
        (2, 6, "a", 0), (2, 7, "b", 50),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, us long"
    ).select("user_id", "event_id", "event_type",
             F.timestamp_micros(F.col("us")).alias("ts"))
    out = {(r.from_type, r.to_type): (r.n_trans, r.p_x1e6)
           for r in session_transitions(df, gap_us=100).collect()}
    assert out == {("a", "b"): (2, 1_000_000),
                   ("b", "a"): (1, 500_000),
                   ("b", "b"): (1, 500_000)}


def test_session_transitions_broadcasts_totals(spark, sf_dir):
    from cascading_flink_spark.extensions import session_transitions
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    p = _plan(session_transitions(ev))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "Exchange SinglePartition" not in p


def test_session_transitions_validation(spark):
    from cascading_flink_spark.extensions import session_transitions
    df = spark.createDataFrame(
        [(1, 1, "a", 0)], "user_id long, event_id long, event_type string, us long")
    with pytest.raises(ValueError, match="gap_us"):
        session_transitions(df, gap_us=0)


# ------------------------------------------------------ rrf_fuse

def test_rrf_fuse_exact_arithmetic_and_coverage(spark):
    """Hand-computed fusion of two 2-row lists: rank by (sim DESC, id
    ASC), contribution = 1e6 DIV (60 + rank); a candidate surfaced by
    both lists sums both contributions and reports n_lists=2."""
    from cascading_flink_spark.extensions import rrf_fuse
    l1 = spark.createDataFrame(
        [(0, 10, 0.9), (0, 11, 0.8)],
        "query_id long, vec_id long, sim double")
    l2 = spark.createDataFrame(
        [(0, 11, 0.7), (0, 12, 0.6)],
        "query_id long, vec_id long, sim double")
    out = {r.vec_id: (r.rrf_x, r.n_lists)
           for r in rrf_fuse([l1, l2], k=60).collect()}
    r1, r2 = 1_000_000 // 61, 1_000_000 // 62
    assert out == {10: (r1, 1), 11: (r2 + r1, 2), 12: (r2, 1)}


def test_rrf_fuse_rank_ties_break_by_id(spark):
    from cascading_flink_spark.extensions import rrf_fuse
    l1 = spark.createDataFrame(
        [(0, 20, 0.5), (0, 10, 0.5)],
        "query_id long, vec_id long, sim double")
    out = {r.vec_id: r.rrf_x for r in rrf_fuse([l1], k=60).collect()}
    assert out[10] == 1_000_000 // 61 and out[20] == 1_000_000 // 62


def test_rrf_fuse_validations(spark):
    from cascading_flink_spark.extensions import rrf_fuse
    with pytest.raises(ValueError, match="non-empty"):
        rrf_fuse([])
    df = spark.createDataFrame([(0, 1, 0.5)],
                               "query_id long, vec_id long, sim double")
    with pytest.raises(ValueError, match="k must"):
        rrf_fuse([df], k=0)


# ------------------------------------------------ hard_negatives

def test_hard_negatives_strips_gold_and_ranks(spark):
    from cascading_flink_spark.extensions import hard_negatives
    cand = spark.createDataFrame(
        [(0, 10, 0.9), (0, 11, 0.8), (0, 12, 0.7), (0, 13, 0.6)],
        "query_id long, vec_id long, sim double")
    gold = spark.createDataFrame([(0, 10)], "query_id long, vec_id long")
    out = [(r.vec_id, r.neg_rank)
           for r in hard_negatives(cand, gold, k=2)
           .orderBy("neg_rank").collect()]
    assert out == [(11, 1), (12, 2)]  # gold 10 stripped, 13 cut by k


def test_hard_negatives_gold_only_strips_its_own_query(spark):
    from cascading_flink_spark.extensions import hard_negatives
    cand = spark.createDataFrame(
        [(0, 10, 0.9), (1, 10, 0.9)],
        "query_id long, vec_id long, sim double")
    gold = spark.createDataFrame([(0, 10)], "query_id long, vec_id long")
    out = {(r.query_id, r.vec_id)
           for r in hard_negatives(cand, gold, k=5).collect()}
    assert out == {(1, 10)}  # (0,10) is gold; (1,10) is a fair negative


def test_hard_negatives_validation(spark):
    from cascading_flink_spark.extensions import hard_negatives
    df = spark.createDataFrame([(0, 1, 0.5)],
                               "query_id long, vec_id long, sim double")
    with pytest.raises(ValueError, match="k must"):
        hard_negatives(df, df, k=0)


# ------------------------------------------------ cluster_split

@pytest.mark.slow  # r15: heavy, round-close full gate only
def test_cluster_split_never_straddles_near_dups(spark, sf_dir):
    """The leakage property itself: every near-dup pair's two docs land
    on the SAME side of the split (group key = shared cluster id)."""
    from __spark_entry__ import q_cluster_split
    from cascading_flink_spark.extensions import ngram_jaccard_pairs
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    split = q_cluster_split(spark, sf_dir)
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.8)
    straddles = (pairs
                 .join(split.select(F.col("doc_id").alias("id_a"),
                                    F.col("split").alias("sa")), "id_a")
                 .join(split.select(F.col("doc_id").alias("id_b"),
                                    F.col("split").alias("sb")), "id_b")
                 .filter("sa != sb").count())
    assert straddles == 0
    sides = {r.split for r in split.select("split").distinct().collect()}
    assert sides == {"train", "test"}  # non-vacuous at sf0.001+


# ------------------------------------------- flagship margin stage

@pytest.mark.slow  # r15: heavy, round-close full gate only
def test_flagship_margin_stage_drops_only_non_pivot_docs(spark, sf_dir):
    from cascading_flink_spark.extensions.curation import curate_corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 20 == 0).select("doc_id", "text")
    corpus = docs.filter(F.col("doc_id") % 20 != 0)
    kw = dict(
        gopher_kwargs=dict(min_words=30, max_words=120,
                           min_mean_word_len_x100=300,
                           max_mean_word_len_x100=450, min_stop_hits=1),
        blocklist_terms=["dup"], url_col=None, use_md5=True,
        total_budget=8000, test_frac=0.2, context_len=512,
        return_stages=True)
    _, plain = curate_corpus(corpus, bench, **kw)
    _, mined = curate_corpus(
        corpus, bench,
        margin_kwargs=dict(side_a="en", k=4, threshold_x1e4=9000, dim=16),
        **kw)
    assert "margin_mined" in mined and "margin_mined" not in plain
    before = {r.doc_id: r.lang for r in plain["deduped"]
              .select("doc_id", "lang").collect()}
    after = {r.doc_id for r in mined["margin_mined"]
             .select("doc_id").collect()}
    dropped = set(before) - after
    assert dropped, "margin stage was vacuous on this corpus"
    assert all(before[d] != "en" for d in dropped)  # pivot side kept


# ------------------------------------------------ dsir_mixture_select

@pytest.fixture(scope="module")
def mixture_docs(spark):
    rows = [
        (1, "alpha alpha beta"),
        (2, "alpha beta beta"),
        (3, "gamma gamma delta"),
        (4, "gamma delta delta"),
        (5, "alpha gamma"),
        (6, "beta delta"),
        # NB: no empty/None doc here on purpose — a featureless doc
        # scores exactly 0, which legitimately outranks real docs whose
        # log-ratio sums are negative (raw bigger than target), so it
        # would nondeterministically crowd the tiny quotas; that edge
        # is pinned by the round-9 dsir_weights tests instead.
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_mixture_exact_quotas_and_disjoint(spark, mixture_docs):
    from cascading_flink_spark.extensions import dsir_mixture_select
    t_a = spark.createDataFrame([(100, "alpha alpha alpha beta")],
                                "doc_id long, text string")
    t_g = spark.createDataFrame([(200, "gamma gamma gamma delta")],
                                "doc_id long, text string")
    out = dsir_mixture_select(
        mixture_docs, targets={"a": t_a, "g": t_g},
        quotas={"a": 2, "g": 2}, buckets=64).collect()
    by_dom = {}
    for r in out:
        by_dom.setdefault(r.domain, []).append(r.doc_id)
    assert sorted(len(v) for v in by_dom.values()) == [2, 2]
    ids = [r.doc_id for r in out]
    assert len(ids) == len(set(ids))  # exactly-once
    # the alpha-heavy docs go to domain a, gamma-heavy to g
    assert set(by_dom["a"]) <= {1, 2, 5}
    assert set(by_dom["g"]) <= {3, 4, 5, 6}


def test_dsir_mixture_sorted_domain_priority(spark, mixture_docs):
    """Two domains with the SAME target corpus: the alphabetically
    first domain claims the top docs, the second gets the next ones
    (disjoint, deterministic)."""
    from cascading_flink_spark.extensions import dsir_mixture_select
    tgt = spark.createDataFrame([(100, "alpha beta")],
                                "doc_id long, text string")
    out = dsir_mixture_select(
        mixture_docs, targets={"z_late": tgt, "a_first": tgt},
        quotas={"z_late": 2, "a_first": 2}, buckets=64).collect()
    a = sorted(r.doc_id for r in out if r.domain == "a_first")
    z = sorted(r.doc_id for r in out if r.domain == "z_late")
    assert len(a) == 2 and len(z) == 2 and not set(a) & set(z)
    # a_first's WORST pick scores >= z_late's best pick (same scorer)
    sc = {r.doc_id: r.logw_x1e6 for r in out}
    assert min(sc[i] for i in a) >= max(sc[i] for i in z)


def test_dsir_mixture_validations(spark, mixture_docs):
    from cascading_flink_spark.extensions import dsir_mixture_select
    with pytest.raises(ValueError, match="non-empty"):
        dsir_mixture_select(mixture_docs, {}, {})
    with pytest.raises(ValueError, match="same keys"):
        dsir_mixture_select(mixture_docs, {"a": mixture_docs},
                            {"b": 1})
    with pytest.raises(ValueError, match="quota"):
        dsir_mixture_select(mixture_docs, {"a": mixture_docs},
                            {"a": 0})


def test_dsir_weight_array_roundtrips_into_score_expr(spark):
    raw = spark.createDataFrame(
        [(1, "aa bb cc"), (2, "dd ee ff")], "doc_id long, text string")
    tgt = spark.createDataFrame([(1, "aa bb")], "doc_id long, text string")
    wt = dsir_bucket_weights(raw, tgt, buckets=16)
    lr, c0 = dsir_weight_array(wt, buckets=16)
    col = dsir_score_expr(F.lit("aa bb"), lr, c0, buckets=16)
    assert raw.select(col.alias("s")).first()["s"] is not None
