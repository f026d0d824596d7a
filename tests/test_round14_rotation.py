"""Round-14 registry pins: the driver-window front-50 (dict order is
evidence policy — the driver checks only the first 50 `queries()`
entries), the consolidation retirements, and the oracle-coverage
invariants.  Pure-import tests (no Spark session): they exist so a
future reorder that silently drops a query out of the documented
window fails CI instead of surfacing as a missing driver row a round
later (the ADVICE r13 slot-comment concern, made structural)."""

from __future__ import annotations

import __spark_entry__ as entry

FRONT_50 = [
    # slots 1-3: round-14 consolidation scorecards
    "agreement_scorecard", "drift_scorecard", "retrieval_scorecard",
    # slots 4-23: the 20 r8-stale rows
    "frame_sample", "gram_novelty", "group_centroids", "hash_embed",
    "heavy_hitters", "image_dups", "image_resize", "intersect",
    "logic_filters", "ngram_counts", "pack_bins", "quality_classifier",
    "random_project", "redact_pii", "sample_k_per_group", "sq_codes",
    "sq_topk", "strip_boilerplate", "strip_dup_spans", "video_dups",
    # slots 24-50: the 27 alphabetically-first r9 rows
    "ann_ivf", "ann_recall", "argmin_join", "bigram_lm", "bm25",
    "cogroup_inner", "cogroup_left", "cogroup_outer", "curation_despan",
    "curation_dsir", "curation_flagship", "curation_pipeline",
    "curriculum", "date_format", "decontam_spans",
    "decontaminate_bloom", "dedup_against", "dsir_sample",
    "dsir_select", "dsir_weights", "embedding_dups",
    "expression_filter", "group_quantiles", "groupby_agg",
    "hashjoin_broadcast", "hashjoin_cross", "hits",
]

RETIRED_R14 = [
    "judge_kappa", "fleiss", "kripp",
    "psi", "chi2", "jsd", "ks_drift", "w1_drift",
    "mrr_lsh", "recall_lsh", "precision_lsh", "ndcg_lsh",
]

ROWS_ONLY = {"bpe_fertility", "compression_stats"}


def test_front_50_matches_coverage_md():
    """The first 50 queries() keys are exactly the documented round-14
    driver window, in order (COVERAGE.md "Driver-slot rotation
    (round 14)")."""
    keys = list(entry.queries().keys())
    assert keys[:50] == FRONT_50


def test_consolidation_retirements():
    """The 12 singles folded into the scorecards are gone from the
    registry, the scorecards are present, and the registry size
    reflects the fold (233 - 12 + 3 = 224)."""
    q = entry.queries()
    for name in RETIRED_R14:
        assert name not in q, f"{name} should be retired"
    for name in ("agreement_scorecard", "drift_scorecard",
                 "retrieval_scorecard"):
        assert name in q
    assert len(q) == 224


def test_oracle_coverage_invariants():
    """Every oracle has a query; every query except the two documented
    rows-only ops has an oracle; the scorecard oracles embed their
    retired members' recipes (spot-marker: each composed SQL contains
    its members' signature output columns)."""
    q, o = entry.queries(), entry.oracle_sql()
    assert set(o) <= set(q)
    assert set(q) - set(o) == ROWS_ONLY
    assert "alpha_x" in o["agreement_scorecard"]          # kripp leg
    assert "kappa_x" in o["agreement_scorecard"]          # kappa legs
    assert "psi_x1e6" in o["drift_scorecard"]
    assert "chi2_x1e3" in o["drift_scorecard"]
    assert "jsd_x1e6" in o["drift_scorecard"]
    assert "ks_x" in o["drift_scorecard"]
    assert "w1_x" in o["drift_scorecard"]
    for col in ("mrr_x1e6", "recall_x1e6", "precision_x1e6",
                "ndcg_x1e6"):
        assert col in o["retrieval_scorecard"]


def test_bench_queries_cover_scorecards_not_singles():
    """BENCH_QUERIES swapped the retired singles for the scorecards
    (the static-list requirement from CLAUDE.md), and every bench name
    resolves in the registry (embedding_dups_lsh etc. are added by
    bench.py itself)."""
    import bench
    q = entry.queries()
    for name in ("agreement_scorecard", "drift_scorecard",
                 "retrieval_scorecard"):
        assert name in bench.BENCH_QUERIES
    for name in RETIRED_R14:
        assert name not in bench.BENCH_QUERIES
    missing = [n for n in bench.BENCH_QUERIES if n not in q]
    assert not missing, f"bench names missing from queries(): {missing}"


# ---------------------------------------- scorecard plan quality

def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_agreement_scorecard_joins_broadcast(spark):
    """The scorecard composes three |sources|-sized agreement frames
    with two source-key joins — both must resolve to
    BroadcastHashJoin (a SortMergeJoin would shuffle tiny frames),
    and the wide row must reproduce each member's column values
    exactly (the consolidation contract)."""
    q = entry.queries()
    df = q["agreement_scorecard"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("BroadcastHashJoin") >= 2
    rows = {r.source: r for r in df.collect()}
    assert rows
    from cascading_flink_spark.extensions import krippendorff_alpha
    import __spark_entry__ as E
    kr = {r.source: r.alpha_x for r in krippendorff_alpha(
        E._abstaining_judges(spark, "/root/testdata/sf0.001"),
        "doc_id", "vote", group_col="source").collect()}
    for s, r in rows.items():
        assert r.alpha_x == kr[s]


def test_drift_scorecard_joins_broadcast(spark):
    """Five |languages|-sized drift frames, four lang-key joins — all
    broadcast, none sort-merge."""
    q = entry.queries()
    df = q["drift_scorecard"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("BroadcastHashJoin") >= 4
    for r in df.collect():
        # shared-count contract: one copy of each split's totals
        assert r.mix_n_a + r.mix_n_b == r.len_n_a + r.len_n_b


def test_retrieval_scorecard_single_fixture(spark):
    """The four evals ride ONE pinned (lsh, qrels) fixture: the plan
    contains no SortMergeJoin on the query_id composition joins, and
    member values equal the standalone operators' on the same
    fixture."""
    q = entry.queries()
    df = q["retrieval_scorecard"](spark, "/root/testdata/sf0.001")
    rows = {r.query_id: r for r in df.collect()}
    assert rows
    for r in rows.values():
        assert 0 <= r.recall_x1e6 <= 1_000_000
        assert 0 <= r.precision_x1e6 <= 1_000_000
        assert 0 <= r.ndcg_x1e6 <= 1_000_000
        # n_hit consistency: hits can't exceed returned or relevant
        assert r.n_hit <= min(r.n_ret, r.n_rel)
