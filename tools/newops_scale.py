#!/usr/bin/env python
"""Round-10/11 scaling harness: reproduce the README "Round-10 session /
retrieval / BFS additions", the graph-addition rows, and the round-11
rows (session_funnel, rrf_hybrid3, bucketed quantile_norm_lang,
4-domain dsir_mixture exclusion chains, stars-vs-hashmin CC) at
1x/8x/32x.

Usage: python tools/newops_scale.py [X8_DIR] [X32_DIR] [REPS]
       (defaults /tmp/sf0.1x8 /tmp/sf0.1x32 2 — build the replicates
       with tools/replicate_sf.py first; runs 1x from /root/testdata)

Two measurement rules learned the hard way, both baked in here:

* a bare ``.count()`` lets Catalyst PRUNE window/withColumn work
  (session_labels timed flat until a checksum agg forced the window),
  so every map/window query is timed through ``agg(count, sum(col))``;
* the %500 thin-graph fixture saturates under replication, so the
  graph ops are re-keyed to ``user_id % (2000 * factor)`` — nodes AND
  edges grow factor-fold at constant average degree (the
  tools/graph_scale.py sparse regime).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from cascading_flink_spark import get_spark  # noqa: E402
import __spark_entry__ as E  # noqa: E402


def best_of(reps, fn):
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        el = time.time() - t0
        best = el if best is None or el < best else best
    return best


def main() -> None:
    x8 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf0.1x8"
    x32 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf0.1x32"
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    spark = get_spark("newops-scale", cpus=int(
        os.environ.get("SPARK_GRAFT_CPUS", "32")))
    qs = E.queries()
    dirs = [("1x", "/root/testdata/sf0.1", 1), ("8x", x8, 8),
            ("32x", x32, 32)]

    # entry queries, window/agg work forced via a checksum aggregate
    forced = {
        "session_labels": ["session_n", "session_seq"],
        "session_stats": ["n_events", "duration_us"],
        "session_transitions": ["n_trans", "p_x1e6"],
        "hard_negatives": ["neg_rank"],
        "rrf_hybrid": ["rrf_x", "n_lists"],
        "quantile_norm_lang": ["q_x1e6"],
        "corpus_drift": ["tv_x1e6"],
        "weighted_sample_lang": ["n_chars"],
        # round 11
        "session_funnel": ["n_sessions"],
        "rrf_hybrid3": ["rrf_x", "n_lists"],
        "quantile_norm_global": ["q_x1e6"],
        "kcenter": ["dist_x"],
        # ngram_containment under replication = 8/32-way duplicate
        # clusters — the dedup family's adversarial output-bound case.
        # Round 12's collapse_exact default runs the intersect verify
        # at REPRESENTATIVE level (verbatim copies collapse first), so
        # the 32x row is ungated: true pairs still blow up
        # ~multiplicity^2 in OUTPUT rows, but per-row cost is one
        # expand join, not an array_intersect (was 1208s pre-collapse).
        "ngram_containment": ["n_common"],
        # round 12: the two r11 composition ops that lacked their own
        # scaling rows (VERDICT r11 #8), plus the new suffix-array-free
        # ExactSubstr spans (occurrence-counted windows; replication
        # multiplies window occurrences, the adversarial direction)
        "dedup_soft": ["w_x1e6", "cluster_size"],
        "topic_quota": ["cluster"],
        "dup_substrings": ["span_tokens", "n_grams"],
        # round 13: partner attribution — replication multiplies the
        # per-gram occurrence lists the m1/m2 partial aggs reduce,
        # the adversarial direction for the partner machinery
        "dup_partners": ["span_tokens", "partner_pos"],
        # round 14: the consolidation scorecards replace their
        # retired singles (kripp/judge_kappa/fleiss, psi/chi2/jsd/
        # ks_drift/w1_drift, *_lsh) — same reduced-frame shapes, one
        # row per source/lang/query
        "agreement_scorecard": ["n_units", "cohen_x", "fleiss_x",
                                "alpha_x"],
        "drift_scorecard": ["psi_x1e6", "chi2_x1e3", "jsd_x1e6",
                            "ks_x", "w1_x"],
        "retrieval_scorecard": ["mrr_x1e6", "recall_x1e6",
                                "precision_x1e6", "ndcg_x1e6"],
        # round 12: the eval-analytics quartet — all reduce to
        # quantization/vote-bounded frames, so the scaling surface is
        # the single corpus-pass partial agg
        "calibration_bins": ["n", "gap_x"],
        "calibration_ece": ["ece_x", "brier_x"],
        "pr_curve": ["tp", "f1_x1e6"],
        "label_agreement": ["n_votes", "agreement_x1e6"],
        # replication = verbatim-dup density: edit_dups rides the
        # collapsed (representative-level) verify, output-bound
        # member expansion
        "edit_dups": ["edit_dist"],
        "pearson_signals": ["n", "rho"],
        "spearman_signals": ["n", "rho"],
        "confusion": ["f1_x1e6"],
        # k bounded collects over a growing corpus: the argmax
        # TakeOrdered + map-only dot folds are the scaling surface
        "mmr": ["score_x"],
        "rbo": ["n_common", "rbo_x"],
        "concentration": ["hhi_x1e6", "cr4_x1e6"],
        "eccentricity": ["n_reached", "ecc"],
        "trimmed_stats": ["trimmed_mean_x", "winsor_mean_x"],
        "lang_confusion": ["f1_x1e6"],
        "avg_precision": ["ap_x"],
        "rate_confidence": ["n", "n_pos"],
        # round 12 late session: the corpus-statistics family — all
        # reduce to keys/vocab/degree-support-bounded frames, so the
        # scaling surface is the corpus-pass partial agg (plus the
        # explode for the token-based pair)
        "diversity": ["entropy_x1e6", "gini_x1e6"],
        "zipf": ["n_terms", "slope"],
        "vocab_overlap": ["jaccard_x1e6"],
        "assortativity": ["n_edges", "rho"],
        "mean_confidence": ["n", "mean"],
        "harmonic": ["n_reached", "harm_x1e6"],
        "mrl_recall": ["recall_x1e6"],
        "silhouette": ["mean_sil_x", "min_sil_x"],
        "drift_series": ["tv_x1e6"],
        "readability": ["n_words", "flesch"],
        "data_card": ["entropy_x1e6", "hhi_x1e6", "flesch"],
        "robust_spread": ["median_x", "mad_x"],
    }
    only = os.environ.get("SPARK_GRAFT_SCALE_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        forced = {k: v for k, v in forced.items() if k in keep}
    for name, cols in forced.items():
        for tag, d, _ in dirs:
            t = best_of(reps, lambda: qs[name](spark, d).agg(
                F.count(F.lit(1)), *[F.sum(c) for c in cols]).collect())
            print(f"{name} {tag}: best={t:.2f}s", flush=True)

    if only:
        # SPARK_GRAFT_SCALE_ONLY restricts to the forced-agg entries;
        # the graph/dsir fixtures below have their own names — rerun
        # without the filter for those
        return

    # graph additions on genuinely growing sparse graphs
    from cascading_flink_spark.extensions import (bfs_distances,
                                                  connected_components,
                                                  link_candidates)
    for tag, d, factor in dirs:
        n_mod = 2000 * factor
        ev = spark.read.parquet(f"{d}/events.parquet").filter(
            F.col("event_id") % 11 == 0)
        edges = ev.select(
            (F.col("user_id") % n_mod).alias("src"),
            ((F.col("user_id") * 7 + F.col("event_id")) % n_mod)
            .alias("dst"))
        for name, fn in [
            ("connected_components",
             lambda: connected_components(edges, rounds=6).agg(
                 F.count(F.lit(1)), F.sum("comp")).collect()),
            ("link_candidates",
             lambda: link_candidates(edges, min_common=2).agg(
                 F.count(F.lit(1)), F.sum("jaccard_x1e6"),
                 F.sum("aa_x1e6")).collect()),
            ("bfs_distances",
             lambda: bfs_distances(edges, seeds=[0, 1, 2],
                                   max_hops=3).agg(
                 F.count(F.lit(1)), F.sum("dist")).collect()),
            # round 11: the log-round production CC twin — 5 star
            # rounds converge these sparse graphs where hash-min's 6
            # one-hop rounds only cover diameter-6 balls
            ("connected_components_stars",
             lambda: connected_components(edges, rounds=5,
                                          strategy="stars").agg(
                 F.count(F.lit(1)), F.sum("comp")).collect()),
        ]:
            t = best_of(reps, fn)
            print(f"{name} {tag} (n_mod={n_mod}): best={t:.2f}s",
                  flush=True)

    # round 11: 4-domain dsir_mixture — the per-domain NOT-IN exclusion
    # chains are the scaling surface (each later domain anti-joins the
    # broadcast union of earlier picks, bounded by sum(quotas))
    from cascading_flink_spark.extensions import dsir_mixture_select
    for tag, d, _ in dirs:
        docs = spark.read.parquet(f"{d}/documents.parquet")
        raw = docs.filter(F.col("doc_id") % 7 != 0)
        tgt = docs.filter(F.col("doc_id") % 7 == 0)
        targets = {f"dom{i}": tgt.filter(F.col("doc_id") % 4 == i)
                   for i in range(4)}
        quotas = {f"dom{i}": 25 for i in range(4)}
        t = best_of(reps, lambda: dsir_mixture_select(
            raw, targets=targets, quotas=quotas, buckets=512).agg(
            F.count(F.lit(1)), F.sum("logw_x1e6")).collect())
        print(f"dsir_mixture_4dom {tag}: best={t:.2f}s", flush=True)


if __name__ == "__main__":
    main()
