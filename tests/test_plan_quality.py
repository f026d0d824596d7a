"""Plan-quality regression tests: the 100 TB story in assertable form.

Every operator must compile to the physical plan we'd want on a real
cluster: filters reach the parquet scan (PushedFilters), projections prune
the read schema, explicit HashJoins broadcast, top-k uses WindowGroupLimit
(rank pushdown), global sort+limit uses TakeOrderedAndProject.  A regression
here means a silent 10-100x at scale even though results stay correct."""

from __future__ import annotations

import re

import pytest


def plan_of(spark, name, sf_dir):
    import __spark_entry__ as entry
    df = entry.queries()[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("query,pattern,why", [
    ("groupby_agg", r"PushedFilters: \[.*LessThanOrEqual\(l_shipdate",
     "date filter must reach the parquet scan"),
    ("groupby_agg", r"ReadSchema: (?!.*l_tax)",
     "unused columns must be pruned from the scan"),
    ("groupby_agg", r"HashAggregate",
     "aggregation must be hash-based with partial/final split"),
    ("hashjoin_broadcast", r"BroadcastHashJoin",
     "HashJoin pipes must compile to broadcast joins"),
    ("hashjoin_broadcast", r"PushedFilters: \[.*GreaterThan\(p_size,40\)",
     "dimension filter must push into the dimension scan"),
    ("nary_join", r"BroadcastHashJoin",
     "small dims in the n-ary chain must broadcast"),
    ("nary_join", r"EqualTo\(r_name,ASIA\)",
     "region filter must push into the region scan"),
    ("topk_per_group", r"WindowGroupLimit",
     "FirstNBuffer must push the rank limit below the window sort"),
    ("global_sort_limit", r"TakeOrderedAndProject",
     "global sort + limit must not materialize a full sort"),
    ("expression_filter", r"PushedFilters: \[.*l_quantity",
     "expression filters on scan columns must push down"),
])
def test_plan_property(spark, sf_dir, query, pattern, why):
    plan = plan_of(spark, query, sf_dir)
    assert re.search(pattern, plan), f"{query}: {why}\n--- plan ---\n{plan[:4000]}"


def test_cogroup_becomes_native_join(spark, sf_dir):
    plan = plan_of(spark, "cogroup_inner", sf_dir)
    assert re.search(r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin)", plan)


def test_unique_partial_dedup(spark, sf_dir):
    # dropDuplicates compiles to partial+final HashAggregate (map-side dedup)
    plan = plan_of(spark, "unique", sf_dir)
    assert plan.count("HashAggregate") >= 2


def test_python_buffer_stage_keeps_parallelism(spark, sf_dir):
    """The keyed-PyBuffer shuffle must carry an explicit partition count:
    AQE coalesces by byte size and cannot see per-row Python cost, so
    without it the whole buffer stage serializes onto one task
    (REPARTITION_BY_NUM is exempt from AQE coalescing)."""
    plan = plan_of(spark, "buffer_span", sf_dir)
    assert "REPARTITION_BY_NUM" in plan, plan[:4000]


def test_curation_pipeline_filter_pushes_to_scan(spark, sf_dir):
    """Composing quality filter -> dedup must keep the quality predicate
    inside the parquet scan's pushed/partial filters (Catalyst sees
    through the chain).  chunk_corpus localCheckpoints its narrow
    tokenized projection (cache scoping, r8), so the FULL pipeline plan
    starts at the checkpoint boundary — the pushdown property is
    asserted on the segment upstream of it, where the scan lives."""
    from pyspark.sql import functions as F
    from cascading_flink_spark.extensions import quality_filter, fingerprint
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    good = quality_filter(docs, min_tokens=30, max_punct_ratio=0.05)
    keep = (fingerprint(good).groupBy("fp")
            .agg(F.min("doc_id").alias("doc_id")).select("doc_id"))
    upstream = good.join(keep, "doc_id")
    plan = upstream._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"PushedFilters: \[IsNotNull\(text\)", plan) or \
        re.search(r"Filter.*n_toks|Filter.*size\(", plan), plan[:3000]
    # and the full pipeline plan indeed starts at the checkpoint boundary
    full = plan_of(spark, "curation_pipeline", sf_dir)
    assert "Scan ExistingRDD" in full


def test_nary_emission_filter_eliminates_outer_joins(spark, sf_dir):
    """The accumulate-then-emit joiner compiles Right/Mixed n-ary joins as
    full-outer cascades plus a presence filter; Catalyst's outer-join
    elimination must rewrite the filtered full-outers back to the minimal
    join types (Mixed [req, outer, req] -> inner + left; no residual
    full-outer), so the declared semantics cost nothing physically."""
    import __spark_entry__ as entry
    df = entry.queries()["nary_mixed_join"](spark, sf_dir)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    joins = re.findall(r"Join (\w+)", plan)
    assert joins and "FullOuter" not in joins, joins


@pytest.mark.parametrize("query,pattern,why", [
    ("tpch_q3", r"TakeOrderedAndProject",
     "global top-10 must not materialize a full sort"),
    ("tpch_q3", r"PushedFilters: \[.*EqualTo\(c_mktsegment,BUILDING\)",
     "segment filter must push into the customer scan"),
    ("tpch_q3", r"PushedFilters: \[.*GreaterThan\(l_shipdate",
     "ship-date filter must push into the lineitem scan"),
    ("repetition_stats", r"ReadSchema: (?!.*source)(?!.*lang).*doc_id",
     "only doc_id+text may be read from the documents scan"),
    ("repetition_stats", r"HashAggregate",
     "bigram counting must be a partial-aggregated hash agg"),
    ("tfidf_topterms", r"ReadSchema: (?!.*source)(?!.*n_chars).*doc_id",
     "only doc_id+text may be read"),
    ("unigram_commonness", r"HashAggregate",
     "term counts must partial-aggregate map-side"),
    ("ann_pq", r"Broadcast",
     "per-query LUTs must broadcast (no corpus shuffle for scoring)"),
])
def test_round3_plan_property(spark, sf_dir, query, pattern, why):
    plan = plan_of(spark, query, sf_dir)
    assert re.search(pattern, plan), f"{query}: {why}\n--- plan ---\n{plan[:4000]}"


def test_event_funnel_column_pruning(spark, sf_dir):
    """The funnel must not read unused event columns.  Asserted with
    pin_stages=False: the default stage checkpoints (cache scoping, r8)
    truncate explain at the boundary, hiding the parquet scans — the
    pruning property belongs to the un-pinned plan, which is identical
    upstream of the boundaries."""
    from cascading_flink_spark.extensions import event_funnel
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    df = event_funnel(events, ["view", "cart", "purchase"],
                      pin_stages=False)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert re.search(r"ReadSchema: (?!.*props)(?!.*value)", plan), plan[:4000]
    # and the pinned default indeed starts at the checkpoint boundary
    full = plan_of(spark, "event_funnel", sf_dir)
    assert "Scan ExistingRDD" in full


@pytest.mark.parametrize("query,pattern,why", [
    ("tpch_q1", r"PushedFilters: \[.*l_shipdate",
     "Q1's date filter must reach the lineitem scan"),
    ("tpch_q1", r"ReadSchema: (?!.*l_comment)",
     "Q1 must prune unused lineitem columns"),
    ("tpch_q1", r"HashAggregate",
     "Q1 must partial-aggregate map-side"),
    ("tpch_q18", r"BroadcastHashJoin",
     "the HAVING-shrunk key set must broadcast into orders/customer"),
    ("tpch_q18", r"TakeOrderedAndProject",
     "Q18's global top-100 must not materialize a full sort"),
    ("tpch_q6", r"PushedFilters: \[.*l_discount.*l_quantity|PushedFilters: \[.*l_quantity.*l_discount",
     "every Q6 predicate must reach the lineitem scan"),
    ("tpch_q10", r"BroadcastHashJoin",
     "the nation dim in Q10 must broadcast"),
    ("tpch_q10", r"TakeOrderedAndProject",
     "Q10's global top-20 must not materialize a full sort"),
    ("tpch_q10", r"PushedFilters: \[.*EqualTo\(l_returnflag,R\)",
     "the returnflag filter must push into the lineitem scan"),
    ("tpch_q13", r"HashAggregate",
     "both Q13 aggregations must be hash-based with partial/final split"),
    ("domain_quota", r"WindowGroupLimit",
     "the per-domain cap must push the rank limit below the window sort"),
    ("bm25", r"Broadcast",
     "df/avgdl statistics must join back by broadcast"),
    ("ngram_counts", r"HashAggregate",
     "gram counting must partial-aggregate map-side"),
    ("group_centroids", r"HashAggregate",
     "per-dim sums must partial-aggregate map-side"),
])
def test_round5_plan_property(spark, sf_dir, query, pattern, why):
    plan = plan_of(spark, query, sf_dir)
    assert re.search(pattern, plan), f"{query}: {why}\n--- plan ---\n{plan[:4000]}"


@pytest.mark.parametrize("query,pattern,why", [
    ("tpch_q21", r"LeftSemi",
     "the EXISTS branch must compile to a semi join, not an inner+dedup"),
    ("tpch_q21", r"LeftAnti",
     "the NOT EXISTS branch must compile to an anti join"),
    ("tpch_q21", r"BroadcastHashJoin",
     "the nation dim in Q21 must broadcast"),
    ("tpch_q21", r"TakeOrderedAndProject",
     "Q21's global top-100 must not materialize a full sort"),
    ("tpch_q21", r"PushedFilters: \[.*o_orderstatus",
     "the order-status filter must push into the orders scan"),
])
def test_round6_plan_property(spark, sf_dir, query, pattern, why):
    plan = plan_of(spark, query, sf_dir)
    assert re.search(pattern, plan), f"{query}: {why}\n--- plan ---\n{plan[:4000]}"


@pytest.mark.parametrize("query,pattern,why", [
    ("tpch_q4", r"LeftSemi",
     "Q4's EXISTS must compile to a semi join"),
    ("tpch_q4", r"PushedFilters: \[.*GreaterThanOrEqual\(o_orderdate",
     "Q4's quarter filter must push into the orders scan"),
    ("tpch_q4", r"PushedFilters: \[.*EqualTo\(l_returnflag,R\)",
     "Q4's late-line filter must push into the lineitem scan"),
    ("tpch_q5", r"EqualTo\(r_name,ASIA\)",
     "Q5's region filter must push into the region scan"),
    ("tpch_q5", r"BroadcastHashJoin",
     "Q5's nation/region dims must broadcast"),
    ("tpch_q7", r"BroadcastHashJoin",
     "Q7's renamed nation branches must broadcast"),
    ("tpch_q7", r"PushedFilters: \[.*GreaterThanOrEqual\(l_shipdate",
     "Q7's two-year window must push into the lineitem scan"),
    ("tpch_q12", r"PushedFilters: \[.*GreaterThanOrEqual\(l_shipdate",
     "Q12's year filter must push into the lineitem scan"),
    ("tpch_q15", r"PushedFilters: \[.*GreaterThanOrEqual\(l_shipdate",
     "Q15's quarter filter must push into the lineitem scan"),
    ("tpch_q17", r"PushedFilters: \[.*EqualTo\(p_brand,Brand#1\)",
     "Q17's brand filter must push into the part scan"),
    ("tpch_q17", r"BroadcastHashJoin",
     "Q17's filtered part dim must broadcast (shrinks the probe before "
     "the per-part stats join)"),
    ("tpch_q19", r"PushedFilters: \[.*LessThanOrEqual\(l_quantity,30.0\)",
     "Q19's quantity envelope (union of the OR bands) must push into "
     "the lineitem scan"),
    ("tpch_q19", r"PushedFilters: \[.*Or\(",
     "Q19's OR-of-ANDs must reach a scan as a pushed disjunction"),
    ("tpch_q22", r"LeftAnti",
     "Q22's NOT EXISTS must compile to an anti join"),
    ("tpch_q22", r"In\(c_nationkey",
     "Q22's country-code list must push into the customer scan"),
])
def test_round6_tpch_plan_property(spark, sf_dir, query, pattern, why):
    plan = plan_of(spark, query, sf_dir)
    assert re.search(pattern, plan), f"{query}: {why}\n--- plan ---\n{plan[:4000]}"


@pytest.mark.parametrize("query,pattern,why", [
    ("tpch_q2", r"EqualTo\(r_name,EUROPE\)",
     "Q2's region filter must push into the region scan"),
    ("tpch_q2", r"TakeOrderedAndProject",
     "Q2's top-100 must not materialize a full sort"),
    ("tpch_q8", r"EqualTo\(p_type,ECONOMY\)",
     "Q8's part-type filter must push into the part scan"),
    ("tpch_q8", r"BroadcastHashJoin",
     "Q8's two nation roles and region must broadcast"),
    ("tpch_q9", r"StringContains\(p_name,red\)",
     "Q9's LIKE filter must push into the part scan as a contains"),
    ("tpch_q11", r"EqualTo\(n_name,NATION_4\)",
     "Q11's nation filter must push into the nation scan"),
    ("tpch_q16", r"LeftAnti",
     "Q16's NOT IN complaint-supplier exclusion must compile to an "
     "anti join"),
    ("tpch_q16", r"LessThan\(s_acctbal,0.0\)",
     "Q16's complaint proxy filter must push into the supplier scan"),
    ("tpch_q20", r"LeftSemi",
     "Q20's nested-IN supplier membership must compile to a semi join"),
    ("tpch_q20", r"StringStartsWith\(p_name,red\)",
     "Q20's part-name prefix filter must push into the part scan"),
])
def test_round6b_tpch_plan_property(spark, sf_dir, query, pattern, why):
    plan = plan_of(spark, query, sf_dir)
    assert re.search(pattern, plan), f"{query}: {why}\n--- plan ---\n{plan[:4000]}"


def test_paragraph_dedup_no_window(spark, sf_dir):
    """The keep-decision must stay a partial-agg min + equi-join — a
    Window here would single-task-sort a hot boilerplate segment."""
    plan = plan_of(spark, "paragraph_dedup", sf_dir)
    assert "Window" not in plan, plan[:4000]
    assert "CartesianProduct" not in plan


def test_semdedup_broadcasts_centroids(spark, sf_dir):
    """The centroid table must broadcast; the pairwise stage must be an
    equi-join on the cell id (no cartesian over the corpus)."""
    plan = plan_of(spark, "semdedup", sf_dir)
    assert "CartesianProduct" not in plan, plan[:4000]
    assert re.search(r"Broadcast(HashJoin|NestedLoopJoin)", plan)


def test_binned_quantiles_no_unbounded_group_sort(spark, sf_dir):
    """Pass-1 windows sort bins (bounded), pass-2 windows sort only
    target-bin rows; stats frames ride broadcasts."""
    plan = plan_of(spark, "group_quantiles_binned", sf_dir)
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_tpch_q5_q7_no_cartesian(spark, sf_dir):
    for q in ("tpch_q5", "tpch_q7"):
        plan = plan_of(spark, q, sf_dir)
        assert "CartesianProduct" not in plan, plan[:4000]


def test_tpch_q21_no_cartesian(spark, sf_dir):
    plan = plan_of(spark, "tpch_q21", sf_dir)
    assert "CartesianProduct" not in plan and "NestedLoop" not in plan


def test_tpch_q18_no_sort_merge_join(spark, sf_dir):
    """All three Q18 joins ride the broadcast of the tiny HAVING output —
    a SortMergeJoin here would shuffle orders+customer at 100 TB."""
    plan = plan_of(spark, "tpch_q18", sf_dir)
    assert "SortMergeJoin" not in plan, plan[:4000]


def test_ivf_md5_broadcasts_probe_side(spark, sf_dir):
    """The deterministic IVF twin must keep the scale shape: tiny
    centroid/probe sides broadcast (no corpus shuffle for the join)."""
    import __spark_entry__ as entry
    df = entry.queries()["ann_recall"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_temperature_mixture_broadcasts_budget_table(spark, sf_dir):
    """The per-language allocation table is tiny and must broadcast back
    onto the corpus — a SortMergeJoin here would shuffle the whole
    corpus twice (once for the join, once for the admission window)."""
    plan = plan_of(spark, "temperature_mixture", sf_dir)
    assert "BroadcastHashJoin" in plan, plan[:4000]
    assert "CartesianProduct" not in plan


def test_gopher_and_blocklist_are_map_only(spark, sf_dir):
    """Quality gates are embarrassingly parallel projections: no shuffle
    (Exchange), no Python (BatchEvalPython/ArrowEvalPython) may appear."""
    for q in ("gopher_quality", "blocklist"):
        plan = plan_of(spark, q, sf_dir)
        assert "Exchange" not in plan, f"{q} shuffles:\n{plan[:4000]}"
        assert "EvalPython" not in plan, f"{q} leaves the JVM:\n{plan[:4000]}"


def test_rolling_stats_single_shuffle(spark, sf_dir):
    """One hash partitioning on the key serves every window: frames,
    lag and row_number all reuse the same (key, ts, id) sort order."""
    plan = plan_of(spark, "rolling_stats", sf_dir)
    assert plan.count("Exchange hashpartitioning") == 1, plan[:4000]


def test_sq_topk_broadcasts_queries_single_topk_shuffle(spark, sf_dir):
    """The query side broadcasts (corpus streams once over the quantized
    codes); the only exchange is the final per-query top-k window."""
    plan = plan_of(spark, "sq_topk", sf_dir)
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, \
        plan[:4000]
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan, plan[:4000]


def test_sq_codes_and_url_normalize_map_only(spark, sf_dir):
    """Quantization and URL canonicalization are pure projections: no
    Exchange, no Python."""
    for q in ("sq_codes", "url_normalize"):
        plan = plan_of(spark, q, sf_dir)
        assert "Exchange" not in plan, f"{q} shuffles:\n{plan[:4000]}"
        assert "EvalPython" not in plan, f"{q} leaves the JVM:\n{plan[:4000]}"


def test_url_dedup_partial_aggregates(spark, sf_dir):
    """The canonical-URL group-by must partial-aggregate map-side
    (HashAggregate before AND after one Exchange), never sort the rows."""
    plan = plan_of(spark, "url_dedup", sf_dir)
    assert plan.count("Exchange hashpartitioning") == 1, plan[:4000]
    assert "HashAggregate" in plan


def test_oov_stats_partial_aggregates(spark, sf_dir):
    """Doc-term and df aggregations both partial-aggregate; nothing
    interprets rows in Python."""
    plan = plan_of(spark, "oov_stats", sf_dir)
    assert "HashAggregate" in plan
    assert "EvalPython" not in plan, plan[:4000]
    assert "CartesianProduct" not in plan


def test_random_project_map_only_query(spark, sf_dir):
    plan = plan_of(spark, "random_project", sf_dir)
    assert "Exchange" not in plan, plan[:4000]
    assert "EvalPython" not in plan, plan[:4000]


def test_dedup_against_no_cartesian(spark, sf_dir):
    """Cross-corpus candidates must come from the banded equality join —
    a cartesian/nested-loop between the corpora is the scale failure."""
    plan = plan_of(spark, "dedup_against", sf_dir)
    assert "CartesianProduct" not in plan, plan[:4000]
    assert "BroadcastNestedLoopJoin" not in plan, plan[:4000]


def test_quality_classifier_map_only(spark, sf_dir):
    """The classifier is a broadcast-weights linear scorer: a pure
    projection — no Exchange, no Python in the plan (the weight tables
    ride as literals)."""
    plan = plan_of(spark, "quality_classifier", sf_dir)
    assert "Exchange" not in plan, plan[:4000]
    assert "EvalPython" not in plan, plan[:4000]
