"""Round-12 eval-analytics operators: calibration (reliability bins +
ECE/Brier scorecard), the precision/recall/F1 threshold sweep, and
majority-vote label agreement — property-pinned against direct Python
models, guard-raised on contract violations, plan-asserted codegen-only
(no Python eval) with the documented exchange counts."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

SCALE = 1_000_000


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _mk_scored(spark, seed, n=400, groups=("en", "de", "fr")):
    """(group, p, label) rows whose probability is an exact multiple
    of 1/SCALE (p = sq/SCALE round-trips through round(p*SCALE)
    exactly on every engine — no half-way cases by construction)."""
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        g = groups[rng.randrange(len(groups))]
        sq = rng.randrange(0, SCALE + 1)
        # correlate the label with the score so the metrics are
        # non-degenerate (but the pin is exact either way)
        lab = 1 if rng.randrange(SCALE) < sq else 0
        rows.append((g, sq, sq / SCALE, lab))
    df = spark.createDataFrame(rows, "g string, sq long, p double, "
                                     "label int")
    return rows, df


# ---------------------------------------------- calibration_report


def _calib_model(rows, bins=10):
    agg = {}
    for g, sq, _p, lab in rows:
        b = min(bins - 1, sq * bins // SCALE)
        n, npos, ss = agg.get((g, b), (0, 0, 0))
        agg[(g, b)] = (n + 1, npos + lab, ss + sq)
    out = {}
    for (g, b), (n, npos, ss) in agg.items():
        out[(g, b)] = (n, npos, ss // n, npos * SCALE // n,
                       abs(ss - npos * SCALE) // n)
    return out


def test_calibration_report_pins_python_model(spark):
    rows, df = _mk_scored(spark, seed=121)
    from cascading_flink_spark.extensions import calibration_report
    got = {(r.g, r.bin): (r.n, r.n_pos, r.mean_score_x, r.pos_rate_x,
                          r.gap_x)
           for r in calibration_report(df, "p", "label",
                                       group_col="g").collect()}
    assert got == _calib_model(rows)


def test_calibration_report_edges_and_global(spark):
    """p = 1.0 closes into the LAST bin (not an 11th); p = 0 into bin
    0; the global (no group) path and a custom bin count agree with
    the model."""
    rows = [("x", 0, 0.0, 0), ("x", SCALE, 1.0, 1),
            ("x", SCALE // 2, 0.5, 1), ("x", SCALE // 2, 0.5, 0)]
    df = spark.createDataFrame(rows, "g string, sq long, p double, "
                                     "label int")
    from cascading_flink_spark.extensions import calibration_report
    out = {r.bin: (r.n, r.n_pos)
           for r in calibration_report(df, "p", "label",
                                       bins=4).collect()}
    assert out == {0: (1, 0), 2: (2, 1), 3: (1, 1)}


def test_calibration_report_guards(spark):
    df = spark.createDataFrame([("x", 0.5, 1)],
                               "g string, p double, label int")
    from cascading_flink_spark.extensions import calibration_report
    with pytest.raises(ValueError, match="bins"):
        calibration_report(df, "p", "label", bins=0)
    with pytest.raises(ValueError, match="scale"):
        calibration_report(df, "p", "label", scale=0)
    bad_p = spark.createDataFrame([("x", 1.5, 1)],
                                  "g string, p double, label int")
    with pytest.raises(Exception, match="probability"):
        calibration_report(bad_p, "p", "label").collect()
    bad_l = spark.createDataFrame([("x", 0.5, 2)],
                                  "g string, p double, label int")
    with pytest.raises(Exception, match="0/1"):
        calibration_report(bad_l, "p", "label").collect()


def test_calibration_report_plan_one_exchange_no_python(spark):
    """One partial-agg shuffle onto (group, bin), nothing else; the
    whole op stays JVM-side."""
    _rows, df = _mk_scored(spark, seed=122, n=50)
    from cascading_flink_spark.extensions import calibration_report
    plan = _plan(calibration_report(df, "p", "label", group_col="g"))
    assert "EvalPython" not in plan
    assert plan.count("Exchange") == 1
    assert "partial" in plan  # map-side combine before the shuffle


# --------------------------------------------- calibration_summary


def _summary_model(rows, bins=10):
    per_bin = {}
    for g, sq, _p, lab in rows:
        b = min(bins - 1, sq * bins // SCALE)
        n, p, ss, sq2 = per_bin.get((g, b), (0, 0, 0, 0))
        per_bin[(g, b)] = (n + 1, p + lab, ss + sq,
                           sq2 + (sq - lab * SCALE) ** 2)
    tot = {}
    for (g, _b), (n, p, ss, sq2) in per_bin.items():
        tn, tp_, ece, br = tot.get(g, (0, 0, 0, 0))
        tot[g] = (tn + n, tp_ + p, ece + abs(ss - p * SCALE), br + sq2)
    return {g: (n, p * SCALE // n, ece // n, br // (n * SCALE))
            for g, (n, p, ece, br) in tot.items()}


def test_calibration_summary_pins_python_model(spark):
    rows, df = _mk_scored(spark, seed=123)
    from cascading_flink_spark.extensions import calibration_summary
    got = {r.g: (r.n, r.pos_rate_x, r.ece_x, r.brier_x)
           for r in calibration_summary(df, "p", "label",
                                        group_col="g").collect()}
    assert got == _summary_model(rows)


def test_calibration_summary_perfectly_calibrated_bins(spark):
    """A bin whose empirical rate equals its mean score contributes 0
    to ECE exactly (the telescoped integer numerator, not a rounded
    difference): p=0.5 with half positives -> ece_x = 0."""
    rows = [("x", 0.5, 1), ("x", 0.5, 0), ("x", 0.5, 1), ("x", 0.5, 0)]
    df = spark.createDataFrame(rows, "g string, p double, label int")
    from cascading_flink_spark.extensions import calibration_summary
    [r] = calibration_summary(df, "p", "label").collect()
    assert r.ece_x == 0
    assert r.brier_x == SCALE // 4  # (0.5)^2 in units of 1/scale


# --------------------------------------------- pr_threshold_stats


def _pr_model(rows):
    from collections import defaultdict
    cnt = defaultdict(lambda: [0, 0])
    for g, s, lab in rows:
        c = cnt[(g, s)]
        c[0] += lab
        c[1] += 1 - lab
    per_g = defaultdict(list)
    for (g, s), (p, q) in cnt.items():
        per_g[g].append((s, p, q))
    out = {}
    for g, lst in per_g.items():
        lst.sort(key=lambda t: -t[0])
        tot = sum(p for _s, p, _q in lst)
        if tot == 0:
            continue
        tp = fp = 0
        for s, p, q in lst:
            tp += p
            fp += q
            fn = tot - tp
            out[(g, s)] = (tp, fp, fn, tp * SCALE // (tp + fp),
                           tp * SCALE // tot,
                           2 * tp * SCALE // (2 * tp + fp + fn))
    return out


def test_pr_threshold_stats_pins_python_model(spark):
    rng = random.Random(124)
    rows = [(["en", "de"][rng.randrange(2)], rng.randrange(40),
             rng.randrange(2)) for _ in range(500)]
    # a one-class group must vanish from the output entirely
    rows += [("zz", 7, 0), ("zz", 9, 0)]
    df = spark.createDataFrame(rows, "g string, s long, label int")
    from cascading_flink_spark.extensions import pr_threshold_stats
    got = {(r.g, r.threshold): (r.tp, r.fp, r.fn, r.precision_x1e6,
                                r.recall_x1e6, r.f1_x1e6)
           for r in pr_threshold_stats(df, "s", "label",
                                       group_col="g").collect()}
    assert got == _pr_model([r for r in rows if r[0] != "zz"])
    assert not any(g == "zz" for g, _s in got)


def test_pr_threshold_stats_sweep_shape(spark):
    """Recall is monotonically non-increasing in the threshold, hits
    1e6 at the lowest threshold, and the lowest threshold's precision
    equals the base rate."""
    rng = random.Random(125)
    rows = [("g", rng.randrange(25), rng.randrange(2))
            for _ in range(300)]
    df = spark.createDataFrame(rows, "g string, s long, label int")
    from cascading_flink_spark.extensions import pr_threshold_stats
    out = sorted((r.threshold, r.recall_x1e6, r.precision_x1e6, r.tp,
                  r.fp)
                 for r in pr_threshold_stats(df, "s", "label",
                                             group_col="g").collect())
    recalls = [r for _t, r, _p, _tp, _fp in out]
    assert recalls == sorted(recalls, reverse=True)
    assert out[0][1] == SCALE  # threshold = min score retrieves all
    n_pos = sum(l for _g, _s, l in rows)
    assert out[0][2] == n_pos * SCALE // len(rows)


def test_pr_threshold_stats_quantize_path(spark):
    """quantize_x buckets a continuous score in-plan (the
    classifier_auc contract) — same result as pre-quantizing by
    hand."""
    rng = random.Random(126)
    rows = [("g", rng.randrange(200), rng.randrange(2))
            for _ in range(300)]
    df = (spark.createDataFrame(rows, "g string, sq long, label int")
          .withColumn("raw", F.col("sq") / F.lit(10.0)))
    from cascading_flink_spark.extensions import pr_threshold_stats
    a = {(r.g, r.threshold): (r.tp, r.fp, r.f1_x1e6)
         for r in pr_threshold_stats(df, "raw", "label", group_col="g",
                                     quantize_x=10).collect()}
    b = {(r.g, r.threshold): (r.tp, r.fp, r.f1_x1e6)
         for r in pr_threshold_stats(df, "sq", "label",
                                     group_col="g").collect()}
    assert a == b
    with pytest.raises(ValueError, match="quantize_x"):
        pr_threshold_stats(df, "raw", "label", quantize_x=0)


def test_pr_threshold_stats_plan_reduced_frame_no_python(spark):
    """The groupBy shuffles the CORPUS once; both windows then ride
    the (group, distinct score) reduced frame — exactly 2 exchanges,
    no Python eval."""
    rng = random.Random(127)
    rows = [("g", rng.randrange(25), rng.randrange(2))
            for _ in range(100)]
    df = spark.createDataFrame(rows, "g string, s long, label int")
    from cascading_flink_spark.extensions import pr_threshold_stats
    plan = _plan(pr_threshold_stats(df, "s", "label", group_col="g"))
    assert "EvalPython" not in plan
    assert plan.count("Exchange") == 2


# ------------------------------------------------ label_agreement


def _agree_model(rows, min_votes=1):
    from collections import defaultdict
    cnt = defaultdict(lambda: defaultdict(int))
    for item, lab in rows:
        if lab is not None:
            cnt[item][lab] += 1
    out = {}
    for item, labs in cnt.items():
        n = sum(labs.values())
        if n < min_votes:
            continue
        maj, mn = sorted(labs.items(), key=lambda t: (-t[1], t[0]))[0]
        out[item] = (n, len(labs), maj, mn, mn * SCALE // n)
    return out


def test_label_agreement_pins_python_model(spark):
    rng = random.Random(128)
    rows = [(rng.randrange(40),
             ["good", "bad", "spam", None][rng.randrange(4)])
            for _ in range(600)]
    df = spark.createDataFrame(rows, "item long, lab string")
    from cascading_flink_spark.extensions import label_agreement
    got = {r.item: (r.n_votes, r.n_labels, r.majority_label,
                    r.majority_n, r.agreement_x1e6)
           for r in label_agreement(df, "item", "lab").collect()}
    assert got == _agree_model(rows)


def test_label_agreement_tiebreak_and_min_votes(spark):
    """A 2-2 tie resolves to the ASC-smaller label in the label's OWN
    ordering; min_votes drops thin items AFTER null exclusion."""
    rows = [(1, "b"), (1, "b"), (1, "a"), (1, "a"),
            (2, "z"), (2, None), (3, None)]
    df = spark.createDataFrame(rows, "item long, lab string")
    from cascading_flink_spark.extensions import label_agreement
    got = {r.item: (r.majority_label, r.agreement_x1e6, r.n_votes)
           for r in label_agreement(df, "item", "lab").collect()}
    assert got == {1: ("a", SCALE // 2, 4), 2: ("z", SCALE, 1)}
    got2 = {r.item for r in label_agreement(df, "item", "lab",
                                            min_votes=2).collect()}
    assert got2 == {1}
    with pytest.raises(ValueError, match="min_votes"):
        label_agreement(df, "item", "lab", min_votes=0)


def test_label_agreement_keeps_label_type(spark):
    """Integer labels stay integers (the connected_components
    type-preservation convention) and order numerically: 9 < 11 for
    the tiebreak only if compared as INTs."""
    rows = [(1, 9), (1, 11), (1, 11), (1, 9)]
    df = spark.createDataFrame(rows, "item long, lab long")
    from cascading_flink_spark.extensions import label_agreement
    [r] = label_agreement(df, "item", "lab").collect()
    assert r.majority_label == 9 and isinstance(r.majority_label, int)
    [t] = [f.dataType.simpleString()
           for f in label_agreement(df, "item", "lab").schema
           if f.name == "majority_label"]
    assert t == "bigint"


def test_label_agreement_plan_reduced_frame_no_python(spark):
    rows = [(i % 7, str(i % 3)) for i in range(100)]
    df = spark.createDataFrame(rows, "item long, lab string")
    from cascading_flink_spark.extensions import label_agreement
    plan = _plan(label_agreement(df, "item", "lab"))
    assert "EvalPython" not in plan
    # corpus shuffles once onto (item, label); the window re-keys the
    # REDUCED votes-per-item frame onto item
    assert plan.count("Exchange") == 2
