"""Round-12 late-session corpus-statistics operators: the diversity
data card (entropy / effective keys / Gini), PSI categorical drift,
the Zipf-exponent fit, vocabulary overlap, degree assortativity, and
the mean-confidence interval — each property-pinned against a direct
Python model, guard-raised on contract violations, and plan-asserted
(codegen-only, documented exchange/window shapes)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _rnd(x):
    # Spark/DuckDB round(double) is HALF-UP (away from zero); for the
    # positive values these models feed, floor(x + 0.5) is the twin
    # (Python's round() banker's-rounds and would drift on .5 cases)
    return math.floor(x + 0.5)


def _ln_x(v):
    return _rnd(math.log(v) * 1_000_000)


# ---------------------------------------------- diversity_report


def _diversity_model(counts):
    """counts: dict key -> count.  Returns the operator's row."""
    n = sum(counts.values())
    m = len(counts)
    slnc = sum(c * _ln_x(c) for c in counts.values())
    ent = _ln_x(n) - slnc // n
    norm = 0 if m < 2 else ent * 1_000_000 // _ln_x(m)
    eff = _rnd(math.exp(ent / 1_000_000.0) * 1000)
    gnum = sum(i * c for i, (_k, c)
               in enumerate(sorted(counts.items(),
                                   key=lambda kv: (kv[1], kv[0])), 1))
    gini = (2 * gnum - (m + 1) * n) * 1_000_000 // (m * n)
    return (n, m, ent, norm, eff, gini)


def test_diversity_report_pins_python_model(spark):
    rng = random.Random(1201)
    rows = [("g%d" % (i % 2), "k%02d" % rng.randrange(12))
            for i in range(500)]
    df = spark.createDataFrame(rows, "g string, k string")
    from cascading_flink_spark.extensions import diversity_report
    got = {r.g: (r.n, r.n_keys, r.entropy_x1e6, r.norm_entropy_x1e6,
                 r.eff_keys_x1e3, r.gini_x1e6)
           for r in diversity_report(df, "k", group_col="g").collect()}
    for g in ("g0", "g1"):
        counts = {}
        for gg, k in rows:
            if gg == g:
                counts[k] = counts.get(k, 0) + 1
        assert got[g] == _diversity_model(counts)


def test_diversity_report_extremes(spark):
    """One key -> entropy exactly 0, norm 0, eff 1.000, gini 0 (the
    single-key identity); a perfectly even split -> gini 0 and norm
    entropy ~1e6; NULL keys are excluded."""
    rows = ([("one", "a")] * 7
            + [("even", k) for k in "abcd" for _ in range(5)]
            + [("one", None)])
    df = spark.createDataFrame(rows, "g string, k string")
    from cascading_flink_spark.extensions import diversity_report
    got = {r.g: (r.n, r.n_keys, r.entropy_x1e6, r.norm_entropy_x1e6,
                 r.eff_keys_x1e3, r.gini_x1e6)
           for r in diversity_report(df, "k", group_col="g").collect()}
    assert got["one"] == (7, 1, 0, 0, 1000, 0)
    n, m, ent, norm, eff, gini = got["even"]
    assert (n, m, gini) == (20, 4, 0)
    assert abs(norm - 1_000_000) <= 2  # per-ln rounding, documented
    assert abs(eff - 4000) <= 1


def test_diversity_report_plan_reduced_frame(spark):
    """Codegen-only; ONE exchange for the corpus reduction (the
    row_number window and the rollup reuse the (g) partitioning —
    hash(g, k) does not satisfy partitionBy(g), so a second exchange
    onto g is expected — but never a third), no Python eval."""
    df = spark.createDataFrame([("a", "x")], "g string, k string")
    from cascading_flink_spark.extensions import diversity_report
    plan = _plan(diversity_report(df, "k", group_col="g"))
    assert "EvalPython" not in plan
    assert plan.count("Exchange") <= 2


# ---------------------------------------------- psi_drift


def _psi_model(ca, cb, scale=1_000_000):
    keys = set(ca) | set(cb)
    na, nb = sum(ca.values()), sum(cb.values())
    s = 0
    for k in keys:
        p = max(ca.get(k, 0) * scale // na, 1)
        q = max(cb.get(k, 0) * scale // nb, 1)
        s += (p - q) * (_ln_x(p) - _ln_x(q))
    return (na, nb, len(keys), s // scale)


def test_psi_drift_pins_python_model(spark):
    rng = random.Random(1202)
    ra = [("g", "k%d" % rng.randrange(8)) for _ in range(300)]
    rb = [("g", "k%d" % (rng.randrange(10))) for _ in range(200)]
    a = spark.createDataFrame(ra, "g string, k string")
    b = spark.createDataFrame(rb, "g string, k string")
    from cascading_flink_spark.extensions import psi_drift
    r = psi_drift(a, b, "k", group_col="g").collect()[0]
    ca, cb = {}, {}
    for _g, k in ra:
        ca[k] = ca.get(k, 0) + 1
    for _g, k in rb:
        cb[k] = cb.get(k, 0) + 1
    assert (r.n_a, r.n_b, r.n_keys, r.psi_x1e6) == _psi_model(ca, cb)


def test_psi_drift_properties(spark):
    """PSI(a, a) == 0; PSI >= 0 always; a key present in only one
    side contributes through the epsilon floor (and is the dominant
    term on a disjoint pair); one-sided groups are excluded; the
    scale guard raises."""
    rows = [("g", "x")] * 5 + [("g", "y")] * 3
    a = spark.createDataFrame(rows, "g string, k string")
    from cascading_flink_spark.extensions import psi_drift
    self_psi = psi_drift(a, a, "k", group_col="g").collect()[0]
    assert self_psi.psi_x1e6 == 0
    b = spark.createDataFrame([("g", "z")] * 8, "g string, k string")
    disj = psi_drift(a, b, "k", group_col="g").collect()[0]
    # fully disjoint support: each side's mass plays against the
    # 1-quantum floor -> PSI ~ 2 * ln(1e6) ~ 27.6
    assert disj.psi_x1e6 > 20_000_000
    # disjoint group supports: g has n_b = 0, h has n_a = 0 — both
    # one-sided, both excluded (the KS convention)
    only_h = spark.createDataFrame([("h", "x")], "g string, k string")
    assert psi_drift(a, only_h, "k", group_col="g").count() == 0
    with pytest.raises(ValueError, match="scale"):
        psi_drift(a, b, "k", scale=1000)
    plan = _plan(psi_drift(a, b, "k", group_col="g"))
    assert "EvalPython" not in plan
    assert "SortMergeJoin" not in plan  # union + re-agg, no join


# ---------------------------------------------- zipf_slope


def _zipf_model(tf_counts, top_n=100, min_rank=1):
    ranked = sorted(tf_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    pts = [(_ln_x(r), _ln_x(tf))
           for r, (_t, tf) in enumerate(ranked[:top_n], 1)
           if r >= min_rank]
    m = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    den = m * sxx - sx * sx
    if den <= 0:
        return None
    return m, round((m * sxy - sx * sy) / den, 4)


def test_zipf_slope_pins_python_model(spark):
    rng = random.Random(1203)
    # a Zipf-ish corpus: term t_i appears ~ 600/i times
    words = []
    for i in range(1, 40):
        words += ["t%02d" % i] * max(1, 600 // i)
    rng.shuffle(words)
    docs = [" ".join(words[i::10]) for i in range(10)]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    from cascading_flink_spark.extensions import zipf_slope
    r = zipf_slope(df, top_n=30).collect()[0]
    tf = {}
    for w in words:
        tf[w] = tf.get(w, 0) + 1
    m, slope = _zipf_model(tf, top_n=30)
    assert r.n_terms == m
    assert r.slope == pytest.approx(slope, abs=1e-4)
    assert -1.3 < r.slope < -0.7  # a 1/i corpus fits ~ -1


def test_zipf_slope_guards_and_plan(spark):
    df = spark.createDataFrame([("a a b",)], "text string")
    from cascading_flink_spark.extensions import zipf_slope
    with pytest.raises(ValueError, match="top_n"):
        zipf_slope(df, top_n=1)
    with pytest.raises(ValueError, match="min_rank"):
        zipf_slope(df, top_n=10, min_rank=10)
    # a single-distinct-term group has den = 0 -> excluded
    one = spark.createDataFrame([("x x x",)], "text string")
    assert zipf_slope(one, top_n=5).count() == 0
    # global path: the rank filter collapses the window onto a
    # TakeOrderedAndProject (LimitPushDownThroughWindow) — no full
    # vocabulary sort; grouped path: WindowGroupLimit prunes
    # per-group before the sort
    plan = _plan(zipf_slope(df, top_n=5))
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan
    gdf = spark.createDataFrame([("g1", "a a b")],
                                "lang string, text string")
    gplan = _plan(zipf_slope(gdf, group_col="lang", top_n=5))
    assert "WindowGroupLimit" in gplan


# ---------------------------------------------- vocab_overlap


def test_vocab_overlap_pins_python_model(spark):
    rng = random.Random(1204)
    va = ["w%02d" % rng.randrange(30) for _ in range(400)]
    vb = ["w%02d" % (rng.randrange(30) + 15) for _ in range(300)]
    a = spark.createDataFrame([(" ".join(va[i::5]),) for i in range(5)],
                              "text string")
    b = spark.createDataFrame([(" ".join(vb[i::5]),) for i in range(5)],
                              "text string")
    from cascading_flink_spark.extensions import vocab_overlap
    r = vocab_overlap(a, b, min_tf=2).collect()[0]

    def vocab(ws):
        tf = {}
        for w in ws:
            tf[w] = tf.get(w, 0) + 1
        return {w for w, c in tf.items() if c >= 2}
    sa, sb = vocab(va), vocab(vb)
    inter = len(sa & sb)
    assert (r.n_a, r.n_b, r.n_common) == (len(sa), len(sb), inter)
    assert r.jaccard_x1e6 == inter * 1_000_000 // len(sa | sb)
    assert r.contain_a_x1e6 == inter * 1_000_000 // len(sa)
    assert r.contain_b_x1e6 == inter * 1_000_000 // len(sb)


def test_vocab_overlap_edges(spark):
    """Disjoint vocabularies -> all ratios 0; identical -> all 1e6;
    an empty side is guarded to 0 (no divide-by-zero divergence);
    min_tf guard raises."""
    a = spark.createDataFrame([("x y z",)], "text string")
    b = spark.createDataFrame([("p q r",)], "text string")
    from cascading_flink_spark.extensions import vocab_overlap
    r = vocab_overlap(a, b).collect()[0]
    assert (r.jaccard_x1e6, r.contain_a_x1e6, r.contain_b_x1e6) \
        == (0, 0, 0)
    r = vocab_overlap(a, a).collect()[0]
    assert (r.jaccard_x1e6, r.contain_a_x1e6) == (1_000_000, 1_000_000)
    empty = spark.createDataFrame([("",)], "text string")
    r = vocab_overlap(a, empty).collect()[0]
    assert (r.n_b, r.jaccard_x1e6, r.contain_b_x1e6) == (0, 0, 0)
    with pytest.raises(ValueError, match="min_tf"):
        vocab_overlap(a, b, min_tf=0)


# ---------------------------------------------- degree_assortativity


def _pearson(pairs):
    n = len(pairs)
    sx = sum(x for x, _ in pairs)
    sy = sum(y for _, y in pairs)
    sxx = sum(x * x for x, _ in pairs)
    syy = sum(y * y for _, y in pairs)
    sxy = sum(x * y for x, y in pairs)
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    if dx <= 0 or dy <= 0:
        return None
    return round((n * sxy - sx * sy)
                 / (math.sqrt(dx) * math.sqrt(dy)), 4)


def _assort_model(edges):
    und = {}
    es = set()
    for s, d in edges:
        a, b = min(s, d), max(s, d)
        if a != b:
            es.add((a, b))
    deg = {}
    for a, b in es:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    pairs = [(deg[a], deg[b]) for a, b in es] \
        + [(deg[b], deg[a]) for a, b in es]
    return len(es), _pearson(pairs)


def test_degree_assortativity_star_is_minus_one(spark):
    """A star graph is maximally DISassortative: every edge pairs the
    hub (deg n-1) with a leaf (deg 1) -> rho = -1.0 exactly."""
    edges = [(0, i) for i in range(1, 7)]
    df = spark.createDataFrame(edges, "src long, dst long")
    from cascading_flink_spark.extensions import degree_assortativity
    r = degree_assortativity(df).collect()[0]
    assert (r.n_edges, r.rho) == (6, -1.0)


def test_degree_assortativity_pins_python_model(spark):
    rng = random.Random(1205)
    edges = [(rng.randrange(30), rng.randrange(30)) for _ in range(80)]
    df = spark.createDataFrame(edges, "src long, dst long")
    from cascading_flink_spark.extensions import degree_assortativity
    r = degree_assortativity(df).collect()[0]
    n_edges, rho = _assort_model(edges)
    assert r.n_edges == n_edges
    assert r.rho == pytest.approx(rho, abs=1e-4)


def test_degree_assortativity_regular_graph_excluded(spark):
    """A cycle is degree-regular (constant signal) -> rho undefined
    -> EMPTY frame (the signal_corr exclusion); self-loops drop."""
    cyc = [(i, (i + 1) % 5) for i in range(5)] + [(2, 2)]
    df = spark.createDataFrame(cyc, "src long, dst long")
    from cascading_flink_spark.extensions import degree_assortativity
    assert degree_assortativity(df).count() == 0


# ---------------------------------------------- mean_confidence


def _mean_ci_model(vals, z=1.96):
    n = len(vals)
    s, sxx = sum(vals), sum(v * v for v in vals)
    mean = s / n
    se = math.sqrt((n * sxx - s * s) / (n * n * (n - 1)))
    return round(mean, 4), round(mean - z * se, 4), \
        round(mean + z * se, 4)


def test_mean_confidence_pins_python_model(spark):
    rng = random.Random(1206)
    data = {"a": [rng.randrange(1000) for _ in range(211)],
            "b": [rng.randrange(50) for _ in range(17)]}
    rows = [(g, v) for g, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    from cascading_flink_spark.extensions import mean_confidence
    got = {r.g: (r.n, r.mean, r.lo, r.hi)
           for r in mean_confidence(df, "v", group_col="g").collect()}
    for g, vs in data.items():
        mean, lo, hi = _mean_ci_model(vs)
        gn, gm, glo, ghi = got[g]
        assert gn == len(vs)
        assert gm == pytest.approx(mean, abs=1e-4)
        assert glo == pytest.approx(lo, abs=1e-4)
        assert ghi == pytest.approx(hi, abs=1e-4)


def test_mean_confidence_edges_quantize_and_plan(spark):
    """n = 1 groups are excluded; constant values collapse the band
    to the mean; quantize_x buckets raw doubles (reported in
    quantized units); guards raise; single-exchange plan."""
    rows = [("solo", 5.0)] + [("const", 3.0)] * 9 \
        + [("x", 1.25), ("x", 1.75), ("x", 2.25)]
    df = spark.createDataFrame(rows, "g string, v double")
    from cascading_flink_spark.extensions import mean_confidence
    got = {r.g: (r.n, r.mean, r.lo, r.hi)
           for r in mean_confidence(df, "v", group_col="g",
                                    quantize_x=4).collect()}
    assert "solo" not in got
    assert got["const"] == (9, 12.0, 12.0, 12.0)  # 3.0 * 4, zero var
    assert got["x"][1] == 7.0  # (5 + 7 + 9) / 3 in quarter units
    with pytest.raises(ValueError, match="z_x1000"):
        mean_confidence(df, "v", z_x1000=-1)
    with pytest.raises(ValueError, match="quantize_x"):
        mean_confidence(df, "v", quantize_x=0)
    plan = _plan(mean_confidence(df, "v", group_col="g",
                                 quantize_x=4))
    assert "EvalPython" not in plan
    assert plan.count("Exchange") == 1


# ---------------------------------------------- chi2_drift


def _chi2_model(ca, cb):
    keys = set(ca) | set(cb)
    na, nb = sum(ca.values()), sum(cb.values())
    s = 0
    for k in keys:
        a, b = ca.get(k, 0), cb.get(k, 0)
        d = a * nb - b * na
        s += d * d * 1000 // (a + b)
    return (na, nb, len(keys), len(keys) - 1, s // (na * nb))


def test_chi2_drift_pins_python_model(spark):
    rng = random.Random(1207)
    ra = [("g", "k%d" % rng.randrange(6)) for _ in range(250)]
    rb = [("g", "k%d" % rng.randrange(8)) for _ in range(150)]
    a = spark.createDataFrame(ra, "g string, k string")
    b = spark.createDataFrame(rb, "g string, k string")
    from cascading_flink_spark.extensions import chi2_drift
    r = chi2_drift(a, b, "k", group_col="g").collect()[0]
    ca, cb = {}, {}
    for _g, k in ra:
        ca[k] = ca.get(k, 0) + 1
    for _g, k in rb:
        cb[k] = cb.get(k, 0) + 1
    assert (r.n_a, r.n_b, r.n_keys, r.dof, r.chi2_x1e3) \
        == _chi2_model(ca, cb)


def test_chi2_drift_properties(spark):
    """chi2(a, a) == 0 exactly (every cell numerator is 0); a
    PROPORTIONALLY scaled copy also scores 0 (homogeneity, not
    equality); the statistic GROWS with sample size at fixed shift
    (the property that separates it from PSI); one-sided groups are
    excluded; no joins in the plan."""
    rows = [("g", "x")] * 6 + [("g", "y")] * 3
    a = spark.createDataFrame(rows, "g string, k string")
    from cascading_flink_spark.extensions import chi2_drift
    assert chi2_drift(a, a, "k", group_col="g") \
        .collect()[0].chi2_x1e3 == 0
    b = spark.createDataFrame(rows * 3, "g string, k string")
    assert chi2_drift(a, b, "k", group_col="g") \
        .collect()[0].chi2_x1e3 == 0
    # fixed shift, growing n -> growing chi2
    sm_a = spark.createDataFrame([("g", "x")] * 6 + [("g", "y")] * 4,
                                 "g string, k string")
    sm_b = spark.createDataFrame([("g", "x")] * 4 + [("g", "y")] * 6,
                                 "g string, k string")
    lg_a = spark.createDataFrame([("g", "x")] * 60 + [("g", "y")] * 40,
                                 "g string, k string")
    lg_b = spark.createDataFrame([("g", "x")] * 40 + [("g", "y")] * 60,
                                 "g string, k string")
    small = chi2_drift(sm_a, sm_b, "k").collect()[0].chi2_x1e3
    large = chi2_drift(lg_a, lg_b, "k").collect()[0].chi2_x1e3
    assert large > small * 5
    plan = _plan(chi2_drift(a, b, "k", group_col="g"))
    assert "EvalPython" not in plan and "SortMergeJoin" not in plan


# ---------------------------------------------- js_divergence


def _jsd_model(ca, cb, scale=1_000_000):
    keys = set(ca) | set(cb)
    na, nb = sum(ca.values()), sum(cb.values())
    s = 0
    for k in keys:
        p = ca.get(k, 0) * scale // na
        q = cb.get(k, 0) * scale // nb
        if p:
            s += p * (_ln_x(2 * p) - _ln_x(p + q))
        if q:
            s += q * (_ln_x(2 * q) - _ln_x(p + q))
    return (na, nb, len(keys), max(s, 0) // (2 * scale))


def test_js_divergence_pins_python_model(spark):
    rng = random.Random(1208)
    ra = [("g", "k%d" % rng.randrange(7)) for _ in range(260)]
    rb = [("g", "k%d" % rng.randrange(9)) for _ in range(180)]
    a = spark.createDataFrame(ra, "g string, k string")
    b = spark.createDataFrame(rb, "g string, k string")
    from cascading_flink_spark.extensions import js_divergence
    r = js_divergence(a, b, "k", group_col="g").collect()[0]
    ca, cb = {}, {}
    for _g, k in ra:
        ca[k] = ca.get(k, 0) + 1
    for _g, k in rb:
        cb[k] = cb.get(k, 0) + 1
    assert (r.n_a, r.n_b, r.n_keys, r.jsd_x1e6) == _jsd_model(ca, cb)


def test_js_divergence_bounds(spark):
    """JSD(a, a) == 0; fully disjoint supports hit the ln 2 ceiling
    (~693147 at x1e6, up to quantization) and NEVER exceed it; no
    epsilon floor is involved (the PSI difference); scale guard
    raises."""
    rows = [("g", "x")] * 5 + [("g", "y")] * 3
    a = spark.createDataFrame(rows, "g string, k string")
    from cascading_flink_spark.extensions import js_divergence
    assert js_divergence(a, a, "k", group_col="g") \
        .collect()[0].jsd_x1e6 == 0
    b = spark.createDataFrame([("g", "z")] * 8, "g string, k string")
    d = js_divergence(a, b, "k", group_col="g").collect()[0].jsd_x1e6
    assert 690_000 <= d <= 693_148
    with pytest.raises(ValueError, match="scale"):
        js_divergence(a, b, "k", scale=1000)


# ------------------------------------- harmonic_centrality_sample


def test_harmonic_centrality_exact_censored_islands(spark):
    """On a 4-node path from the endpoint: harm = 1e6/1 + 1e6 DIV 2 +
    1e6 DIV 3 (exact truncating terms); a horizon of 1 censors to the
    direct-neighbour term; a disconnected island contributes 0 (the
    harmonic-vs-closeness point); guards mirror the BFS seed
    contract."""
    e = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (10, 11)],
                              "src long, dst long")
    from cascading_flink_spark.extensions import (
        harmonic_centrality_sample)
    got = {r.seed: (r.n_reached, r.harm_x1e6)
           for r in harmonic_centrality_sample(
               e, seeds=[0, 1, 10], max_hops=6).collect()}
    assert got[0] == (4, 1_000_000 + 500_000 + 333_333)
    assert got[1] == (4, 2_000_000 + 500_000)  # two at 1, one at 2
    assert got[10] == (2, 1_000_000)  # island: only its neighbour
    cens = harmonic_centrality_sample(e, seeds=[0],
                                      max_hops=1).collect()[0]
    assert (cens.n_reached, cens.harm_x1e6) == (2, 1_000_000)
    with pytest.raises(ValueError, match="non-empty"):
        harmonic_centrality_sample(e, seeds=[])
    with pytest.raises(ValueError, match="distinct"):
        harmonic_centrality_sample(e, seeds=[0, 0])
    with pytest.raises(Exception, match="seed"):
        harmonic_centrality_sample(e, seeds=[99],
                                   max_hops=2).collect()


def test_harmonic_centrality_star_hub_dominates(spark):
    """The hub of a star reaches every leaf at distance 1 (harm =
    (n-1) * 1e6); a leaf reaches the hub at 1 and the other leaves
    at 2 — the probe separates them 2:1 as n grows."""
    e = spark.createDataFrame([(0, i) for i in range(1, 9)],
                              "src long, dst long")
    from cascading_flink_spark.extensions import (
        harmonic_centrality_sample)
    got = {r.seed: r.harm_x1e6
           for r in harmonic_centrality_sample(
               e, seeds=[0, 1], max_hops=4).collect()}
    assert got[0] == 8_000_000
    assert got[1] == 1_000_000 + 7 * 500_000


# ------------------------------------------------- mrl composition


def test_mrl_identity_truncation_full_recall(spark):
    """Truncating to the FULL dimension is the identity: exact search
    on slice(embedding, 1, dim) against the full-dim exact top-k
    positives scores recall 1e6 for every query — the composition
    sanity pin behind the q_mrl_recall entry (16-dim truncation is
    gated against the DuckDB oracle instead)."""
    import __spark_entry__ as E
    from pyspark.sql import Window
    from cascading_flink_spark.extensions import (brute_force_topk,
                                                  recall_at_k)
    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    queries_df = (emb.filter(F.col("vec_id") < 3)
                  .select(F.col("vec_id").alias("query_id"),
                          "embedding"))
    truth = brute_force_topk(emb, queries_df, k=10)
    w = (Window.partitionBy("query_id")
         .orderBy(F.desc("sim"), F.asc("vec_id")))
    qrels = (truth.withColumn(
        "rel", (F.lit(11) - F.row_number().over(w)).cast("long"))
        .select("query_id", "vec_id", "rel"))
    out = recall_at_k(truth, qrels, k=10, rel_threshold=1).collect()
    assert len(out) == 3
    assert all(r.recall_x1e6 == 1_000_000 for r in out)


# ---------------------------------------------- fleiss_kappa


def _fleiss_model(votes, scale=1_000_000):
    """votes: list of (item, label).  Pooled-pairwise spelling."""
    per_item = {}
    for i, l in votes:
        per_item.setdefault(i, {})
        per_item[i][l] = per_item[i].get(l, 0) + 1
    A = P = 0
    for cs in per_item.values():
        ni = sum(cs.values())
        A += sum(c * (c - 1) for c in cs.values())
        P += ni * (ni - 1)
    marg = {}
    for _i, l in votes:
        marg[l] = marg.get(l, 0) + 1
    T = sum(marg.values())
    S = sum(t * t for t in marg.values())
    if P == 0 or T * T == S:
        return None
    def tdiv(a, b):  # trunc-toward-zero like Spark DIV / DuckDB //
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q
    return (len(per_item), T, A * scale // P, S * scale // (T * T),
            tdiv((A * T * T - P * S) * scale, P * (T * T - S)))


def test_fleiss_kappa_pins_python_model(spark):
    rng = random.Random(1209)
    votes = []
    for item in range(60):
        truth = "l%d" % (item % 4)
        for _r in range(rng.randrange(2, 6)):  # varying panel size
            votes.append((item, truth if rng.random() < 0.7
                          else "l%d" % rng.randrange(4)))
    df = spark.createDataFrame([("g", i, l) for i, l in votes],
                               "g string, item long, label string")
    from cascading_flink_spark.extensions import fleiss_kappa
    r = fleiss_kappa(df, "item", "label", group_col="g").collect()[0]
    assert (r.n_items, r.n_votes, r.po_x, r.pe_x, r.kappa_x) \
        == _fleiss_model(votes)


def test_fleiss_kappa_identities(spark):
    """Perfect agreement -> kappa exactly 1e6; with exactly 2 raters
    per item the pooled spelling reproduces cohen-style po; a
    single-vote item drops from the pairwise pool but feeds the
    marginals; all-one-label and no-pair groups are excluded;
    negative kappa (systematic disagreement) truncates toward
    zero."""
    perfect = [("p", i, "l%d" % (i % 3)) for i in range(9)] * 3
    df = spark.createDataFrame(perfect, "g string, item long, "
                                        "label string")
    from cascading_flink_spark.extensions import fleiss_kappa
    r = fleiss_kappa(df, "item", "label", group_col="g").collect()[0]
    assert (r.po_x, r.kappa_x) == (1_000_000, 1_000_000)
    # two items, two raters each, always disagreeing on a 2-label
    # alphabet with even marginals: po = 0, pe = 1/2, kappa = -1
    neg = [("n", 0, "a"), ("n", 0, "b"), ("n", 1, "b"), ("n", 1, "a")]
    df = spark.createDataFrame(neg, "g string, item long, "
                                    "label string")
    r = fleiss_kappa(df, "item", "label", group_col="g").collect()[0]
    assert (r.po_x, r.pe_x, r.kappa_x) == (0, 500_000, -1_000_000)
    # single-vote items only -> P = 0 -> excluded; constant label
    # -> T^2 == S -> excluded
    solo = [("s", 0, "a"), ("s", 1, "b")]
    df = spark.createDataFrame(solo, "g string, item long, "
                                     "label string")
    assert fleiss_kappa(df, "item", "label", group_col="g") \
        .count() == 0
    const = [("c", 0, "a"), ("c", 0, "a"), ("c", 1, "a")]
    df = spark.createDataFrame(const, "g string, item long, "
                                      "label string")
    assert fleiss_kappa(df, "item", "label", group_col="g") \
        .count() == 0
    with pytest.raises(ValueError, match="scale"):
        fleiss_kappa(df, "item", "label", scale=0)


# ---------------------------------------------- cluster_silhouette


def _silhouette_model(vecs, cents):
    """Direct Python twin: integer-scaled vectors, exact-int dots."""
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)
    agg = {}
    for v in vecs:
        sims = [cos(v, c) for c in cents]
        c1 = max(range(len(cents)),
                 key=lambda i: (sims[i], -i))  # strict > index order
        best = sims[c1]
        second = max(s for i, s in enumerate(sims) if i != c1) \
            if len(cents) > 1 else float("-inf")
        # fold semantics: cos2 is the multiset's 2nd-largest VALUE —
        # a tie with the max leaves second == best
        second = max(second,
                     max((s for i, s in enumerate(sims) if i != c1),
                         default=second))
        sx = 0 if 1.0 - second == 0 \
            else _rnd((best - second) / (1.0 - second) * 1_000_000)
        n, ss, mn = agg.get(c1, (0, 0, None))
        agg[c1] = (n + 1, ss + sx,
                   sx if mn is None else min(mn, sx))
    return {c: (n, ss // n, mn) for c, (n, ss, mn) in agg.items()}


def test_cluster_silhouette_pins_python_model(spark):
    """Zero Lloyd iterations freeze the centroids at the md5-ranked
    seeds, so the model can replay the WHOLE operator (fit + top-2
    fold + per-cluster rollup) with plain Python floats over the
    integer-scaled vectors."""
    rng = random.Random(1210)
    rows = [(i, [float(rng.randrange(-100, 101)) / 100
                 for _ in range(8)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding "
                                     "array<double>")
    from cascading_flink_spark.extensions import cluster_silhouette
    got = {r.cluster: (r.n, r.mean_sil_x, r.min_sil_x)
           for r in cluster_silhouette(df, k=4, iterations=0)
           .collect()}
    # replay: integer-scale, md5-rank the seeds like the operator
    import hashlib
    sv = {i: [round(x * 1_000_000) for x in v] for i, v in rows}
    seed_ids = sorted(sv, key=lambda i: hashlib.md5(
        str(i).encode()).hexdigest())[:4]
    cents = [sv[i] for i in seed_ids]
    expect = _silhouette_model(list(sv.values()), cents)
    assert got == expect


def test_cluster_silhouette_separated_vs_duplicate(spark):
    """Two well-separated orthogonal blobs score mean_sil at the
    ceiling region; duplicating every centroid (k = n with duplicate
    vectors) exercises the 1 - cos_next = 0 short-circuit to 0."""
    # place blobs by md5 rank so the two seeds (the md5-smallest
    # ids) come from DIFFERENT blobs — alternate rank -> blob
    import hashlib
    ranked = sorted(range(8), key=lambda i: hashlib.md5(
        str(i).encode()).hexdigest())
    rows = [(i, [1.0, 0.0, 0.0, 0.0] if r % 2 == 0
             else [0.0, 1.0, 0.0, 0.0])
            for r, i in enumerate(ranked)]
    df = spark.createDataFrame(rows,
                               "vec_id long, embedding array<double>")
    from cascading_flink_spark.extensions import cluster_silhouette
    out = cluster_silhouette(df, k=2, iterations=1).collect()
    assert {r.n for r in out} == {4}
    # orthogonal blobs: cos_own = 1, cos_next = 0 -> s = 1e6 exactly
    assert all(r.mean_sil_x == 1_000_000 for r in out)
    # identical vectors: every centroid duplicates -> cos_next = 1
    # -> the CASE shorts every point to 0
    same = spark.createDataFrame([(i, [1.0, 1.0]) for i in range(6)],
                                 "vec_id long, embedding "
                                 "array<double>")
    out = cluster_silhouette(same, k=2, iterations=1).collect()
    assert all(r.mean_sil_x == 0 and r.min_sil_x == 0 for r in out)


# ---------------------------------------------- wasserstein_distance


def _w1_model(va, vb, scale=1_000_000):
    vals = sorted(set(va) | set(vb))
    na, nb = len(va), len(vb)
    s = 0
    cuma = cumb = 0
    for v, nv in zip(vals, vals[1:]):
        cuma += sum(1 for x in va if x == v)
        cumb += sum(1 for x in vb if x == v)
        s += abs(cuma * nb - cumb * na) * (nv - v)
    return (na, nb, s * scale // (na * nb))


def test_wasserstein_pins_python_model(spark):
    rng = random.Random(1211)
    va = [rng.randrange(100) for _ in range(200)]
    vb = [rng.randrange(30, 160) for _ in range(150)]
    a = spark.createDataFrame([("g", v) for v in va],
                              "g string, v long")
    b = spark.createDataFrame([("g", v) for v in vb],
                              "g string, v long")
    from cascading_flink_spark.extensions import wasserstein_distance
    r = wasserstein_distance(a, b, "v", group_col="g").collect()[0]
    assert (r.n_a, r.n_b, r.w1_x) == _w1_model(va, vb)


def test_wasserstein_shift_and_edges(spark):
    """A constant +k shift of every value scores EXACTLY k*1e6 (the
    property KS flattens to its cap); identical samples score 0; a
    single-distinct-value pair still reports a row (w1 = 0 for
    equal, |delta| for distinct constants); W1 is symmetric."""
    va = [10, 20, 30, 40] * 5
    a = spark.createDataFrame([("g", v) for v in va],
                              "g string, v long")
    b = spark.createDataFrame([("g", v + 7) for v in va],
                              "g string, v long")
    from cascading_flink_spark.extensions import wasserstein_distance
    assert wasserstein_distance(a, a, "v", group_col="g") \
        .collect()[0].w1_x == 0
    r = wasserstein_distance(a, b, "v", group_col="g").collect()[0]
    assert r.w1_x == 7_000_000
    r2 = wasserstein_distance(b, a, "v", group_col="g").collect()[0]
    assert r2.w1_x == 7_000_000
    c1 = spark.createDataFrame([("g", 5)] * 4, "g string, v long")
    c2 = spark.createDataFrame([("g", 9)] * 6, "g string, v long")
    assert wasserstein_distance(c1, c1, "v", group_col="g") \
        .collect()[0].w1_x == 0
    assert wasserstein_distance(c1, c2, "v", group_col="g") \
        .collect()[0].w1_x == 4_000_000
    with pytest.raises(ValueError, match="quantize_x"):
        wasserstein_distance(c1, c2, "v", quantize_x=0)


# ---------------------------------------------- drift_series


def test_drift_series_pins_python_model(spark):
    """Integer epoch-truncation buckets + the shifted-union merge
    replayed in plain Python: per consecutive bucket pair, TV over
    the union support with corpus_drift quantization."""
    import datetime
    rng = random.Random(1212)
    base = datetime.datetime(2024, 3, 1)
    rows = []
    for h in range(6):
        for _ in range(rng.randrange(20, 40)):
            rows.append((base + datetime.timedelta(
                hours=h, seconds=rng.randrange(3600)),
                "k%d" % rng.randrange(4)))
    df = spark.createDataFrame(rows, "ts timestamp, k string")
    from cascading_flink_spark.extensions import drift_series
    got = {r.bucket_us: (r.n, r.n_prev, r.tv_x1e6)
           for r in drift_series(df, "k", bucket_s=3600).collect()}
    # model
    import collections
    SC = 1_000_000_000
    buckets = collections.defaultdict(collections.Counter)
    for ts, k in rows:
        b = int(ts.replace(tzinfo=datetime.timezone.utc)
                .timestamp() * 1_000_000) // 3_600_000_000 \
            * 3_600_000_000
        buckets[b][k] += 1
    expect = {}
    for b, cnt in buckets.items():
        prev = buckets.get(b - 3_600_000_000)
        if not prev:
            continue
        n, np_ = sum(cnt.values()), sum(prev.values())
        tv = sum(abs(cnt.get(k, 0) * SC // n
                     - prev.get(k, 0) * SC // np_)
                 for k in set(cnt) | set(prev))
        expect[b] = (n, np_, tv // 2 // 1000)
    assert got == expect
    assert len(got) == 5  # 6 buckets -> 5 consecutive pairs


def test_drift_series_step_change_and_gaps(spark):
    """A step change in the mix spikes exactly the boundary bucket;
    a bucket after an empty gap is EXCLUDED; guards raise."""
    import datetime
    base = datetime.datetime(2024, 3, 1)
    rows = ([(base + datetime.timedelta(hours=0, minutes=m), "a")
             for m in range(10)]
            + [(base + datetime.timedelta(hours=1, minutes=m), "a")
               for m in range(10)]
            + [(base + datetime.timedelta(hours=2, minutes=m), "b")
               for m in range(10)]
            # hour 3 empty; hour 4 has data -> excluded (gap)
            + [(base + datetime.timedelta(hours=4, minutes=m), "b")
               for m in range(10)])
    df = spark.createDataFrame(rows, "ts timestamp, k string")
    from cascading_flink_spark.extensions import drift_series
    out = sorted((r.bucket_us, r.tv_x1e6)
                 for r in drift_series(df, "k",
                                       bucket_s=3600).collect())
    assert len(out) == 2  # hours 1 and 2 only
    assert out[0][1] == 0          # a -> a: no drift
    assert out[1][1] == 1_000_000  # a -> b: total swap
    with pytest.raises(ValueError, match="bucket_s"):
        drift_series(df, "k", bucket_s=0)
    with pytest.raises(ValueError, match="scale"):
        drift_series(df, "k", scale=1000)


# ---------------------------------------------- readability_report


def test_readability_pins_python_model(spark):
    import re
    rng = random.Random(1213)
    vocab = ["data", "cat", "onomatopoeia", "a", "syzygy", "stream"]
    docs = []
    for _ in range(30):
        words = [vocab[rng.randrange(len(vocab))]
                 for _ in range(rng.randrange(3, 30))]
        txt = ""
        for i, w0 in enumerate(words):
            txt += w0 + ("." if rng.randrange(6) == 0 else " ")
        docs.append(("g", txt))
    df = spark.createDataFrame(docs, "g string, text string")
    from cascading_flink_spark.extensions import readability_report
    r = readability_report(df, group_col="g").collect()[0]
    W = S = Y = 0
    for _g, t in docs:
        w = len(t.strip().split()) if t.strip() else 0
        if w == 0:
            continue
        W += w
        S += max(len(re.findall(r"[.!?]+", t)), 1)
        Y += len(re.findall(r"[aeiouy]+", t.lower()))
    assert (r.n_docs, r.n_words, r.n_sentences, r.n_syllables) \
        == (30, W, S, Y)
    flesch = 206.835 - 1.015 * (W / S) - 84.6 * (Y / W)
    assert r.flesch == pytest.approx(round(flesch, 4), abs=1e-4)


def test_readability_edges(spark):
    """Empty/NULL docs count n_docs but no words; a fragment with no
    terminator is ONE sentence; an all-empty group is excluded; the
    known-sentence arithmetic is exact."""
    rows = [("e", ""), ("e", None),
            ("f", "no punctuation here"),
            ("k", "The cat sat. The dog ran!")]
    df = spark.createDataFrame(rows, "g string, text string")
    from cascading_flink_spark.extensions import readability_report
    got = {r.g: r for r in readability_report(df, group_col="g")
           .collect()}
    assert "e" not in got
    assert (got["f"].n_words, got["f"].n_sentences) == (3, 1)
    k = got["k"]
    assert (k.n_docs, k.n_words, k.n_sentences) == (1, 6, 2)
    # syllable runs: e|a|a|e|o|a: "the cat sat. the dog ran!" ->
    # the(1) cat(1) sat(1) the(1) dog(1) ran(1) = 6
    assert k.n_syllables == 6


def test_psi_jsd_large_scale_no_silent_wrap(spark):
    """At scale = 1e12 a long per-cell product would silently wrap
    on Spark (the classifier_auc overflow class) — the DECIMAL(38,0)
    intermediates must keep both scores exactly on the
    arbitrary-precision Python model."""
    rows_a = [("g", "x")] * 97 + [("g", "y")] * 3
    rows_b = [("g", "x")] * 5 + [("g", "y")] * 95
    a = spark.createDataFrame(rows_a, "g string, k string")
    b = spark.createDataFrame(rows_b, "g string, k string")
    from cascading_flink_spark.extensions import js_divergence, psi_drift
    SC = 10 ** 12
    r = psi_drift(a, b, "k", group_col="g", scale=SC).collect()[0]

    def model_psi(ca, cb):
        na, nb = sum(ca.values()), sum(cb.values())
        s = 0
        for k in set(ca) | set(cb):
            p = max(ca.get(k, 0) * SC // na, 1)
            q = max(cb.get(k, 0) * SC // nb, 1)
            s += (p - q) * (_ln_x(p) - _ln_x(q))
        return s // SC
    ca = {"x": 97, "y": 3}
    cb = {"x": 5, "y": 95}
    assert r.psi_x1e6 == model_psi(ca, cb)
    assert r.psi_x1e6 > 0

    r = js_divergence(a, b, "k", group_col="g", scale=SC).collect()[0]
    s = 0
    for k in ("x", "y"):
        p = ca[k] * SC // 100
        q = cb[k] * SC // 100
        if p:
            s += p * (_ln_x(2 * p) - _ln_x(p + q))
        if q:
            s += q * (_ln_x(2 * q) - _ln_x(p + q))
    assert r.jsd_x1e6 == max(s, 0) // (2 * SC)
    assert 0 < r.jsd_x1e6 <= 693_148

    # disjoint supports at scale 1e13: the PSI floor cell's product
    # is ~1e13 * ln(1e13)*1e6 ~ 3e20 — PAST 2^63, so a long
    # intermediate would definitely wrap; the exact answer is
    # 2 * ln(1e13) ~ 59.9
    big = 10 ** 13
    d1 = spark.createDataFrame([("g", "only_a")] * 4,
                               "g string, k string")
    d2 = spark.createDataFrame([("g", "only_b")] * 4,
                               "g string, k string")
    r = psi_drift(d1, d2, "k", group_col="g", scale=big).collect()[0]
    assert r.psi_x1e6 == 2 * (big - 1) * _ln_x(big) // big
    assert 59_000_000 < r.psi_x1e6 < 60_000_000


# ---------------------------------------------- data_card composition


def test_data_card_joins_broadcast(spark):
    """The four-card composition joins |languages|-sized frames —
    every join must resolve to BroadcastHashJoin (a SortMergeJoin
    here would shuffle four tiny frames three times)."""
    import __spark_entry__ as E
    df = E.queries()["data_card"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert plan.count("SortMergeJoin") == 0
    assert plan.count("BroadcastHashJoin") == 3
    out = {r.lang: r for r in df.collect()}
    # cross-card consistency on the same corpus slice
    for r in out.values():
        assert r.n_keys >= 1 and r.hhi_x1e6 >= 1_000_000 // r.n_keys
        assert r.chars_lo <= r.mean_chars <= r.chars_hi


# ---------------------------------------------- precision_at_k


def test_precision_at_k_budget_denominator(spark):
    """Hits divide by the serving BUDGET k, not the returned count —
    a perfect-but-short retrieval cannot score 1e6; a
    judged-but-unretrieved query reports (0, 0, 0); unjudged
    queries emit no row; k guard raises."""
    results = spark.createDataFrame(
        # q1: returns 3 rows, all relevant.  q2: nothing returned.
        [(1, 10, 0.9), (1, 11, 0.8), (1, 12, 0.7)],
        "query_id long, vec_id long, sim double")
    qrels = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 1), (1, 12, 1), (2, 20, 1),
         (3, 30, 0)],  # q3 judged only IRRELEVANT -> not in output
        "query_id long, vec_id long, rel int")
    from cascading_flink_spark.extensions import precision_at_k
    got = {r.query_id: (r.n_hit, r.n_ret, r.precision_x1e6)
           for r in precision_at_k(results, qrels, k=10).collect()}
    assert got == {1: (3, 3, 300_000), 2: (0, 0, 0)}
    # k truncation: only the top-k ranked rows count as hits
    got = {r.query_id: (r.n_hit, r.n_ret, r.precision_x1e6)
           for r in precision_at_k(results, qrels, k=2).collect()}
    assert got[1] == (2, 2, 1_000_000)
    with pytest.raises(ValueError, match="k must be"):
        precision_at_k(results, qrels, k=0)


# ---------------------------------------------- robust_spread


def _median_lower(vals):
    vals = sorted(vals)
    return vals[(len(vals) + 1) // 2 - 1]


def test_robust_spread_pins_python_model(spark):
    rng = random.Random(1214)
    data = {"a": [rng.randrange(500) for _ in range(301)],
            "b": [rng.randrange(50) for _ in range(40)]}
    rows = [(gv, x) for gv, xs in data.items() for x in xs]
    df = spark.createDataFrame(rows, "g string, v long")
    from cascading_flink_spark.extensions import robust_spread
    got = {r.g: (r.n, r.median_x, r.mad_x)
           for r in robust_spread(df, "v", group_col="g").collect()}
    for gv, xs in data.items():
        med = _median_lower(xs)
        mad = _median_lower([abs(x - med) for x in xs])
        assert got[gv] == (len(xs), med, mad)


def test_robust_spread_outlier_immunity_and_edges(spark):
    """One absurd outlier moves neither the median nor the MAD (the
    property mean/std lacks); constant values give MAD 0; the
    lower-median convention on even counts; quantize path; guard."""
    base = [("g", x) for x in (10, 20, 30, 40, 50)]
    df0 = spark.createDataFrame(base, "g string, v long")
    df1 = spark.createDataFrame(base + [("g", 10 ** 12)],
                                "g string, v long")
    from cascading_flink_spark.extensions import robust_spread
    r0 = robust_spread(df0, "v", group_col="g").collect()[0]
    r1 = robust_spread(df1, "v", group_col="g").collect()[0]
    assert (r0.median_x, r0.mad_x) == (30, 10)
    # 6 values -> lower-median rank 3: median stays 30; deviations
    # sorted (0,10,10,20,20,1e12) -> rank-3 MAD stays 10
    assert (r1.median_x, r1.mad_x) == (30, 10)
    const = spark.createDataFrame([("c", 7)] * 9, "g string, v long")
    rc = robust_spread(const, "v", group_col="g").collect()[0]
    assert (rc.median_x, rc.mad_x) == (7, 0)
    dq = spark.createDataFrame([("q", 1.25), ("q", 1.75), ("q", 9.0)],
                               "g string, v double")
    rq = robust_spread(dq, "v", group_col="g",
                       quantize_x=4).collect()[0]
    assert rq.median_x == 7  # 1.75 * 4 in quarter units
    with pytest.raises(ValueError, match="quantize_x"):
        robust_spread(dq, "v", quantize_x=0)
