"""Property pins for the round-12 ops.

The load-bearing one: dup_substring_spans must equal the DIRECT
definition — enumerate EVERY token substring of length >= L, count
occurrences corpus-wide, mark the positions of every substring
occurring >= min_count times, take maximal runs — on arbitrary small
corpora.  The operator computes only duplicated length-EXACTLY-L
windows; agreement here is the coverage theorem its docstring proves
(suffix-array subsumption, VERDICT r11 What's-missing #2)."""

from __future__ import annotations

import pytest

# Round-15 (VERDICT r14 Next #2): brute-force property/golden suite —
# skipped on the default path, runs under SPARK_GRAFT_FULL_TESTS=1 /
# --runslow (the round-close full gate).
pytestmark = pytest.mark.slow


try:
    from hypothesis import given, settings, strategies as st
except ImportError:                                    # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from cascading_flink_spark.extensions import dup_substring_spans

# tiny vocab + short docs => repeats are common, enumeration is cheap
corpus_strategy = st.lists(
    st.tuples(st.integers(0, 20),
              st.lists(st.sampled_from(list("abc")),
                       min_size=0, max_size=14)),
    min_size=1, max_size=8, unique_by=lambda d: d[0])


def _direct_spans(docs, L, min_count):
    """The definition, verbatim: every substring (token tuple) of
    length >= L, occurrence-counted over ALL positions of ALL docs."""
    from collections import Counter
    occ = Counter()
    for _id, toks in docs:
        for m in range(L, len(toks) + 1):
            for i in range(len(toks) - m + 1):
                occ[tuple(toks[i:i + m])] += 1
    covered = {}
    for _id, toks in docs:
        cov = set()
        for m in range(L, len(toks) + 1):
            for i in range(len(toks) - m + 1):
                if occ[tuple(toks[i:i + m])] >= min_count:
                    cov.update(range(i, i + m))
        covered[_id] = cov
    spans = set()
    for _id, cov in covered.items():
        for p in sorted(cov):
            if p - 1 not in cov:
                q = p
                while q + 1 in cov:
                    q += 1
                spans.add((_id, p, q, q - p + 1))
    return spans


@settings(max_examples=25, deadline=None)
@given(docs=corpus_strategy, L=st.integers(2, 4))
def test_dup_substring_spans_equals_direct_enumeration(spark, docs, L):
    docs = [(i, toks) for i, toks in docs]
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs],
        "doc_id long, text string")
    got = {(r.doc_id, r.span_start, r.span_end, r.span_tokens)
           for r in dup_substring_spans(df, min_len=L).collect()}
    assert got == _direct_spans(docs, L, 2)


def test_dup_substring_spans_within_doc_and_overlapping_repeats(spark):
    """The modality dup_spans misses: occurrence counting marks a
    verbatim run repeated inside ONE document, including a
    self-overlapping period-1 run ('a a a a a')."""
    rows = [
        # 'x y z w' appears twice within doc 1 only
        (1, "x y z w q q q q p p x y z w"),
        # self-overlapping: 5 'a's => 'a a a a' (L=4) at pos 0 and 1
        (2, "a a a a a"),
        (3, "nothing shared here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.span_start, r.span_end)
           for r in dup_substring_spans(df, min_len=4).collect()}
    assert (1, 0, 3) in got and (1, 10, 13) in got
    assert (2, 0, 4) in got
    assert not any(d == 3 for d, *_ in got)
    # dup_spans (distinct-doc counting) finds NONE of these
    from cascading_flink_spark.extensions import dup_spans
    assert dup_spans(df, k=4, min_docs=2).count() == 0


def _direct_partner_spans(docs, L, min_count):
    """Round-13 partner model: L-window islands (the operator's plan,
    already proven == the >=L-substring coverage by the tests above),
    each span attributed to the minimal OTHER occurrence of its FIRST
    duplicated window — operator semantics: m1 unless self IS m1,
    else m2; equivalently min occurrence != self."""
    from collections import defaultdict
    occ = defaultdict(list)
    for _id, toks in docs:
        for i in range(len(toks) - L + 1):
            occ[tuple(toks[i:i + L])].append((_id, i))
    out = set()
    for _id, toks in docs:
        dpos = sorted(i for i in range(len(toks) - L + 1)
                      if len(occ[tuple(toks[i:i + L])]) >= min_count)
        islands = []
        for p in dpos:
            if islands and p <= islands[-1][-1] + L:
                islands[-1].append(p)
            else:
                islands.append([p])
        for isl in islands:
            p0 = isl[0]
            cand = sorted(occ[tuple(toks[p0:p0 + L])])
            partner = cand[1] if cand[0] == (_id, p0) else cand[0]
            out.add((_id, isl[0], isl[-1] + L - 1,
                     partner[0], partner[1]))
    return out


@settings(max_examples=25, deadline=None)
@given(docs=corpus_strategy, L=st.integers(2, 4))
def test_dup_substring_partners_match_direct_model(spark, docs, L):
    docs = [(i, toks) for i, toks in docs]
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs],
        "doc_id long, text string")
    rows = dup_substring_spans(df, min_len=L,
                               with_partners=True).collect()
    got = {(r.doc_id, r.span_start, r.span_end,
            r.partner_doc, r.partner_pos) for r in rows}
    assert got == _direct_partner_spans(docs, L, 2)
    # partner is never the span's own first window occurrence, and the
    # span columns are bit-identical to the partner-free path
    assert all((r.partner_doc, r.partner_pos)
               != (r.doc_id, r.span_start) for r in rows)
    base = {(r.doc_id, r.span_start, r.span_end, r.span_tokens,
             r.n_grams)
            for r in dup_substring_spans(df, min_len=L).collect()}
    assert {(r.doc_id, r.span_start, r.span_end, r.span_tokens,
             r.n_grams) for r in rows} == base


# ----------------------------- strip_dup_substrings (removal twin)

def _direct_strip(docs, L, min_count):
    """Window-level occurrence ownership, per the operator contract:
    lowercased window keys, lexicographically-first (doc, pos)
    occurrence is canonical, all other occurrences' positions removed."""
    from collections import defaultdict
    occ = defaultdict(list)
    for did, toks in docs:
        low = [t.lower() for t in toks]
        for i in range(len(low) - L + 1):
            occ[tuple(low[i:i + L])].append((did, i))
    removed = defaultdict(set)
    for g, lst in occ.items():
        if len(lst) >= min_count:
            owner = min(lst)
            for did, p in lst:
                if (did, p) != owner:
                    removed[did].update(range(p, p + L))
    out = {}
    for did, toks in docs:
        kept = [t for i, t in enumerate(toks) if i not in removed[did]]
        out[did] = (" ".join(kept), len(kept), len(toks) - len(kept))
    return out


@settings(max_examples=25, deadline=None)
@given(docs=corpus_strategy, L=st.integers(2, 4))
def test_strip_dup_substrings_matches_direct_model(spark, docs, L):
    from cascading_flink_spark.extensions import strip_dup_substrings
    docs = [(i, toks) for i, toks in docs]
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs],
        "doc_id long, text string")
    got = {r.doc_id: (r.clean_text, r.n_tokens_kept, r.n_tokens_removed)
           for r in strip_dup_substrings(df, min_len=L).collect()}
    assert got == _direct_strip(docs, L, 2)


def test_strip_dup_substrings_within_doc_and_ownership(spark):
    from cascading_flink_spark.extensions import (strip_dup_spans,
                                                  strip_dup_substrings)
    rows = [
        (1, "x y z w AND THEN x y z w"),          # within-doc repeat
        (2, "a b c d tail one"),
        (3, "a b c d tail two"),                  # doc 2 owns 'a b c d'
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in
           strip_dup_substrings(df, min_len=4).collect()}
    # second within-doc occurrence stripped, first kept (case intact)
    assert got[1].clean_text == "x y z w AND THEN"
    assert got[1].n_tokens_removed == 4
    # doc 2 (lexicographically first occurrence) keeps; doc 3 drops
    # BOTH shared windows ('a b c d' and 'b c d tail' -> tokens 0-4)
    assert got[2].clean_text == "a b c d tail one"
    assert got[3].clean_text == "two"
    assert got[3].n_tokens_removed == 5
    # strip_dup_spans' distinct-doc ownership KEEPS doc 1's repeat
    sds = {r.doc_id: r for r in strip_dup_spans(df, k=4).collect()}
    assert sds[1].n_tokens_removed == 0


def test_dup_rate_report_counts_coverage_once(spark):
    """dup_tokens must be exact coverage (disjoint islands summed),
    docs without spans count only in n_docs/total_tokens, empty docs
    don't divide."""
    from cascading_flink_spark.extensions import dup_rate_report
    rows = [
        (1, "en", "p q r s t u filler one"),     # 'p q r s' dup w/ doc 2
        (2, "en", "p q r s t u filler two"),     # covered: pos 0-5 (3 windows)
        (3, "en", "totally novel text here now"),
        (4, "xx", ""),                           # empty doc, lone group
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {r.lang: r for r in
           dup_rate_report(df, min_len=4, group_col="lang").collect()}
    en = got["en"]
    # docs 1,2 share windows at pos 0-3 -> one island covering 0..6
    # (7 tokens per doc, counted once each)
    assert (en.n_docs, en.n_dup_docs) == (3, 2)
    assert en.dup_tokens == 14 and en.total_tokens == 8 + 8 + 5
    assert en.dup_frac_x1e6 == 14 * 1_000_000 // 21
    assert (got["xx"].total_tokens, got["xx"].dup_frac_x1e6) == (0, 0)


# ---------------------- retrieval-eval twins: mrr_at_k / recall_at_k

# (query, doc, sim-rank-key) results + (query, doc, rel) judgments;
# unique (q, d) per table — the shared qrels contract
eval_strategy = st.tuples(
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 15),
                       st.integers(0, 100)),
             min_size=0, max_size=30,
             unique_by=lambda r: (r[0], r[1])),
    st.lists(st.tuples(st.integers(0, 3), st.integers(0, 15),
                       st.integers(0, 3)),
             min_size=1, max_size=25,
             unique_by=lambda r: (r[0], r[1])),
    st.integers(1, 5))


def _ranked_topk(results, k):
    by_q = {}
    for q, d, s in results:
        by_q.setdefault(q, []).append((d, s))
    out = {}
    for q, lst in by_q.items():
        lst.sort(key=lambda x: (-x[1], x[0]))
        out[q] = [d for d, _ in lst[:k]]
    return out


@settings(max_examples=30, deadline=None)
@given(data=eval_strategy)
def test_mrr_recall_match_python_model(spark, data):
    results, qrels, k = data
    from cascading_flink_spark.extensions import mrr_at_k, recall_at_k
    rdf = spark.createDataFrame(
        [(q, d, float(s)) for q, d, s in results] or
        [(None, None, None)],
        "query_id long, vec_id long, sim double").filter(
        "query_id is not null")
    qdf = spark.createDataFrame(qrels,
                                "query_id long, vec_id long, rel long")
    topk = _ranked_topk(results, k)
    pos = {}
    for q, d, r in qrels:
        if r >= 1:
            pos.setdefault(q, set()).add(d)
    exp_mrr, exp_rec = {}, {}
    for q, ds in pos.items():
        got = topk.get(q, [])
        fr = next((i + 1 for i, d in enumerate(got) if d in ds), 0)
        exp_mrr[q] = (fr, 1_000_000 // fr if fr else 0)
        nh = sum(1 for d in got if d in ds)
        exp_rec[q] = (nh, len(ds), nh * 1_000_000 // len(ds))
    got_mrr = {r.query_id: (r.first_rel_rank, r.mrr_x1e6)
               for r in mrr_at_k(rdf, qdf, k=k).collect()}
    got_rec = {r.query_id: (r.n_hit, r.n_rel, r.recall_x1e6)
               for r in recall_at_k(rdf, qdf, k=k).collect()}
    assert got_mrr == exp_mrr
    assert got_rec == exp_rec


def test_mrr_recall_judged_but_unretrieved_scores_zero(spark):
    from cascading_flink_spark.extensions import mrr_at_k, recall_at_k
    rdf = spark.createDataFrame([(1, 10, 0.9)],
                                "query_id long, vec_id long, sim double")
    qdf = spark.createDataFrame([(1, 10, 2), (2, 99, 3)],
                                "query_id long, vec_id long, rel long")
    m = {r.query_id: r.mrr_x1e6 for r in mrr_at_k(rdf, qdf).collect()}
    rc = {r.query_id: r.recall_x1e6
          for r in recall_at_k(rdf, qdf).collect()}
    assert m == {1: 1_000_000, 2: 0}
    assert rc == {1: 1_000_000, 2: 0}


def test_dup_substring_spans_validates(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="min_len"):
        dup_substring_spans(df, min_len=1)
    with pytest.raises(ValueError, match="min_count"):
        dup_substring_spans(df, min_count=1)


# ---------------------- round-12 eval family: hypothesis model pins


_scored_strategy = st.lists(
    st.tuples(st.sampled_from(["g1", "g2"]),
              st.integers(0, 30),          # quantized score
              st.integers(0, 1)),          # label
    min_size=1, max_size=60)


@given(data=_scored_strategy)
@settings(max_examples=25, deadline=None)
def test_pr_threshold_stats_matches_direct_model(spark, data):
    """pr_threshold_stats == the definition (sort distinct scores
    descending, cumulate, one truncating DIV per metric) on arbitrary
    tiny frames — including all-tie, all-one-class and single-row
    corpora."""
    from collections import defaultdict
    from cascading_flink_spark.extensions import pr_threshold_stats
    df = spark.createDataFrame(data, "g string, s long, label int")
    got = {(r.g, r.threshold): (r.tp, r.fp, r.fn, r.precision_x1e6,
                                r.recall_x1e6, r.f1_x1e6)
           for r in pr_threshold_stats(df, "s", "label",
                                       group_col="g").collect()}
    cnt = defaultdict(lambda: [0, 0])
    for g, s, l in data:
        cnt[(g, s)][0] += l
        cnt[(g, s)][1] += 1 - l
    per_g = defaultdict(list)
    for (g, s), (p, q) in cnt.items():
        per_g[g].append((s, p, q))
    expect = {}
    for g, lst in per_g.items():
        lst.sort(key=lambda t: -t[0])
        tot = sum(p for _s, p, _q in lst)
        if not tot:
            continue
        tp = fp = 0
        for s, p, q in lst:
            tp, fp = tp + p, fp + q
            expect[(g, s)] = (tp, fp, tot - tp,
                              tp * 10**6 // (tp + fp),
                              tp * 10**6 // tot,
                              2 * tp * 10**6 // (tp + fp + tot))
    assert got == expect


_vote_strategy = st.lists(
    st.tuples(st.integers(0, 6),
              st.one_of(st.none(), st.sampled_from(list("pqr")))),
    min_size=1, max_size=60)


@given(data=_vote_strategy)
@settings(max_examples=25, deadline=None)
def test_label_agreement_matches_direct_model(spark, data):
    """label_agreement == the definition (NULL votes out, majority by
    (count DESC, label ASC)) on arbitrary tiny vote tables —
    including all-NULL items, unanimous items and full ties."""
    from collections import defaultdict
    from cascading_flink_spark.extensions import label_agreement
    df = spark.createDataFrame(data, "item long, lab string")
    got = {r.item: (r.n_votes, r.n_labels, r.majority_label,
                    r.majority_n, r.agreement_x1e6)
           for r in label_agreement(df, "item", "lab").collect()}
    cnt = defaultdict(lambda: defaultdict(int))
    for item, lab in data:
        if lab is not None:
            cnt[item][lab] += 1
    expect = {}
    for item, labs in cnt.items():
        n = sum(labs.values())
        maj, mn = sorted(labs.items(), key=lambda t: (-t[1], t[0]))[0]
        expect[item] = (n, len(labs), maj, mn, mn * 10**6 // n)
    assert got == expect


_value_strategy = st.lists(st.integers(-50, 50), min_size=1,
                           max_size=80)


@given(vals=_value_strategy, lo=st.integers(0, 400),
       hi=st.integers(0, 400))
@settings(max_examples=25, deadline=None)
def test_trimmed_stats_matches_direct_model(spark, vals, lo, hi):
    """trimmed_stats' interval-overlap spelling == sort-and-slice on
    arbitrary values (negative values, dense ties, over-trim)."""
    from cascading_flink_spark.extensions import trimmed_stats
    df = spark.createDataFrame([("g", v) for v in vals],
                               "g string, v long")
    rows = trimmed_stats(df, "v", group_col="g", trim_lo_x1000=lo,
                         trim_hi_x1000=hi).collect()
    s = sorted(vals)
    n = len(s)
    LB, UB = n * lo // 1000 + 1, n - n * hi // 1000
    if LB > UB:
        assert rows == []
        return
    kept = s[LB - 1:UB]
    ksum, lo_cut, hi_cut = sum(kept), s[LB - 1], s[UB - 1]
    [r] = rows
    # Python // floors while the engines' DIV truncates toward zero —
    # match on the exact rational instead of reimplementing trunc
    import math
    trunc = lambda a, b: int(math.trunc(a / b)) if a % b else a // b
    assert (r.n, r.n_kept, r.lo_cut, r.hi_cut) == (n, len(kept),
                                                   lo_cut, hi_cut)
    assert r.trimmed_mean_x == trunc(ksum, len(kept))
    assert r.winsor_mean_x == trunc(
        ksum + lo_cut * (LB - 1) + hi_cut * (n - UB), n)


# ------------------------- the late-session two-sample drift family


import math as _math


def _rnd_half_up(x):
    return _math.floor(x + 0.5)


def _lnx(v):
    return _rnd_half_up(_math.log(v) * 1_000_000)


counts_strategy = st.dictionaries(
    st.sampled_from(list("abcdef")), st.integers(1, 40),
    min_size=1, max_size=6)


def _mk_two(spark, ca, cb):
    rows_a = [("g", k) for k, c in sorted(ca.items()) for _ in range(c)]
    rows_b = [("g", k) for k, c in sorted(cb.items()) for _ in range(c)]
    return (spark.createDataFrame(rows_a, "g string, k string"),
            spark.createDataFrame(rows_b, "g string, k string"))


@settings(max_examples=20, deadline=None)
@given(ca=counts_strategy, cb=counts_strategy)
def test_psi_chi2_jsd_equal_direct_models(spark, ca, cb):
    """On arbitrary small two-sample count tables all three
    categorical drift scores equal their direct Python models
    exactly (every division truncating, every ln rounded once), and
    the family invariants hold: PSI >= 0, JSD in [0, ln 2], chi2 >=
    0, all three 0 on identical tables."""
    from cascading_flink_spark.extensions import (chi2_drift,
                                                  js_divergence,
                                                  psi_drift)
    a, b = _mk_two(spark, ca, cb)
    na, nb = sum(ca.values()), sum(cb.values())
    keys = set(ca) | set(cb)
    SC = 1_000_000

    psi = psi_drift(a, b, "k", group_col="g").collect()[0]
    s = 0
    for k in keys:
        p = max(ca.get(k, 0) * SC // na, 1)
        q = max(cb.get(k, 0) * SC // nb, 1)
        s += (p - q) * (_lnx(p) - _lnx(q))
    assert (psi.n_a, psi.n_b, psi.n_keys) == (na, nb, len(keys))
    assert psi.psi_x1e6 == s // SC >= 0

    chi = chi2_drift(a, b, "k", group_col="g").collect()[0]
    s = 0
    for k in keys:
        x, y = ca.get(k, 0), cb.get(k, 0)
        d = x * nb - y * na
        s += d * d * 1000 // (x + y)
    assert chi.chi2_x1e3 == s // (na * nb) >= 0
    assert chi.dof == len(keys) - 1

    jsd = js_divergence(a, b, "k", group_col="g").collect()[0]
    s = 0
    for k in keys:
        p = ca.get(k, 0) * SC // na
        q = cb.get(k, 0) * SC // nb
        if p:
            s += p * (_lnx(2 * p) - _lnx(p + q))
        if q:
            s += q * (_lnx(2 * q) - _lnx(p + q))
    assert jsd.jsd_x1e6 == max(s, 0) // (2 * SC)
    assert 0 <= jsd.jsd_x1e6 <= 693_148


@settings(max_examples=20, deadline=None)
@given(va=st.lists(st.integers(0, 30), min_size=2, max_size=25),
       vb=st.lists(st.integers(0, 30), min_size=2, max_size=25))
def test_w1_equals_direct_model_and_bounds(spark, va, vb):
    """W1 equals the direct cdf-integral model on arbitrary integer
    samples, is symmetric, and is bounded by the value range."""
    from cascading_flink_spark.extensions import wasserstein_distance
    a = spark.createDataFrame([("g", v) for v in va], "g string, v long")
    b = spark.createDataFrame([("g", v) for v in vb], "g string, v long")
    r = wasserstein_distance(a, b, "v", group_col="g").collect()[0]
    vals = sorted(set(va) | set(vb))
    na, nb = len(va), len(vb)
    s = cuma = cumb = 0
    for v, nv in zip(vals, vals[1:]):
        cuma += va.count(v)
        cumb += vb.count(v)
        s += abs(cuma * nb - cumb * na) * (nv - v)
    assert (r.n_a, r.n_b) == (na, nb)
    assert r.w1_x == s * 1_000_000 // (na * nb)
    assert 0 <= r.w1_x <= (max(vals) - min(vals)) * 1_000_000
    r2 = wasserstein_distance(b, a, "v", group_col="g").collect()[0]
    assert r2.w1_x == r.w1_x
