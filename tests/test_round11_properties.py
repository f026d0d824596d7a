"""Property pins for the round-11 ops: each Spark operator must equal
a direct Python replay of the exact arithmetic on arbitrary small
random inputs."""

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

from pyspark.sql import functions as F

from cascading_flink_spark.extensions import (
    classifier_auc, grouped_rank, ngram_containment_pairs,
    session_funnel,
)

# small vocab so shared shingles happen often
docs_strategy = st.lists(
    st.tuples(st.integers(0, 30),
              st.lists(st.sampled_from(list("abcde")),
                       min_size=0, max_size=8)),
    min_size=1, max_size=10, unique_by=lambda d: d[0])


def _py_containment(docs, n, t):
    sh = {}
    for i, toks in docs:
        text = " ".join(toks)
        tk = text.strip().lower().split() if text.strip() else []
        sh[i] = {" ".join(tk[j:j + n]) for j in range(len(tk) - n + 1)}
    out = {}
    for a, sa in sh.items():
        if not sa:
            continue
        for b, sb in sh.items():
            if a == b:
                continue
            c = len(sa & sb)
            if c / len(sa) >= t:
                out[(a, b)] = (c, round(c / len(sa), 4))
    return out


@settings(max_examples=6, deadline=None)
@given(docs=docs_strategy)
def test_ngram_containment_matches_python_model(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs],
        "doc_id long, text string")
    got = {(r.id_a, r.id_b): (r.n_common, r.containment)
           for r in ngram_containment_pairs(df, n=2,
                                            threshold=0.6).collect()}
    assert got == _py_containment(docs, 2, 0.6)


rows_strategy = st.lists(
    st.tuples(st.integers(0, 40), st.integers(0, 1),
              st.integers(0, 5), st.integers(0, 1)),
    min_size=2, max_size=25, unique_by=lambda r: r[0])


def _py_auc(rows):
    out = {}
    for g in {r[1] for r in rows}:
        pos = [s for _, gg, s, l in rows if gg == g and l == 1]
        neg = [s for _, gg, s, l in rows if gg == g and l == 0]
        if pos and neg:
            num2 = sum(2 if p > n else (1 if p == n else 0)
                       for p in pos for n in neg)
            out[g] = num2 * 1_000_000 // (2 * len(pos) * len(neg))
    return out


@settings(max_examples=8, deadline=None)
@given(rows=rows_strategy)
def test_classifier_auc_matches_python_model(spark, rows):
    df = spark.createDataFrame(rows, "id long, g long, s long, label int")
    got = {r.g: r.auc_x1e6
           for r in classifier_auc(df, "s", "label", group_col="g")
           .collect()}
    assert got == _py_auc(rows)


grank_strategy = st.lists(
    st.tuples(st.integers(0, 50), st.integers(0, 2), st.integers(0, 4)),
    min_size=1, max_size=25, unique_by=lambda r: r[0])


@settings(max_examples=6, deadline=None)
@given(rows=grank_strategy)
def test_grouped_rank_matches_python_model(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, g long, s long")
    got = {r.doc_id: r.rk
           for r in grouped_rank(df, "g", "s", id_col="doc_id",
                                 rank_col="rk", buckets=4,
                                 sample_cap=8).collect()}
    want = {}
    for g in {r[1] for r in rows}:
        grp = sorted((s, i) for i, gg, s in rows if gg == g)
        for rk, (_, i) in enumerate(grp, start=1):
            want[i] = rk
    assert got == want


funnel_events = st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 30),
              st.integers(0, 40), st.sampled_from(["a", "b", "c"])),
    min_size=1, max_size=18, unique_by=lambda e: e[1])

GAP = 7
STEPS = ["a", "b", "a"]


def _py_session_funnel(events, gap, steps):
    by_key = {}
    for u, i, ts, t in events:
        by_key.setdefault(u, []).append((ts, i, t))
    counts = [0] * len(steps)
    for rows in by_key.values():
        rows.sort()
        sessions, cur, last = [], [], None
        for ts, i, t in rows:
            if last is not None and ts - last > gap:
                sessions.append(cur)
                cur = []
            cur.append((ts, t))
            last = ts
        sessions.append(cur)
        for sess in sessions:
            times = [None] * len(steps)
            for j, s in enumerate(steps):
                cand = [ts for ts, t in sess if t == s
                        and (j == 0 or (times[j - 1] is not None
                                        and ts > times[j - 1]))]
                times[j] = min(cand) if cand else None
            for j in range(len(steps)):
                if times[j] is not None:
                    counts[j] += 1
    return {steps[j] + str(j + 1): counts[j]
            for j in range(len(steps))}


@settings(max_examples=8, deadline=None)
@given(events=funnel_events)
def test_session_funnel_matches_python_model(spark, events):
    df = spark.createDataFrame(
        events, "user_id long, event_id long, us long, event_type string"
    ).select("user_id", "event_id", "event_type",
             F.timestamp_micros(F.col("us")).alias("ts"))
    got = {r.step_name + str(r.step): r.n_sessions
           for r in session_funnel(df, STEPS, gap_us=GAP).collect()}
    assert got == _py_session_funnel(events, GAP, STEPS)
