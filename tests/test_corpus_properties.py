"""Property-based pin for bigram_lm_scores: the Spark implementation must
match a direct Python model of the add-k bigram LM on arbitrary corpora
(tolerance +-1 on the x10000 integer — Java and C libm may differ in the
last ulp of ln)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

# Round-15 (VERDICT r14 Next #2): brute-force property/golden suite —
# skipped on the default path, runs under SPARK_GRAFT_FULL_TESTS=1 /
# --runslow (the round-close full gate).
pytestmark = pytest.mark.slow


try:
    from hypothesis import given, settings, strategies as st
except ImportError:                                    # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from cascading_flink_spark.extensions import bigram_lm_scores

WORDS = ["the", "cat", "sat", "zq", "xv"]

docs_strategy = st.lists(
    st.tuples(st.integers(0, 30),
              st.lists(st.sampled_from(WORDS), min_size=0, max_size=6)),
    min_size=1, max_size=8).map(
        lambda rows: [(f"d{i}", toks)
                      for i, toks in {r[0]: r[1] for r in rows}.items()])


def _model(docs, k=1):
    occ = [(did, (t[i], t[i + 1]))
           for did, t in docs if len(t) >= 2 for i in range(len(t) - 1)]
    c2 = Counter(b for _, b in occ)
    c1 = Counter()
    for (w1, _), n in c2.items():
        c1[w1] += n
    vocab = len({w2 for (_, w2) in c2})
    out = {}
    for did, t in docs:
        if len(t) < 2:
            continue
        bs = [(t[i], t[i + 1]) for i in range(len(t) - 1)]
        nll = sum(math.log(c1[b[0]] + k * vocab) - math.log(c2[b] + k)
                  for b in bs) / len(bs)
        out[did] = (len(bs), math.floor(nll * 10000 + 0.5))
    return out


@settings(max_examples=5, deadline=None)
@given(docs_strategy)
def test_bigram_lm_equals_python_model(spark, docs):
    rows = [(did, " ".join(toks)) for did, toks in docs]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_bigrams"], r["nll_x10000"])
           for r in bigram_lm_scores(df).collect()}
    expect = _model(docs)
    assert set(got) == set(expect)
    for did in expect:
        assert got[did][0] == expect[did][0]
        assert abs(got[did][1] - expect[did][1]) <= 1, (did, got[did],
                                                        expect[did])


# --------------------------------------------------- overlap_chunks pin

chunk_params = st.tuples(st.integers(1, 10), st.integers(1, 12))
chunk_docs = st.lists(
    st.tuples(st.integers(0, 20), st.integers(0, 25)),
    min_size=1, max_size=6).map(
        lambda rows: [(i, n) for i, n in {r[0]: r[1] for r in rows}.items()])


def _chunk_model(n, context_len, stride):
    toks = [f"w{k}" for k in range(n)]
    if not toks:
        return []
    num = (1 if n <= context_len
           else min(1 + -(-(n - context_len) // stride),
                    1 + (n - 1) // stride))
    return [(j, len(toks[j * stride: j * stride + context_len]),
             " ".join(toks[j * stride: j * stride + context_len]))
            for j in range(num)]


@settings(max_examples=12, deadline=None)
@given(docs=chunk_docs, params=chunk_params)
def test_overlap_chunks_property(spark, docs, params):
    """For arbitrary token counts and any (context, stride) pair the
    chunk walk must match the Python model exactly."""
    from cascading_flink_spark.extensions import overlap_chunks
    context_len, stride = params
    df = spark.createDataFrame(
        [(i, " ".join(f"w{k}" for k in range(n))) for i, n in docs],
        "doc_id long, text string")
    got = {}
    for r in overlap_chunks(df, context_len, stride).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["chunk_tokens"], r["chunk_text"]))
    for i, n in docs:
        assert sorted(got.get(i, [])) == _chunk_model(n, context_len, stride)


# --------------------------------------------------------- oov_stats pin

oov_docs = st.lists(
    st.tuples(st.integers(0, 15),
              st.lists(st.sampled_from(["a", "b", "c", "x", "y", "z"]),
                       min_size=0, max_size=8)),
    min_size=1, max_size=8).map(
        lambda rows: [(i, toks) for i, toks in {r[0]: r[1] for r in rows}.items()])


@settings(max_examples=12, deadline=None)
@given(docs=oov_docs, min_df=st.integers(1, 4))
def test_oov_stats_property(spark, docs, min_df):
    from cascading_flink_spark.extensions import oov_stats
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["oov_x10000"])
           for r in oov_stats(df, min_df=min_df).collect()}
    dfreq = Counter()
    for _, toks in docs:
        for t in set(toks):
            dfreq[t] += 1
    for i, toks in docs:
        if not toks:
            assert i not in got
            continue
        n_oov = sum(1 for t in toks if dfreq[t] < min_df)
        assert got[i] == (len(toks), n_oov, n_oov * 10000 // len(toks)), \
            f"doc {i}"
