"""Property-based pin for bigram_lm_scores: the Spark implementation must
match a direct Python model of the add-k bigram LM on arbitrary corpora
(tolerance +-1 on the x10000 integer — Java and C libm may differ in the
last ulp of ln)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

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
