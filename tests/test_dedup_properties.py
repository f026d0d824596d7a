"""Property-based pins for paragraph_dedup: the Spark implementation must
equal a direct Python model of its md5-first-occurrence semantics on
arbitrary corpora (hypothesis generates the docs; few examples — each is a
Spark job)."""

from __future__ import annotations

import hashlib
import math
import re

import pytest

# Round-15 (VERDICT r14 Next #2): brute-force property/golden suite —
# skipped on the default path, runs under SPARK_GRAFT_FULL_TESTS=1 /
# --runslow (the round-close full gate).
pytestmark = pytest.mark.slow


try:
    from hypothesis import given, settings, strategies as st
except ImportError:                                    # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from cascading_flink_spark.extensions import paragraph_dedup

WORDS = ["alpha", "beta", "gamma", "delta", "common", "footer"]

para_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=4).map(" ".join),
    min_size=1, max_size=5)
docs_strategy = st.lists(
    st.tuples(st.integers(0, 50), para_strategy),
    min_size=1, max_size=8).map(
        lambda rows: [(f"d{i}", paras)
                      for i, paras in {r[0]: r[1] for r in rows}.items()])


def _md5(seed, doc_id, idx):
    return hashlib.md5(f"{seed}#{doc_id}#{idx}".encode()).hexdigest()


def _model(docs, segs_of):
    """Python model: per distinct segment keep the min-md5 occurrence,
    reassemble in order."""
    occ = [(did, i, seg)
           for did, raw in docs for i, seg in enumerate(segs_of(raw))]
    keep_k = {}
    for did, i, seg in occ:
        k = _md5("pdedup", did, i)
        if seg not in keep_k or k < keep_k[seg][0]:
            keep_k[seg] = (k, did, i)
    kept = {(did, i) for _, did, i in keep_k.values()}
    out = {}
    for did, raw in docs:
        segs = [s for i, s in enumerate(segs_of(raw)) if (did, i) in kept]
        if segs:
            out[did] = segs
    return out


@settings(max_examples=5, deadline=None)
@given(docs_strategy)
def test_paragraph_mode_equals_python_model(spark, docs):
    rows = [(did, "\n\n".join(paras)) for did, paras in docs]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["clean_text"].split("\n\n"), r["n_kept"])
           for r in paragraph_dedup(df).collect()}
    expect = _model([(did, paras) for did, paras in docs], lambda p: p)
    assert {k: v[0] for k, v in got.items()} == expect
    assert all(n == len(expect[d]) for d, (_, n) in got.items())


@settings(max_examples=5, deadline=None)
@given(docs_strategy, st.integers(1, 3))
def test_window_mode_equals_python_model(spark, docs, k):
    rows = [(did, " ".join(w for p in paras for w in p.split()))
            for did, paras in docs]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    def segs_of(text):
        toks = re.split(r"\s+", text.strip(" "))
        n = math.ceil(len(toks) / k)
        return [" ".join(toks[i * k:(i + 1) * k]) for i in range(n)]

    got = {r["doc_id"]: r["clean_text"].split(" ")
           for r in paragraph_dedup(df, window_words=k).collect()}
    expect = _model(rows, segs_of)
    # window mode joins with single spaces; compare token streams
    exp_tokens = {d: [w for s in segs for w in s.split()]
                  for d, segs in expect.items()}
    assert got == exp_tokens
