"""Property pins for dup_spans / strip_dup_spans: the Spark plans must
equal direct Python models of the span semantics on arbitrary small
corpora (hypothesis generates docs from a tiny alphabet so k-gram
collisions are common; few examples — each is a Spark job)."""

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

from cascading_flink_spark.extensions import dup_spans, strip_dup_spans

K = 3
WORDS = ["a", "b", "c", "d"]

docs_strategy = st.lists(
    # min_size=1: SQL split('') yields [''] (one empty token) where
    # Python ''.split() yields [] — empty docs are a tokenization
    # convention diff, not span semantics, so keep them out of the pin
    st.tuples(st.integers(0, 20),
              st.lists(st.sampled_from(WORDS), min_size=1, max_size=12)),
    min_size=1, max_size=6).map(
        lambda rows: [(i, " ".join(toks))
                      for i, toks in {r[0]: r[1] for r in rows}.items()])


def _grams(toks):
    return [(p, " ".join(toks[p:p + K]))
            for p in range(len(toks) - K + 1)]


def _dup_positions(docs):
    """doc_id -> sorted positions whose k-gram occurs in >= 2 docs."""
    by_gram: dict[str, set[int]] = {}
    for did, text in docs:
        for _, g in _grams(text.split()):
            by_gram.setdefault(g, set()).add(did)
    dup = {g for g, ids in by_gram.items() if len(ids) >= 2}
    out = {}
    for did, text in docs:
        ps = sorted(p for p, g in _grams(text.split()) if g in dup)
        if ps:
            out[did] = ps
    return out


def _model_spans(docs):
    spans = set()
    for did, ps in _dup_positions(docs).items():
        start = prev = ps[0]
        grams = 1
        for p in ps[1:]:
            if p > prev + K:          # gap: close the island
                spans.add((did, start, prev + K - 1, prev - start + K,
                           grams))
                start, grams = p, 0
            prev = p
            grams += 1
        spans.add((did, start, prev + K - 1, prev - start + K, grams))
    return spans


def _model_strip(docs):
    by_gram: dict[str, list[tuple[int, int]]] = {}
    tok_of = {did: text.split() for did, text in docs}
    for did, text in docs:
        for p, g in _grams(text.split()):
            by_gram.setdefault(g, []).append((did, p))
    removed: dict[int, set[int]] = {}
    for g, occ in by_gram.items():
        ids = {d for d, _ in occ}
        if len(ids) < 2:
            continue
        owner = min(ids)
        for did, p in occ:
            if did != owner:
                removed.setdefault(did, set()).update(range(p, p + K))
    out = {}
    for did, toks in tok_of.items():
        rm = removed.get(did, set())
        kept = [t for i, t in enumerate(toks) if i not in rm]
        out[did] = (" ".join(kept), len(kept), len(toks) - len(kept))
    return out


@settings(max_examples=12, deadline=None)
@given(docs_strategy)
def test_dup_spans_matches_python_model(spark, docs):
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {(r["doc_id"], r["span_start"], r["span_end"],
            r["span_tokens"], r["n_grams"])
           for r in dup_spans(df, k=K, min_docs=2).collect()}
    assert got == _model_spans(docs)


@settings(max_examples=12, deadline=None)
@given(docs_strategy)
def test_strip_dup_spans_matches_python_model(spark, docs):
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_tokens_kept"],
                         r["n_tokens_removed"])
           for r in strip_dup_spans(df, k=K, min_docs=2).collect()}
    assert got == _model_strip(docs)


def _model_novelty(docs):
    by_gram: dict[str, set[int]] = {}
    for did, text in docs:
        for _, g in _grams(text.split()):
            by_gram.setdefault(g, set()).add(did)
    out = {}
    for did, text in docs:
        gs = [g for _, g in _grams(text.split())]
        novel = sum(1 for g in gs if len(by_gram[g]) == 1)
        out[did] = (len(gs), novel,
                    novel * 10000 // max(len(gs), 1))
    return out


@settings(max_examples=12, deadline=None)
@given(docs_strategy)
def test_gram_novelty_matches_python_model(spark, docs):
    from cascading_flink_spark.extensions import gram_novelty
    df = spark.createDataFrame(docs, "doc_id int, text string")
    got = {r["doc_id"]: (r["n_grams"], r["n_novel_grams"],
                         r["novelty_x10000"])
           for r in gram_novelty(df, k=K).collect()}
    assert got == _model_novelty(docs)
