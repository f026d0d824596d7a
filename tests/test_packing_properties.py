"""Property-based pins for the round-7 operators: pack_bins (both
strategies) and heavy_hitters must equal direct Python models of their
documented semantics on arbitrary inputs (hypothesis generates the
corpora; a few examples at small size — each example is a Spark job)."""

from __future__ import annotations

import hashlib
from bisect import bisect_left, insort

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

from cascading_flink_spark.extensions import heavy_hitters, pack_bins

# (doc_id, n_tokens) with unique ids; token counts straddle the capacity
docs_strategy = st.lists(
    st.tuples(st.integers(0, 300), st.integers(0, 25)),
    min_size=1, max_size=25).map(
        lambda rows: list({r[0]: r for r in rows}.values()))

CAP = 10


def _mk_docs(spark, rows):
    # materialize token counts as text (n one-char words)
    return spark.createDataFrame(
        [(i, "w " * n) for i, n in rows], "doc_id long, text string")


def _nextfit_model(rows, cap, bucket_chars=2):
    per_bucket: dict = {}
    for i, n in rows:
        if n > 0:
            h = hashlib.md5(str(i).encode()).hexdigest()
            per_bucket.setdefault(h[:bucket_chars], []).append((h, i, n))
    out, base = {}, 0
    for b in sorted(per_bucket):
        cur, fill = 0, 0
        for _, i, n in sorted(per_bucket[b]):
            if fill > 0 and fill + n > cap:
                cur += 1
                fill = 0
            out[i] = (n, base + cur, fill)
            fill += n
        base += cur + 1
    return out


def _bfd_model(rows, cap, bucket_chars=2):
    per_bucket: dict = {}
    for i, n in rows:
        if n > 0:
            h = hashlib.md5(str(i).encode()).hexdigest()
            per_bucket.setdefault(h[:bucket_chars], []).append((h, i, n))
    out, base = {}, 0
    for b in sorted(per_bucket):
        items = sorted(per_bucket[b])
        items.sort(key=lambda t: -t[2])
        fills, open_bins = [], []
        for _, i, n in items:
            j = bisect_left(open_bins, (n, -1))
            if j < len(open_bins):
                rem, k = open_bins.pop(j)
                out[i] = (n, base + k, fills[k])
                fills[k] += n
                if rem - n > 0:
                    insort(open_bins, (rem - n, k))
            else:
                k = len(fills)
                out[i] = (n, base + k, 0)
                fills.append(n)
                if cap - n > 0:
                    insort(open_bins, (cap - n, k))
        base += len(fills)
    return out


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_pack_bins_nextfit_matches_model(spark, rows):
    got = {r.doc_id: (r.n_tokens, r.bin, r.offset_in_bin)
           for r in pack_bins(_mk_docs(spark, rows), CAP).collect()}
    assert got == _nextfit_model(rows, CAP)


@settings(max_examples=8, deadline=None)
@given(docs_strategy)
def test_pack_bins_bfd_matches_model(spark, rows):
    got = {r.doc_id: (r.n_tokens, r.bin, r.offset_in_bin)
           for r in pack_bins(_mk_docs(spark, rows), CAP,
                              strategy="bfd").collect()}
    assert got == _bfd_model(rows, CAP)


keys_strategy = st.lists(
    st.sampled_from(["x", "y", "z", "w", None]), min_size=1, max_size=60)


@settings(max_examples=8, deadline=None)
@given(keys_strategy, st.integers(2, 6), st.integers(1, 4))
def test_heavy_hitters_matches_exact_groupby(spark, keys, k, parts):
    df = spark.createDataFrame([(v,) for v in keys],
                               "k string").repartition(parts)
    got = {(r.key, r.n) for r in heavy_hitters(df, "k", k=k).collect()}
    tot = len(keys)
    exact = {}
    for v in keys:
        exact[v] = exact.get(v, 0) + 1
    expect = {(v, n) for v, n in exact.items() if n * k > tot}
    assert got == expect
