"""Property pins for the graph family: pagerank (plain / weighted /
personalized) and hits must equal direct Python replays of the exact
integer arithmetic on arbitrary small random graphs."""

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

from cascading_flink_spark.extensions import (bfs_distances, hits, k_core,
                                              label_propagation, pagerank)

edges_strategy = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7), st.integers(1, 5)),
    min_size=1, max_size=14)

SCALE = 1_000_000


def _py_pagerank(edges, iters, d=85, weighted=False, seeds=None,
                 dangling="drop"):
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    deg = {}
    for s, _, w in edges:
        deg[s] = deg.get(s, 0) + (w if weighted else 1)
    if seeds is None:
        n = len(nodes)
        r = {v: SCALE // n for v in nodes}
        base = {v: (SCALE * (100 - d)) // (100 * n) for v in nodes}
    else:
        ss = set(seeds)
        r = {v: (SCALE // len(ss) if v in ss else 0) for v in nodes}
        sb = (SCALE * (100 - d)) // (100 * len(ss))
        base = {v: (sb if v in ss else 0) for v in nodes}
    dang = [v for v in nodes if v not in deg]
    for _ in range(iters):
        inc = {v: 0 for v in nodes}
        for s, t, w in edges:
            ww = w if weighted else 1
            inc[t] += (r[s] * d * ww) // (100 * deg[s])
        gain = {v: 0 for v in nodes}
        if dangling == "redistribute":
            pool = sum(r[v] for v in dang)
            if seeds is None:
                g = (pool * d) // (100 * len(nodes))
                gain = {v: g for v in nodes}
            else:
                g = (pool * d) // (100 * len(ss))
                gain = {v: (g if v in ss else 0) for v in nodes}
        r = {v: base[v] + gain[v] + inc[v] for v in nodes}
    return r


def _py_hits(edges, iters):
    e = [(s, t) for s, t, _ in edges]
    nodes = sorted({s for s, t in e} | {t for s, t in e})
    h = {v: SCALE for v in nodes}

    def norm(vec):
        mx = max(max(vec.values()), 1)
        return {v: (x * SCALE) // mx for v, x in vec.items()}

    a = {v: 0 for v in nodes}
    for _ in range(iters):
        a = {v: 0 for v in nodes}
        for s, t in e:
            a[t] += h[s]
        a = norm(a)
        h = {v: 0 for v in nodes}
        for s, t in e:
            h[s] += a[t]
        h = norm(h)
    return h, a


@settings(max_examples=6, deadline=None)
@given(edges=edges_strategy, weighted=st.booleans(),
       use_seeds=st.booleans())
def test_pagerank_matches_python_model(spark, edges, weighted, use_seeds):
    seeds = None
    if use_seeds:
        nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
        seeds = nodes[: max(1, len(nodes) // 2)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r.node: r.rank_x for r in pagerank(
        df, iterations=2, weight_col="w" if weighted else None,
        seeds=seeds).collect()}
    assert got == _py_pagerank(edges, 2, weighted=weighted, seeds=seeds)


@settings(max_examples=6, deadline=None)
@given(edges=edges_strategy, use_seeds=st.booleans())
def test_pagerank_redistribute_matches_python_model(spark, edges,
                                                    use_seeds):
    seeds = None
    if use_seeds:
        nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
        seeds = nodes[: max(1, len(nodes) // 2)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r.node: r.rank_x for r in pagerank(
        df, iterations=2, seeds=seeds,
        dangling="redistribute").collect()}
    assert got == _py_pagerank(edges, 2, seeds=seeds,
                               dangling="redistribute")


def _py_label_prop(edges, iters):
    ue = [(s, t) for s, t, _ in edges] + [(t, s) for s, t, _ in edges]
    nodes = sorted({s for s, _ in ue})
    lab = {v: v for v in nodes}
    for _ in range(iters):
        votes = {}
        for s, t in ue:
            votes.setdefault(t, {}).setdefault(lab[s], 0)
            votes[t][lab[s]] += 1
        lab = {v: min(vs, key=lambda l: (-vs[l], l))
               for v, vs in votes.items()}
    return lab


def _py_k_core(edges, k, rounds):
    g = {(min(s, t), max(s, t)) for s, t, _ in edges if s != t}
    for _ in range(rounds):
        deg = {}
        for a, b in g:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        keep = {v for v, d in deg.items() if d >= k}
        g = {(a, b) for a, b in g if a in keep and b in keep}
    deg = {}
    for a, b in g:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    return {v: d for v, d in deg.items() if d >= k}


@settings(max_examples=6, deadline=None)
@given(edges=edges_strategy)
def test_label_propagation_matches_python_model(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r.node: r.label
           for r in label_propagation(df, iterations=2).collect()}
    assert got == _py_label_prop(edges, 2)


@settings(max_examples=6, deadline=None)
@given(edges=edges_strategy, k=st.integers(1, 4))
def test_k_core_matches_python_model(spark, edges, k):
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r.node: r.deg
           for r in k_core(df, k=k, rounds=3).collect()}
    assert got == _py_k_core(edges, k, 3)


def _py_cc(edges, rounds):
    ue = [(s, t) for s, t, _ in edges] + [(t, s) for s, t, _ in edges]
    nodes = sorted({s for s, _ in ue})
    comp = {v: v for v in nodes}
    for _ in range(rounds):
        nc = dict(comp)
        for s, t in ue:
            if comp[s] < nc[t]:
                nc[t] = comp[s]
        comp = nc
    return comp


@settings(max_examples=6, deadline=None)
@given(edges=edges_strategy, rounds=st.integers(1, 4))
def test_connected_components_matches_python_model(spark, edges, rounds):
    from cascading_flink_spark.extensions import connected_components
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r.node: r.comp
           for r in connected_components(df, rounds=rounds).collect()}
    assert got == _py_cc(edges, rounds)


def _py_bfs(edges, seeds, hops, directed):
    e = [(s, t) for s, t, _ in edges]
    if not directed:
        e = e + [(t, s) for s, t in e]
    dist = {v: 0 for v in seeds}
    for _ in range(hops):
        nd = dict(dist)
        for s, t in e:
            if s in dist and dist[s] + 1 < nd.get(t, 1 << 60):
                nd[t] = dist[s] + 1
        dist = nd
    return dist


@settings(max_examples=6, deadline=None)
@given(edges=edges_strategy, directed=st.booleans(),
       hops=st.integers(1, 3))
def test_bfs_distances_matches_python_model(spark, edges, directed, hops):
    nodes = sorted({s for s, _, _ in edges} | {t for _, t, _ in edges})
    seeds = nodes[: max(1, len(nodes) // 3)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r.node: r.dist for r in bfs_distances(
        df, seeds=seeds, max_hops=hops, directed=directed).collect()}
    assert got == _py_bfs(edges, seeds, hops, directed)


@settings(max_examples=6, deadline=None)
@given(edges=edges_strategy)
def test_hits_matches_python_model(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r.node: (r.hub_x, r.auth_x)
           for r in hits(df, iterations=2).collect()}
    eh, ea = _py_hits(edges, 2)
    assert got == {v: (eh[v], ea[v]) for v in eh}
