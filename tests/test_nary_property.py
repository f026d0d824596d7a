"""Property-based check of the n-ary joiner against a pure-Python
accumulate-then-emit reference model.

The model is the reference's joiner semantics (FlinkFlowStep.java:688-763,
TupleOuterJoiner.java:50-63) under SQL null-key rules: per non-null key,
the cartesian product of the present inputs' rows (absent inputs null-pad)
emits iff every required (non-outer-flagged) input is present; a null-key
row never matches anything and survives solo iff its own input alone
satisfies the required set.  Hypothesis drives random tables and flag
combinations through the planner and compares multisets.
"""

from __future__ import annotations

from collections import Counter
from itertools import product

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cascading_flink_spark import (
    CoGroup, DataFrameTap, Fields, FlowConnector, FlowDef, MixedJoin, Pipe,
)

KEYS = st.one_of(st.none(), st.integers(min_value=0, max_value=3))


def rows_strategy(tag):
    return st.lists(
        st.tuples(KEYS, st.integers(min_value=0, max_value=2)),
        min_size=0, max_size=5,
    ).map(lambda rs: [(k, f"{tag}{v}") for k, v in rs])


def model_emit(tables, flags):
    """Pure-Python accumulate-then-emit over n tables of (key, val)."""
    required = [i for i, outer in enumerate(flags) if not outer]
    n = len(tables)
    out = []
    keys = {k for t in tables for (k, _) in t if k is not None}
    for k in keys:
        groups = [[r for r in t if r[0] == k] for t in tables]
        present = {i for i, g in enumerate(groups) if g}
        if not set(required) <= present:
            continue
        padded = [g if g else [(None, None)] for g in groups]
        for combo in product(*padded):
            out.append(tuple(x for r in combo for x in r))
    for i, t in enumerate(tables):
        if set(required) <= {i}:
            for r in t:
                if r[0] is None:
                    row = [(None, None)] * n
                    row[i] = r
                    out.append(tuple(x for rr in row for x in rr))
    return Counter(out)


@pytest.fixture(scope="module")
def run_join(spark):
    def _run(tables, flags):
        names = ["A", "B", "C"][: len(tables)]
        dfs = [
            spark.createDataFrame(t or [(None, None)],
                                  f"k{nm} int, v{nm} string").limit(len(t))
            if not t else
            spark.createDataFrame(t, f"k{nm} int, v{nm} string")
            for nm, t in zip(names, tables)
        ]
        j = CoGroup([Pipe(nm) for nm in names],
                    [Fields(f"k{nm}") for nm in names],
                    joiner=MixedJoin(list(flags)))
        fd = FlowDef()
        for nm, d in zip(names, dfs):
            fd.add_source(nm, DataFrameTap(d))
        fd.add_tail(j)
        df = FlowConnector(spark).connect(fd).dataframe(j.name)
        return Counter(tuple(r) for r in df.collect())
    return _run


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
@given(a=rows_strategy("a"), b=rows_strategy("b"), c=rows_strategy("c"),
       flags=st.tuples(st.booleans(), st.booleans(), st.booleans()))
def test_three_way_mixed_join_matches_model(run_join, a, b, c, flags):
    got = run_join([a, b, c], flags)
    want = model_emit([a, b, c], flags)
    assert got == want, (a, b, c, flags)
