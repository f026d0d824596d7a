"""Property-based pins for the temporal joins: asof_join (both directions,
with tolerance, salted and not) against a direct Python nearest-match
model, and range_join against a brute-force nested loop — on arbitrary
hypothesis-generated event sets (few examples; every example is a Spark
job)."""

from __future__ import annotations

import pytest

try:
    from hypothesis import given, settings, strategies as st
except ImportError:                                    # pragma: no cover
    pytest.skip("hypothesis unavailable", allow_module_level=True)

from cascading_flink_spark.extensions.temporal import asof_join, range_join

# left rows: (row_id, key, ts); right rows: (key, ts, px) with (key, ts)
# unique so the nearest match is well-defined (equal-ts right rows have no
# deterministic tiebreak in any asof engine)
left_strategy = st.lists(
    st.tuples(st.integers(0, 100), st.sampled_from(["a", "b", "c"]),
              st.integers(0, 50)),
    min_size=1, max_size=20).map(
        lambda rows: list({r[0]: r for r in rows}.values()))
right_strategy = st.lists(
    st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 50),
              st.integers(0, 999)),
    min_size=0, max_size=20).map(
        lambda rows: list({(r[0], r[1]): r for r in rows}.values()))


def _asof_model(left, right, direction, tol):
    out = {}
    for rid, k, lts in left:
        if direction == "backward":
            cands = [(rts, px) for rk, rts, px in right
                     if rk == k and rts <= lts
                     and (tol is None or lts - rts <= tol)]
            best = max(cands) if cands else None
        else:
            cands = [(rts, px) for rk, rts, px in right
                     if rk == k and rts >= lts
                     and (tol is None or rts - lts <= tol)]
            best = min(cands) if cands else None
        out[rid] = best[1] if best is not None else None
    return out


@settings(max_examples=5, deadline=None)
@given(left_strategy, right_strategy,
       st.sampled_from(["backward", "forward"]),
       st.sampled_from([None, 5.0]),
       st.sampled_from([None, 2]))
def test_asof_equals_python_model(spark, left, right, direction, tol, salt):
    ldf = spark.createDataFrame(
        [(rid, k, float(ts)) for rid, k, ts in left],
        "row_id long, k string, lts double")
    rdf = spark.createDataFrame(
        [(k, float(ts), px) for k, ts, px in right] or [("zzz", -1.0, -1)],
        "k string, rts double, px long")
    got = {r.row_id: r.px for r in
           asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts",
                     right_cols={"px": "px"}, direction=direction,
                     tolerance_seconds=tol, salt=salt).collect()}
    assert got == _asof_model(left, right if right else [], direction, tol)


@settings(max_examples=5, deadline=None)
@given(left_strategy, right_strategy,
       st.tuples(st.integers(-10, 10), st.integers(0, 15)))
def test_range_join_equals_nested_loop(spark, left, right, window):
    lower, span = window
    upper = lower + span
    ldf = spark.createDataFrame(
        [(rid, k, float(ts)) for rid, k, ts in left],
        "row_id long, k string, lts double")
    rdf = spark.createDataFrame(
        [(k, float(ts), px) for k, ts, px in right] or [("zzz", -1.0, -1)],
        "k string, rts double, px long")
    got = sorted((r.row_id, r.px) for r in
                 range_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts",
                            lower_seconds=lower, upper_seconds=upper)
                 .collect())
    expect = sorted((rid, px)
                    for rid, k, lts in left
                    for rk, rts, px in (right if right else [])
                    if rk == k and lower <= rts - lts <= upper)
    assert got == expect
