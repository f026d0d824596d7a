"""Property-based tests for the Fields selector algebra (the subtle heart —
SURVEY §7.2 step 1).  Pure Python, no Spark session needed."""

from __future__ import annotations

import pytest
from hypothesis import given, strategies as st

from cascading_flink_spark.fields import (
    Fields, FieldsResolutionError, resolve_argument_fields,
    resolve_output_fields,
)

names = st.lists(st.sampled_from([f"c{i}" for i in range(8)]),
                 min_size=1, max_size=6, unique=True)


@given(incoming=names, data=st.data())
def test_argument_subset_resolves(incoming, data):
    args = data.draw(st.lists(st.sampled_from(incoming), max_size=len(incoming),
                              unique=True))
    assert resolve_argument_fields(incoming, Fields(*args)) == args


@given(incoming=names)
def test_argument_all_and_none(incoming):
    assert resolve_argument_fields(incoming, Fields.ALL) == list(incoming)
    assert resolve_argument_fields(incoming, Fields.NONE) == []


@given(incoming=names)
def test_argument_unknown_name_raises(incoming):
    with pytest.raises(FieldsResolutionError):
        resolve_argument_fields(incoming, Fields("zz_missing"))


@given(incoming=names, data=st.data())
def test_results_selector_is_declared(incoming, data):
    declared = data.draw(st.lists(st.sampled_from([f"d{i}" for i in range(4)]),
                                  min_size=1, max_size=4, unique=True))
    out, src = resolve_output_fields(incoming, [], declared, Fields.RESULTS)
    assert out == declared
    assert all(s.startswith("res:") for s in src)


@given(incoming=names, data=st.data())
def test_all_selector_appends(incoming, data):
    declared = data.draw(st.lists(st.sampled_from([f"d{i}" for i in range(4)]),
                                  min_size=1, max_size=4, unique=True))
    out, src = resolve_output_fields(incoming, [], declared, Fields.ALL)
    assert out == list(incoming) + declared
    assert src == [f"in:{n}" for n in incoming] + [f"res:{n}" for n in declared]


@given(incoming=names)
def test_all_selector_collision_raises(incoming):
    with pytest.raises(FieldsResolutionError):
        resolve_output_fields(incoming, [], [incoming[0]], Fields.ALL)


@given(incoming=names, data=st.data())
def test_swap_removes_args_appends_declared(incoming, data):
    args = data.draw(st.lists(st.sampled_from(incoming), max_size=len(incoming),
                              unique=True))
    declared = data.draw(st.lists(st.sampled_from([f"d{i}" for i in range(4)]),
                                  min_size=1, max_size=4, unique=True))
    out, _ = resolve_output_fields(incoming, args, declared, Fields.SWAP)
    kept = [n for n in incoming if n not in set(args)]
    assert out == kept + declared


@given(incoming=names, data=st.data())
def test_replace_preserves_shape(incoming, data):
    args = data.draw(st.lists(st.sampled_from(incoming), min_size=1,
                              max_size=len(incoming), unique=True))
    out, src = resolve_output_fields(incoming, args, list(args), Fields.REPLACE)
    assert out == list(incoming)  # same names, same order
    for n, s in zip(out, src):
        if n in set(args):
            assert s == f"res:{n}"
        else:
            assert s == f"in:{n}"


@given(incoming=names, data=st.data())
def test_explicit_selector_prefers_results(incoming, data):
    declared = data.draw(st.lists(st.sampled_from(incoming), min_size=1,
                                  max_size=len(incoming), unique=True))
    # names shadowed by declared must resolve from results
    out, src = resolve_output_fields(incoming, [], declared,
                                     Fields(*incoming))
    for n, s in zip(out, src):
        assert s == (f"res:{n}" if n in set(declared) else f"in:{n}")


@given(incoming=names)
def test_explicit_unknown_raises(incoming):
    with pytest.raises(FieldsResolutionError):
        resolve_output_fields(incoming, [], [], Fields("zz_nope"))


@given(a=names, b=names)
def test_append_disjointness(a, b):
    fa, fb = Fields(*a), Fields(*b)
    if set(a) & set(b):
        with pytest.raises(FieldsResolutionError):
            fa.append(fb)
    else:
        assert list(fa.append(fb)) == a + b
