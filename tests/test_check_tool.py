"""The correctness-gate mimic itself (tools/check_correctness.py): the
dtype check must read TRUE engine types, not pandas fetch coercions —
the whole evidence chain runs through this tool."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

from check_correctness import dtype_mismatches, norm_cell  # noqa: E402


def _arrow_schema(sql):
    import duckdb
    return duckdb.connect().execute(sql).fetch_arrow_table().schema


def test_null_padded_int_column_passes_clean():
    """A NULL-padded BIGINT column (unmatched outer-join rows) fetches as
    float64 via pandas but IS int64 in the engine: must NOT warn (the
    round-5/6 advice false positive)."""
    schema = _arrow_schema(
        "SELECT * FROM (VALUES (1::BIGINT), (NULL::BIGINT)) t(n)")
    assert dtype_mismatches([("n", "bigint")], schema) == []


def test_hugeint_aggregate_still_flagged():
    """DuckDB sum(BIGINT) -> HUGEINT (arrow decimal128): a genuine type
    skew against a Spark bigint, and the advice says to cast."""
    schema = _arrow_schema("SELECT sum(n) AS s FROM (VALUES (1::BIGINT)) t(n)")
    msgs = dtype_mismatches([("s", "bigint")], schema)
    assert len(msgs) == 1 and "cast the oracle aggregate AS BIGINT" in msgs[0]


def test_double_vs_int_both_directions():
    schema = _arrow_schema("SELECT 1.5::DOUBLE AS x, 2::BIGINT AS y")
    assert dtype_mismatches([("x", "bigint")], schema)      # int vs DOUBLE
    assert dtype_mismatches([("y", "double")], schema)      # float vs int
    assert dtype_mismatches([("x", "double"), ("y", "bigint")], schema) == []


def test_norm_cell_conventions():
    """Pin the hash normalization the gate depends on: integral floats
    collapse, NULL spelled, dates isoformat, arrays recursive."""
    import datetime
    assert norm_cell(None) == "NULL"
    assert norm_cell(5.0) == "5"
    assert norm_cell(float("nan")) == "NaN"
    assert norm_cell(datetime.date(2024, 1, 2)) == "2024-01-02"
    assert norm_cell([1.0, None]) == "[1,NULL]"
