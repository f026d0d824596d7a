"""n-ary (n=3) CoGroup outer-join matrix.

The reference routes every non-buffer joiner through an accumulating
full-outer cogroup that threads a coalesced key tuple
(``/root/reference/src/main/java/com/dataartisans/flink/cascading/planner/FlinkFlowStep.java:706-763``)
so a key absent from input 1 still co-groups inputs 2..n.  These tests pin
the repo's chained-with-coalesced-key semantics for every MixedJoin flag
combination (all 8 for n=3) plus the four standard joiners, against DuckDB
executing the equivalent chained SQL — an independent engine running the
same declared semantics (modeled on Cascading's
``JoinFieldedPipesPlatformTest`` join matrix).
"""

from __future__ import annotations

import duckdb
import pytest

from cascading_flink_spark import (
    CoGroup, DataFrameTap, Fields, FlowConnector, FlowDef, InnerJoin,
    LeftJoin, MixedJoin, OuterJoin, Pipe, RightJoin,
)

def _sorted(rows):
    return sorted(rows, key=lambda t: tuple((v is None, v) for v in t))


A_ROWS = [(1, "a1"), (1, "a1b"), (2, "a2"), (5, "a5")]
B_ROWS = [(1, "b1"), (2, "b2"), (2, "b2b"), (3, "b3")]
C_ROWS = [(2, "c2"), (3, "c3"), (4, "c4")]


@pytest.fixture(scope="module")
def abc(spark):
    a = spark.createDataFrame(A_ROWS, "ka int, va string")
    b = spark.createDataFrame(B_ROWS, "kb int, vb string")
    c = spark.createDataFrame(C_ROWS, "kc int, vc string")
    return a, b, c


def run3(spark, abc, joiner):
    a, b, c = abc
    j = CoGroup([Pipe("A"), Pipe("B"), Pipe("C")],
                [Fields("ka"), Fields("kb"), Fields("kc")],
                joiner=joiner)
    fd = (FlowDef().add_source("A", DataFrameTap(a))
          .add_source("B", DataFrameTap(b))
          .add_source("C", DataFrameTap(c)).add_tail(j))
    df = FlowConnector(spark).connect(fd).dataframe(j.name)
    return _sorted(tuple(r) for r in df.collect())


def duck3(how1, how2):
    """Chained 3-way join in DuckDB: the second link keys on the coalesced
    accumulated key, exactly the declared n-ary semantics."""
    con = duckdb.connect()
    con.execute("CREATE TABLE a(ka int, va text); CREATE TABLE b(kb int, vb text); "
                "CREATE TABLE c(kc int, vc text)")
    con.executemany("INSERT INTO a VALUES (?, ?)", A_ROWS)
    con.executemany("INSERT INTO b VALUES (?, ?)", B_ROWS)
    con.executemany("INSERT INTO c VALUES (?, ?)", C_ROWS)
    rows = con.execute(
        f"""SELECT ka, va, kb, vb, kc, vc
            FROM (SELECT * FROM a {how1} JOIN b ON ka = kb) ab
            {how2} JOIN c ON coalesce(ab.ka, ab.kb) = kc"""
    ).fetchall()
    con.close()
    return _sorted(rows)


def chained_hows(flags):
    """The planner's flag->how fold (flag True = keep that input's
    unmatched rows)."""
    hows, acc = [], flags[0]
    for f in flags[1:]:
        if acc and f:
            hows.append("FULL")
        elif acc:
            hows.append("LEFT")
        elif f:
            hows.append("RIGHT")
        else:
            hows.append("INNER")
        acc = acc or f
    return hows


@pytest.mark.parametrize("flags", [
    (False, False, False), (False, False, True), (False, True, False),
    (False, True, True), (True, False, False), (True, False, True),
    (True, True, False), (True, True, True),
])
def test_mixedjoin_flag_matrix(spark, abc, flags):
    how1, how2 = chained_hows(list(flags))
    assert run3(spark, abc, MixedJoin(list(flags))) == duck3(how1, how2)


@pytest.mark.parametrize("joiner,how", [
    (InnerJoin(), "INNER"), (LeftJoin(), "LEFT"),
    (RightJoin(), "RIGHT"), (OuterJoin(), "FULL"),
])
def test_standard_joiner_3way(spark, abc, joiner, how):
    assert run3(spark, abc, joiner) == duck3(how, how)


def test_key_absent_from_first_input_cogroups_later_inputs(spark):
    """The exact shape from the reference cascade: A{1}, B{1,2}, C{2}
    full-outer must pair B and C on key 2 in ONE row, not two half-null
    rows."""
    a = spark.createDataFrame([(1, "a1")], "ka int, va string")
    b = spark.createDataFrame([(1, "b1"), (2, "b2")], "kb int, vb string")
    c = spark.createDataFrame([(2, "c2")], "kc int, vc string")
    rows = run3(spark, (a, b, c), OuterJoin())
    assert rows == [(1, "a1", 1, "b1", None, None),
                    (None, None, 2, "b2", 2, "c2")]


def test_right_join_3way_key_skips_middle_input(spark):
    """Key present in A and C but not B: under chained RIGHT semantics the
    AB link drops A-only keys, so C's row surfaces null-padded — pinned
    here so the declared semantics stay stable."""
    a = spark.createDataFrame([(7, "a7")], "ka int, va string")
    b = spark.createDataFrame([(1, "b1")], "kb int, vb string")
    c = spark.createDataFrame([(7, "c7")], "kc int, vc string")
    rows = run3(spark, (a, b, c), RightJoin())
    assert rows == [(None, None, None, None, 7, "c7")]
