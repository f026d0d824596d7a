"""n-ary (n=3) CoGroup joiner-emission matrix.

The reference routes every non-buffer joiner through an accumulating
full-outer cogroup that threads a coalesced key tuple, then lets the
Joiner decide emission per key
(``/root/reference/src/main/java/com/dataartisans/flink/cascading/planner/FlinkFlowStep.java:688-763``,
``runtime/coGroup/regularJoin/TupleOuterJoiner.java:50-63``): a key-group
emits iff every REQUIRED (non-outer-flagged) input contributed rows, with
absent outer inputs null-padded.  These tests pin that accumulate-then-emit
model for every MixedJoin flag combination (all 8 for n=3) plus the four
standard joiners, against DuckDB executing the equivalent
full-outer-cascade-plus-presence-filter SQL — an independent engine running
the same declared semantics (modeled on Cascading's
``JoinFieldedPipesPlatformTest`` join matrix).

MixedJoin flags use Cascading's convention: True = that input is OUTER
(absence tolerated, null-padded), False = required.
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
    assert df.columns == ["ka", "va", "kb", "vb", "kc", "vc"]
    return _sorted(tuple(r) for r in df.collect())


def duck3_emit(required):
    """Accumulate-then-emit in DuckDB: full-outer cascade on the coalesced
    key with constant presence markers, filtered per the joiner's required
    set — the declared n-ary semantics, independently executed."""
    con = duckdb.connect()
    con.execute("CREATE TABLE a(ka int, va text); CREATE TABLE b(kb int, vb text); "
                "CREATE TABLE c(kc int, vc text)")
    con.executemany("INSERT INTO a VALUES (?, ?)", A_ROWS)
    con.executemany("INSERT INTO b VALUES (?, ?)", B_ROWS)
    con.executemany("INSERT INTO c VALUES (?, ?)", C_ROWS)
    marks = ["pa", "pb", "pc"]
    where = " AND ".join(f"{marks[i]} IS NOT NULL" for i in required) or "true"
    rows = con.execute(
        f"""SELECT ka, va, kb, vb, kc, vc
            FROM (SELECT * FROM (SELECT *, true AS pa FROM a) a
                  FULL JOIN (SELECT *, true AS pb FROM b) b ON ka = kb) ab
            FULL JOIN (SELECT *, true AS pc FROM c) c
              ON coalesce(ab.ka, ab.kb) = kc
            WHERE {where}"""
    ).fetchall()
    con.close()
    return _sorted(rows)


@pytest.mark.parametrize("flags", [
    (False, False, False), (False, False, True), (False, True, False),
    (False, True, True), (True, False, False), (True, False, True),
    (True, True, False), (True, True, True),
])
def test_mixedjoin_flag_matrix(spark, abc, flags):
    required = [i for i, outer in enumerate(flags) if not outer]
    assert run3(spark, abc, MixedJoin(list(flags))) == duck3_emit(required)


@pytest.mark.parametrize("joiner,required", [
    (InnerJoin(), [0, 1, 2]), (LeftJoin(), [0]),
    (RightJoin(), [2]), (OuterJoin(), []),
])
def test_standard_joiner_3way(spark, abc, joiner, required):
    assert run3(spark, abc, joiner) == duck3_emit(required)


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
    """Key present in A and C but not B: Cascading's accumulate-then-emit
    RightJoin pairs A's row with C's, null-padding only B
    (TupleOuterJoiner.java:50-63) — not the chained-RIGHT result of a
    fully-null-padded C row (round-2 divergence, now closed)."""
    a = spark.createDataFrame([(7, "a7")], "ka int, va string")
    b = spark.createDataFrame([(1, "b1")], "kb int, vb string")
    c = spark.createDataFrame([(7, "c7")], "kc int, vc string")
    rows = run3(spark, (a, b, c), RightJoin())
    assert rows == [(7, "a7", None, None, 7, "c7")]


def test_mixed_join_3way_key_skips_optional_middle(spark):
    """MixedJoin [False, True, False]: A and C required, B outer.  A key in
    A and C but not B emits (a, null, c); a key only in C does not emit."""
    a = spark.createDataFrame([(7, "a7"), (8, "a8")], "ka int, va string")
    b = spark.createDataFrame([(8, "b8")], "kb int, vb string")
    c = spark.createDataFrame([(7, "c7"), (9, "c9")], "kc int, vc string")
    rows = run3(spark, (a, b, c), MixedJoin([False, True, False]))
    assert rows == [(7, "a7", None, None, 7, "c7")]


def test_null_join_keys_survive_outer_preservation(spark):
    """A row whose join key is NULL never matches, but when its input is
    outer-preserved it must still be emitted (SQL outer-join null-key
    behavior; the presence filter uses constant markers, not the key)."""
    a = spark.createDataFrame([(1, "a1")], "ka int, va string")
    b = spark.createDataFrame([(None, "bnull"), (1, "b1")], "kb int, vb string")
    c = spark.createDataFrame([(1, "c1")], "kc int, vc string")
    # B required (its null-key row must survive), A and C outer.
    rows = run3(spark, (a, b, c), MixedJoin([True, False, True]))
    assert rows == [(1, "a1", 1, "b1", 1, "c1"),
                    (None, None, None, "bnull", None, None)]


def test_hashjoin_3way_right_and_mixed(spark, abc):
    """HashJoin (broadcast-hinted) n-ary Right/Mixed joins go through the
    same accumulate-then-emit path; the hint must not change results."""
    from cascading_flink_spark import HashJoin

    def run_hash(joiner):
        a, b, c = abc
        j = HashJoin([Pipe("A"), Pipe("B"), Pipe("C")],
                     [Fields("ka"), Fields("kb"), Fields("kc")],
                     joiner=joiner)
        fd = (FlowDef().add_source("A", DataFrameTap(a))
              .add_source("B", DataFrameTap(b))
              .add_source("C", DataFrameTap(c)).add_tail(j))
        df = FlowConnector(spark).connect(fd).dataframe(j.name)
        return _sorted(tuple(r) for r in df.collect())

    assert run_hash(RightJoin()) == duck3_emit([2])
    assert run_hash(MixedJoin([False, True, False])) == duck3_emit([0, 2])
