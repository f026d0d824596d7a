"""WritableSequenceFile — the SURVEY §2.3 RDD escape hatch for Hadoop
SequenceFile k/v interop (reference inherits it from Hadoop formats,
FlinkTestPlatform.java:139-172)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cascading_flink_spark import (
    DataFrameTap, Each, Fields, FlowConnector, FlowDef, GroupBy, Every,
    Hfs, Pipe, SinkMode, WritableSequenceFile,
)
from cascading_flink_spark.operations.aggregators import Count


def _tap(path, mode=SinkMode.KEEP, **kw):
    return Hfs(WritableSequenceFile(**kw), str(path), sink_mode=mode)


def test_roundtrip_string_long(spark, tmp_path):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "k string, v long")
    out = tmp_path / "seq1"
    _tap(out, key_type="string", value_type="long",
         fields=("k", "v")).write(df)
    back = _tap(out, key_type="string", value_type="long",
                fields=("k", "v")).read(spark)
    assert back.schema.simpleString() == "struct<k:string,v:bigint>"
    assert sorted((r["k"], r["v"]) for r in back.collect()) == \
        [("a", 1), ("b", 2), ("c", 3)]


def test_roundtrip_bytes_value(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, bytearray(b"\x00\xffpayload"))], "k long, v binary")
    out = tmp_path / "seqb"
    _tap(out, key_type="long", value_type="binary",
         fields=("k", "v")).write(df)
    rows = _tap(out, key_type="long", value_type="binary",
                fields=("k", "v")).read(spark).collect()
    assert rows[0]["k"] == 1 and bytes(rows[0]["v"]) == b"\x00\xffpayload"


def test_sink_modes(spark, tmp_path):
    df = spark.createDataFrame([("a", 1)], "k string, v long")
    df2 = spark.createDataFrame([("z", 9)], "k string, v long")
    out = tmp_path / "seq2"
    _tap(out, fields=("k", "v"), value_type="long").write(df)
    with pytest.raises(ValueError, match="KEEP"):
        _tap(out, fields=("k", "v"), value_type="long").write(df2)
    with pytest.raises(ValueError, match="UPDATE"):
        _tap(out, mode=SinkMode.UPDATE,
             fields=("k", "v"), value_type="long").write(df2)
    _tap(out, mode=SinkMode.REPLACE,
         fields=("k", "v"), value_type="long").write(df2)
    rows = _tap(out, fields=("k", "v"), value_type="long").read(spark).collect()
    assert [(r["k"], r["v"]) for r in rows] == [("z", 9)]


def test_sequencefile_source_in_flow(spark, tmp_path, sf_dir):
    """SequenceFile source feeding a real flow: count orders per priority
    written to / read from a SequenceFile, vs the parquet truth."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    kv = orders.select(F.col("o_orderpriority").alias("k"),
                       F.col("o_orderkey").alias("v"))
    seq = tmp_path / "orders_seq"
    _tap(seq, fields=("k", "v"), value_type="long").write(kv)

    counted = Every(GroupBy(Pipe("seq"), Fields("k")), Fields.NONE,
                    Count("n"), Fields.ALL)
    fd = (FlowDef()
          .add_source("seq", _tap(seq, fields=("k", "v"), value_type="long"))
          .add_tail(counted))
    got = {r["k"]: r["n"]
           for r in FlowConnector(spark).connect(fd).dataframe().collect()}
    truth = {r["o_orderpriority"]: r["cnt"]
             for r in orders.groupBy("o_orderpriority")
                            .agg(F.count(F.lit(1)).alias("cnt")).collect()}
    assert got == truth


def test_num_sink_parts(spark, tmp_path):
    sch = WritableSequenceFile(fields=("k", "v"), value_type="long")
    sch.num_sink_parts = 2
    df = spark.range(100).select(F.col("id").cast("string").alias("k"),
                                 F.col("id").alias("v"))
    out = tmp_path / "seqp"
    Hfs(sch, str(out)).write(df)
    import glob
    parts = glob.glob(str(out / "part-*"))
    assert len(parts) == 2
    assert _tap(out, fields=("k", "v"),
                value_type="long").read(spark).count() == 100


def test_num_sink_parts_preserves_sort_order(spark, tmp_path):
    """Forcing the sink DOP must not destroy an upstream sort: the
    reference's sink-parallelism adjustment is explicitly
    sort-preserving (FlinkFlowStep.java:424-458).  Regression: the RDD
    path used repartition (a shuffle) where the DataFrame sinks use
    coalesce; each written part file must now be internally ordered."""
    sch = WritableSequenceFile(fields=("k", "v"), value_type="long")
    sch.num_sink_parts = 2
    df = (spark.range(500)
          .select(F.format_string("k%05d", F.col("id")).alias("k"),
                  F.col("id").alias("v"))
          .orderBy("k"))
    out = tmp_path / "seq_sorted"
    Hfs(sch, str(out)).write(df)
    import glob
    parts = sorted(glob.glob(str(out / "part-*")))
    assert len(parts) <= 2 and parts
    total = 0
    for p in parts:
        ks = [r["k"] for r in _tap(p, fields=("k", "v"),
                                   value_type="long").read(spark).collect()]
        assert ks == sorted(ks), f"part {p} lost its sort order"
        total += len(ks)
    assert total == 500


def test_declares_exactly_two_fields():
    with pytest.raises(ValueError, match="exactly"):
        WritableSequenceFile(fields=("k", "v", "extra"))


def _cascading_tuple_seqfile(path):
    """Craft the on-disk HEADER of a SequenceFile whose key/value
    classes are Cascading's TupleSerialization types — only the header
    matters (the sniff raises before any record is deserialized), so no
    Cascading jars are needed to pin the boundary."""
    cls = b"cascading.tuple.Tuple"
    with open(path, "wb") as f:
        f.write(b"SEQ" + bytes([6]))
        for name in (cls, cls):
            f.write(bytes([len(name)]) + name)  # VInt short form
        f.write(bytes([0, 0]))  # no value/block compression
        f.write(b"\x00" * 32)   # metadata count + sync filler


def test_cascading_tuple_file_raises_actionable_error(spark, tmp_path):
    """VERDICT r13 Next #7: a Cascading-serialized full-Tuple
    SequenceFile must fail with the DOCUMENTED actionable error naming
    the migration path (re-export as Writables / parquet), not a
    ClassNotFoundException stack trace from sc.sequenceFile."""
    p = tmp_path / "cascading_tuples.seq"
    _cascading_tuple_seqfile(p)
    with pytest.raises(ValueError) as exc:
        _tap(p, fields=("k", "v")).read(spark)
    msg = str(exc.value)
    assert "cascading.tuple.Tuple" in msg
    assert "ParquetScheme" in msg and "re-export" in msg
    # directory-of-parts spelling (what a real Cascading Hfs sink
    # leaves behind) sniffs the first part file the same way
    d = tmp_path / "cascading_dir"
    d.mkdir()
    (d / "_SUCCESS").touch()
    _cascading_tuple_seqfile(d / "part-00000")
    with pytest.raises(ValueError, match="cascading.tuple.Tuple"):
        _tap(d, fields=("k", "v")).read(spark)


def test_header_sniff_passes_writable_files(spark, tmp_path):
    """The sniff must NOT reject legitimate Writable SequenceFiles —
    the roundtrip still reads after the round-14 header check."""
    df = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v long")
    out = tmp_path / "seq_ok"
    _tap(out, key_type="string", value_type="long",
         fields=("k", "v")).write(df)
    sch = WritableSequenceFile(fields=("k", "v"), value_type="long")
    hdr = sch._header_classes(spark, str(out))
    assert hdr and hdr[0] == "org.apache.hadoop.io.Text"
    back = _tap(out, fields=("k", "v"), value_type="long").read(spark)
    assert back.count() == 2
