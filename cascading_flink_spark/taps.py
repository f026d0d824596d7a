"""Taps & Schemes — source/sink abstraction (SURVEY.md §2.3).

The reference supports "all Cascading Hadoop Taps and Schemes"
(``/root/reference/README.md:18``) by delegating to Hadoop
Input/OutputFormats (``runtime/source/TapInputFormat.java:88-101``,
``runtime/sink/TapOutputFormat.java``).  The Spark-native equivalents are
DataSource V2 readers/writers: splits, locality, file statistics, partition
discovery and the commit protocol are all built in
(SURVEY.md §2.3 bottom rows), so a Tap here is a thin declarative wrapper
around ``spark.read`` / ``df.write`` that preserves the Cascading surface:
scheme-declared fields, SinkMode, globs, multi-source, dir-partitioning.
"""

from __future__ import annotations

import enum
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .fields import Fields


class SinkMode(enum.Enum):
    """Cascading SinkMode (``FlinkTestPlatform.java:139``) -> save modes."""

    KEEP = "error"        # fail if output exists
    REPLACE = "overwrite"
    UPDATE = "append"


class Scheme:
    """Parses/formats records; declares source/sink fields."""

    def __init__(self, fields: Fields | Sequence[str] | None = None) -> None:
        self.fields = Fields.coerce(fields) if fields is not None else None
        self.num_sink_parts: int | None = None

    def read(self, spark: SparkSession, paths: list[str]) -> DataFrame:
        raise NotImplementedError

    def write(self, df: DataFrame, path: str, mode: SinkMode) -> None:
        raise NotImplementedError


class TextLine(Scheme):
    """Line-oriented text (Cascading ``TextLine``; ``FlinkTestPlatform.java:144-150``).

    Source fields default to ``('line',)``; requesting ``('offset','line')``
    reads through Hadoop's ``TextInputFormat`` (the same input format
    Cascading's TextLine uses), whose record key IS the exact byte offset of
    each line — identical offsets to the reference, split-parallel.
    """

    def __init__(self, fields=("line",)) -> None:
        super().__init__(fields)

    def read(self, spark, paths):
        names = list(self.fields.names)
        if names == ["line"]:
            return spark.read.text(*paths).withColumnRenamed("value", "line")
        if names == ["offset", "line"]:
            # RDD escape hatch: TextInputFormat keys records by exact byte
            # offset (what Spark's DataFrame text source drops).  Scans stay
            # split-parallel; the DataFrame conversion is schema-on-rdd.
            sc = spark.sparkContext
            rdd = sc.hadoopFile(
                ",".join(paths),
                "org.apache.hadoop.mapred.TextInputFormat",
                "org.apache.hadoop.io.LongWritable",
                "org.apache.hadoop.io.Text")
            return spark.createDataFrame(rdd, "offset long, line string")
        raise ValueError(f"TextLine fields must be (line,) or (offset,line), got {names}")

    def write(self, df, path, mode):
        cols = df.columns
        out = df if cols == ["value"] else df.select(
            F.concat_ws("\t", *[F.col(c).cast("string") for c in cols]).alias("value"))
        w = out.write.mode(mode.value)
        if self.num_sink_parts:
            out = out.coalesce(self.num_sink_parts)
            w = out.write.mode(mode.value)
        w.text(path)


class TextDelimited(Scheme):
    """CSV/TSV with header/quote/typed columns (Cascading ``TextDelimited``;
    ``FlinkTestPlatform.java:153-167``) -> ``spark.read.csv`` options."""

    def __init__(self, fields=None, delimiter: str = "\t", header: bool = False,
                 quote: str | None = '"', types: Sequence[str] | None = None) -> None:
        super().__init__(fields)
        self.delimiter = delimiter
        self.header = header
        self.quote = quote
        self.types = list(types) if types is not None else None

    def read(self, spark, paths):
        reader = (spark.read
                  .option("sep", self.delimiter)
                  .option("header", str(self.header).lower()))
        if self.quote is not None:
            reader = reader.option("quote", self.quote)
        if self.fields is not None and self.types is not None:
            schema = ", ".join(f"`{n}` {t}" for n, t in zip(self.fields.names, self.types))
            reader = reader.schema(schema)
            df = reader.csv(*paths)
        elif self.fields is not None:
            df = reader.csv(*paths)
            df = df.toDF(*self.fields.names)
        else:
            df = reader.option("inferSchema", "true").csv(*paths)
        return df

    def write(self, df, path, mode):
        out = df.coalesce(self.num_sink_parts) if self.num_sink_parts else df
        writer = (out.write.mode(mode.value)
                  .option("sep", self.delimiter)
                  .option("header", str(self.header).lower()))
        # mirror the read-side quote char so write/read roundtrips agree
        # (a custom quote written with Spark's default '"' would re-read
        # with wrong arity on values containing the delimiter)
        if self.quote is not None:
            writer = writer.option("quote", self.quote)
        writer.csv(path)

    def read_trapped(self, spark, paths):
        """(good, trapped) split for typed reads — SOURCE traps (the
        reference inherits tap-level failure capture from Cascading,
        ``runtime/util/FlinkFlowProcess.java:169-190``): rows whose
        columns fail type parsing divert to the trap channel as
        (payload = raw record, error) instead of failing the flow.
        Untyped reads cannot fail to parse, so they trap nothing."""
        if self.fields is None or self.types is None:
            return self.read(spark, paths), None
        schema = ", ".join(f"`{n}` {t}"
                           for n, t in zip(self.fields.names, self.types))
        schema += ", `__corrupt` string"
        reader = (spark.read
                  .option("sep", self.delimiter)
                  .option("header", str(self.header).lower())
                  .option("mode", "PERMISSIVE")
                  .option("columnNameOfCorruptRecord", "__corrupt")
                  .schema(schema))
        if self.quote is not None:
            reader = reader.option("quote", self.quote)
        # cache: Spark disallows queries referencing ONLY the internal
        # corrupt-record column of a raw CSV/JSON scan
        df = reader.csv(*paths).cache()
        good = df.filter(F.col("__corrupt").isNull()).drop("__corrupt")
        bad = (df.filter(F.col("__corrupt").isNotNull())
                 .select(F.col("__corrupt").alias("payload"),
                         F.lit("malformed record: type parse failed")
                          .alias("error")))
        return good, bad


class ParquetScheme(Scheme):
    """Columnar binary — the SequenceFile analog (SURVEY.md §2.3): typed,
    splittable, self-describing, with predicate pushdown + column pruning."""

    def read(self, spark, paths):
        df = spark.read.parquet(*paths)
        if self.fields is not None:
            df = df.select(*self.fields.names)
        return df

    def write(self, df, path, mode):
        out = df.coalesce(self.num_sink_parts) if self.num_sink_parts else df
        out.write.mode(mode.value).parquet(path)


class OrcScheme(Scheme):
    """ORC columnar binary — same role as :class:`ParquetScheme` for
    Hive-ecosystem interop (typed, splittable, predicate pushdown +
    column pruning via Spark's native ORC reader)."""

    def read(self, spark, paths):
        df = spark.read.orc(*paths)
        if self.fields is not None:
            df = df.select(*self.fields.names)
        return df

    def write(self, df, path, mode):
        out = df.coalesce(self.num_sink_parts) if self.num_sink_parts else df
        out.write.mode(mode.value).orc(path)


class JsonScheme(Scheme):
    def read(self, spark, paths):
        df = spark.read.json(*paths)
        if self.fields is not None:
            df = df.select(*self.fields.names)
        return df

    def write(self, df, path, mode):
        out = df.coalesce(self.num_sink_parts) if self.num_sink_parts else df
        out.write.mode(mode.value).json(path)


class XmlScheme(Scheme):
    """XML records via Spark 4's NATIVE xml data source (one row per
    ``row_tag`` element; attributes surface as ``_attr`` columns).  Fills
    the Cascading-ecosystem XML-scheme role (cascading.xml's XPath taps)
    with a splittable, schema-inferring columnar read — no external jar.
    Like :class:`JsonScheme`, declared fields prune columns at the source;
    at cluster scale prefer an explicit read schema over inference (Spark
    samples the files to infer, an extra pass)."""

    def __init__(self, fields=None, row_tag: str = "row") -> None:
        super().__init__(fields)
        self.row_tag = row_tag

    def read(self, spark, paths):
        df = (spark.read.format("xml").option("rowTag", self.row_tag)
              .load(list(paths)))
        if self.fields is not None:
            df = df.select(*self.fields.names)
        return df

    def write(self, df, path, mode):
        out = df.coalesce(self.num_sink_parts) if self.num_sink_parts else df
        (out.write.mode(mode.value).format("xml")
            .option("rowTag", self.row_tag).save(path))


class UnknownTextDelimited(Scheme):
    """Dynamic-arity delimited text -> a single ``tuple array<string>``
    column — the ``Fields.UNKNOWN`` escape hatch (SURVEY §1.2/§1.3: the
    reference carries varying-arity tuples with a dedicated serializer,
    ``types/tuple/UnknownTupleSerializer.java:26``; DataFrames are
    statically typed, so dynamic arity becomes an array column addressed by
    position — including negative from-the-end positions, matching the
    reference's comparator offset hack, ``TupleTypeInfo.java:325-347``)."""

    def __init__(self, delimiter: str = "\t") -> None:
        super().__init__(("tuple",))
        self.delimiter = delimiter

    def read(self, spark, paths):
        import re
        df = spark.read.text(*paths)
        # literal delimiter: split() takes a regex, so escape it ('|', '.'
        # would otherwise split on everything)
        return df.select(F.split(F.col("value"),
                                 re.escape(self.delimiter)).alias("tuple"))

    def write(self, df, path, mode):
        # concat_ws SKIPS null elements (shifting every later position on
        # re-read); render them as empty fields instead, as a delimited
        # file must
        padded = F.transform(F.col("tuple"),
                             lambda x: F.coalesce(x, F.lit("")))
        out = df.select(F.concat_ws(self.delimiter, padded).alias("value"))
        out.write.mode(mode.value).text(path)


class WritableSequenceFile(Scheme):
    """Hadoop SequenceFile of Writable key/value pairs — the RDD escape
    hatch promised by SURVEY.md §2.3 (the reference inherits SequenceFile
    support from Hadoop formats for free, ``FlinkTestPlatform.java:139-172``;
    Spark's DataFrame reader has no SequenceFile source, so this is the one
    tap that drops to the RDD API).

    Reading uses ``sc.sequenceFile`` (Writables auto-convert: Text→str,
    Int/LongWritable→int, DoubleWritable→float, BytesWritable→bytearray);
    writing uses ``saveAsSequenceFile`` on a pair RDD.  ``fields`` must
    declare exactly (key, value); ``key_type``/``value_type`` are Spark SQL
    type strings used to build the DataFrame schema.

    Only matters for migrating existing k/v data in or out — new data
    should use :class:`ParquetScheme` (typed, splittable, pushdown-capable;
    SURVEY §2.3 maps Cascading's tuple ``SequenceFile`` to it).  Full-Tuple
    SequenceFiles written by Cascading's ``TupleSerialization`` are NOT
    readable here: their deserializer lives in the Cascading jars, which
    this pure-PySpark engine deliberately does not ship.  ``read``
    sniffs each path's SequenceFile header and raises an actionable
    ``ValueError`` naming the migration path when the key/value class
    is a ``cascading.*`` type (VERDICT r13 Next #7) instead of the
    ClassNotFound stack trace ``sc.sequenceFile`` would produce.

    Scale note: SequenceFiles are splittable, ``sc.sequenceFile`` keeps
    per-block parallelism, and the pair RDD is converted to a DataFrame
    with an explicit schema — so reads fan out like any file source; there
    is no driver-side materialization."""

    def __init__(self, fields=("key", "value"), key_type: str = "string",
                 value_type: str = "string") -> None:
        super().__init__(fields)
        if len(self.fields.names) != 2:
            raise ValueError("WritableSequenceFile declares exactly "
                             "(key, value) fields")
        self.key_type = key_type
        self.value_type = value_type

    def _schema(self):
        from pyspark.sql import types as T
        kn, vn = self.fields.names
        return T.StructType([
            T.StructField(kn, T._parse_datatype_string(self.key_type)),
            T.StructField(vn, T._parse_datatype_string(self.value_type)),
        ])

    @staticmethod
    def _fs_path(spark: SparkSession, path: str):
        jvm = spark._jvm
        jpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return fs, jpath

    @classmethod
    def _header_classes(cls, spark, path):
        """Return ``(key_class, value_class)`` from the first data
        file's SequenceFile header, or ``None`` when the path has no
        readable SequenceFile header (empty dir, non-SEQ magic — those
        fall through to ``sc.sequenceFile``'s own errors).

        Pure byte parse (magic ``SEQ`` + version byte + two
        VInt-length-prefixed UTF-8 class names, the on-disk layout of
        ``SequenceFile.Writer#writeFileHeader``): the Hadoop
        ``SequenceFile.Reader`` cannot be used for the sniff because
        its init eagerly ``Class.forName``s the key class — exactly
        the unactionable stack trace this check exists to replace."""
        fs, jpath = cls._fs_path(spark, path)
        try:
            st = fs.getFileStatus(jpath)
        except Exception:
            return None
        if st.isDirectory():
            parts = sorted(
                (s.getPath() for s in fs.listStatus(jpath)
                 if not s.isDirectory() and s.getLen() > 0
                 and not s.getPath().getName().startswith(("_", "."))),
                key=lambda p: p.getName())
            if not parts:
                return None
            jpath = parts[0]
        # single-byte reads: py4j does not reflect Java-side mutation
        # of a passed byte[] back to Python, and this sniff runs once
        # per path on ~256 bytes — the round trips are negligible
        stream = fs.open(jpath)
        try:
            data = []
            for _ in range(256):
                b = stream.read()
                if b < 0:
                    break
                data.append(b)
        finally:
            stream.close()
        buf = bytes(data)
        if len(buf) < 6 or buf[:3] != b"SEQ":
            return None

        def vint(off):
            # WritableUtils.writeVInt: first byte in [-112, 127] IS the
            # value; class names are short so that branch always hits,
            # but decode the multi-byte form for completeness
            first = buf[off] - 256 if buf[off] > 127 else buf[off]
            if first >= -112:
                return first, off + 1
            neg = first < -120
            size = (-119 - first) if neg else (-111 - first)
            val = 0
            for i in range(size):
                val = (val << 8) | buf[off + 1 + i]
            return (~val if neg else val), off + 1 + size

        try:
            klen, off = vint(4)
            kcls = buf[off:off + klen].decode("utf-8")
            vlen, off = vint(off + klen)
            vcls = buf[off:off + vlen].decode("utf-8")
        except (IndexError, UnicodeDecodeError):
            return None
        return kcls, vcls

    def read(self, spark, paths):
        sc = spark.sparkContext
        for p in paths:
            hdr = self._header_classes(spark, p)
            if hdr and any(c.startswith("cascading.") for c in hdr):
                raise ValueError(
                    f"WritableSequenceFile: {p} is a Cascading-"
                    f"serialized tuple SequenceFile (header classes "
                    f"{hdr[0]} / {hdr[1]}). Its deserializer lives in "
                    "the Cascading jars, which this pure-PySpark "
                    "engine deliberately does not ship — re-export the "
                    "data from Cascading as Writable key/value pairs "
                    "(e.g. WritableSequenceFile with Text/LongWritable "
                    "fields) or as delimited text/parquet, then read "
                    "it here (ParquetScheme is the declared analog for "
                    "tuple SequenceFiles, SURVEY.md §2.3).")
        rdds = [sc.sequenceFile(p) for p in paths]
        rdd = rdds[0] if len(rdds) == 1 else sc.union(rdds)
        # bytearray (BytesWritable) isn't directly row-encodable -> bytes
        rdd = rdd.map(lambda kv: (
            bytes(kv[0]) if isinstance(kv[0], bytearray) else kv[0],
            bytes(kv[1]) if isinstance(kv[1], bytearray) else kv[1]))
        return spark.createDataFrame(rdd, self._schema())

    def write(self, df, path, mode):
        # The RDD API has no save modes; honor SinkMode via the Hadoop
        # FileSystem (same semantics the DataFrame writer implements).
        fs, jpath = self._fs_path(df.sparkSession, path)
        if fs.exists(jpath):
            if mode is SinkMode.KEEP:
                raise ValueError(f"SinkMode.KEEP: path exists: {path}")
            if mode is SinkMode.REPLACE:
                fs.delete(jpath, True)
            if mode is SinkMode.UPDATE:
                raise ValueError(
                    "SinkMode.UPDATE is not supported for SequenceFile "
                    "sinks (Hadoop's committer cannot append part files "
                    "into an existing SequenceFile directory)")
        kn, vn = self.fields.names
        out = df.select(kn, vn)
        if self.num_sink_parts:
            # coalesce, not repartition: the reference's sink-DOP
            # adjustment is explicitly sort-preserving
            # (FlinkFlowStep.java:424-458) — a shuffle here would destroy
            # an upstream GroupBy's sort order on the way into the files.
            # coalesce only merges partitions (it cannot grow the count),
            # which keeps each input partition's row order intact;
            # matching the DataFrame sinks, which already use coalesce.
            out = out.coalesce(self.num_sink_parts)
        out.rdd.map(tuple).saveAsSequenceFile(path)


def pos(col, position: int):
    """Positional field access over an UNKNOWN tuple column; negative
    positions address from the end; out-of-range positions yield null
    (try_element_at — plain element_at raises under ANSI mode)."""
    idx = position + 1 if position >= 0 else position
    return F.try_element_at(col, F.lit(idx))


class Tap:
    """Locates data; pairs a path with a Scheme (Cascading ``Hfs``-family)."""

    def __init__(self, scheme: Scheme, path: str | Sequence[str],
                 sink_mode: SinkMode = SinkMode.KEEP) -> None:
        self.scheme = scheme
        self.paths = [path] if isinstance(path, str) else list(path)
        self.sink_mode = sink_mode

    def read(self, spark: SparkSession) -> DataFrame:
        return self.scheme.read(spark, self.paths)

    def write(self, df: DataFrame) -> None:
        self.scheme.write(df, self.paths[0], self.sink_mode)


class Hfs(Tap):
    """File tap; Spark's reader natively expands globs (GlobHfs is just a
    glob path here — reference README.md:18 'all Hadoop taps')."""


GlobHfs = Hfs


class MultiSourceTap(Tap):
    """Union of several source taps (same schema)."""

    def __init__(self, *taps: Tap) -> None:
        self.taps = list(taps)
        self.sink_mode = SinkMode.KEEP

    def read(self, spark):
        dfs = [t.read(spark) for t in self.taps]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def write(self, df):
        raise ValueError("MultiSourceTap is source-only")


class PartitionTap(Tap):
    """Directory-partitioned data (Cascading ``PartitionTap``;
    ``FlinkTestPlatform.java:170-172``) -> ``partitionBy`` on write,
    partition-discovering read with partition pruning for free."""

    def __init__(self, parent: Tap, partition_fields: Sequence[str]) -> None:
        super().__init__(parent.scheme, parent.paths, parent.sink_mode)
        self.partition_fields = list(partition_fields)

    def read(self, spark):
        if isinstance(self.scheme, ParquetScheme):
            return spark.read.parquet(*self.paths)
        if isinstance(self.scheme, TextDelimited):
            sc = self.scheme
            reader = (spark.read
                      .option("sep", sc.delimiter)
                      .option("header", str(sc.header).lower())
                      .option("inferSchema", "true"))
            if sc.quote is not None:
                reader = reader.option("quote", sc.quote)
            df = reader.csv(*self.paths)
            # honor the scheme's declared fields/types: headerless files
            # come back _c0/_c1... otherwise (partition columns are named
            # by their directories and excluded from the file contents)
            if sc.fields is not None and not sc.header:
                data_fields = [f for f in sc.fields.names
                               if f not in self.partition_fields]
                positional = [c for c in df.columns if c.startswith("_c")]
                if len(positional) == len(data_fields):
                    for old, new in zip(positional, data_fields):
                        df = df.withColumnRenamed(old, new)
            if sc.fields is not None and sc.types is not None:
                tmap = dict(zip(sc.fields.names, sc.types))
                for c in df.columns:
                    if c in tmap:
                        df = df.withColumn(c, F.col(c).cast(tmap[c]))
            return df
        return self.scheme.read(spark, self.paths)

    def write(self, df):
        out = df
        writer = out.write.mode(self.sink_mode.value).partitionBy(*self.partition_fields)
        if isinstance(self.scheme, ParquetScheme):
            writer.parquet(self.paths[0])
        elif isinstance(self.scheme, TextDelimited):
            writer = (writer.option("sep", self.scheme.delimiter)
                      .option("header", str(self.scheme.header).lower()))
            if self.scheme.quote is not None:
                writer = writer.option("quote", self.scheme.quote)
            writer.csv(self.paths[0])
        elif isinstance(self.scheme, JsonScheme):
            writer.json(self.paths[0])
        else:
            raise ValueError("PartitionTap supports parquet/csv/json schemes")


class BucketedTap(Tap):
    """Bucketed table tap: ``bucketBy`` on write, shuffle-free co-located
    joins/aggregations on read.

    The 100 TB pattern the reference cannot express: two fact tables
    bucketed on the same key join with NO exchange on either side (Spark
    reads bucket files as pre-partitioned).  Requires a saved table (bucket
    metadata lives in the catalog), hence ``table_name`` not a path."""

    def __init__(self, table_name: str, bucket_cols: Sequence[str],
                 num_buckets: int = 64, sort_cols: Sequence[str] | None = None,
                 sink_mode: SinkMode = SinkMode.REPLACE) -> None:
        self.table_name = table_name
        self.bucket_cols = list(bucket_cols)
        self.num_buckets = num_buckets
        self.sort_cols = list(sort_cols) if sort_cols else None
        self.sink_mode = sink_mode

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.table(self.table_name)

    def write(self, df: DataFrame) -> None:
        writer = (df.write.mode(self.sink_mode.value)
                  .bucketBy(self.num_buckets, *self.bucket_cols))
        if self.sort_cols:
            writer = writer.sortBy(*self.sort_cols)
        writer.format("parquet").saveAsTable(self.table_name)


class SnapshotTap(Tap):
    """Versioned table tap — Iceberg's metadata-pointer commit protocol,
    scaled to a directory layout (no table-format dependency):

    * every ``write`` lands in a fresh ``v_<n>/`` directory, and only after
      the data write completes is the ``_latest`` pointer file swapped with
      an atomic ``os.replace`` — concurrent readers always see a COMPLETE
      snapshot, and a failed/killed write can never corrupt the table
      (its half-written directory is simply never referenced);
    * past versions stay readable: ``read(spark, version=n)`` is time
      travel, ``versions()`` lists the history, ``rollback(n)`` re-points
      ``_latest`` without touching data.

    SinkMode: KEEP refuses when any snapshot exists; REPLACE/UPDATE both
    append a new snapshot (the table-format model — "replace" IS a new
    version; old data is immutable until ``expire``).

    At 100 TB this is the pattern that makes batch pipelines re-runnable:
    a Cascade step that died mid-write leaves the previous snapshot live,
    and downstream flows pin the version they started from."""

    def __init__(self, scheme: Scheme, path: str,
                 sink_mode: SinkMode = SinkMode.UPDATE) -> None:
        super().__init__(scheme, path, sink_mode)

    # -- metadata ----------------------------------------------------
    def _pointer(self) -> str:
        return os.path.join(self.paths[0], "_latest")

    def latest_version(self) -> int | None:
        try:
            with open(self._pointer()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return None
        except ValueError as e:
            # A garbled pointer is NOT "no snapshots": treating it that way
            # would make read() claim an empty table and write() bypass
            # SinkMode.KEEP and overwrite committed v_1 data.  Loud error;
            # rollback() repairs the pointer to a known-good version.
            raise ValueError(
                f"SnapshotTap {self.paths[0]}: corrupt _latest pointer "
                f"({e}); use rollback(<version>) to repair") from e

    def versions(self) -> list[int]:
        root = self.paths[0]
        if not os.path.isdir(root):
            return []
        out = []
        for name in os.listdir(root):
            if name.startswith("v_"):
                try:
                    out.append(int(name[2:]))
                except ValueError:
                    pass
        return sorted(out)

    def _vdir(self, version: int) -> str:
        return os.path.join(self.paths[0], f"v_{version}")

    # -- IO ----------------------------------------------------------
    def read(self, spark, version: int | None = None):
        v = self.latest_version() if version is None else version
        if v is None:
            raise FileNotFoundError(
                f"SnapshotTap {self.paths[0]}: no committed snapshot")
        return self.scheme.read(spark, [self._vdir(v)])

    def write(self, df) -> None:
        latest = self.latest_version()
        if self.sink_mode is SinkMode.KEEP and latest is not None:
            raise ValueError(
                f"SnapshotTap {self.paths[0]}: SinkMode.KEEP and snapshot "
                f"v_{latest} exists")
        os.makedirs(self.paths[0], exist_ok=True)
        # next version from the ON-DISK version list, not the pointer: after
        # rollback(1) of {v_1,v_2,v_3} the pointer says 1 but v_2/v_3 are
        # still committed, immutable data — pointer+1 would REPLACE v_2
        new_v = max(self.versions(), default=latest or 0) + 1
        # data first, fully; only then the atomic pointer swap commits it
        self.scheme.write(df, self._vdir(new_v), SinkMode.REPLACE)
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(new_v))
        os.replace(tmp, self._pointer())

    def rollback(self, version: int) -> None:
        if version not in self.versions():
            raise ValueError(f"no snapshot v_{version}")
        tmp = self._pointer() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(version))
        os.replace(tmp, self._pointer())

    def expire(self, keep_last: int = 1) -> list[int]:
        """Delete all but the newest ``keep_last`` snapshots (never the one
        ``_latest`` points to).  Returns the versions removed."""
        import shutil
        live = self.latest_version()
        vs = self.versions()
        to_drop = [v for v in vs[:-keep_last] if v != live] if keep_last else \
                  [v for v in vs if v != live]
        for v in to_drop:
            shutil.rmtree(self._vdir(v), ignore_errors=True)
        return to_drop


class DataFrameTap(Tap):
    """Source tap over an existing DataFrame — used by tests and by
    ``queries()`` to bind driver-provided parquet tables into flows."""

    def __init__(self, df: DataFrame) -> None:
        self.df = df
        self.sink_mode = SinkMode.KEEP

    def read(self, spark):
        return self.df

    def write(self, df):
        raise ValueError("DataFrameTap is source-only")


class MemoryTap(Tap):
    """In-memory rows source (tests)."""

    def __init__(self, rows, schema) -> None:
        self.rows = rows
        self.schema = schema
        self.sink_mode = SinkMode.KEEP

    def read(self, spark):
        return spark.createDataFrame(self.rows, schema=self.schema)

    def write(self, df):
        raise ValueError("MemoryTap is source-only")
