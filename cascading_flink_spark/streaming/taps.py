"""Streaming taps: sources produce streaming DataFrames, sinks start queries.

Mirrors the batch Tap contract (read -> DataFrame, write -> action) so a
FlowDef can bind streaming taps without planner changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class StreamTap:
    def read(self, spark: SparkSession) -> DataFrame:
        raise NotImplementedError

    def write(self, df: DataFrame, query_name: str):
        raise NotImplementedError


class FileStreamTap(StreamTap):
    """Directory-watching file source / file sink (exactly-once via the
    file-sink commit log).  ``fmt`` in parquet|csv|json|text.  Sources need
    an explicit schema (streaming reads don't infer)."""

    def __init__(self, path: str, fmt: str = "parquet", schema=None,
                 checkpoint: str | None = None, options: dict | None = None) -> None:
        self.path = path
        self.fmt = fmt
        self.schema = schema
        self.checkpoint = checkpoint or f"{path}/_checkpoint"
        self.options = options or {}

    def read(self, spark):
        reader = spark.readStream.format(self.fmt)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        for k, v in self.options.items():
            reader = reader.option(k, v)
        return reader.load(self.path)

    def write(self, df, query_name):
        return (df.writeStream.format(self.fmt)
                .option("path", self.path)
                .option("checkpointLocation", self.checkpoint)
                .queryName(query_name))


class RateStreamTap(StreamTap):
    """Built-in rate source (timestamp, value) — deterministic-ish test feed."""

    def __init__(self, rows_per_second: int = 100) -> None:
        self.rows_per_second = rows_per_second

    def read(self, spark):
        return (spark.readStream.format("rate")
                .option("rowsPerSecond", str(self.rows_per_second)).load())

    def write(self, df, query_name):
        raise ValueError("RateStreamTap is source-only")


class MemorySink(StreamTap):
    """Memory sink for tests: results land in a queryable temp view."""

    def __init__(self, output_mode: str = "append") -> None:
        self.output_mode = output_mode

    def read(self, spark):
        raise ValueError("MemorySink is sink-only")

    def write(self, df, query_name):
        return (df.writeStream.format("memory")
                .outputMode(self.output_mode)
                .queryName(query_name))
