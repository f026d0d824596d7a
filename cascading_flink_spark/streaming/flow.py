"""Streaming flow runner: the batch DSL over streaming sources.

DataFrame transformations are identical in Structured Streaming, so the
batch planner compiles pipe assemblies unchanged; only source/sink binding
and query lifecycle differ (start/awaitTermination instead of a blocking
write).  ``trigger="availableNow"`` processes everything available then
stops — the batch-parity mode used in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..flow import FlowDef
from ..planner import FlowPlanner, PlannerError
from .taps import StreamTap


class StreamingFlow:
    def __init__(self, spark: SparkSession, flow_def: FlowDef,
                 dataframes: dict[str, DataFrame]) -> None:
        self.spark = spark
        self.flow_def = flow_def
        self._dataframes = dataframes
        self.queries = {}

    def dataframe(self, tail_name: str | None = None) -> DataFrame:
        if tail_name is None:
            if len(self._dataframes) != 1:
                raise ValueError(f"flow has tails {list(self._dataframes)}; name one")
            return next(iter(self._dataframes.values()))
        return self._dataframes[tail_name]

    def start(self, trigger: str = "availableNow"):
        """Start every tail's streaming query.  trigger: 'availableNow' |
        'continuous' is not supported | a processing-time interval like
        '10 seconds'."""
        for name, df in self._dataframes.items():
            tap = self.flow_def.sinks.get(name)
            if tap is None or not isinstance(tap, StreamTap):
                raise PlannerError(f"tail {name!r} needs a StreamTap sink")
            writer = tap.write(df, query_name=name)
            if trigger == "availableNow":
                writer = writer.trigger(availableNow=True)
            else:
                writer = writer.trigger(processingTime=trigger)
            self.queries[name] = writer.start()
        return self

    def await_termination(self, timeout: int | None = None) -> None:
        for q in self.queries.values():
            q.awaitTermination(timeout)

    def stop(self) -> None:
        for q in self.queries.values():
            q.stop()


class StreamingFlowConnector:
    """connect() plans eagerly against streaming sources (same planner)."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    def connect(self, flow_def: FlowDef) -> StreamingFlow:
        if not flow_def.tails:
            raise PlannerError("FlowDef has no tails")
        # FlowDef features the streaming runtime cannot honor must fail
        # LOUDLY at connect time: silently compiling in non-trap mode
        # would send rows the batch engine diverts to a trap into the
        # query as failures/NULLs instead.
        if flow_def.traps:
            raise PlannerError(
                "traps are not supported on streaming flows (a failed row "
                "has no side-channel tap in Structured Streaming); filter "
                "explicitly or run the trapped stage in batch")
        if flow_def.flow_conf:
            raise PlannerError(
                "with_conf is not supported on streaming flows: a "
                "streaming query outlives connect(), so scoped "
                "apply-and-restore semantics cannot hold — set the conf "
                "on the session instead")
        sources = {}
        for name, tap in flow_def.sources.items():
            sources[name] = tap.read(self.spark)
        planner = FlowPlanner(self.spark,
                              assertion_level=flow_def.assertion_level,
                              run_id=flow_def.run_id)
        dataframes = {}
        for tail in flow_def.tails:
            dataframes[tail.name] = planner.compile(tail, sources)
        return StreamingFlow(self.spark, flow_def, dataframes)
