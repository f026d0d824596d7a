"""Flow construction & execution — the connector entry point.

Mirrors the reference's lifecycle (SURVEY.md §3): ``FlowConnector.connect``
(``/root/reference/src/main/java/com/dataartisans/flink/cascading/FlinkConnector.java:84-87``)
binds a pipe DAG to taps and *plans eagerly* — our planner compiles the
whole DAG to DataFrames at ``connect()`` time, so field-resolution errors
surface at assembly time exactly like Cascading's planner asserts
(``FlinkConnector.java:96-100``).  ``flow.complete()`` is the action that
triggers the Spark job (= the reference's ``FlinkFlowStepJob`` submission,
``planner/FlinkFlowStepJob.java:131-216``; here the DAGScheduler does the
optimizer/JobGraph work).

Traps (per-branch failure capture, reference
``runtime/util/FlinkFlowProcess.java:169-190``) and counters
(``runtime/stats/AccumulatorCache.java:28``) are exposed on FlowDef/Flow.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from .operations.assertions import AssertionLevel
from .pipes import Pipe
from .planner import FlowPlanner, PlannerError
from .taps import Tap


class FlowDef:
    """Named binding of head pipes -> source taps and tail pipes -> sink taps."""

    def __init__(self, name: str = "flow") -> None:
        self.name = name
        self.sources: dict[str, Tap] = {}
        self.sinks: dict[str, Tap] = {}
        self.tails: list[Pipe] = []
        self.traps: dict[str, Tap] = {}
        self.assertion_level = AssertionLevel.STRICT

    def add_source(self, pipe: Pipe | str, tap: Tap) -> "FlowDef":
        name = pipe if isinstance(pipe, str) else pipe.name
        self.sources[name] = tap
        return self

    def add_sink(self, pipe: Pipe | str, tap: Tap) -> "FlowDef":
        name = pipe if isinstance(pipe, str) else pipe.name
        self.sinks[name] = tap
        return self

    def add_tail(self, pipe: Pipe) -> "FlowDef":
        self.tails.append(pipe)
        return self

    def add_tail_sink(self, pipe: Pipe, tap: Tap) -> "FlowDef":
        return self.add_tail(pipe).add_sink(pipe, tap)

    def add_trap(self, pipe: Pipe | str, tap: Tap) -> "FlowDef":
        name = pipe if isinstance(pipe, str) else pipe.name
        self.traps[name] = tap
        return self

    def set_assertion_level(self, level: AssertionLevel) -> "FlowDef":
        self.assertion_level = level
        return self


class Flow:
    """A planned flow: every tail compiled to a DataFrame, ready to run."""

    def __init__(self, spark: SparkSession, flow_def: FlowDef,
                 dataframes: dict[str, DataFrame]) -> None:
        self.spark = spark
        self.flow_def = flow_def
        self._dataframes = dataframes

    def dataframe(self, tail_name: str | None = None) -> DataFrame:
        """The compiled DataFrame for a tail (default: the only tail)."""
        if tail_name is None:
            if len(self._dataframes) != 1:
                raise ValueError(f"flow has tails {list(self._dataframes)}; name one")
            return next(iter(self._dataframes.values()))
        return self._dataframes[tail_name]

    def complete(self) -> None:
        """Run the flow: write every tail to its sink (the triggering action,
        like the reference's blocking job submit)."""
        for name, df in self._dataframes.items():
            tap = self.flow_def.sinks.get(name)
            if tap is None:
                raise PlannerError(f"tail {name!r} has no bound sink")
            tap.write(df)


class FlowConnector:
    """Entry point (reference ``FlinkConnector``).  Eagerly plans at connect."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    def connect(self, flow_def: FlowDef) -> Flow:
        if not flow_def.tails:
            raise PlannerError("FlowDef has no tails")
        sources = {name: tap.read(self.spark) for name, tap in flow_def.sources.items()}
        planner = FlowPlanner(self.spark, assertion_level=flow_def.assertion_level)
        dataframes = {}
        for tail in flow_def.tails:
            heads = tail.heads
            missing = [h.name for h in heads if h.name not in sources]
            if missing:
                raise PlannerError(f"unbound head pipes: {missing}")
            dataframes[tail.name] = planner.compile(tail, sources)
        return Flow(self.spark, flow_def, dataframes)
