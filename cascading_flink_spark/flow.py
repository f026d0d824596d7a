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

import threading

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
        self.flow_conf: dict[str, str] = {}
        self.run_id: str | None = None

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

    def set_run_id(self, run_id: str) -> "FlowDef":
        """Mark the flow restartable (Cascading ``FlowDef.setRunID``): only
        with a run id do durable Checkpoint taps RESUME from pre-existing
        data, and the checkpoint path is SCOPED by the run id (re-running
        id X resumes X's checkpoints; a new id starts fresh).  Without one
        every run recomputes and overwrites, so changed inputs can never be
        silently served from a stale checkpoint."""
        self.run_id = run_id
        return self

    def with_conf(self, conf: dict[str, str]) -> "FlowDef":
        """Flow-level engine configuration — the step-level ConfigDef
        analog (the reference folds step ConfigDefs into each node's
        Flink Configuration, ``FlinkFlowStep.java:1376-1383``).  The SQL
        confs are applied around :meth:`Flow.complete` and restored after,
        so two flows on one session can run with different shuffle
        partitioning, broadcast thresholds, AQE settings, etc.  Per-PIPE
        ConfigDef remains a consciously-different mapping (COVERAGE.md):
        Catalyst has no per-operator configuration.

        Caveat: SQL confs are SESSION-scoped, so two flows running
        concurrently (``complete_async``) on one session with different
        ``with_conf`` sets race; give concurrent flows separate sessions
        (``spark.newSession()``) as the reference gives each job its own
        Flink environment."""
        self.flow_conf.update({k: str(v) for k, v in conf.items()})
        return self


class Flow:
    """A planned flow: every tail compiled to a DataFrame, ready to run."""

    def __init__(self, spark: SparkSession, flow_def: FlowDef,
                 dataframes: dict[str, DataFrame],
                 planner: FlowPlanner | None = None) -> None:
        self.spark = spark
        self.flow_def = flow_def
        self._dataframes = dataframes
        self._planner = planner

    def dataframe(self, tail_name: str | None = None) -> DataFrame:
        """The compiled DataFrame for a tail (default: the only tail)."""
        if tail_name is None:
            if len(self._dataframes) != 1:
                raise ValueError(f"flow has tails {list(self._dataframes)}; name one")
            return next(iter(self._dataframes.values()))
        return self._dataframes[tail_name]

    def _applied_conf(self):
        """Context manager: apply the FlowDef's flow-level confs for the
        duration of the action and restore the previous values after
        (physical planning happens at action time, so confs like shuffle
        partitions / broadcast threshold / AQE flags take full effect)."""
        import contextlib

        @contextlib.contextmanager
        def ctx():
            saved: dict[str, str | None] = {}
            # apply INSIDE the try: a failing conf.set (e.g. a
            # non-runtime-modifiable key) must still restore the confs
            # already applied, not leak them into the shared session
            try:
                for k, v in self.flow_def.flow_conf.items():
                    try:
                        saved[k] = self.spark.conf.get(k)
                    except Exception:
                        saved[k] = None
                    self.spark.conf.set(k, v)
                yield
            finally:
                for k, old in saved.items():
                    if old is None:
                        self.spark.conf.unset(k)
                    else:
                        self.spark.conf.set(k, old)
        return ctx()

    def complete(self) -> None:
        """Run the flow: write every tail to its sink (the triggering action,
        like the reference's blocking job submit), then flush trap channels."""
        with self._applied_conf():
            for name, df in self._dataframes.items():
                tap = self.flow_def.sinks.get(name)
                if tap is None:
                    raise PlannerError(f"tail {name!r} has no bound sink")
                tap.write(df)
            if self._planner:
                for pipe_name, trap_df in self._planner.trap_frames.items():
                    trap_tap = self.flow_def.traps.get(pipe_name)
                    if trap_tap is not None:
                        trap_tap.write(trap_df)

    def trap_dataframe(self, pipe_name: str) -> DataFrame:
        """Rows diverted by the trap on the named pipe (payload, error)."""
        if not self._planner or pipe_name not in self._planner.trap_frames:
            raise KeyError(f"no trap channel for pipe {pipe_name!r}")
        return self._planner.trap_frames[pipe_name]

    def stats(self) -> dict[str, dict]:
        """Counter values (CounterOp observations) after an action has run —
        the FlowStats analog (reference polls Flink accumulators)."""
        if not self._planner:
            return {}
        return {name: obs.get for name, obs in self._planner.observations.items()}

    def complete_async(self) -> "FlowStepJob":
        """Run :meth:`complete` on a background thread and return a job
        handle with MID-FLIGHT progress polling — the FlinkFlowStepJob
        analog (the reference polls its accumulator cache every 10s while
        the job runs, ``FlinkFlowStepJob.java:86``,
        ``runtime/stats/AccumulatorCache.java:28``)."""
        return FlowStepJob(self)


class FlowStepJob:
    """Handle for an asynchronously running flow.

    ``live_progress()`` snapshots the Spark status tracker — active jobs
    and per-stage task counts — while the action runs; ``observe``-based
    counters resolve when it finishes (Spark exposes observed metrics only
    at action completion, unlike per-task progress which is live)."""

    def __init__(self, flow: Flow) -> None:
        self._flow = flow
        self._error: BaseException | None = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        try:
            self._flow.complete()
        except BaseException as e:  # surfaced on join()
            self._error = e

    def running(self) -> bool:
        return self._thread.is_alive()

    def join(self, timeout: float | None = None) -> None:
        """Block until the flow finishes; re-raises any execution error."""
        self._thread.join(timeout)
        if not self._thread.is_alive() and self._error is not None:
            raise self._error

    def live_progress(self) -> dict:
        """Snapshot of in-flight execution: active job ids and per-stage
        (total, active, completed) task counts."""
        st = self._flow.spark.sparkContext.statusTracker()
        stages = []
        for sid in st.getActiveStageIds():
            info = st.getStageInfo(sid)
            if info is not None:
                stages.append({"stage": sid,
                               "num_tasks": info.numTasks,
                               "active": info.numActiveTasks,
                               "completed": info.numCompletedTasks})
        return {"active_jobs": list(st.getActiveJobsIds()), "stages": stages}


class FlowConnector:
    """Entry point (reference ``FlinkConnector``).  Eagerly plans at connect."""

    def __init__(self, spark: SparkSession) -> None:
        self.spark = spark

    def connect(self, flow_def: FlowDef) -> Flow:
        if not flow_def.tails:
            raise PlannerError("FlowDef has no tails")
        planner = FlowPlanner(self.spark, assertion_level=flow_def.assertion_level,
                              traps=set(flow_def.traps),
                              run_id=flow_def.run_id)
        sources = {}
        for name, tap in flow_def.sources.items():
            scheme = getattr(tap, "scheme", None)
            if name in flow_def.traps and hasattr(scheme, "read_trapped"):
                # SOURCE trap: scheme-level parse failures divert to the
                # trap channel instead of failing the read (Cascading tap
                # traps; FlinkFlowProcess.java:169-190)
                good, bad = scheme.read_trapped(self.spark, tap.paths)
                sources[name] = good
                if bad is not None:
                    # union, never assign: a trapped head pipe may ALSO have
                    # trapped operations on the same pipe name (Cascading
                    # unions all trapped rows into one trap tap)
                    planner.add_trap_frame(name, bad)
            else:
                sources[name] = tap.read(self.spark)
        dataframes = {}
        for tail in flow_def.tails:
            heads = tail.heads
            missing = [h.name for h in heads if h.name not in sources]
            if missing:
                raise PlannerError(f"unbound head pipes: {missing}")
            dataframes[tail.name] = planner.compile(tail, sources)
        return Flow(self.spark, flow_def, dataframes, planner=planner)


class Cascade:
    """Run multiple flows in data-dependency order (Cascading ``Cascade``;
    the reference inherits CascadePlatformTest coverage via the platform
    suite).  Dependencies are inferred from tap paths: a flow reading a
    path that another flow writes runs after it.

    Accepts connected :class:`Flow` objects or raw :class:`FlowDef`s; defs
    are connected lazily right before execution (their source paths may not
    exist until an upstream flow has written them — this engine plans
    eagerly at connect, so dependent flows must defer)."""

    def __init__(self, *flows, connector: "FlowConnector | None" = None) -> None:
        self.flows = list(flows)
        self.connector = connector

    @staticmethod
    def _paths(taps) -> set[str]:
        out = set()
        for tap in taps:
            for p in getattr(tap, "paths", []) or []:
                out.add(Cascade._normalize(p))
        return out

    @staticmethod
    def _normalize(p: str) -> str:
        """Strip glob components: the dependency base of '/data/out/*.pq'
        is '/data/out' (a source tap reading a glob under a sink's
        directory depends on that sink)."""
        parts = p.rstrip("/").split("/")
        base = []
        for seg in parts:
            if any(ch in seg for ch in "*?["):
                break
            base.append(seg)
        return "/".join(base) or p.rstrip("/")

    @staticmethod
    def _overlaps(src: str, sink: str) -> bool:
        """True when one normalized path contains the other — exact match,
        a glob source under a sink dir, or a source dir above a sink."""
        return (src == sink or src.startswith(sink + "/")
                or sink.startswith(src + "/"))

    @staticmethod
    def _def_of(item) -> FlowDef:
        return item if isinstance(item, FlowDef) else item.flow_def

    def complete(self, parallel: bool = False) -> list[str]:
        """Execute all flows respecting write->read dependencies; returns
        the execution order (flow names).

        ``parallel=True`` runs each dependency wave's flows concurrently on
        threads (Cascading's Cascade submits independent flows in parallel;
        Spark's scheduler interleaves jobs from multiple threads using the
        same session).  Flows carrying ``with_conf`` still run sequentially
        within their wave — session-scoped SQL confs race across threads
        (see :meth:`FlowDef.with_conf`)."""
        n = len(self.flows)
        defs = [self._def_of(f) for f in self.flows]
        sinks = {i: self._paths(d.sinks.values()) for i, d in enumerate(defs)}
        srcs = {i: self._paths(d.sources.values()) for i, d in enumerate(defs)}
        deps: dict[int, set[int]] = {i: set() for i in range(n)}
        for i in range(n):
            for j in range(n):
                if i != j and any(self._overlaps(s, k)
                                  for s in srcs[i] for k in sinks[j]):
                    deps[i].add(j)
        order: list[int] = []
        done: set[int] = set()

        def _run(i: int):
            item = self.flows[i]
            if isinstance(item, FlowDef):
                if self.connector is None:
                    raise PlannerError(
                        "Cascade needs connector= to run raw FlowDefs")
                item = self.connector.connect(item)
            item.complete()

        while len(done) < n:
            ready = [i for i in range(n) if i not in done and deps[i] <= done]
            if not ready:
                raise PlannerError("Cascade has a dependency cycle")
            if parallel:
                confless = [i for i in ready
                            if not self._def_of(self.flows[i]).flow_conf]
                conf_bound = [i for i in ready if i not in confless]
                if len(confless) > 1:
                    import concurrent.futures as cf
                    with cf.ThreadPoolExecutor(len(confless)) as pool:
                        futs = {pool.submit(_run, i): i for i in confless}
                        for fut in cf.as_completed(futs):
                            fut.result()  # re-raise flow errors
                else:
                    for i in confless:
                        _run(i)
                for i in conf_bound:
                    _run(i)
            else:
                for i in ready:
                    _run(i)
            for i in ready:
                done.add(i)
                order.append(defs[i].name)
        return order
