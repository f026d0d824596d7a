"""Mid-flight stats: complete_async() + FlowStepJob.live_progress() must
observe in-flight task progress while a slow flow runs (the reference polls
its accumulator cache every 10s during execution, FlinkFlowStepJob.java:86).
"""

from __future__ import annotations

import time

import pandas as pd
import pytest

from cascading_flink_spark import (
    DataFrameTap, Each, Fields, FlowConnector, FlowDef, Hfs, ParquetScheme,
    Pipe, SinkMode,
)
from cascading_flink_spark.operations import PyFunction


def test_async_flow_reports_live_progress(spark, tmp_path):
    df = spark.range(64).selectExpr("id", "id * 2 AS v").repartition(8)

    def make_slow():
        def slow(pdf: pd.DataFrame) -> pd.DataFrame:
            time.sleep(0.6)
            return pd.DataFrame({"out": pdf["v"] + 1})
        return slow

    head = Pipe("src")
    p = Each(head, Fields("v"), PyFunction(Fields("out"), make_slow(),
                                           types=["long"]), Fields.RESULTS)
    sink = Hfs(ParquetScheme(), str(tmp_path / "out"), SinkMode.REPLACE)
    fd = (FlowDef("slow").add_source(head, DataFrameTap(df))
          .add_tail(p).add_sink(p, sink))
    flow = FlowConnector(spark).connect(fd)

    job = flow.complete_async()
    saw_inflight = False
    for _ in range(200):
        prog = job.live_progress()
        if any(s["active"] > 0 or 0 < s["completed"] < s["num_tasks"]
               for s in prog["stages"]):
            saw_inflight = True
            break
        if not job.running():
            break
        time.sleep(0.05)
    job.join()
    assert saw_inflight, "never observed in-flight task progress"
    assert spark.read.parquet(str(tmp_path / "out")).count() == 64


def test_async_flow_propagates_errors(spark, tmp_path):
    def make_boom():
        def boom(pdf: pd.DataFrame) -> pd.DataFrame:
            raise RuntimeError("kaboom")
        return boom

    head = Pipe("src")
    p = Each(head, Fields("v"),
             PyFunction(Fields("out"), make_boom(), types=["long"]),
             Fields.RESULTS)
    fd = (FlowDef("boom")
          .add_source(head, DataFrameTap(
              spark.range(4).selectExpr("id", "id AS v")))
          .add_tail(p)
          .add_sink(p, Hfs(ParquetScheme(), str(tmp_path / "boom"),
                           SinkMode.REPLACE)))
    job = FlowConnector(spark).connect(fd).complete_async()
    with pytest.raises(Exception, match="kaboom"):
        job.join()
