"""SparkSession factory tuned for the project's execution profile.

Local testing runs ``local[N]`` (single JVM); the configuration is chosen so
the same logical plans scale to a multi-executor cluster: AQE enabled
(runtime re-plan, skew-join handling, partition coalescing), Arrow enabled
for every pandas-UDF path, shuffle partitions sized to cores locally (on a
real cluster AQE coalesces from a higher initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "cascading_flink_spark",
              cpus: int | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce post-shuffle partitions by SIZE, not to defaultParallelism
        # — avoids swarms of tiny tasks on small inputs; same setting Spark
        # docs recommend for clusters (parallelismFirst is a compat default)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        # modest heap: test-scale data is small and G1 full collections on a
        # huge heap produce multi-second stalls that dwarf query time
        # -Xss16m: iterative operators (hashmin CC, pagerank, k-core)
        # chain lazy localCheckpoints whose FIRST materialization can
        # deserialize a full multi-round lineage in one task; at the JVM's
        # default ~1m thread stack that depth is StackOverflow-flaky
        # (observed round 13: a 60-round hashmin task died in
        # ObjectInputStream recursion and took the whole local JVM with it
        # via the fatal-error handler).  Local mode = executor threads live
        # in the driver JVM, so one setting covers both.
        .config("spark.driver.extraJavaOptions",
                "-XX:+UseG1GC -XX:MaxGCPauseMillis=200 -Xss16m")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
