"""SparkSession factory with scale-oriented defaults.

Local mode here, but every knob is chosen for the 1000-executor /
100 TB target: AQE on (runtime coalesce + skew-join splitting), Arrow
for all pandas-UDF traffic, partition counts sized to cores.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "kblock_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or max(cpus, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "20000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # long-running-app hygiene: localCheckpoint/persist blocks are
        # only released when the ContextCleaner sees their RDDs
        # garbage-collected, and the default periodic driver GC (30
        # min) never fires inside a query burst — hundreds of dead
        # cached RDDs pile up in the block manager and late queries
        # run under heap/GC pressure (measured 2-3× slowdowns after
        # ~90 queries in one session). 45 s keeps cleanup continuous;
        # tune via KBLOCK_PERIODIC_GC on clusters.
        .config(
            "spark.cleaner.periodicGC.interval",
            os.environ.get("KBLOCK_PERIODIC_GC", "45s"),
        )
        # the periodic cleaner calls System.gc(); without this flag
        # that is a stop-the-world full collection on a 24g heap and
        # the pause lands on whatever query is in flight (measured
        # 1-3 s spikes on random queries). Concurrent cycles reclaim
        # the dead RDD references with millisecond pauses.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+ExplicitGCInvokesConcurrent",
        )
    )
    return b.getOrCreate()
