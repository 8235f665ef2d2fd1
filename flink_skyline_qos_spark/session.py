"""SparkSession factory with engine defaults.

Tuned for correctness tests on local[N]; every setting is the one you'd
also want on a real cluster (AQE, Arrow, partition sizing) — see
ARCHITECTURE.md for the 100 TB rationale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "flink-skyline-qos-spark", *,
              master: str | None = None,
              shuffle_partitions: int | None = None) -> SparkSession:
    master = master or os.environ.get("SPARK_MASTER", "local[*]")
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus and master == "local[*]":
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    return (
        SparkSession.builder.master(master)
        .appName(app_name)
        # local mode runs every task inside the driver JVM; the 1g
        # default heap GC-thrashes under 32 concurrent Arrow tasks.
        # Takes effect at JVM launch — i.e. on the first session of the
        # process (exactly how tests/bench/driver invoke us).
        .config("spark.driver.memory",
                os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # deterministic time bucketing (window alignment) across engines
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # ~64k rows/batch: fewer kernel invocations per partition for the
        # incremental skyline prune (measured ~1.5× on 1M 3-D); a few MB
        # per batch at typical widths — far below worker memory.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.host", "127.0.0.1")
        .getOrCreate()
    )
