"""Streaming source/sink builders (S1-S3) — Kafka parity + testable files.

The reference reads CSV tuples from an ``input-topic`` Kafka source
(earliest offsets), triggers from a ``query-topic`` (latest offsets), and
writes JSON results to an ``output-topic``
(`/root/reference/java/org.main/FlinkSkyline.java:84-97,177-183`).

Kafka builders below construct the exact Structured Streaming plan but
are exercised only where a broker exists (this container has none — the
file builders are the tested path; both yield the same single
``value: string`` schema, so everything downstream is source-agnostic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "kafka_stream",
    "kafka_sink",
    "file_stream",
    "rate_stream",
]


def kafka_stream(spark: SparkSession, servers: str, topic: str, *,
                 starting_offsets: str = "earliest") -> DataFrame:
    """``value: string`` stream from a Kafka topic (S1/S2).

    `starting_offsets="earliest"` mirrors the data source, ``"latest"``
    the control/query source (FlinkSkyline.java:87,95).
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("subscribe", topic)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def kafka_sink(df: DataFrame, servers: str, topic: str, *,
               checkpoint_dir: str, value_col: str = "value"):
    """writeStream → Kafka (S3).  ``max.request.size`` raised like the
    reference's 10 MB producer override (FlinkSkyline.java:179)."""
    return (
        df.select(F.col(value_col).cast("string").alias("value"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", servers)
        .option("topic", topic)
        .option("kafka.max.request.size", str(10 * 1024 * 1024))
        .option("checkpointLocation", checkpoint_dir)
    )


def file_stream(spark: SparkSession, path: str, *,
                max_files_per_trigger: int | None = None) -> DataFrame:
    """``value: string`` stream over text files in `path` — the broker-free
    stand-in for :func:`kafka_stream` used by tests and local runs."""
    reader = spark.readStream.format("text")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path).select(F.col("value"))


def rate_stream(spark: SparkSession, rows_per_second: int = 10_000) -> DataFrame:
    """Synthetic unbounded source for load tests (Spark's rate source)."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
