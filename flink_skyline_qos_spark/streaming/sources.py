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
    "kafka_source_options",
    "kafka_sink_options",
    "kafka_stream",
    "kafka_sink",
    "file_stream",
    "rate_stream",
    "rate_tuple_dims",
    "rate_tuples_stream",
]

#: the reference raises the producer's max request to 10 MB for large
#: skyline payloads (FlinkSkyline.java:179)
KAFKA_MAX_REQUEST_SIZE = 10 * 1024 * 1024


def kafka_source_options(servers: str, topic: str, *,
                         starting_offsets: str = "earliest") -> dict[str, str]:
    """The exact option plan of the reference's Kafka sources (S1/S2).

    ``starting_offsets="earliest"`` mirrors the data source
    (FlinkSkyline.java:87); ``"latest"`` the control/query source (:95).
    Pure + testable in broker-less containers; :func:`kafka_stream`
    applies it verbatim.
    """
    if starting_offsets not in ("earliest", "latest"):
        raise ValueError("starting_offsets must be 'earliest' or 'latest'")
    return {
        "kafka.bootstrap.servers": servers,
        "subscribe": topic,
        "startingOffsets": starting_offsets,
    }


def kafka_sink_options(servers: str, topic: str, *,
                       checkpoint_dir: str) -> dict[str, str]:
    """Option plan of the reference's Kafka sink (S3), including the
    10 MB ``max.request.size`` override (FlinkSkyline.java:177-183)."""
    return {
        "kafka.bootstrap.servers": servers,
        "topic": topic,
        "kafka.max.request.size": str(KAFKA_MAX_REQUEST_SIZE),
        "checkpointLocation": checkpoint_dir,
    }


def kafka_stream(spark: SparkSession, servers: str, topic: str, *,
                 starting_offsets: str = "earliest") -> DataFrame:
    """``value: string`` stream from a Kafka topic (S1/S2).

    Requires the spark-sql-kafka connector on the classpath (absent in
    the test container — the option plan itself is pinned by tests via
    :func:`kafka_source_options`).
    """
    reader = spark.readStream.format("kafka")
    for k, v in kafka_source_options(
            servers, topic, starting_offsets=starting_offsets).items():
        reader = reader.option(k, v)
    return reader.load().select(F.col("value").cast("string").alias("value"))


def kafka_sink(df: DataFrame, servers: str, topic: str, *,
               checkpoint_dir: str, value_col: str = "value"):
    """writeStream → Kafka (S3) with the reference's producer override."""
    writer = (df.select(F.col(value_col).cast("string").alias("value"))
              .writeStream.format("kafka"))
    for k, v in kafka_sink_options(
            servers, topic, checkpoint_dir=checkpoint_dir).items():
        writer = writer.option(k, v)
    return writer


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


def rate_tuple_dims(dims: int, domain_max: float = 10000.0) -> list:
    """Deterministic dim columns derived from ``id`` — md5-seeded like the
    hash generators, so a batch `spark.range` over the same ids
    reproduces a rate stream's tuples exactly (test oracle)."""
    from ..sources.generators import _u01

    return [
        F.floor(_u01(f"rate{i}") * domain_max).cast("double").alias(f"d{i}")
        for i in range(dims)
    ]


def rate_tuples_stream(spark: SparkSession, dims: int, *,
                       rows_per_second: int = 1000,
                       trigger_every: int = 500,
                       domain_max: float = 10000.0) -> DataFrame:
    """Tagged ``(value, kind)`` pipeline input synthesized from the rate
    source — a genuinely UNBOUNDED, non-file execution path for the
    S1/S2 contract (the Kafka twin minus the broker).

    Every ``trigger_every``-th row becomes a K=0 trigger
    (``"q<id>,0"`` — immediate release, FlinkSkyline.java:334); the rest
    serialize as CSV service tuples whose dims are a pure md5 function
    of the row id (:func:`rate_tuple_dims`), so the exact ingested
    prefix can be regenerated in batch and verified.
    """
    base = rate_stream(spark, rows_per_second).select(
        F.col("value").alias("id"))
    dim_cols = rate_tuple_dims(dims, domain_max)
    data_val = F.concat_ws(
        ",", F.col("id").cast("string"),
        *[c.cast("string") for c in dim_cols])
    trig_val = F.concat(F.lit("q"), F.col("id").cast("string"), F.lit(",0"))
    is_trig = (F.col("id") % trigger_every) == (trigger_every - 1)
    return base.select(
        F.when(is_trig, trig_val).otherwise(data_val).alias("value"),
        F.when(is_trig, F.lit(1)).otherwise(F.lit(0)).alias("kind"),
    )
