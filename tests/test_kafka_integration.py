"""Kafka wire-contract integration test (S1-S3) — env-gated.

Executes the reference's ACTUAL wire contract against a real broker:
CSV service tuples from an input topic read at ``earliest`` offsets
(FlinkSkyline.java:84-97), ``q,K`` triggers from a query topic read at
``latest`` offsets (:95), the incremental two-phase skyline pipeline,
and JSON results produced to an output topic with the 10 MB
``max.request.size`` override (:177-183).

Skipped unless ``$KAFKA_BOOTSTRAP`` names a broker (none exists in the
CI container — VERDICT r5 #7).  The body reuses the
``streaming/sources.py`` builders UNMODIFIED, so a broker-bearing
environment executes the production path with zero code change::

    PYSPARK_SUBMIT_ARGS="--packages \\
        org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 pyspark-shell" \\
    KAFKA_BOOTSTRAP=localhost:9092 \\
    python -m pytest tests/test_kafka_integration.py -x -q

Assumes the broker auto-creates topics (or pre-create the three
``skyline-{in,query,out}-*`` topics).  All tuples are produced with a
constant key so they land in ONE topic partition — the ingested stream
is then a strict prefix of the published order and the released skyline
can be verified against a batch regeneration of that exact prefix (the
same oracle discipline as the rate-source twin in test_streaming.py).
"""

from __future__ import annotations

import os
import threading
import uuid

import pytest
from pyspark.sql import functions as F

from flink_skyline_qos_spark.operators.skyline import skyline
from flink_skyline_qos_spark.streaming.engine import SkylinePipeline
from flink_skyline_qos_spark.streaming.sources import (
    KAFKA_MAX_REQUEST_SIZE,
    kafka_sink,
    kafka_sink_options,
    kafka_source_options,
    kafka_stream,
    rate_tuple_dims,
)

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")

pytestmark = pytest.mark.skipif(
    not BOOTSTRAP,
    reason="KAFKA_BOOTSTRAP not set — no broker in this container; "
           "set it (and put spark-sql-kafka on the classpath) to "
           "execute the S1-S3 wire contract",
)


def _publish(spark, topic: str, values) -> None:
    """Batch-produce ``value: string`` rows to `topic` via Spark's own
    Kafka producer — constant key + one producer task ⇒ one topic
    partition, in publish order (the prefix property the oracle needs).
    """
    (values.coalesce(1)
     .select(F.lit("k").alias("key"),
             F.col("value").cast("string").alias("value"))
     .write.format("kafka")
     .option("kafka.bootstrap.servers", BOOTSTRAP)
     .option("topic", topic)
     .save())


def test_kafka_round_trip(spark, tmp_path):
    run_id = uuid.uuid4().hex[:8]
    in_topic = f"skyline-in-{run_id}"
    q_topic = f"skyline-query-{run_id}"
    out_topic = f"skyline-out-{run_id}"
    n_rows = 2000

    # The builders ARE the reference's consumer/producer config plan.
    assert kafka_source_options(BOOTSTRAP, in_topic)[
        "startingOffsets"] == "earliest"
    assert kafka_source_options(BOOTSTRAP, q_topic,
                                starting_offsets="latest")[
        "startingOffsets"] == "latest"
    assert kafka_sink_options(BOOTSTRAP, out_topic, checkpoint_dir="x")[
        "kafka.max.request.size"] == str(KAFKA_MAX_REQUEST_SIZE)

    # Service tuples "id,d0,d1" with md5-deterministic dims (same
    # derivation as the rate twin) — published BEFORE the stream starts;
    # the earliest-offset data source must still consume them.
    tuples = (
        spark.range(0, n_rows)
        .select("id", *rate_tuple_dims(2, 10000.0))
        .select(F.concat_ws(",", F.col("id").cast("string"),
                            F.col("d0").cast("string"),
                            F.col("d1").cast("string")).alias("value"))
    )
    _publish(spark, in_topic, tuples)

    data = kafka_stream(spark, BOOTSTRAP, in_topic,
                        starting_offsets="earliest") \
        .withColumn("kind", F.lit(0))
    trig = kafka_stream(spark, BOOTSTRAP, q_topic,
                        starting_offsets="latest") \
        .withColumn("kind", F.lit(1))

    pipe = SkylinePipeline(spark, str(tmp_path / "wd"), dims=2,
                           algo="mr-dim", num_partitions=4,
                           domain_max=10000.0)

    # The query source reads LATEST offsets: the trigger only exists if
    # produced while the stream is live (that IS the contract under
    # test) — a K=0 trigger (immediate release, FlinkSkyline.java:334)
    # lands a few seconds in.
    timer = threading.Timer(5.0, lambda: _publish(
        spark, q_topic,
        spark.createDataFrame([("q1,0",)], "value string")))
    timer.start()
    try:
        pipe.run_stream(data.unionByName(trig), timeout_s=120.0,
                        min_batches=4)
    finally:
        timer.cancel()

    met = pipe.metrics().filter(F.col("query_id") == "q1").collect()
    assert met, "trigger q1 was never released — raise timeout_s or " \
                "check the broker allows topic auto-creation"
    n_seen = met[0]["record_count"]
    assert 0 < n_seen <= n_rows

    # Single-partition topic ⇒ the ingested prefix is exactly ids
    # 0..n_seen-1; regenerate it in batch and compare skylines.
    replay = spark.range(0, n_seen).select("id", *rate_tuple_dims(2, 10000.0))
    expect = sorted(r["id"] for r in skyline(replay, ["d0", "d1"]).collect())
    res = pipe.results().filter(F.col("query_id") == "q1")
    got = sorted(r["id"] for r in res.select("id").collect())
    assert got == expect

    # Sink leg (S3): released skyline → JSON → output topic through the
    # kafka_sink builder (10 MB producer override), then batch-read the
    # topic back and compare payloads.
    payload = res.select(
        F.to_json(F.struct("query_id", "id", "d0", "d1")).alias("value"))
    pdir = str(tmp_path / "payload")
    payload.write.parquet(pdir)
    sdf = spark.readStream.schema(payload.schema).parquet(pdir)
    sink_q = (kafka_sink(sdf, BOOTSTRAP, out_topic,
                         checkpoint_dir=str(tmp_path / "sink_ckpt"))
              .trigger(availableNow=True)
              .start())
    sink_q.awaitTermination()

    back = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("subscribe", out_topic)
        .option("startingOffsets", "earliest")
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )
    sent = [r["value"] for r in payload.collect()]
    rcvd = [r["value"] for r in back.collect()]
    # Spark's Kafka sink is AT-LEAST-once: a producer/task retry may
    # duplicate records in out_topic even when the pipeline behaved
    # correctly (ADVICE r6), so compare deduplicated payload SETS and
    # assert no loss separately — never exactly-once delivery.
    assert sorted(set(rcvd)) == sorted(set(sent))
    assert len(rcvd) >= len(sent)
