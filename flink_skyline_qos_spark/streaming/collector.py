"""Metrics-collector loop: the reference's final CSV sink, Spark-first.

Reference: ``/root/reference/python/metrics_collector.py:38-128`` — a
Kafka consumer that tails the job's JSON result records and appends a
canonical 10-column CSV (headers written once, rows flushed per record)
for the plotting scripts to read.

Spark analogue: a Structured Streaming collector.  The source is either

* the :class:`~.engine.SkylinePipeline` metrics directory (parquet,
  one subdir per batch — the container has no Kafka broker), or
* any streaming DataFrame of result records — e.g. a Kafka source whose
  ``value`` went through :func:`parse_result_json` — via
  :func:`collect_stream`.

Rows land in ONE driver-side CSV in the reference collector's exact
column order (``metrics_collector.py:60-72``).  That is deliberately a
driver append, not a distributed write: metric records are
one-per-query (O(queries), never O(data)), and the reference's
idempotent-file semantics — headers only when creating, append+flush
otherwise — require a single writer.  A sidecar progress file (keyed to
the run's checkpoint location) makes CLEAN foreachBatch retries
idempotent: a replayed micro-batch is skipped instead of re-appended.
On a crash between the CSV append and the sidecar write the batch is
re-appended — at-least-once, the same floor as the reference's Kafka
consumer (see :class:`_CsvAppender`).
"""

from __future__ import annotations

import csv
import json
import os
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType,
                               StructField, StructType)

__all__ = [
    "CSV_HEADERS", "RESULT_JSON_SCHEMA", "parse_result_json",
    "collect_stream", "collect_pipeline_metrics",
]

# metrics_collector.py:60-72 — the canonical column order.
CSV_HEADERS = [
    "QueryID", "Records", "SkylineSize", "Optimality",
    "IngestTime(ms)", "LocalTime(ms)", "GlobalTime(ms)", "TotalTime(ms)",
    "Latency(ms)", "SkylinePoints",
]

# The JSON result record the reference job publishes
# (FlinkSkyline.java:610-650 / metrics_collector.py:91-108).
RESULT_JSON_SCHEMA = StructType([
    StructField("query_id", StringType()),
    StructField("record_count", LongType()),
    StructField("skyline_size", LongType()),
    StructField("optimality", DoubleType()),
    StructField("ingestion_time_ms", LongType()),
    StructField("local_processing_time_ms", LongType()),
    StructField("global_processing_time_ms", LongType()),
    StructField("total_processing_time_ms", LongType()),
    StructField("query_latency_ms", LongType()),
    StructField("skyline_points", StringType()),
])

# Accepted source spellings per canonical column, first match wins —
# mirrors the collector's defensive .get() chain
# (metrics_collector.py:91-101) across the reference JSON names and the
# pipeline/batch metrics names used elsewhere in this repo.
_SOURCES = {
    "QueryID": ["query_id"],
    "Records": ["record_count"],
    "SkylineSize": ["skyline_size"],
    "Optimality": ["optimality"],
    "IngestTime(ms)": ["ingestion_time_ms", "ingest_ms"],
    "LocalTime(ms)": ["local_processing_time_ms", "local_ms",
                      "local_cpu_ms"],
    "GlobalTime(ms)": ["global_processing_time_ms", "global_ms"],
    "TotalTime(ms)": ["total_processing_time_ms", "total_ms"],
    "Latency(ms)": ["query_latency_ms", "latency_ms"],
    "SkylinePoints": ["skyline_points"],
}
_DEFAULTS = {"QueryID": "N/A", "Records": 0, "SkylineSize": 0,
             "Optimality": 0.0, "SkylinePoints": "[]"}


def parse_result_json(df: DataFrame, col: str = "value") -> DataFrame:
    """Deserialize a JSON result-record column (the Kafka ``value`` path,
    metrics_collector.py:50) into the canonical result columns."""
    return df.select(
        F.from_json(F.col(col).cast("string"), RESULT_JSON_SCHEMA)
        .alias("r")
    ).select("r.*")


def _canonical_row(d: dict) -> list:
    row = []
    for h in CSV_HEADERS:
        v = None
        for src in _SOURCES[h]:
            if d.get(src) is not None:
                v = d[src]
                break
        if v is None:
            v = _DEFAULTS.get(h, 0)
        row.append(v)
    return row


class _CsvAppender:
    """Headers-once append-mode CSV with per-batch flush and a sidecar
    progress file keyed to the run's checkpoint location.

    Delivery semantics: duplicate-free for CLEAN foreachBatch retries
    (the sidecar skips a replayed batch id), **at-least-once on crash**
    — the CSV append and the sidecar write are two files and cannot be
    atomic, so a crash between them re-appends that one batch on
    replay.  The reference collector (at-least-once Kafka,
    metrics_collector.py:85) has the same floor.

    The sidecar records the checkpoint location (``run_id``): when a
    caller reuses a CSV path with a FRESH checkpoint (batch ids restart
    at 0), progress resets instead of silently dropping every new batch
    against the stale high-water mark.
    """

    def __init__(self, path: str, order_by: Sequence[str],
                 run_id: str = ""):
        self.path = path
        self.progress = path + ".progress"
        self.order_by = list(order_by)
        self.run_id = run_id

    def _done_through(self) -> int:
        if not os.path.isfile(self.progress):
            return -1
        with open(self.progress) as fh:
            raw = fh.read().strip()
        try:
            state = json.loads(raw)
        except json.JSONDecodeError:
            state = None
        if not isinstance(state, dict):
            # pre-run_id sidecar (bare int): honor it only for same-path
            # continuations; a new checkpoint should reset anyway.
            state = {"run": "", "batch_id": int(raw or -1)}
        if state.get("run", "") != self.run_id:
            return -1  # different run / fresh checkpoint — start over
        return int(state.get("batch_id", -1))

    def __call__(self, batch: DataFrame, batch_id: int) -> None:
        if batch_id <= self._done_through():
            return  # foreachBatch retry — already appended
        order = [c for c in self.order_by if c in batch.columns]
        rows = (batch.orderBy(*order) if order else batch).collect()
        exists = os.path.isfile(self.path)
        with open(self.path, mode="a", newline="") as fh:
            w = csv.writer(fh)
            if not exists:
                w.writerow(CSV_HEADERS)
            for r in rows:
                w.writerow(_canonical_row(r.asDict()))
            fh.flush()
        tmp = self.progress + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"run": self.run_id, "batch_id": batch_id}, fh)
        os.replace(tmp, self.progress)


def collect_stream(records: DataFrame, csv_path: str, *,
                   checkpoint: str, available_now: bool = True,
                   order_by: Sequence[str] = ("batch_id", "query_id")):
    """Run the collector loop over any streaming DataFrame of result
    records; returns the started query (caller awaits/stops).

    ``available_now=True`` drains what exists and stops (test/batch
    drive); ``False`` runs continuously like the reference's
    ``for message in consumer`` loop (metrics_collector.py:85).
    """
    writer = (
        records.writeStream
        .foreachBatch(_CsvAppender(csv_path, order_by, run_id=checkpoint))
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _points_json_col(results_dir: str, spark: SparkSession,
                     point_cols: Sequence[str]) -> DataFrame:
    """Per-query ``[[d0, d1], ...]`` JSON from the pipeline results sink —
    the collector's optional raw-points cell (metrics_collector.py:107)."""
    res = spark.read.option("recursiveFileLookup", "true") \
        .parquet(results_dir)
    return res.groupBy("query_id").agg(
        F.to_json(F.collect_list(F.array(*[F.col(c) for c in point_cols])))
        .alias("skyline_points")
    )


def collect_pipeline_metrics(spark: SparkSession, metrics_dir: str,
                             csv_path: str, *, checkpoint: str,
                             schema: StructType | str | None = None,
                             results_dir: str | None = None,
                             point_cols: Sequence[str] = (),
                             available_now: bool = True):
    """Collector wired to a :class:`~.engine.SkylinePipeline` work dir.

    Streams the per-batch metrics parquet (``metrics_dir/batch_*/``);
    when ``results_dir``/``point_cols`` are given, each row also carries
    the query's skyline points as a JSON array — the reference
    collector's ``SkylinePoints`` cell.  The points join happens inside
    foreachBatch on the micro-batch's own rows only (one tiny batch-side
    table joined per emission, never a full-history scan).
    """
    if schema is None:
        try:
            schema = spark.read.option("recursiveFileLookup", "true") \
                .parquet(metrics_dir).schema
        except Exception:
            # Collector-first startup (the reference's normal order,
            # metrics_collector.py:44-49): the pipeline has not committed
            # its first metrics batch yet — fall back to the engine's
            # known metrics shape instead of failing.
            from .engine import PIPELINE_METRICS_DDL

            schema = PIPELINE_METRICS_DDL
    src = spark.readStream.schema(schema) \
        .option("pathGlobFilter", "*.parquet") \
        .parquet(os.path.join(metrics_dir, "batch_*"))

    if results_dir and point_cols:
        appender = _CsvAppender(csv_path, ("batch_id", "query_id"),
                                run_id=checkpoint)

        def with_points(batch: DataFrame, batch_id: int) -> None:
            pts = _points_json_col(results_dir, spark, point_cols)
            appender(batch.join(F.broadcast(pts), "query_id", "left"),
                     batch_id)

        writer = src.writeStream.foreachBatch(with_points) \
            .option("checkpointLocation", checkpoint)
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()

    return collect_stream(src, csv_path, checkpoint=checkpoint,
                          available_now=available_now)


def read_collector_csv(path: str):
    """Load a collector CSV into pandas with parsed ``SkylinePoints`` —
    the prep step shared by every reference plotting script
    (graph_skyline_points_2d.py, graph_ingestion_parallelism.py)."""
    import pandas as pd

    df = pd.read_csv(path)
    if "SkylinePoints" in df.columns:
        df["SkylinePoints"] = df["SkylinePoints"].map(
            lambda s: json.loads(s) if isinstance(s, str) and s else [])
    return df
