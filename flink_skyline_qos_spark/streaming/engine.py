"""Incremental streaming skyline engine (ST1-ST7), Spark-idiomatic.

The reference keeps per-partition local skylines in Flink keyed state,
updated record-at-a-time with a 5000-row buffer, and answers triggers
behind a record-ID barrier
(`/root/reference/java/org.main/FlinkSkyline.java:219-356,407-444`).

Spark re-expression (SURVEY §4.3): **each micro-batch is one buffer
flush**, and the micro-batch boundary is a consistent prefix of the
stream — so the barrier, the pending-query replay, and the
countdown-latch (ST2/ST3/A3) all collapse into `foreachBatch`
orchestration:

* State = a versioned parquet table of per-partition local skylines
  (`epoch={batchId}` subdirs).  Retry-idempotent: a batch ALWAYS resumes
  from the largest epoch strictly below its own batch id, so a replay of
  batch B re-reads B's true predecessor (never B's own half/fully
  written output), re-derives the identical state, and overwrites
  epoch=B in place; result/metrics rows land in per-batch-id
  subdirectories written with overwrite — the exact exactly-once
  property Flink gets from checkpointed keyed state.
* Batch update = union(previous state, new batch) →
  `groupBy(pid).applyInPandas(local prune)` — ONE shuffle whose left
  side is already skyline-pruned (small), mirroring the reference's
  incremental BNL against existing state.
* A trigger released in batch B answers the skyline over everything
  ingested through B — the reference's "skyline over all records seen
  so far at release time" (FlinkSkyline.java:303-305).

State scale note: local skylines are a tiny fraction of the input
(BASELINE.md: ~3k survivors per 200k anti-correlated points), so the
per-batch shuffle carries O(batch + skyline), never O(stream).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from typing import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.partitioners import partitioner_expr
from ..operators.skyline import (
    MaxAccumulator,
    _grouped_prune,
    _local_prune,
    skyline,
)
from .wire import parse_service_tuples, parse_triggers

__all__ = ["SkylinePipeline", "read_state_skyline", "PIPELINE_METRICS_DDL"]

_KEEP_EPOCHS = 2  # current + previous, for retry/debug

#: Schema of the per-batch metrics rows `_answer` writes — also the
#: collector's fallback when it starts before the first batch commits.
PIPELINE_METRICS_DDL = (
    "query_id string, record_count long, skyline_size long,"
    " optimality double, batch_id long, ingest_ms long,"
    " global_ms long, total_ms long, latency_ms long,"
    " local_cpu_ms long, global_cpu_ms long"
)


def _batch_subdir(batch_id: int) -> str:
    return f"batch_{batch_id:020d}"


def _epochs(path: str) -> list[int]:
    if not os.path.isdir(path):
        return []
    out = []
    for name in os.listdir(path):
        if name.startswith("epoch="):
            try:
                out.append(int(name.split("=", 1)[1]))
            except ValueError:
                continue
    return sorted(out)


def _gc(path: str, keep: int = _KEEP_EPOCHS) -> None:
    for e in _epochs(path)[:-keep]:
        shutil.rmtree(os.path.join(path, f"epoch={e}"), ignore_errors=True)


def read_state_skyline(spark: SparkSession, state_dir: str,
                       cols: Sequence[str]) -> DataFrame:
    """Global skyline implied by the current state (merge of local skylines)."""
    pts = os.path.join(state_dir, "points")
    es = _epochs(pts)
    if not es:
        raise FileNotFoundError(f"no state epochs under {pts}")
    local = spark.read.parquet(os.path.join(pts, f"epoch={es[-1]}"))
    return skyline(local.drop("pid"), cols)


class SkylinePipeline:
    """The full reference pipeline: data stream + trigger stream →
    incremental local skylines → barrier-gated global skylines + metrics.

    Batch layout under ``work_dir``::

        state/points/epoch={b}/   per-partition local skylines (parquet)
        state/meta/epoch={b}.json max_seen_id, record_count, pending triggers
        results/points/           released skylines (query_id-tagged parquet)
        results/metrics/          one metrics row per released query (A7 shape)
        checkpoint/               Structured Streaming checkpoint

    Use :meth:`run_available_now` against file sources in tests; swap the
    sources for :func:`sources.kafka_stream` in production — everything
    downstream of the ``value: string`` schema is identical.
    """

    def __init__(self, spark: SparkSession, work_dir: str, *, dims: int,
                 algo: str = "mr-dim", num_partitions: int = 8,
                 domain_max: float = 10000.0) -> None:
        self.spark = spark
        self.work_dir = work_dir
        self.dims = dims
        self.cols = [f"d{i}" for i in range(dims)]
        self.algo = algo
        self.num_partitions = num_partitions
        self.domain_max = domain_max
        self.points_dir = os.path.join(work_dir, "state", "points")
        self.meta_dir = os.path.join(work_dir, "state", "meta")
        self.results_dir = os.path.join(work_dir, "results", "points")
        self.metrics_dir = os.path.join(work_dir, "results", "metrics")
        self.batches_processed = 0
        os.makedirs(self.meta_dir, exist_ok=True)

    # -- state I/O ---------------------------------------------------------

    def _load(self, batch_id: int | None = None) -> tuple[DataFrame | None, dict]:
        """State + meta to resume from.

        With `batch_id`, only epochs STRICTLY BELOW it are eligible — on
        a foreachBatch retry of batch B (after a _save(B) already
        happened) this re-reads B's true predecessor instead of B's own
        output, making the replay idempotent: no double union into
        state, no double record_count, no re-released triggers, and the
        epoch=B overwrite never targets the path the state plan reads.
        """
        es = _epochs(self.points_dir)
        if batch_id is not None:
            es = [e for e in es if e < batch_id]
        state = None
        if es:
            state = self.spark.read.parquet(
                os.path.join(self.points_dir, f"epoch={es[-1]}"))
        meta = {"max_seen_id": -1, "record_count": 0, "pending": []}
        metas = sorted(
            f for f in os.listdir(self.meta_dir) if f.endswith(".json")
        ) if os.path.isdir(self.meta_dir) else []
        if batch_id is not None:
            metas = [f for f in metas
                     if int(f.split("=", 1)[1].split(".", 1)[0]) < batch_id]
        if metas:
            with open(os.path.join(self.meta_dir, metas[-1])) as fh:
                meta = json.load(fh)
        return state, meta

    def _save(self, batch_id: int, state: DataFrame, meta: dict) -> None:
        state.write.mode("overwrite").parquet(
            os.path.join(self.points_dir, f"epoch={batch_id}"))
        tmp = os.path.join(self.meta_dir, f"epoch={batch_id:020d}.json.tmp")
        with open(tmp, "w") as fh:
            json.dump(meta, fh)
        os.replace(tmp, tmp[:-4])
        _gc(self.points_dir)
        for f in sorted(
            f for f in os.listdir(self.meta_dir) if f.endswith(".json")
        )[:-_KEEP_EPOCHS]:
            os.remove(os.path.join(self.meta_dir, f))

    # -- the micro-batch handler ------------------------------------------

    def process_batch(self, batch: DataFrame, batch_id: int) -> None:
        """foreachBatch handler over the tagged union of both streams."""
        t_batch0 = time.perf_counter()
        batch = batch.persist()
        local_cpu_acc = self.spark.sparkContext.accumulator(0, MaxAccumulator())
        try:
            pts = parse_service_tuples(
                batch.filter(F.col("kind") == 0), self.dims)
            trig = parse_triggers(batch.filter(F.col("kind") == 1))

            prev, meta = self._load(batch_id)
            agg = pts.select(
                F.max("id").alias("mx"), F.count("*").alias("n")).first()
            if agg["n"]:
                meta["max_seen_id"] = max(meta["max_seen_id"],
                                          int(agg["mx"]))
                meta["record_count"] += int(agg["n"])
                pid = partitioner_expr(
                    self.algo, [F.col(c) for c in self.cols],
                    self.num_partitions, self.domain_max)
                tagged = pts.withColumn("pid", pid)
                unioned = tagged if prev is None \
                    else prev.unionByName(tagged)
                state = _grouped_prune(unioned, ["pid"], self.cols,
                                       cpu_acc=local_cpu_acc)
            else:
                state = prev if prev is not None else \
                    self.spark.createDataFrame(
                        [], parse_service_tuples(
                            batch.filter(F.lit(False)), self.dims
                        ).withColumn("pid", F.lit(0)).schema)

            # Barrier (ST2/ST3): release pending + new triggers whose K is
            # satisfied; a partition that never saw data (max_seen_id=-1)
            # releases K=0 only (FlinkSkyline.java:334,351).
            waiting = [tuple(t) for t in meta["pending"]]
            waiting += [(r["query_id"], int(r["required_count"]))
                        for r in trig.collect()]
            released = [(q, k) for q, k in waiting
                        if k == 0 or meta["max_seen_id"] >= k]
            meta["pending"] = [list(t) for t in waiting
                               if (t[0], t[1]) not in set(released)]

            # Persist BEFORE answering so a released query reads its own
            # batch's ingest — and a retry of this epoch overwrites in place.
            self._save(batch_id, state, meta)
            ingest_ms = int((time.perf_counter() - t_batch0) * 1000)
            if released:
                self._answer(batch_id, released, meta,
                             ingest_ms=ingest_ms, t_batch0=t_batch0,
                             local_cpu_ns=int(local_cpu_acc.value))
            # only after the epoch committed (state + answers written):
            # an aborted batch must not count as processed (ADVICE r3)
            self.batches_processed += 1
        finally:
            batch.unpersist()

    def _answer(self, batch_id: int, released: list[tuple[str, int]],
                meta: dict, *, ingest_ms: int = 0,
                t_batch0: float | None = None,
                local_cpu_ns: int = 0) -> None:
        t_g0 = time.perf_counter()
        global_cpu_acc = self.spark.sparkContext.accumulator(
            0, MaxAccumulator())
        local = self.spark.read.parquet(
            os.path.join(self.points_dir, f"epoch={batch_id}"))
        sizes = {int(r["pid"]): int(r["n"]) for r in
                 local.groupBy("pid").agg(F.count("*").alias("n")).collect()}
        glob = (
            _local_prune(
                _local_prune(local, self.cols, cpu_acc=global_cpu_acc)
                .repartition(1),
                self.cols, cpu_acc=global_cpu_acc)
            .persist()
        )
        try:
            surv = {int(r["pid"]): int(r["n"]) for r in
                    glob.groupBy("pid").agg(F.count("*").alias("n")).collect()}
            sky_size = sum(surv.values())
            # A4: survivors/local per partition, averaged over ALL
            # num_partitions (empty partitions count 0 — FlinkSkyline.java:600).
            opt = sum(surv.get(p, 0) / sizes[p] for p in sizes) \
                / self.num_partitions
            out = None
            for qid, _k in released:
                tagged = glob.drop("pid").select(
                    F.lit(str(qid)).alias("query_id"), "*")
                out = tagged if out is None else out.unionByName(tagged)
            # Per-batch-id subdir + overwrite ⇒ a batch retry replaces its
            # own earlier rows instead of appending duplicates.
            out.write.mode("overwrite").parquet(
                os.path.join(self.results_dir, _batch_subdir(batch_id)))
            # A5 timing shape (metrics_collector.py:60-72): ingest =
            # state update, global = merge+emit, total = batch wall,
            # latency = trigger receipt (batch start) → emission.
            # A6: {local,global}_cpu_ms = max task kernel CPU (straggler),
            # measured by the kernels themselves (FlinkSkyline.java:534-539).
            global_ms = int((time.perf_counter() - t_g0) * 1000)
            now = time.perf_counter()
            total_ms = int((now - (t_batch0 or t_g0)) * 1000)
            rows = [
                (str(qid), meta["record_count"], sky_size, round(opt, 4),
                 batch_id, ingest_ms, global_ms, total_ms, total_ms,
                 local_cpu_ns // 1_000_000,
                 int(global_cpu_acc.value) // 1_000_000)
                for qid, _k in released
            ]
            self.spark.createDataFrame(
                rows, PIPELINE_METRICS_DDL,
            ).write.mode("overwrite").parquet(
                os.path.join(self.metrics_dir, _batch_subdir(batch_id)))
        finally:
            glob.unpersist()

    # -- drivers -----------------------------------------------------------

    def run_available_now(self, data_dir: str, trigger_dir: str, *,
                          max_files_per_trigger: int | None = None) -> None:
        """Consume all currently-available files, then stop (test driver).

        Two text-file streams (CSV tuples / CSV triggers) tagged and
        unioned — the Spark analogue of the reference's
        ``keyedData.connect(keyedTriggers)`` (FlinkSkyline.java:162-165).
        """
        from .sources import file_stream

        data = file_stream(self.spark, data_dir,
                           max_files_per_trigger=max_files_per_trigger) \
            .withColumn("kind", F.lit(0))
        trig = file_stream(self.spark, trigger_dir,
                           max_files_per_trigger=max_files_per_trigger) \
            .withColumn("kind", F.lit(1))
        q = (
            data.unionByName(trig)
            .writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation",
                    os.path.join(self.work_dir, "checkpoint"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    def run_stream(self, tagged: DataFrame, *, timeout_s: float = 30.0,
                   min_batches: int = 2,
                   processing_interval: str = "1 second") -> int:
        """Run the pipeline off ANY tagged ``(value, kind)`` stream — the
        production driver shape: an unbounded source (rate, socket, or
        :func:`sources.kafka_stream`) with a processing-time trigger.

        Stops once ``min_batches`` micro-batches have been processed (or
        at ``timeout_s``, whichever first).  ``StreamingQuery.stop()``
        INTERRUPTS any in-flight micro-batch rather than draining it —
        that is safe here because each epoch commits atomically
        (``_save`` overwrites in place, retries are idempotent), so
        state/results are exactly what the completed epochs committed —
        the same any-time-stop contract a Kafka deployment has.  Returns
        the number of batches that committed during this run.
        """
        start = self.batches_processed
        q = (
            tagged.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation",
                    os.path.join(self.work_dir, "checkpoint"))
            .trigger(processingTime=processing_interval)
            .start()
        )
        try:
            deadline = time.time() + timeout_s
            while (time.time() < deadline
                   and self.batches_processed - start < min_batches):
                time.sleep(0.2)
        finally:
            q.stop()
            q.awaitTermination()
        return self.batches_processed - start

    def results(self) -> DataFrame:
        return self.spark.read.option("recursiveFileLookup", "true") \
            .parquet(self.results_dir)

    def metrics(self) -> DataFrame:
        return self.spark.read.option("recursiveFileLookup", "true") \
            .parquet(self.metrics_dir)
