"""Result metrics (A4-A7): optimality, timing, JSON result assembly.

Reference: `/root/reference/java/org.main/FlinkSkyline.java:579-650`.

* **Optimality** (A4): per origin partition, survivors-in-global ÷
  local-skyline-size; summed over partitions *with a recorded local
  skyline* and divided by `total_partitions` (empty partitions count in
  the denominator only) — exactly the reference's loop at :590-608.
* **Timing** (A5/A6): wall-clock phases measured driver-side; the
  per-partition CPU accounting becomes `observe()` metrics / Spark UI.
* **JSON assembly** (A7): `to_json(struct(...))`, optimality at 4 dp
  with US-locale formatting (reference uses String.format %.4f).
"""

from __future__ import annotations

import time
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.partitioners import partitioner_expr
from ..operators.skyline import _group_prune, _prune_batches

__all__ = ["skyline_query_metrics", "metrics_to_json", "write_metrics_csv"]


def skyline_query_metrics(points: DataFrame, cols: Sequence[str], *,
                          query_id: str = "1", algo: str = "mr-dim",
                          num_partitions: int = 8, domain_max: float,
                          with_timing: bool = False) -> DataFrame:
    """One-row metrics DataFrame for a skyline query under a given partitioner.

    Columns: query_id, record_count, skyline_size, optimality (4 dp) —
    the oracle-checkable subset of the reference's result JSON; timing
    fields (wall-clock, not oracle-checkable) added when `with_timing`.
    """
    t0 = time.perf_counter()
    dims = [F.col(c) for c in cols]
    tagged = points.withColumn(
        "origin_partition",
        partitioner_expr(algo, dims, num_partitions, domain_max),
    )
    local = tagged.groupBy("origin_partition").applyInPandas(
        _group_prune(cols), schema=tagged.schema
    )
    # One pass computes local sizes AND the global skyline from the same
    # cached local-skyline set (the reference records sizes in MapState
    # while merging, FlinkSkyline.java:541-544).
    local = local.persist()
    try:
        local_sizes = local.groupBy("origin_partition").agg(
            F.count("*").alias("local_size")
        )
        t_local0 = time.perf_counter()
        global_sky = local.repartition(1).mapInPandas(
            _prune_batches(cols), schema=local.schema
        )
        survivors = global_sky.groupBy("origin_partition").agg(
            F.count("*").alias("survivor_count")
        )
        record_count = points.count()
        per_part = (
            local_sizes.join(survivors, "origin_partition", "left")
            .select(
                (F.coalesce(F.col("survivor_count"), F.lit(0))
                 / F.col("local_size")).alias("ratio"),
                "local_size",
            )
        )
        agg = per_part.agg(
            F.round(
                F.coalesce(F.sum(F.when(F.col("local_size") > 0, F.col("ratio"))),
                           F.lit(0.0))
                / F.lit(float(num_partitions)),
                4,
            ).alias("optimality"),
        )
        skyline_size = global_sky.count()
        t_end = time.perf_counter()
        out = agg.select(
            F.lit(str(query_id)).alias("query_id"),
            F.lit(record_count).cast("long").alias("record_count"),
            F.lit(skyline_size).cast("long").alias("skyline_size"),
            "optimality",
        )
        if with_timing:
            total_ms = int((t_end - t0) * 1000)
            local_ms = int((t_local0 - t0) * 1000)
            global_ms = int((t_end - t_local0) * 1000)
            out = (
                out.withColumn("ingestion_time_ms", F.lit(0).cast("long"))
                .withColumn("local_processing_time_ms",
                            F.lit(local_ms).cast("long"))
                .withColumn("global_processing_time_ms",
                            F.lit(global_ms).cast("long"))
                .withColumn("total_processing_time_ms",
                            F.lit(total_ms).cast("long"))
            )
        out = out.persist()
        out.count()  # materialize before unpersisting the local skylines
        return out
    finally:
        local.unpersist()


def write_metrics_csv(metrics: DataFrame, path: str) -> None:
    """S4: append-style CSV metrics sink with the reference collector's
    column order (`metrics_collector.py:60-72`) where present.

    Missing timing columns are written as 0 — the collector does the
    same for malformed records.
    """
    ref_order = [
        "query_id", "record_count", "skyline_size", "optimality",
        "ingest_ms", "local_ms", "global_ms", "total_ms", "latency_ms",
    ]
    cols = [
        (F.col(c) if c in metrics.columns else F.lit(0).alias(c))
        for c in ref_order
    ]
    metrics.select(*cols).write.mode("append") \
        .option("header", True).csv(path)


def metrics_to_json(metrics: DataFrame) -> DataFrame:
    """A7: the reference's JSON result record as a single string column."""
    return metrics.select(
        F.to_json(F.struct(*metrics.columns)).alias("result_json")
    )


def metrics_oracle_sql(table_sql: str, cols: Sequence[str], *, query_id: str,
                       pid_sql: str, num_partitions: int) -> str:
    """DuckDB twin of :func:`skyline_query_metrics` (no timing columns)."""
    from ..functions.dominance import skyline_not_exists_sql

    base = f"(SELECT t.*, {pid_sql} AS origin_partition FROM {table_sql} t)"
    local_sky = skyline_not_exists_sql(
        base, cols, select="t.*", partition_by=["origin_partition"]
    )
    # global skyline composes over the CTE NAME so the local pipeline's SQL
    # is expanded (and evaluated) once, not once per reference
    global_sky = skyline_not_exists_sql("local_sky", cols, select="t.*")
    return f"""
WITH local_sky AS ({local_sky}),
global_sky AS ({global_sky}),
sizes AS (SELECT origin_partition, count(*) AS n FROM local_sky GROUP BY 1),
surv AS (SELECT origin_partition, count(*) AS s FROM global_sky GROUP BY 1)
SELECT '{query_id}' AS query_id,
       (SELECT count(*) FROM {table_sql} t) AS record_count,
       (SELECT count(*) FROM global_sky) AS skyline_size,
       round(coalesce((SELECT sum(coalesce(s.s, 0) * 1.0 / z.n)
                       FROM sizes z LEFT JOIN surv s USING (origin_partition)
                       WHERE z.n > 0), 0.0) / {num_partitions}, 4) AS optimality
""".strip()
