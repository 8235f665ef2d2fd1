"""Query/trigger semantics (ST2/ST3) — the reference's record-ID barrier,
re-expressed for Spark's batch/micro-batch model.

Reference behavior (`/root/reference/java/org.main/FlinkSkyline.java:274-356`):
a trigger ``"qid,K"`` answers the skyline over everything ingested so far,
released at the earliest moment max-seen-id ≥ K; K=0 (or missing) means
"immediately, over whatever has arrived"; a trigger whose K is never
reached stays parked until more data arrives.

Batch mapping (SURVEY §3.3): with monotone ids, "earliest release at
max-seen ≥ K" is exactly the prefix ``id ≤ K``.  Deterministic batch
semantics for the edge cases:

* K = 0          → whole input (immediate over everything that arrived);
* K > max(id)    → whole input (released at end-of-input);
* 0 < K ≤ max(id)→ prefix ``id ≤ K``.

Scale note: the plan is one branch per query over the same scan; the
prefix predicate pushes down to the parquet scan per branch, and each
branch's skyline reduces narrowly before its tiny merge exchange — no
points×queries explosion.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dominance import dominance_sql
from ..operators.skyline import skyline

__all__ = ["run_prefix_queries", "prefix_queries_oracle_sql"]


def run_prefix_queries(points: DataFrame, queries: Sequence[tuple[int, int]],
                       cols: Sequence[str], *, id_col: str = "id") -> DataFrame:
    """Skyline per trigger (query_id, required_count K) with barrier semantics.

    Returns the union of per-query skylines tagged with ``query_id`` and
    ``record_count`` (number of rows in the answered prefix — the
    reference reports it in its result JSON, FlinkSkyline.java:633-634).
    """
    if not queries:
        raise ValueError("need at least one (query_id, required_count) trigger")
    # One aggregation job covers the barrier (max id) AND every prefix's
    # record count — no per-query count jobs.
    ks = sorted({int(k) for _, k in queries})
    stats = points.agg(
        F.max(id_col).alias("__max"),
        F.count(F.lit(1)).alias("__total"),
        *[F.sum((F.col(id_col) <= F.lit(k)).cast("long")).alias(f"__c_{k}")
          for k in ks],
    ).first()
    max_id = stats["__max"]
    out: DataFrame | None = None
    for qid, k in queries:
        whole = k == 0 or max_id is None or k > max_id
        prefix = points if whole else points.filter(F.col(id_col) <= F.lit(k))
        rc = stats["__total"] if whole else stats[f"__c_{int(k)}"]
        sky = (
            skyline(prefix, cols)
            .withColumn("query_id", F.lit(int(qid)).cast("long"))
            .withColumn("record_count", F.lit(int(rc or 0)).cast("long"))
        )
        out = sky if out is None else out.unionByName(sky)
    return out


def prefix_queries_oracle_sql(table: str, queries: Sequence[tuple[int, int]],
                              cols: Sequence[str], *, id_col: str = "id",
                              select: str = "t.*") -> str:
    """DuckDB-oracle twin of :func:`run_prefix_queries` (literal triggers)."""
    from ..functions.dominance import skyline_not_exists_sql

    parts = []
    for qid, k in queries:
        where = (
            f"{id_col} <= CASE WHEN {k} = 0 OR {k} > (SELECT max({id_col}) FROM {table}) "
            f"THEN (SELECT max({id_col}) FROM {table}) ELSE {k} END"
        )
        prefix = f"(SELECT * FROM {table} WHERE {where})"
        parts.append(
            skyline_not_exists_sql(
                prefix, cols,
                select=(
                    f"{select}, cast({qid} as bigint) AS query_id, "
                    f"cast((SELECT count(*) FROM {table} WHERE {where}) "
                    f"as bigint) AS record_count"
                ),
            )
        )
    return " UNION ALL ".join(parts)
