"""Wire-format parsing (P1/P2) — the reference's CSV tuple/trigger codecs.

Reference (`/root/reference/java/org.main/ServiceTuple.java:89-104`): a
data record is ``"ID,Val1,...,ValN"``; malformed records (wrong arity,
non-numeric fields) parse to null and are filtered out
(`FlinkSkyline.java:103-104`).  A trigger record is
``"QueryID,RequiredRecordCount"``; a payload without a comma means
K=0 → execute immediately (`query_trigger.py:76-82`,
`FlinkSkyline.java:334`).

Everything here is pure Column expressions (split + casts) — JVM-side,
whole-stage codegen, identical on batch and streaming DataFrames.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "tuple_schema_ddl",
    "parse_service_tuples",
    "parse_triggers",
    "serialize_service_tuples",
]


def tuple_schema_ddl(dims: int) -> str:
    """DDL schema string for an N-dim service tuple."""
    return ", ".join(["id LONG"] + [f"d{i} DOUBLE" for i in range(dims)])


def parse_service_tuples(raw: DataFrame, dims: int, *,
                         value_col: str = "value") -> DataFrame:
    """``"id,v1,..,vn"`` strings → ``(id: long, d0..d{dims-1}: double)``.

    Exact reference semantics: a row is dropped unless it has exactly
    ``dims + 1`` comma-separated fields and every field casts cleanly
    (ServiceTuple.java:95-103 — arity comes from the row, but the
    partitioners assume the CLI ``dims``; we enforce it at parse).
    """
    parts = F.split(F.col(value_col), ",")
    # try_element_at + try_cast: malformed rows yield nulls (ANSI-safe),
    # which the arity/null filter below drops — reference P1+P2 semantics.
    fields = [F.try_element_at(parts, F.lit(1)).try_cast("long").alias("id")] + [
        F.try_element_at(parts, F.lit(i + 2)).try_cast("double").alias(f"d{i}")
        for i in range(dims)
    ]
    parsed = raw.select(*fields, F.size(parts).alias("__arity"))
    ok = reduce(
        lambda a, b: a & b,
        [F.col("id").isNotNull()]
        + [F.col(f"d{i}").isNotNull() for i in range(dims)]
        + [F.col("__arity") == dims + 1],
    )
    return parsed.filter(ok).drop("__arity")


def parse_triggers(raw: DataFrame, *, value_col: str = "value") -> DataFrame:
    """Trigger strings → ``(query_id: string, required_count: long)``.

    ``"qid,K"`` → (qid, K); a payload without a comma (or with a
    non-numeric K) → (payload, 0) = immediate execution, matching
    FlinkSkyline.java:330-335.
    """
    parts = F.split(F.col(value_col), ",")
    k = F.when(F.size(parts) >= 2,
               F.coalesce(
                   F.try_element_at(parts, F.lit(2)).try_cast("long"),
                   F.lit(0))) \
        .otherwise(F.lit(0))
    return raw.select(
        F.try_element_at(parts, F.lit(1)).alias("query_id"),
        k.alias("required_count"),
    ).filter(F.col("query_id").isNotNull() & (F.col("query_id") != ""))


def serialize_service_tuples(df: DataFrame, dims: int, *,
                             id_col: str = "id") -> DataFrame:
    """Inverse of :func:`parse_service_tuples` — one ``value`` string column.

    Mirrors the producer's CSV serialization
    (`unified_producer.py:173-175`).  Useful for Kafka sinks and for
    writing test fixtures.
    """
    cols: list[Column] = [F.col(id_col).cast("string")]
    for i in range(dims):
        cols.append(F.col(f"d{i}").cast("string"))
    return df.select(F.concat_ws(",", *cols).alias("value"))
