"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Every operator from SURVEY.md §2 implemented so far is registered here
with a DuckDB-oracle twin; column names are aliased identically on both
sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_skyline_qos_spark import (  # noqa: E402
    grouped_skyline,
    partitioner_expr,
    partitioner_sql,
    skyline,
    skyline_not_exists_sql,
    skyline_two_phase,
)
from flink_skyline_qos_spark.plans.queries import (  # noqa: E402
    prefix_queries_oracle_sql,
    run_prefix_queries,
)
from flink_skyline_qos_spark.sources.tables import load_table  # noqa: E402

# Fixed domain constants shared verbatim by Spark exprs and oracle SQL —
# the reference takes --domain from the CLI (FlinkSkyline.java:71).
LI_DOMAIN = 120000.0
LI_DIMS2 = ["l_extendedprice", "l_discount"]
LI_DIMS3 = ["l_extendedprice", "l_discount", "l_quantity"]
LI_COLS = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
]
NUM_PARTS = 8

# Prefix triggers on events (FIXTURES.md F2): mid-prefix, K=0 immediate,
# K beyond max(id) (pending-barrier → whole input at end-of-batch).
EVENT_TRIGGERS = [(1, 300), (2, 0), (3, 10_000_000_000)]


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").select(*LI_COLS)


def _events_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id", "user_id", "event_type", "value",
        F.unix_millis("ts").cast("double").alias("unix_ms"),
    )


_EV_SQL = (
    "(SELECT event_id, user_id, event_type, value, "
    "cast(epoch_ms(ts) as double) AS unix_ms FROM events)"
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: two-phase MR-Angle skyline of lineitem (minimize price+discount)."""
    df = _li(spark, "/root/testdata/sf0.001")
    return skyline_two_phase(
        df, LI_DIMS2, algo="mr-angle", num_partitions=NUM_PARTS,
        domain_max=LI_DOMAIN,
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- core skyline (A1+A2 composed), three physical strategies ---
    q["skyline_2d_lineitem"] = lambda s, d: skyline(_li(s, d), LI_DIMS2)
    q["skyline_3d_lineitem"] = lambda s, d: skyline(_li(s, d), LI_DIMS3)
    q["skyline_part"] = lambda s, d: skyline(
        load_table(s, d, "part").select("p_partkey", "p_size", "p_retailprice"),
        ["p_retailprice", "p_size"],
    )

    # --- two-phase with each reference partitioner (K1/K2/K3 + A1 + A2) ---
    for algo in ("mr-dim", "mr-grid", "mr-angle"):
        q[f"skyline_2d_{algo.replace('-', '_')}"] = (
            lambda s, d, a=algo: skyline_two_phase(
                _li(s, d), LI_DIMS2, algo=a, num_partitions=NUM_PARTS,
                domain_max=LI_DOMAIN,
            )
        )

    # --- partitioner routing as data (K1/K2/K3 observable output) ---
    for algo in ("mr-dim", "mr-grid", "mr-angle"):
        def _counts(s: SparkSession, d: str, a: str = algo) -> DataFrame:
            df = _li(s, d)
            pid = partitioner_expr(
                a, [F.col(c) for c in LI_DIMS2], NUM_PARTS, LI_DOMAIN
            )
            return (
                df.withColumn("pid", pid)
                .groupBy("pid").agg(F.count("*").alias("n_rows"))
            )
        q[f"{algo.replace('-', '_')}_partition_counts"] = _counts

    # --- grouped skyline (keyed-state analogue) ---
    q["grouped_skyline_events"] = lambda s, d: grouped_skyline(
        _events_ms(s, d), ["value", "unix_ms"], by="event_type"
    )

    # --- prefix/trigger queries (ST2 barrier semantics) ---
    q["prefix_query_skyline_events"] = lambda s, d: run_prefix_queries(
        _events_ms(s, d), EVENT_TRIGGERS, ["value", "unix_ms"],
        id_col="event_id",
    )

    return q


def oracle_sql() -> dict[str, str]:
    o: dict[str, str] = {}

    li = f"(SELECT {', '.join(LI_COLS)} FROM lineitem)"
    sky2 = skyline_not_exists_sql(li, LI_DIMS2)
    o["skyline_2d_lineitem"] = sky2
    o["skyline_3d_lineitem"] = skyline_not_exists_sql(li, LI_DIMS3)
    o["skyline_part"] = skyline_not_exists_sql(
        "(SELECT p_partkey, p_size, p_retailprice FROM part)",
        ["p_retailprice", "p_size"],
    )

    # Partition-invariance: two-phase == plain skyline (SURVEY §1.4)
    for algo in ("mr-dim", "mr-grid", "mr-angle"):
        o[f"skyline_2d_{algo.replace('-', '_')}"] = sky2

    for algo in ("mr-dim", "mr-grid", "mr-angle"):
        pid = partitioner_sql(algo, LI_DIMS2, NUM_PARTS, LI_DOMAIN)
        o[f"{algo.replace('-', '_')}_partition_counts"] = (
            f"SELECT {pid} AS pid, count(*) AS n_rows FROM {li} t GROUP BY 1"
        )

    o["grouped_skyline_events"] = skyline_not_exists_sql(
        _EV_SQL, ["value", "unix_ms"], select="t.*",
        partition_by=["event_type"],
    )

    o["prefix_query_skyline_events"] = prefix_queries_oracle_sql(
        _EV_SQL, EVENT_TRIGGERS, ["value", "unix_ms"], id_col="event_id"
    )

    return o
