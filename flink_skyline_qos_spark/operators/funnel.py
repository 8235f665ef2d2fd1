"""Funnel analysis: ordered event-sequence matching per user.

"Of the users who viewed, how many then clicked, then purchased?" — the
canonical event-sequence query over the QoS/event stream, with the
standard FIRST-MATCH (greedy) semantics: step 1 anchors at the user's
earliest step-1 event, and each later step matches its earliest event
STRICTLY after the previous step's match.  (Greedy is the industry
semantics — Amplitude/GA funnels — and is what stays relational; the
alternative "any in-order subsequence" match is a per-user DP.)

Scale shape: one filtered, map-side-combined min-aggregate per step —
k−1 equi-joins on the user key carrying only the per-user timestamps
(never event payloads), no window functions, no per-user sort, no
Python.  Each stage's shuffle is ≤ one row per user.  The SQL twin is
the identical chain of CTEs, so step times are value-oracle-checked
exactly.

Reference basis: extends the reference's per-event analytics surface
(events table, FIXTURES.md F2); no funnel exists in the reference.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["funnel", "funnel_sql", "retention", "retention_sql",
           "user_growth", "user_growth_sql"]


def funnel(df: DataFrame, steps: Sequence[str], *,
           user_col: str = "user_id", ts_col: str = "ts",
           type_col: str = "event_type") -> DataFrame:
    """Per-user greedy funnel over `steps` (event-type names).

    Returns one row per user who reached step 1:
    ``user_col, t_0 … t_{k-1}, stages`` — `t_i` is the (nullable)
    first-match timestamp of step i, `stages` how many steps were
    reached.  A user absent from step 1 is absent from the output.
    """
    steps = [str(s) for s in steps]
    if len(steps) < 2:
        raise ValueError("need at least two funnel steps")
    res = (df.filter(F.col(type_col) == steps[0])
           .groupBy(user_col).agg(F.min(ts_col).alias("t_0")))
    for i, st in enumerate(steps[1:], 1):
        ev = df.filter(F.col(type_col) == st) \
            .select(user_col, F.col(ts_col).alias("__ts"))
        keys = [user_col] + [f"t_{j}" for j in range(i)]
        res = (res.join(ev, on=user_col, how="left")
               .groupBy(*keys)
               .agg(F.min(F.when(F.col("__ts") > F.col(f"t_{i - 1}"),
                                 F.col("__ts"))).alias(f"t_{i}")))
    stages = None
    for i in range(len(steps)):
        c = F.col(f"t_{i}").isNotNull().cast("long")
        stages = c if stages is None else stages + c
    return res.select(user_col, *[f"t_{i}" for i in range(len(steps))],
                      stages.alias("stages"))


def funnel_sql(table_sql: str, steps: Sequence[str], *,
               user_col: str = "user_id", ts_col: str = "ts",
               type_col: str = "event_type") -> str:
    """DuckDB twin of :func:`funnel` (identical greedy chain)."""
    steps = [str(s) for s in steps]
    if len(steps) < 2:
        raise ValueError("need at least two funnel steps")

    def q(v: str) -> str:
        return v.replace("'", "''")

    parts = [
        f"__f0 AS (SELECT {user_col}, min({ts_col}) AS t_0 "
        f"FROM ({table_sql}) WHERE {type_col} = '{q(steps[0])}' "
        f"GROUP BY {user_col})"
    ]
    for i, st in enumerate(steps[1:], 1):
        carry = ", ".join(f"p.t_{j}" for j in range(i))
        parts.append(
            f"__f{i} AS (SELECT p.{user_col}, {carry}, "
            f"min(CASE WHEN e.{ts_col} > p.t_{i - 1} THEN e.{ts_col} END) "
            f"AS t_{i} "
            f"FROM __f{i - 1} p LEFT JOIN ("
            f"SELECT {user_col}, {ts_col} FROM ({table_sql}) "
            f"WHERE {type_col} = '{q(st)}') e "
            f"ON e.{user_col} = p.{user_col} "
            f"GROUP BY p.{user_col}, {carry})")
    ts = ", ".join(f"t_{i}" for i in range(len(steps)))
    stages = " + ".join(
        f"(CASE WHEN t_{i} IS NOT NULL THEN 1 ELSE 0 END)"
        for i in range(len(steps)))
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT {user_col}, {ts}, "
              f"CAST({stages} AS BIGINT) AS stages "
              f"FROM __f{len(steps) - 1}")


def retention(df: DataFrame, *, user_col: str = "user_id",
              ts_col: str = "ts",
              granularity: str = "day") -> DataFrame:
    """Cohort retention: users are cohorted by their FIRST active
    period (day or week), and each (cohort, offset) cell counts how
    many of them were active `offset` periods later — the engagement
    matrix behind every retention curve.

    Scale shape: distinct (user, period) first (the only pass over raw
    events, map-side combined), a per-user min for the cohort, one
    equi-join on the user key, and a final (cohort, offset) count —
    every shuffle is bounded by active-user×period cardinality, never
    event volume.  Same chain in the SQL twin; `date_trunc`/`datediff`
    arithmetic is calendar-identical on both engines (UTC session).

    Output: ``cohort (date), offset (long), n_users (long)``; offset 0
    rows give cohort sizes.
    """
    if granularity not in ("day", "week"):
        raise ValueError("granularity must be 'day' or 'week'")
    per = F.date_trunc(granularity, F.col(ts_col)).cast("date")
    active = (df.where(F.col(user_col).isNotNull()
                       & F.col(ts_col).isNotNull())
              .select(F.col(user_col).alias("__u"), per.alias("__p"))
              .distinct())
    cohort = active.groupBy("__u").agg(F.min("__p").alias("__c"))
    div = 7 if granularity == "week" else 1
    joined = active.join(cohort, on="__u")
    return (joined.groupBy(
                F.col("__c").alias("cohort"),
                (F.datediff(F.col("__p"), F.col("__c")) / F.lit(div))
                .cast("long").alias("offset"))
            .agg(F.count(F.lit(1)).alias("n_users")))


def retention_sql(table_sql: str, *, user_col: str = "user_id",
                  ts_col: str = "ts",
                  granularity: str = "day") -> str:
    """DuckDB twin of :func:`retention`."""
    if granularity not in ("day", "week"):
        raise ValueError("granularity must be 'day' or 'week'")
    div = 7 if granularity == "week" else 1
    return f"""
WITH __active AS (
  SELECT DISTINCT {user_col} AS u,
         CAST(date_trunc('{granularity}', {ts_col}) AS DATE) AS p
  FROM ({table_sql})
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
),
__cohort AS (SELECT u, min(p) AS c FROM __active GROUP BY u)
SELECT c AS cohort,
       CAST(date_diff('day', c, p) / {div} AS BIGINT) AS offset,
       count(*)::BIGINT AS n_users
FROM __active a JOIN __cohort USING (u)
GROUP BY 1, 2
""".strip()


def user_growth(df: DataFrame, *, user_col: str = "user_id",
                ts_col: str = "ts") -> DataFrame:
    """Daily growth report: ``day, dau, new_users, cum_users`` — daily
    active users, first-seen users, and the running total of distinct
    users ever seen (the growth curve).

    The cumulative count needs NO giant window: cum_users(d) = Σ
    new_users(d') for d' ≤ d, a running sum over one row per DAY
    (≤ a few thousand rows at any horizon), while dau/new_users are
    map-side-combined aggregates over distinct (user, day) — shuffles
    bounded by user×day cardinality, never event volume.
    """
    from pyspark.sql.window import Window

    per = F.date_trunc("day", F.col(ts_col)).cast("date")
    active = (df.where(F.col(user_col).isNotNull()
                       & F.col(ts_col).isNotNull())
              .select(F.col(user_col).alias("__u"), per.alias("day"))
              .distinct())
    dau = active.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    first = active.groupBy("__u").agg(F.min("day").alias("day"))
    new = first.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    # the day-level frame is tiny: the running sum's single-partition
    # window is over O(days) rows, not events
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (dau.join(new, on="day", how="left")
            .select("day", "dau",
                    F.coalesce(F.col("new_users"),
                               F.lit(0).cast("long")).alias("new_users"))
            .withColumn("cum_users", F.sum("new_users").over(w)))


def user_growth_sql(table_sql: str, *, user_col: str = "user_id",
                    ts_col: str = "ts") -> str:
    """DuckDB twin of :func:`user_growth`."""
    return f"""
WITH __active AS (
  SELECT DISTINCT {user_col} AS u,
         CAST(date_trunc('day', {ts_col}) AS DATE) AS day
  FROM ({table_sql})
  WHERE {user_col} IS NOT NULL AND {ts_col} IS NOT NULL
),
__dau AS (SELECT day, count(*)::BIGINT AS dau FROM __active GROUP BY day),
__first AS (SELECT u, min(day) AS day FROM __active GROUP BY u),
__new AS (SELECT day, count(*)::BIGINT AS new_users
          FROM __first GROUP BY day)
SELECT d.day, d.dau,
       COALESCE(n.new_users, 0)::BIGINT AS new_users,
       sum(COALESCE(n.new_users, 0))
         OVER (ORDER BY d.day ROWS UNBOUNDED PRECEDING)::BIGINT
         AS cum_users
FROM __dau d LEFT JOIN __new n USING (day)
""".strip()
