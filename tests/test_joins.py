"""As-of and range join tests (operators/joins)."""

import duckdb
from pyspark.sql import functions as F

from flink_skyline_qos_spark.operators.joins import (
    as_of_join,
    as_of_join_sql,
    range_join,
    range_join_sql,
)


def test_as_of_crafted(spark):
    left = spark.createDataFrame(
        [(1, 10, 100), (1, 20, 200), (1, 5, 50), (2, 15, 150)],
        "k long, t long, lv long",
    )
    right = spark.createDataFrame(
        [(1, 10, 7, 900), (1, 18, 8, 901), (2, 99, 9, 902)],
        "k long, t long, rv long, rid long",
    )
    out = {(r.k, r.t): (r.rv_asof, r.t_asof)
           for r in as_of_join(left, right, on="t", by="k",
                               right_cols=["rv"], tiebreak="rid")
           .collect()}
    assert out[(1, 10)] == (7, 10)     # inclusive <=
    assert out[(1, 20)] == (8, 18)     # latest admissible
    assert out[(1, 5)] == (None, None)  # nothing before
    assert out[(2, 15)] == (None, None)  # right row is in the future


def test_as_of_duplicate_ts_tiebreak(spark):
    """Among right rows tied at the same timestamp the greatest
    tiebreak wins — deterministically, on both engines."""
    import pandas as pd

    left = spark.createDataFrame([(1, 10, 0)], "k long, t long, lv long")
    right = spark.createDataFrame(
        [(1, 10, 100, 1), (1, 10, 200, 2), (1, 10, 150, 3)],
        "k long, t long, rv long, rid long",
    )
    r = as_of_join(left, right, on="t", by="k",
                   right_cols=["rv"], tiebreak="rid").first()
    assert r.rv_asof == 150  # rid 3 is last under (t, side, rid)
    con = duckdb.connect()
    con.register("l", pd.DataFrame([(1, 10, 0)],
                                   columns=["k", "t", "lv"]))
    con.register("r", pd.DataFrame(
        [(1, 10, 100, 1), (1, 10, 200, 2), (1, 10, 150, 3)],
        columns=["k", "t", "rv", "rid"]))
    got = con.sql(as_of_join_sql(
        "SELECT * FROM l", "SELECT * FROM r", on="t", by="k",
        left_cols=["k", "t", "lv"], right_cols=["rv"],
        tiebreak="rid")).fetchone()
    assert got[-1] == 150


def test_as_of_events_duckdb_parity(spark, events, sf_dir):
    clicks = events.filter(F.col("event_type") == "click") \
        .select("event_id", "user_id", "ts", "value")
    purch = events.filter(F.col("event_type") == "purchase") \
        .select("event_id", "user_id", "ts", "value")
    out = as_of_join(clicks, purch, on="ts", by="user_id",
                     right_cols=["value", "event_id"],
                     tiebreak="event_id")
    sp = sorted(map(tuple, out.select(
        "event_id",
        F.unix_millis(F.col("ts_asof").cast("timestamp")),
        "value_asof", "event_id_asof").collect()))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS "
            f"SELECT * FROM '{sf_dir}/events.parquet'")
    sql = as_of_join_sql(
        "SELECT event_id, user_id, ts, value FROM events "
        "WHERE event_type = 'click'",
        "SELECT event_id, user_id, ts, value FROM events "
        "WHERE event_type = 'purchase'",
        on="ts", by="user_id",
        left_cols=["event_id", "user_id", "ts", "value"],
        right_cols=["value", "event_id"], tiebreak="event_id")
    dk = sorted(map(tuple, con.sql(
        "SELECT event_id, epoch_ms(ts_asof), value_asof, event_id_asof "
        f"FROM ({sql})").fetchall()))
    assert sp == dk


def test_range_join_crafted_and_boundaries(spark):
    pts = spark.createDataFrame(
        [(1, 0.0), (2, 9.999), (3, 10.0), (4, 25.0)],
        "pid long, v double",
    )
    iv = spark.createDataFrame(
        [(10, 0.0, 10.0), (20, 10.0, 20.0)],
        "iv_id long, lo double, hi double",
    )
    got = sorted(
        (r.pid, r.iv_id)
        for r in range_join(pts, iv, point_col="v", start_col="lo",
                            end_col="hi", bucket_width=4.0).collect())
    # half-open [lo, hi): v=10.0 goes to the second interval only
    assert got == [(1, 10), (2, 10), (3, 20)]


def test_range_join_bucket_width_invariance(spark, events):
    pts = events.select("event_id", F.col("value").alias("v"))
    iv = spark.range(20).select(
        F.col("id").alias("iv_id"),
        (F.col("id") * 11.0).alias("lo"),
        (F.col("id") * 11.0 + 13.0).alias("hi"))
    ref = None
    for w in (1.0, 5.0, 50.0):
        got = sorted(map(tuple, range_join(
            pts, iv, point_col="v", start_col="lo", end_col="hi",
            bucket_width=w).collect()))
        if ref is None:
            ref = got
        else:
            assert got == ref, f"bucket_width={w}"
    con = duckdb.connect()
    con.register("pts", pts.toPandas())
    con.register("iv", iv.toPandas())
    dk = sorted(map(tuple, con.sql(range_join_sql(
        "SELECT * FROM pts", "SELECT * FROM iv",
        point_col="v", start_col="lo", end_col="hi",
        point_cols=["event_id", "v"],
        interval_cols=["iv_id", "lo", "hi"])).fetchall()))
    assert ref == dk


# --- bloom semi join -------------------------------------------------

def test_bloom_semi_join_matches_plain_semi(spark, sf_dir):
    from flink_skyline_qos_spark.operators.joins import bloom_semi_join
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .where("c_custkey % 7 = 0")
    got = sorted(r.o_orderkey for r in bloom_semi_join(
        orders, cust, "o_custkey", dim_key="c_custkey")
        .select("o_orderkey").collect())
    want = sorted(r.o_orderkey for r in orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")).distinct(),
        on="o_custkey", how="leftsemi").select("o_orderkey").collect())
    assert got == want and len(got) > 0


def test_bloom_only_mode_is_superset_and_prunes(spark, sf_dir):
    from flink_skyline_qos_spark.operators.joins import bloom_semi_join
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .where("c_custkey % 11 = 0")
    exact = {r.o_orderkey for r in bloom_semi_join(
        orders, cust, "o_custkey", dim_key="c_custkey")
        .select("o_orderkey").collect()}
    sup = {r.o_orderkey for r in bloom_semi_join(
        orders, cust, "o_custkey", dim_key="c_custkey", exact=False)
        .select("o_orderkey").collect()}
    assert exact <= sup                     # never loses a row
    assert len(sup) < orders.count()        # really prunes the fact side
    # FP budget: m/n is huge here, allow a small absolute slack
    assert len(sup) - len(exact) <= max(10, len(exact) // 10)


def test_bloom_prefilter_runs_before_the_join(spark, sf_dir):
    # the membership conjunction must sit under the final semi join,
    # i.e. the plan filters fact rows before the exchange
    from flink_skyline_qos_spark.operators.joins import bloom_semi_join
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .where("c_custkey % 5 = 0")
    df = bloom_semi_join(orders, cust, "o_custkey", dim_key="c_custkey")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "getbit" in plan           # bloom probe present
    semi_pos = plan.find("LeftSemi")
    probe_pos = plan.find("getbit")
    assert semi_pos != -1 and probe_pos > semi_pos  # probe deeper in tree
    assert "BatchEvalPython" not in plan


def test_bloom_semi_join_empty_dim(spark, sf_dir):
    from flink_skyline_qos_spark.operators.joins import bloom_semi_join
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .where("c_custkey < 0")
    assert bloom_semi_join(orders, cust, "o_custkey",
                           dim_key="c_custkey").count() == 0
