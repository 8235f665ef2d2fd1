"""Mergeable sketches: cross-engine parity, accuracy, determinism."""

import duckdb
import pytest

from flink_skyline_qos_spark.operators.sketches import (
    histogram_quantiles,
    histogram_quantiles_sql,
    hll_distinct,
    hll_distinct_sql,
)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    for t in ("events", "lineitem"):
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_hll_matches_oracle_bit_exact(spark, events, con):
    res = _rows(hll_distinct(events, "user_id",
                             group_cols=["event_type"]))
    ora = sorted(tuple(r) for r in con.sql(
        hll_distinct_sql("events", "user_id",
                         group_cols=["event_type"])).fetchall())
    assert res == ora  # exact float equality, no rounding slack


def test_hll_global_and_small_m(spark, events, con):
    for b in (4, 8, 12):
        res = _rows(hll_distinct(events, "event_id", bucket_bits=b))
        ora = sorted(tuple(r) for r in con.sql(
            hll_distinct_sql("events", "event_id",
                            bucket_bits=b)).fetchall())
        assert res == ora, f"bucket_bits={b}"


def test_hll_accuracy_both_regimes(spark, lineitem, con):
    # linear-counting regime (distinct ≪ m) and raw regime (≫ m)
    for key, b in (("l_partkey", 12), ("l_orderkey", 6)):
        est = hll_distinct(lineitem, key, bucket_bits=b) \
            .collect()[0]["hll_estimate"]
        exact = con.sql(
            f"SELECT count(DISTINCT {key}) FROM lineitem").fetchone()[0]
        assert abs(est - exact) / exact < 0.35, (key, b, est, exact)


def test_hll_partitioning_invariant(spark, events):
    a = _rows(hll_distinct(events, "user_id"))
    b = _rows(hll_distinct(events.repartition(13), "user_id"))
    assert a == b


def test_hll_rejects_bad_bits(events):
    with pytest.raises(ValueError):
        hll_distinct(events, "user_id", bucket_bits=2)


def test_histogram_matches_oracle_bit_exact(spark, events, con):
    res = _rows(histogram_quantiles(events, "value",
                                    group_cols=["event_type"]))
    ora = sorted(tuple(r) for r in con.sql(
        histogram_quantiles_sql("events", "value",
                                group_cols=["event_type"])).fetchall())
    assert res == ora


def test_histogram_global_error_bound(spark, events, con):
    nbins = 512
    row = histogram_quantiles(events, "value", nbins=nbins,
                              quantiles=(0.5, 0.95)).collect()[0]
    lo, hi, p50, p95 = con.sql(
        "SELECT min(value), max(value), quantile_cont(value, 0.5), "
        "quantile_cont(value, 0.95) FROM events").fetchone()
    width = (hi - lo) / nbins
    assert abs(row["q_50"] - p50) <= width
    assert abs(row["q_95"] - p95) <= width


def test_histogram_degenerate_single_value(spark):
    from pyspark.sql import functions as F
    df = spark.range(100).select(F.lit(7.5).alias("v"))
    row = histogram_quantiles(df, "v", quantiles=(0.5,)).collect()[0]
    assert row["n"] == 100 and row["q_50"] == 7.5


def test_histogram_rejects_bad_quantile(events):
    with pytest.raises(ValueError):
        histogram_quantiles(events, "value", quantiles=(1.5,))


def test_sketches_stay_jvm_side(events):
    # the whole sketch is Column expressions — no Python workers
    for df in (hll_distinct(events, "user_id"),
               histogram_quantiles(events, "value")):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "FlatMapGroupsInPandas" not in plan
