"""Z-order layout: key parity, clamping, measurable locality."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_skyline_qos_spark.operators.layout import (
    zorder_key,
    zorder_key_sql,
    zorder_layout,
)

COLS = ["l_extendedprice", "l_quantity"]
DOMS = {"l_extendedprice": (900.0, 105000.0), "l_quantity": (1.0, 51.0)}


def test_zorder_key_matches_oracle(spark, lineitem, sf_dir):
    got = sorted(tuple(r) for r in lineitem.select(
        "l_orderkey", "l_linenumber",
        zorder_key(COLS, DOMS).alias("z")).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS SELECT * "
            f"FROM '{sf_dir}/lineitem.parquet'")
    want = sorted(tuple(r) for r in con.sql(
        f"SELECT l_orderkey, l_linenumber, "
        f"{zorder_key_sql(COLS, DOMS)} AS z FROM lineitem").fetchall())
    assert got == want


def test_zorder_key_clamps_out_of_domain(spark):
    df = spark.createDataFrame(
        [(-1e9, -50.0), (1e9, 1e9)], "a double, b double")
    doms = {"a": (0.0, 100.0), "b": (0.0, 100.0)}
    vals = [r.z for r in df.select(
        zorder_key(["a", "b"], doms, bits=8).alias("z")).collect()]
    assert vals[0] == 0
    assert vals[1] == (1 << 16) - 1  # all 8 bits set in both dims


def test_zorder_interleave_bit_positions(spark):
    # dim0 bit j lands at 2j, dim1 at 2j+1 (d=2)
    df = spark.createDataFrame([(255.0, 0.0), (0.0, 255.0)],
                               "a double, b double")
    doms = {"a": (0.0, 256.0), "b": (0.0, 256.0)}
    z = [r.z for r in df.select(
        zorder_key(["a", "b"], doms, bits=8).alias("z")).collect()]
    assert z[0] == sum(1 << (2 * j) for j in range(8))
    assert z[1] == sum(1 << (2 * j + 1) for j in range(8))


def test_zorder_layout_improves_file_locality(spark, lineitem):
    k = 16

    def mean_chunk_area(df):
        pdf = df.select(*COLS).toPandas()
        n = len(pdf)
        areas = []
        for i in range(k):
            c = pdf.iloc[i * n // k:(i + 1) * n // k]
            areas.append(
                (c[COLS[0]].max() - c[COLS[0]].min())
                * (c[COLS[1]].max() - c[COLS[1]].min()))
        return float(np.mean(areas))

    az = mean_chunk_area(zorder_layout(
        lineitem.select(*COLS), COLS, DOMS, num_files=k))
    an = mean_chunk_area(lineitem)
    # each output chunk's min/max bounding box (what parquet stats see)
    # must cover a much smaller region than an arbitrary layout's
    assert az < 0.5 * an


def test_zorder_rejects_bad_config(spark, lineitem):
    with pytest.raises(ValueError):
        zorder_key(["l_quantity"], {"l_quantity": (0.0, 1.0)})
    with pytest.raises(ValueError):
        zorder_key(COLS, DOMS, bits=32)  # 2*32 > 63
    with pytest.raises(ValueError):
        zorder_key(COLS, {"l_extendedprice": (1.0, 1.0),
                          "l_quantity": (0.0, 1.0)})
