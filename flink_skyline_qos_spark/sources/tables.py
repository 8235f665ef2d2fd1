"""Batch table loaders for the driver's parquet testdata.

`events.parquet` is written with nanosecond timestamps, which Spark's
parquet reader rejects by default ([PARQUET_TYPE_ILLEGAL]).  We read
nanos as long (runtime conf) and normalize back to a proper
TimestampType column, so every downstream operator sees the declared
FIXTURES.md schema regardless of the file's physical type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # integer DIV keeps exactness (float division of epoch-nanos loses µs)
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}
