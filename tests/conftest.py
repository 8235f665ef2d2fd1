import os

import pytest

os.environ.setdefault("SPARK_SHUFFLE_PARTITIONS", "8")

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from flink_skyline_qos_spark.session import get_spark

    s = get_spark("tests", master=os.environ.get("SPARK_MASTER", "local[4]"))
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def lineitem(spark, sf_dir):
    from flink_skyline_qos_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "lineitem")


@pytest.fixture(scope="session")
def events(spark, sf_dir):
    from flink_skyline_qos_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "events")


@pytest.fixture(scope="session")
def documents(spark, sf_dir):
    from flink_skyline_qos_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "documents")


@pytest.fixture(scope="session")
def embeddings(spark, sf_dir):
    from flink_skyline_qos_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "embeddings")


@pytest.fixture()
def points_2d(spark, lineitem):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    return (
        lineitem.limit(400)
        .select(
            F.monotonically_increasing_id().alias("rk"),
            F.col("l_extendedprice").alias("d0"),
            F.col("l_discount").alias("d1"))
        .withColumn("id", F.row_number().over(Window.orderBy("rk")))
        .select("id", "d0", "d1")
    )
