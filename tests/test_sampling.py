"""Deterministic sampling / splitting: stability, disjointness, parity."""

import duckdb
import pytest

from flink_skyline_qos_spark.operators.sampling import (
    deterministic_sample,
    deterministic_sample_sql,
    hash_split,
    hash_split_sql,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_sample_stable_and_unbiased(docs):
    total = docs.count()
    s1 = deterministic_sample(docs, 0.2, ["doc_id"])
    s2 = deterministic_sample(docs.repartition(7), 0.2, ["doc_id"])
    ids1 = {r.doc_id for r in s1.select("doc_id").collect()}
    ids2 = {r.doc_id for r in s2.select("doc_id").collect()}
    assert ids1 == ids2  # partitioning-independent
    assert 0.1 * total < len(ids1) < 0.3 * total


def test_sample_monotone_in_fraction(docs):
    small = {r.doc_id for r in
             deterministic_sample(docs, 0.1, ["doc_id"]).collect()}
    big = {r.doc_id for r in
           deterministic_sample(docs, 0.3, ["doc_id"]).collect()}
    assert small <= big  # nested samples: growing the rate only adds rows


def test_split_disjoint_exhaustive(docs):
    out = hash_split(docs, {"train": 0.9, "val": 0.05, "test": 0.05},
                     ["doc_id"])
    counts = dict(out.groupBy("split").count().collect())
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()
    assert counts["train"] > counts.get("val", 0)
    assert out.filter("split IS NULL").count() == 0


def test_duckdb_parity(docs, sf_dir):
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS "
            f"SELECT * FROM '{sf_dir}/documents.parquet'")
    spark_ids = sorted(
        r.doc_id for r in
        deterministic_sample(docs, 0.25, ["doc_id"]).collect())
    duck_ids = sorted(r[0] for r in con.sql(
        deterministic_sample_sql("(SELECT doc_id FROM documents)", 0.25,
                                 ["doc_id"])).fetchall())
    assert spark_ids == duck_ids

    spark_split = sorted(
        (r.doc_id, r.split) for r in
        hash_split(docs.select("doc_id"),
                   {"train": 0.9, "val": 0.05, "test": 0.05},
                   ["doc_id"]).collect())
    duck_split = sorted(tuple(r) for r in con.sql(
        hash_split_sql("(SELECT doc_id FROM documents)",
                       {"train": 0.9, "val": 0.05, "test": 0.05},
                       ["doc_id"])).fetchall())
    assert spark_split == duck_split


def test_stratified_sample_rates_and_stability(spark):
    from flink_skyline_qos_spark.operators.sampling import stratified_sample

    rows = [(i, ["en", "zh", "de", "fr"][i % 4]) for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(df, {"en": 0.2, "zh": 1.0}, "lang", ["doc_id"])
    got = out.groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    assert by.get("zh") == 1000              # rate 1.0 keeps everything
    assert 120 <= by.get("en", 0) <= 280     # ~200 expected
    assert "de" not in by and "fr" not in by  # default_rate 0 drops
    # content-stable: changing ANOTHER stratum's rate never reshuffles
    # this stratum's sample
    en1 = {r["doc_id"] for r in out.filter("lang = 'en'").collect()}
    out2 = stratified_sample(df, {"en": 0.2, "zh": 0.5}, "lang", ["doc_id"])
    en2 = {r["doc_id"] for r in out2.filter("lang = 'en'").collect()}
    assert en1 == en2
