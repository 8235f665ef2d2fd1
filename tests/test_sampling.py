"""Deterministic sampling / splitting: stability, disjointness, parity."""

import duckdb
import pytest
from pyspark.sql import functions as F

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


def test_weighted_sample_matches_oracle(spark, sf_dir):
    import duckdb

    from flink_skyline_qos_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_sql,
    )
    from flink_skyline_qos_spark.sources.tables import load_table

    df = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("n_chars") / F.lit(4000.0)).alias("weight"))
    got = sorted(tuple(r) for r in
                 weighted_sample(df, 1.0, "weight", ["doc_id"]).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * "
            f"FROM '{sf_dir}/documents.parquet'")
    want = sorted(tuple(r) for r in con.sql(weighted_sample_sql(
        "(SELECT doc_id, CAST(n_chars AS DOUBLE) / 4000.0 AS weight "
        "FROM documents)", 1.0, "weight", ["doc_id"])).fetchall())
    assert got == want
    assert 0 < len(got) < df.count()  # neither empty nor everything


def test_weighted_sample_weight_semantics(spark):
    from flink_skyline_qos_spark.operators.sampling import weighted_sample

    rows = [(1, 2.0), (2, 0.0), (3, -5.0), (4, None),
            (5, float("nan")), (6, 1.0)]
    df = spark.createDataFrame(rows, "id bigint, w double")
    kept = {r.id for r in weighted_sample(df, 1.0, "w", ["id"]).collect()}
    # weight >= 1/rate => probability 1 (always kept); <= 0 / NULL /
    # NaN => never kept
    assert 1 in kept and 6 in kept
    assert kept.isdisjoint({2, 3, 4, 5})


def test_weighted_sample_rate_monotone_and_stable(spark):
    from flink_skyline_qos_spark.operators.sampling import weighted_sample

    df = spark.range(2000).select(
        F.col("id"), F.lit(0.5).alias("w"))
    lo = {r.id for r in weighted_sample(df, 0.4, "w", ["id"]).collect()}
    hi = {r.id for r in weighted_sample(df, 1.2, "w", ["id"]).collect()}
    assert lo < hi  # strictly more rows at the higher rate
    # content-stable: repartitioning never changes membership
    again = {r.id for r in weighted_sample(
        df.repartition(7), 0.4, "w", ["id"]).collect()}
    assert again == lo


def test_weighted_sample_bad_rate(spark):
    from flink_skyline_qos_spark.operators.sampling import (
        weighted_sample,
        weighted_sample_sql,
    )

    df = spark.createDataFrame([(1, 1.0)], "id bigint, w double")
    with pytest.raises(ValueError):
        weighted_sample(df, -0.1, "w", ["id"])
    with pytest.raises(ValueError):
        weighted_sample_sql("t", -1.0, "w", ["id"])


def test_temperature_sample_flattens_distribution(spark):
    from flink_skyline_qos_spark.operators.sampling import (
        temperature_sample,
    )

    # 2000 'big' rows vs 125 'small' rows: with T=2 expected keeps are
    # base*2000 (capped rate on the max group) and base*sqrt(2000*125)
    rows = [(i, "big" if i < 2000 else "small") for i in range(2125)]
    df = spark.createDataFrame(rows, "id long, g string")
    out = temperature_sample(df, ["g"], ["id"], base_rate=0.5,
                             temperature=2.0)
    by = {r["g"]: r["n"] for r in
          out.groupBy("g").agg(F.count("*").alias("n")).collect()}
    # big keeps ~0.5 of 2000; small keeps ~0.5*sqrt(2000/125)=2.0 -> all
    assert abs(by["big"] - 1000) < 120
    assert by["small"] == 125  # rate capped at 1: every row kept
    # T=1 degenerates to uniform base_rate
    out1 = temperature_sample(df, ["g"], ["id"], base_rate=0.5,
                              temperature=1.0)
    by1 = {r["g"]: r["n"] for r in
           out1.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert abs(by1["small"] - 62) < 30
    # T=inf balances: small keeps everything, big ~ base*max == 1000
    outi = temperature_sample(df, ["g"], ["id"], base_rate=0.5,
                              temperature=float("inf"))
    byi = {r["g"]: r["n"] for r in
           outi.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert byi["small"] == 125
    # membership is content-stable under repartitioning
    again = {r["id"] for r in temperature_sample(
        df.repartition(7), ["g"], ["id"], base_rate=0.5,
        temperature=2.0).collect()}
    assert again == {r["id"] for r in out.collect()}


def test_temperature_sample_rejects_inexact_temperature(spark):
    from flink_skyline_qos_spark.operators.sampling import (
        temperature_sample,
        temperature_sample_sql,
    )

    df = spark.createDataFrame([(1, "a")], "id long, g string")
    with pytest.raises(ValueError):
        temperature_sample(df, ["g"], ["id"], base_rate=0.5,
                           temperature=3.0)
    with pytest.raises(ValueError):
        temperature_sample_sql("t", ["g"], ["id"], base_rate=0.5,
                               temperature=0.7)
    with pytest.raises(ValueError):
        temperature_sample(df, ["g"], ["id"], base_rate=-0.1)


# --- group_cap: per-source frequency cap ------------------------------

def test_group_cap_exact_and_stable(docs, spark):
    from flink_skyline_qos_spark.operators.sampling import (
        group_cap, group_cap_sql)
    capped = group_cap(docs.select("doc_id", "source"),
                       ["source"], 7, ["doc_id"])
    per = {r.source: r.n for r in
           capped.groupBy("source").agg(F.count("*").alias("n")).collect()}
    base = {r.source: r.n for r in
            docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in per.items():
        assert n == min(7, base[src])  # exact cap, small groups intact
    # partitioning-independence: the selected SET is content-stable
    again = group_cap(docs.repartition(13).select("doc_id", "source"),
                      ["source"], 7, ["doc_id"])
    assert ({r.doc_id for r in capped.collect()}
            == {r.doc_id for r in again.collect()})
    # salted two-level selection == single global window (exactness):
    # n_salts=1 degenerates to the plain window; any n_salts must agree
    one = group_cap(docs.select("doc_id", "source"), ["source"], 7,
                    ["doc_id"], n_salts=1)
    assert ({r.doc_id for r in one.collect()}
            == {r.doc_id for r in capped.collect()})


def test_group_cap_sql_parity(docs, sf_dir):
    from flink_skyline_qos_spark.operators.sampling import (
        group_cap, group_cap_sql)
    spark_ids = sorted(
        r.doc_id for r in group_cap(docs.select("doc_id", "source"),
                                    ["source"], 5, ["doc_id"]).collect())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    duck_ids = sorted(r[0] for r in con.execute(
        group_cap_sql("SELECT doc_id, source FROM documents",
                      ["source"], 5, ["doc_id"])).fetchall())
    assert spark_ids == duck_ids


def test_group_cap_growth_stability(docs):
    """A kept row is only evicted by a new row hashing below it —
    capping a SUPERSET never admits a row the subset run rejected
    while keeping the group full."""
    from flink_skyline_qos_spark.operators.sampling import group_cap
    half = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "source")
    full = docs.select("doc_id", "source")
    kept_half = {r.doc_id for r in
                 group_cap(half, ["source"], 5, ["doc_id"]).collect()}
    kept_full = {r.doc_id for r in
                 group_cap(full, ["source"], 5, ["doc_id"]).collect()}
    # rows selected from the superset that were PRESENT in the subset
    # must also have been selected there (hash order is content-stable)
    assert {i for i in kept_full if i % 2 == 0} <= kept_half


# --- budget_mix: token-budget training mix ----------------------------

def test_budget_mix_hits_budget_and_parity(docs, sf_dir):
    from flink_skyline_qos_spark.operators.sampling import (
        budget_mix, budget_mix_sql)
    from flink_skyline_qos_spark.functions.text import (
        token_count, token_count_sql)
    base = docs.select("doc_id", "lang",
                       token_count(F.col("text")).alias("n_tokens"))
    out = budget_mix(base, ["lang"], 3000, "n_tokens", ["doc_id"])
    kept = out.groupBy("lang").agg(F.sum("n_tokens").alias("t")).collect()
    totals = {r.lang: r.t for r in
              base.groupBy("lang").agg(F.sum("n_tokens").alias("t"))
              .collect()}
    for r in kept:
        if totals[r.lang] <= 3000:
            assert r.t == totals[r.lang]  # under-budget groups intact
        else:
            # Bernoulli mix around the budget (generous 3x bound —
            # the point is "about the budget", exactness is the oracle)
            assert r.t < 3 * 3000
    # engine parity (bit-identical row set)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{sf_dir}/documents.parquet'")
    duck = sorted(r[0] for r in con.execute(budget_mix_sql(
        f"SELECT doc_id, lang, {token_count_sql('text')} AS n_tokens "
        f"FROM documents", ["lang"], 3000, "n_tokens",
        ["doc_id"])).fetchall())
    assert sorted(r.doc_id for r in out.collect()) == duck


def test_budget_mix_monotone_in_budget(docs):
    from flink_skyline_qos_spark.operators.sampling import budget_mix
    from flink_skyline_qos_spark.functions.text import token_count
    base = docs.select("doc_id", "lang",
                       token_count(F.col("text")).alias("n_tokens"))
    small = {r.doc_id for r in
             budget_mix(base, ["lang"], 1000, "n_tokens",
                        ["doc_id"]).collect()}
    big = {r.doc_id for r in
           budget_mix(base, ["lang"], 5000, "n_tokens",
                      ["doc_id"]).collect()}
    assert small <= big  # raising the budget only adds documents
