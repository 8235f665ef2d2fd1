"""Distributed exact-integer k-means (operators/kmeans.py)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from flink_skyline_qos_spark.operators.kmeans import (
    kmeans_assign,
    kmeans_assign_sql,
)


@pytest.fixture(scope="module")
def embeddings(spark, sf_dir):
    from flink_skyline_qos_spark.sources.tables import load_table

    return load_table(spark, sf_dir, "embeddings")


def test_kmeans_matches_oracle(spark, embeddings, sf_dir):
    got = sorted(tuple(r) for r in kmeans_assign(
        embeddings, dim=64, k=8, iterations=3, dp=4).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * "
            f"FROM '{sf_dir}/embeddings.parquet'")
    want = sorted(tuple(r) for r in con.sql(kmeans_assign_sql(
        "SELECT * FROM embeddings", dim=64, k=8, iterations=3,
        dp=4)).fetchall())
    assert got == want
    clusters = {c for _, c, _ in got}
    assert clusters <= set(range(8)) and len(clusters) > 1
    assert all(d >= 0 for _, _, d in got)


def test_kmeans_partitioning_invariant(spark, embeddings):
    base = sorted(tuple(r) for r in kmeans_assign(
        embeddings, dim=64, k=4, iterations=2).collect())
    shuffled = sorted(tuple(r) for r in kmeans_assign(
        embeddings.repartition(7), dim=64, k=4, iterations=2).collect())
    assert base == shuffled


def test_kmeans_drops_incomplete_vectors(spark):
    rows = [
        (1, [1.0, 2.0]),
        (2, [float("nan"), 2.0]),   # NaN component
        (3, None),                  # null vector
        (4, [1.0]),                 # wrong length
        (5, [None, 2.0]),           # null component
        (6, [10.0, 20.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = kmeans_assign(df, dim=2, k=2, iterations=1).collect()
    assert sorted(r.vec_id for r in out) == [1, 6]


def test_kmeans_zero_iterations_assigns_to_seeds(spark):
    # two well-separated groups; k=2 seeds land one in each by content
    # hash, and even the 0-update assignment separates the groups
    rows = [(i, [0.0 + i, 0.0]) for i in range(3)] + \
           [(100 + i, [1000.0 + i, 1000.0]) for i in range(3)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r.vec_id: r.cluster for r in
           kmeans_assign(df, dim=2, k=2, iterations=0).collect()}
    assert len(out) == 6
    low = {out[i] for i in (0, 1, 2)}
    high = {out[i] for i in (100, 101, 102)}
    assert len(low) == 1 and len(high) == 1 and low != high


def test_kmeans_empty_input(spark):
    df = spark.createDataFrame([], "vec_id bigint, embedding array<double>")
    out = kmeans_assign(df, dim=2, k=2, iterations=1)
    assert out.columns == ["vec_id", "cluster", "sq_dist_q"]
    assert out.count() == 0


def test_kmeans_final_assign_is_jvm_narrow(spark, embeddings):
    # the returned frame (final assignment against literal centroids)
    # must be pure JVM Column math: no Python eval, no join, and no
    # exchange — per-row work only, whatever the input partitioning
    df = kmeans_assign(embeddings, dim=64, k=4, iterations=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_kmeans_bad_args(spark, embeddings):
    with pytest.raises(ValueError):
        kmeans_assign(embeddings, dim=64, k=0)
    with pytest.raises(ValueError):
        kmeans_assign(embeddings, dim=0, k=2)
    with pytest.raises(ValueError):
        kmeans_assign(embeddings, dim=64, k=2, iterations=-1)


def test_pq_encode_matches_oracle(spark, embeddings, sf_dir):
    from flink_skyline_qos_spark.operators.kmeans import (
        pq_encode,
        pq_encode_sql,
    )

    got = sorted(tuple(r) for r in pq_encode(
        embeddings, dim=64, m=4, k=16, iterations=2, dp=4).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * "
            f"FROM '{sf_dir}/embeddings.parquet'")
    want = sorted(tuple(r) for r in con.sql(pq_encode_sql(
        "SELECT * FROM embeddings", dim=64, m=4, k=16, iterations=2,
        dp=4)).fetchall())
    assert got == want
    codes = [c for _, c in got]
    assert all(0 <= c < 16 ** 4 for c in codes)
    # quantizer actually discriminates: near-unique codes on this set
    assert len(set(codes)) > len(codes) // 2


def test_pq_encode_is_narrow_jvm_plan(spark, embeddings):
    from flink_skyline_qos_spark.operators.kmeans import pq_encode

    df = pq_encode(embeddings, dim=64, m=4, k=4, iterations=1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "Join" not in plan
    assert "Exchange" not in plan


def test_pq_encode_subspace_codes_pack_base_k(spark):
    from flink_skyline_qos_spark.operators.kmeans import pq_encode

    # two groups separated ONLY in the second subspace: subspace-0
    # codes agree, subspace-1 codes differ, so packed codes differ by
    # a multiple of k
    rows = [(i, [1.0, 1.0, 0.0 + i * 0.001, 0.0]) for i in range(4)] + \
           [(10 + i, [1.0, 1.0, 900.0 + i * 0.001, 900.0])
            for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = {r.vec_id: r.pq_code for r in pq_encode(
        df, dim=4, m=2, k=2, iterations=2).collect()}
    lo = {out[i] for i in range(4)}
    hi = {out[10 + i] for i in range(4)}
    assert len(lo) == 1 and len(hi) == 1 and lo != hi
    (a,), (b,) = lo, hi
    assert a % 2 == b % 2  # same subspace-0 code
    assert abs(a - b) % 2 == 0  # differ only in the k^1 digit


def test_pq_encode_bad_args(spark, embeddings):
    from flink_skyline_qos_spark.operators.kmeans import pq_encode

    with pytest.raises(ValueError):
        pq_encode(embeddings, dim=64, m=5)  # m does not divide dim
    with pytest.raises(ValueError):
        pq_encode(embeddings, dim=64, m=4, k=1)


def test_pq_adc_matches_oracle_and_self_retrieval(spark, embeddings,
                                                  sf_dir):
    from flink_skyline_qos_spark.operators.kmeans import (
        pq_adc_topk,
        pq_adc_topk_sql,
    )

    qs = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    got = sorted(tuple(r) for r in pq_adc_topk(
        embeddings, qs, dim=64, m=4, k=16, iterations=2, dp=4,
        topk=10).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * "
            f"FROM '{sf_dir}/embeddings.parquet'")
    want = sorted(tuple(r) for r in con.sql(pq_adc_topk_sql(
        "SELECT * FROM embeddings",
        "SELECT vec_id AS query_id, embedding FROM embeddings "
        "WHERE vec_id < 5",
        dim=64, m=4, k=16, iterations=2, dp=4, topk=10)).fetchall())
    assert got == want
    assert len(got) == 50
    # each query's own vector has ADC distance == its own quantization
    # residual, minimal among all codes sharing its cell -> rank 1 here
    rank1 = {q: v for q, v, _, r in got if r == 1}
    assert rank1 == {i: i for i in range(5)}


def test_pq_adc_scan_side_has_no_join(spark, embeddings):
    from flink_skyline_qos_spark.operators.kmeans import pq_adc_topk

    qs = embeddings.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding")
    df = pq_adc_topk(embeddings, qs, dim=64, m=2, k=4, iterations=1,
                     topk=5)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "Join" not in plan  # codes + LUTs are literals, never joined
    # exactly the one exchange the per-query top-k window requires
    assert plan.count("Exchange") <= 2


def test_pq_adc_empty_queries(spark, embeddings):
    from flink_skyline_qos_spark.operators.kmeans import pq_adc_topk

    qs = embeddings.filter(F.lit(False)).select(
        F.col("vec_id").alias("query_id"), "embedding")
    out = pq_adc_topk(embeddings, qs, dim=64, m=2, k=4, iterations=0)
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "adc_dist_q", "rank"]


def test_kmeans_balanced_sample_matches_oracle(spark, embeddings,
                                               sf_dir):
    from flink_skyline_qos_spark.operators.kmeans import (
        kmeans_assign,
        kmeans_balanced_sample,
        kmeans_balanced_sample_sql,
    )

    got = sorted(tuple(r) for r in kmeans_balanced_sample(
        embeddings, dim=64, k=8, iterations=2, dp=4,
        target=20).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS SELECT * "
            f"FROM '{sf_dir}/embeddings.parquet'")
    want = sorted(tuple(r) for r in con.sql(kmeans_balanced_sample_sql(
        "SELECT * FROM embeddings", dim=64, k=8, iterations=2, dp=4,
        target=20)).fetchall())
    assert got == want
    # balance: per-cluster counts hover around the target expectation
    # (binomial at rate 20/|c|); with |c| ~ 60 the spread is wide but
    # every cluster must be represented and none may exceed its size
    from collections import Counter

    sizes = Counter(r.cluster for r in kmeans_assign(
        embeddings, dim=64, k=8, iterations=2, dp=4).collect())
    per = Counter(c for _, c in got)
    assert set(per) == set(sizes)
    for c, n in per.items():
        assert 1 <= n <= sizes[c]


def test_kmeans_balanced_sample_keeps_small_clusters_whole(spark):
    from flink_skyline_qos_spark.operators.kmeans import (
        kmeans_balanced_sample,
    )

    # two tight groups of 5; target 50 >> 5 => rate 1, everything kept
    rows = [(i, [0.0 + i * 0.001, 0.0]) for i in range(5)] + \
           [(100 + i, [900.0 + i * 0.001, 900.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = kmeans_balanced_sample(df, dim=2, k=2, iterations=1, target=50)
    assert out.count() == 10


def test_ann_recall_adc_query(spark, sf_dir):
    import __spark_entry__ as entrymod

    fn = entrymod.queries()["ann_recall_adc_clustered"]
    got = {r.query_id: (r.n_hits, r.recall)
           for r in fn(spark, sf_dir).collect()}
    assert set(got) == {0, 1, 2, 3, 4}
    for qid, (n, rec) in got.items():
        # the query's own vector is rank 1 in BOTH searches -> floor
        assert 1 <= n <= 10
        assert rec == n / 10.0
    # the planted clusters make recall a real signal (VERDICT r9 #5):
    # at 16 bits (m=4, k=16) mean recall@10 must clear 0.5 — on the
    # old i.i.d. fixture it sat at the 0.1 self-hit floor
    mean_recall = sum(rec for _, rec in got.values()) / len(got)
    assert mean_recall > 0.5, got


def test_ann_recall_discriminates_pq_configs(spark):
    """Recall@10 must move with the PQ budget — the quality dial a
    user tuning a config actually reads.  8 bits (m=2) vs 16 bits
    (m=4) over the same planted-cluster corpus."""
    from flink_skyline_qos_spark.operators.kmeans import pq_adc_topk
    from flink_skyline_qos_spark.operators.similarity import cosine_topk
    from flink_skyline_qos_spark.sources.generators import (
        generate_embeddings_hash,
    )

    emb = generate_embeddings_hash(spark, 2000, dim=64, k_centers=200,
                                   jitter=0.5)
    qs = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = cosine_topk(emb, qs, k=10).select("query_id", "vec_id")

    def recall(m: int) -> float:
        adc = pq_adc_topk(emb, qs, dim=64, m=m, k=16, iterations=2,
                          dp=4, topk=10).select("query_id", "vec_id")
        hits = exact.join(adc, on=["query_id", "vec_id"]).count()
        return hits / 50.0

    r16, r8 = recall(4), recall(2)
    assert r16 > 0.5, (r16, r8)
    assert r16 > r8, (r16, r8)


def test_pq_sql_builders_validate_args():
    from flink_skyline_qos_spark.operators.kmeans import (
        pq_adc_topk_sql,
        pq_encode_sql,
    )

    with pytest.raises(ValueError):
        pq_encode_sql("t", dim=64, m=5)  # m does not divide dim
    with pytest.raises(ValueError):
        pq_adc_topk_sql("t", "q", dim=64, m=4, topk=0)


def test_pq_adc_rerank_improves_recall(spark, embeddings, sf_dir):
    """The two-stage pattern's whole point: re-ranked recall@10 must
    dominate the single-stage ADC recall@10 (the shortlist contains
    the ADC top-10 by construction, and the exact re-rank can only
    promote true neighbors into the final 10)."""
    from flink_skyline_qos_spark.operators.kmeans import (
        pq_adc_rerank,
        pq_adc_topk,
    )
    from flink_skyline_qos_spark.operators.similarity import cosine_topk

    qs = embeddings.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding")
    exact = {(r.query_id, r.vec_id) for r in
             cosine_topk(embeddings, qs, k=10).collect()}

    def recall(df):
        hits = {(r.query_id, r.vec_id) for r in df.collect()} & exact
        return len(hits) / len(exact)

    adc = pq_adc_topk(embeddings, qs, dim=64, m=4, k=16, iterations=2,
                      dp=4, topk=10)
    rer = pq_adc_rerank(embeddings, qs, dim=64, m=4, k=16,
                        iterations=2, dp=4, shortlist=50, topk=10)
    r_adc, r_rer = recall(adc), recall(rer)
    assert r_rer >= r_adc
    assert r_rer > 0.3  # 5x shortlist recovers a solid share at 16 bits


def test_pq_adc_rerank_validates_shortlist(spark, embeddings):
    from flink_skyline_qos_spark.operators.kmeans import (
        pq_adc_rerank,
        pq_adc_rerank_sql,
    )

    with pytest.raises(ValueError):
        pq_adc_rerank(embeddings, embeddings, dim=64, shortlist=5,
                      topk=10)
    with pytest.raises(ValueError):
        pq_adc_rerank_sql("t", "q", dim=64, shortlist=1, topk=10)


def test_curation_capstone_invariants(spark, sf_dir):
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    capstone = q["curation_capstone_embeddings"](spark, sf_dir)
    dedup = q["embedding_dedup_corpus"](spark, sf_dir)
    rows = capstone.collect()
    canon = {r.vec_id for r in dedup.collect()}
    # every sampled row is a canonical (deduped) vector
    assert {r.vec_id for r in rows} <= canon
    # the sample is a strict, non-empty, multi-cluster subset
    assert 0 < len(rows) < len(canon)
    assert len({r.cluster for r in rows}) > 1
