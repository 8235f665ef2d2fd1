"""Generator suite (S5): distribution golden properties.

The reference's de-facto golden numbers (PDF §5.1, 200k points in
[0,10000]²): anti-correlated ⇒ thousands of skyline points on the
anti-diagonal; correlated ⇒ skyline collapses to near-duplicates of the
minimum; uniform ⇒ a handful near the origin.  Our deterministic
hash-seeded generators must reproduce those *shapes* (exact counts
differ — different RNG — but the ordering and orders of magnitude hold).
"""

from pyspark.sql import functions as F

from flink_skyline_qos_spark.operators.skyline import skyline
from flink_skyline_qos_spark.sources.generators import (
    generate_points,
    generate_points_hash,
)

N = 20_000


def _sky_size(spark, dist):
    df = generate_points_hash(spark, N, 2, dist=dist)
    return skyline(df, ["d0", "d1"]).count()


def test_distribution_skyline_shapes(spark):
    anti = _sky_size(spark, "anti_correlated")
    uni = _sky_size(spark, "uniform")
    corr = _sky_size(spark, "correlated")
    # anti-correlated: a large fraction survives (reference: 2961/200k)
    assert anti > 1000
    # uniform 2-D: E[skyline] ~ H_n ≈ ln(20000) ≈ 10
    assert uni < 60
    # correlated ρ=0.9: skyline crushed vs anti-correlated
    assert corr < anti / 10
    assert anti < N  # sanity: not everything survives


def test_hash_generator_in_domain_and_deterministic(spark):
    df = generate_points_hash(spark, 1000, 3, dist="uniform",
                              d_min=100.0, d_max=200.0)
    agg = df.agg(
        F.min("d0"), F.max("d0"), F.min("d2"), F.max("d2"),
        F.count("*")).first()
    assert agg[4] == 1000
    assert 100.0 <= agg[0] and agg[1] <= 200.0
    assert 100.0 <= agg[2] and agg[3] <= 200.0
    # pure function of id → repartitioning doesn't change values
    a = sorted(df.collect())
    b = sorted(generate_points_hash(spark, 1000, 3, dist="uniform",
                                    d_min=100.0, d_max=200.0,
                                    num_partitions=3).collect())
    assert a == b


def test_rand_generator_seeded_stable(spark):
    """The rand(seed) variant is reproducible for a fixed partitioning."""
    a = sorted(generate_points(spark, 5000, 2, dist="anti_correlated",
                               seed=7).collect())
    b = sorted(generate_points(spark, 5000, 2, dist="anti_correlated",
                               seed=7).collect())
    assert a == b
    row_sums = [r["d0"] + r["d1"] for r in a]
    mean = sum(row_sums) / len(row_sums)
    # constant-row-sum construction: tight concentration around dims·mid
    assert abs(mean - 10000.0) < 300.0
