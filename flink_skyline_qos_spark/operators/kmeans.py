"""Distributed k-means over embedding columns, in exact integer math.

Embedding-space clustering is the backbone of cluster-based curation
(SemDeDup-style prune-within-cluster, cluster-balanced sampling, data-mix
auditing).  MLlib's KMeans is float-summed and seed-random — two runs
disagree in the last ulps and no external engine can reproduce it.  Here
every quantity is integral:

* vectors are QUANTIZED (``floor(x · 10^dp)`` as BIGINT) once up front;
* squared L2 distances are exact BIGINT sums of integer squares;
* seeds are the k rows with the smallest ``(md5(id), id)`` — a content
  hash, not an RNG, so the choice is engine-portable;
* the Lloyd's centroid update is an element-wise exact *floor* mean
  (non-negative-remainder division), so centroids stay integer vectors.

Every assignment, distance and centroid is therefore a pure function of
the data — bit-identical across engines, runs and partitionings — which
is what makes the operator value-oracle-able (and regression-diffable in
production: a changed assignment means changed DATA, not changed
scheduling).

Scale shape (the MLlib physics, kept): centroids are O(k·d) and live on
the driver between iterations — the only driver state, same bounded-size
concession as `cosine_topk_ivf`'s training sample.  Each iteration is
ONE pass over the points: assignment is a pure Column expression against
k centroid literal arrays (JVM codegen, no Python, no join), and the
centroid update shuffles only the map-side-combined (cluster, pos) sums
— ≤ partitions × k × d rows, independent of |points|.  The points
projection is pinned once and released when the result frame is dropped.

Reference basis: the reference has no clustering op; this is part of the
brief-mandated training-data suite (SURVEY.md "beyond the reference").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .caching import release_on_gc

__all__ = ["kmeans_assign", "kmeans_assign_sql"]


def _quantize(vec_col: str, dp: int) -> Column:
    scale = float(10 ** dp)
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"),
    )


def _dist_to(centroid: list[int]) -> Column:
    c_lit = F.array(*[F.lit(int(v)).cast("long") for v in centroid])
    return F.aggregate(
        F.zip_with("__qv", c_lit, lambda x, c: (x - c) * (x - c)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign(pts: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """Nearest centroid per row: ties go to the smallest cluster id
    (lexicographic struct order on (dist, cluster))."""
    best = F.array_min(F.array(*[
        F.struct(_dist_to(c).alias("d"),
                 F.lit(j).cast("long").alias("c"))
        for j, c in enumerate(centroids)
    ]))
    return pts.withColumn("__best", best) \
        .withColumn("cluster", F.col("__best.c")) \
        .withColumn("sq_dist_q", F.col("__best.d")) \
        .drop("__best")


def kmeans_assign(df: DataFrame, *, vec_col: str = "embedding",
                  id_col: str = "vec_id", dim: int, k: int = 8,
                  iterations: int = 3, dp: int = 4) -> DataFrame:
    """Lloyd's k-means: returns ``(id_col, cluster, sq_dist_q)`` — the
    final nearest-centroid assignment after `iterations` exact updates,
    with the exact quantized squared L2 distance.

    Rows with a NULL vector, a wrong-length vector, or any NULL/NaN
    component are dropped (complete-vectors, stated identically in the
    SQL twin).
    """
    if k < 1 or iterations < 0 or dim < 1:
        raise ValueError("need k >= 1, iterations >= 0, dim >= 1")
    v = F.col(vec_col)
    ok = v.isNotNull() & (F.size(v) == dim) \
        & ~F.exists(v, lambda x: x.isNull() | F.isnan(x.cast("double")))
    pts = df.filter(ok).select(
        F.col(id_col), _quantize(vec_col, dp).alias("__qv")).persist()

    # Seeds: k smallest (md5(id), id) — TakeOrderedAndProject, O(k·d)
    # to the driver (the operator's only driver state).
    seed_rows = pts.select(
        F.md5(F.col(id_col).cast("string")).alias("__h"), id_col, "__qv"
    ).orderBy("__h", id_col).limit(k).collect()
    centroids = [list(r["__qv"]) for r in seed_rows]
    if not centroids:
        return release_on_gc(
            _assign(pts, [[0] * dim]).filter(F.lit(False))
            .select(id_col, "cluster", "sq_dist_q"), pts)

    for _ in range(iterations):
        agg = (_assign(pts, centroids)
               .select("cluster", F.posexplode("__qv")
                       .alias("__pos", "__val"))
               .groupBy("cluster", "__pos")
               .agg(F.sum("__val").alias("__s"),
                    F.count(F.lit(1)).alias("__n"))
               .collect())
        sums: dict[int, list[int]] = {}
        counts: dict[int, int] = {}
        for r in agg:
            sums.setdefault(r["cluster"], [0] * dim)[r["__pos"]] = r["__s"]
            counts[r["cluster"]] = r["__n"]
        centroids = [
            # Python // is floor division — matches the SQL twin's
            # non-negative-remainder form exactly, signs and all.
            [s // counts[j] for s in sums[j]] if j in sums else c
            for j, c in enumerate(centroids)
        ]

    out = _assign(pts, centroids).select(id_col, "cluster", "sq_dist_q")
    return release_on_gc(out, pts)


def kmeans_assign_sql(table_sql: str, *, vec_col: str = "embedding",
                      id_col: str = "vec_id", dim: int, k: int = 8,
                      iterations: int = 3, dp: int = 4) -> str:
    """DuckDB twin of :func:`kmeans_assign` — chained CTEs, one
    assign+update pair per iteration, all arithmetic exact integers.
    Dimensions are unrolled explicitly (no lambda dialect dependence);
    1-based DuckDB list indexing."""
    scale = 10 ** dp
    q = [f"CAST(floor(CAST({vec_col}[{i}] AS DOUBLE) * {scale}) AS BIGINT)"
         for i in range(1, dim + 1)]
    nan = " OR ".join(
        f"{vec_col}[{i}] IS NULL OR isnan(CAST({vec_col}[{i}] AS DOUBLE))"
        for i in range(1, dim + 1))
    dist = " + ".join(
        f"(p.qv[{i}] - c.qv[{i}]) * (p.qv[{i}] - c.qv[{i}])"
        for i in range(1, dim + 1))
    # exact floor mean: non-negative remainder, then exact division
    mean = [
        f"CAST((sum(qv[{i}]) - ((sum(qv[{i}]) % count(*)) + count(*)) "
        f"% count(*)) // count(*) AS BIGINT)"
        for i in range(1, dim + 1)]
    parts = [
        f"__pts AS (SELECT {id_col} AS id, [{', '.join(q)}] AS qv "
        f"FROM ({table_sql}) WHERE {vec_col} IS NOT NULL "
        f"AND len({vec_col}) = {dim} AND NOT ({nan}))",
        f"__c0 AS (SELECT (row_number() OVER (ORDER BY "
        f"md5(CAST(id AS VARCHAR)), id)) - 1 AS cluster, qv FROM __pts "
        f"ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT {k})",
    ]
    for t in range(iterations + 1):
        parts.append(
            f"__d{t} AS (SELECT p.id, p.qv, c.cluster, "
            f"CAST({dist} AS BIGINT) AS sq_dist_q "
            f"FROM __pts p CROSS JOIN __c{t} c)")
        parts.append(
            f"__a{t} AS (SELECT id, qv, cluster, sq_dist_q FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY id "
            f"ORDER BY sq_dist_q, cluster) AS rn FROM __d{t}) WHERE rn = 1)")
        if t == iterations:
            break
        parts.append(
            f"__u{t} AS (SELECT cluster, [{', '.join(mean)}] AS cv "
            f"FROM __a{t} GROUP BY cluster)")
        parts.append(
            f"__c{t + 1} AS (SELECT c.cluster, COALESCE(u.cv, c.qv) AS qv "
            f"FROM __c{t} c LEFT JOIN __u{t} u USING (cluster))")
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT id AS {id_col}, cluster, sq_dist_q "
              f"FROM __a{iterations}")
