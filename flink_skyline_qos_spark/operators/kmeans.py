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

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .caching import release_on_gc

__all__ = ["kmeans_assign", "kmeans_assign_sql",
           "kmeans_balanced_sample", "kmeans_balanced_sample_sql",
           "pq_encode", "pq_encode_sql",
           "pq_adc_topk", "pq_adc_topk_sql",
           "pq_adc_rerank", "pq_adc_rerank_sql"]


def _bigint_array_sql(vals: "Sequence[int]") -> str:
    return "array(" + ",".join(f"{int(v)}L" for v in vals) + ")"


def _bigint_array_lit(vals: "Sequence[int]") -> Column:
    """BIGINT array literal via ONE SQL parse.  ``F.lit(list)`` routes
    every element through its own py4j call (~0.35 s per 256-element
    nested literal, ×8 literals per Lloyd's round — it dominated the
    whole pq/capstone family); the parser builds the same folded
    literal in ~1 ms."""
    return F.expr(_bigint_array_sql(vals))


def _bigint_matrix_lit(rows: "Sequence[Sequence[int]]") -> Column:
    return F.expr(
        "array(" + ",".join(_bigint_array_sql(r) for r in rows) + ")")


def _quantize(vec_col: str, dp: int) -> Column:
    scale = float(10 ** dp)
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * F.lit(scale)).cast("long"),
    )


def _best(centroids: list[list[int]], qv: Column | str = "__qv") -> Column:
    """(dist, cluster) of the nearest centroid: ties go to the smallest
    cluster id (lexicographic struct order).

    The whole codebook is ONE 2-D array literal probed by an indexed
    `transform` — constant expression size in k and d.  The naive form
    (k per-centroid distance expressions over d per-element literals)
    made Catalyst analysis + codegen dominate wall time: ~20 s for
    2000 rows at k=16, d=64 before this shape."""
    cb = _bigint_matrix_lit(centroids)
    return F.array_min(F.transform(cb, lambda c, i: F.struct(
        F.aggregate(F.zip_with(qv, c, lambda x, cc: (x - cc) * (x - cc)),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x).alias("d"),
        i.cast("long").alias("c"))))


def _assign(pts: DataFrame, centroids: list[list[int]]) -> DataFrame:
    return pts.withColumn("__best", _best(centroids)) \
        .withColumn("cluster", F.col("__best.c")) \
        .withColumn("sq_dist_q", F.col("__best.d")) \
        .drop("__best")


def _train_subspaces(base: DataFrame, id_col: str, sub: int, m: int,
                     k: int, iterations: int) -> list[list[list[int]]]:
    """Train m independent per-subspace codebooks over a (id, __qv0)
    frame (full quantized vectors, subspace s = slice [s·sub, (s+1)·sub))
    in ONE Spark job per Lloyd's round: all m assignments are literal-
    codebook Column expressions in the same pass and the m update sums
    share one map-side-combined (subspace, cluster, pos) aggregate —
    driver round-trips are 1 + iterations regardless of m (the per-
    subspace-loop form paid m·(1+iterations) job latencies).  Returns
    the codebooks — the operators' only driver state, O(m·k·sub)."""
    seed_rows = base.select(
        F.md5(F.col(id_col).cast("string")).alias("__h"), id_col, "__qv0"
    ).orderBy("__h", id_col).limit(k).collect()
    if not seed_rows:
        return [[] for _ in range(m)]
    codebooks = [
        [list(r["__qv0"])[s * sub:(s + 1) * sub] for r in seed_rows]
        for s in range(m)
    ]
    for _ in range(iterations):
        ex = base
        for s in range(m):
            ex = ex.withColumn(
                f"__c{s}",
                _best(codebooks[s],
                      F.slice("__qv0", s * sub + 1, sub)).getField("c"))
        agg = (ex.select(F.explode(F.array(*[
                   F.struct(F.lit(s).alias("s"),
                            F.col(f"__c{s}").alias("cl"),
                            F.slice("__qv0", s * sub + 1, sub).alias("sv"))
                   for s in range(m)])).alias("__e"))
               .select(F.col("__e.s").alias("__s2"),
                       F.col("__e.cl").alias("__cl"),
                       F.posexplode("__e.sv").alias("__pos", "__val"))
               .groupBy("__s2", "__cl", "__pos")
               .agg(F.sum("__val").alias("__sum"),
                    F.count(F.lit(1)).alias("__n"))
               .collect())
        sums: dict[tuple[int, int], list[int]] = {}
        counts: dict[tuple[int, int], int] = {}
        for r in agg:
            key = (r["__s2"], r["__cl"])
            sums.setdefault(key, [0] * sub)[r["__pos"]] = r["__sum"]
            counts[key] = r["__n"]
        codebooks = [
            [
                # Python // is floor division — matches the SQL twin's
                # non-negative-remainder form exactly, signs and all.
                [v // counts[(s, j)] for v in sums[(s, j)]]
                if (s, j) in sums else c
                for j, c in enumerate(cb)
            ]
            for s, cb in enumerate(codebooks)
        ]
    return codebooks


def _train(pts: DataFrame, id_col: str, dim: int, k: int,
           iterations: int) -> list[list[int]]:
    """Seed (k smallest (md5(id), id) rows) + `iterations` exact Lloyd's
    updates over a (id, __qv) frame; returns the centroid codebook —
    the single-space (m=1) case of :func:`_train_subspaces`."""
    return _train_subspaces(
        pts.withColumnRenamed("__qv", "__qv0"), id_col, dim, 1, k,
        iterations)[0]


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

    centroids = _train(pts, id_col, dim, k, iterations)
    if not centroids:
        return release_on_gc(
            _assign(pts, [[0] * dim]).filter(F.lit(False))
            .select(id_col, "cluster", "sq_dist_q"), pts)

    out = _assign(pts, centroids).select(id_col, "cluster", "sq_dist_q")
    return release_on_gc(out, pts)


def _kmeans_ctes(table_sql: str, *, vec_col: str, id_col: str, dim: int,
                 k: int, iterations: int, dp: int,
                 prefix: str = "__") -> "tuple[list[str], str, str]":
    """The chained-CTE body shared by every kmeans SQL twin.  Returns
    ``(cte_parts, final_assign_name, final_centroid_name)`` — the
    assign CTE has (id, qv, cluster, sq_dist_q), the centroid CTE
    (cluster, qv).  `prefix` namespaces the CTEs so several codebooks
    can live in ONE WITH clause (the PQ/ADC twins)."""
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
    p = prefix
    parts = [
        f"{p}pts AS (SELECT {id_col} AS id, [{', '.join(q)}] AS qv "
        f"FROM ({table_sql}) WHERE {vec_col} IS NOT NULL "
        f"AND len({vec_col}) = {dim} AND NOT ({nan}))",
        f"{p}c0 AS (SELECT (row_number() OVER (ORDER BY "
        f"md5(CAST(id AS VARCHAR)), id)) - 1 AS cluster, qv FROM {p}pts "
        f"ORDER BY md5(CAST(id AS VARCHAR)), id LIMIT {k})",
    ]
    for t in range(iterations + 1):
        parts.append(
            f"{p}d{t} AS (SELECT p.id, p.qv, c.cluster, "
            f"CAST({dist} AS BIGINT) AS sq_dist_q "
            f"FROM {p}pts p CROSS JOIN {p}c{t} c)")
        parts.append(
            f"{p}a{t} AS (SELECT id, qv, cluster, sq_dist_q FROM ("
            f"SELECT *, row_number() OVER (PARTITION BY id "
            f"ORDER BY sq_dist_q, cluster) AS rn FROM {p}d{t}) WHERE rn = 1)")
        if t == iterations:
            break
        parts.append(
            f"{p}u{t} AS (SELECT cluster, [{', '.join(mean)}] AS cv "
            f"FROM {p}a{t} GROUP BY cluster)")
        parts.append(
            f"{p}c{t + 1} AS (SELECT c.cluster, COALESCE(u.cv, c.qv) AS qv "
            f"FROM {p}c{t} c LEFT JOIN {p}u{t} u USING (cluster))")
    return parts, f"{p}a{iterations}", f"{p}c{iterations}"


def kmeans_assign_sql(table_sql: str, *, vec_col: str = "embedding",
                      id_col: str = "vec_id", dim: int, k: int = 8,
                      iterations: int = 3, dp: int = 4) -> str:
    """DuckDB twin of :func:`kmeans_assign` — chained CTEs, one
    assign+update pair per iteration, all arithmetic exact integers.
    Dimensions are unrolled explicitly (no lambda dialect dependence);
    1-based DuckDB list indexing."""
    parts, a_final, _ = _kmeans_ctes(
        table_sql, vec_col=vec_col, id_col=id_col, dim=dim, k=k,
        iterations=iterations, dp=dp)
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT id AS {id_col}, cluster, sq_dist_q "
              f"FROM {a_final}")


def _complete_filter(vec_col: str, dim: int) -> Column:
    v = F.col(vec_col)
    return v.isNotNull() & (F.size(v) == dim) \
        & ~F.exists(v, lambda x: x.isNull() | F.isnan(x.cast("double")))


def pq_encode(df: DataFrame, *, vec_col: str = "embedding",
              id_col: str = "vec_id", dim: int, m: int = 4, k: int = 16,
              iterations: int = 2, dp: int = 4) -> DataFrame:
    """Product quantization (Jégou et al. 2011): split each vector into
    `m` contiguous subspaces of dim/m, train an exact-integer k-means
    codebook per subspace, and emit each row's packed code
    ``Σ code_s · k^s`` — ``(id_col, pq_code)``.

    This is the 100 TB ANN compression step: a dim×float32 vector
    becomes one BIGINT (m·log2(k) bits), so a billion-vector index fits
    where raw vectors cannot, and asymmetric-distance search scans codes
    instead of floats.  All arithmetic is the exact integer k-means of
    :func:`kmeans_assign`, so codes are bit-identical across engines and
    partitionings — value-oracle-able, which no float PQ is.

    Scale shape: training runs m independent codebooks (driver state
    O(m·k·dim/m) = O(k·dim)); the ENCODE is one narrow pass — every
    subspace's argmin is a literal-codebook Column expression, no joins,
    no shuffle.  Rows failing the complete-vector filter (NULL vector,
    wrong length, NULL/NaN component) are dropped, as in the SQL twin.
    """
    if dim < 1 or m < 1 or dim % m:
        raise ValueError("need dim >= 1, m >= 1, and m | dim")
    if k < 2 or k ** m > (1 << 62):
        raise ValueError("need 2 <= k with k^m inside BIGINT")
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    sub = dim // m
    base = df.filter(_complete_filter(vec_col, dim)).select(
        F.col(id_col), _quantize(vec_col, dp).alias("__qv0")).persist()

    codebooks = _train_subspaces(base, id_col, sub, m, k, iterations)

    if any(not cb for cb in codebooks):  # empty input
        empty = base.select(
            F.col(id_col), F.lit(0).cast("long").alias("pq_code")
        ).filter(F.lit(False))
        return release_on_gc(empty, base)

    packed = None
    for s_i, cb in enumerate(codebooks):
        code = _best(cb, F.slice("__qv0", s_i * sub + 1, sub)) \
            .getField("c")
        term = code * F.lit(int(k ** s_i)).cast("long")
        packed = term if packed is None else packed + term
    out = base.select(F.col(id_col), packed.alias("pq_code"))
    return release_on_gc(out, base)


def pq_encode_sql(table_sql: str, *, vec_col: str = "embedding",
                  id_col: str = "vec_id", dim: int, m: int = 4,
                  k: int = 16, iterations: int = 2, dp: int = 4) -> str:
    """DuckDB twin of :func:`pq_encode`: one nested
    :func:`kmeans_assign_sql` per subspace over the sliced vector
    (complete-vector filter applied on the FULL vector first, exactly
    as the operator does), joined on id and packed base-k."""
    if dim < 1 or m < 1 or dim % m:
        raise ValueError("need dim >= 1, m >= 1, and m | dim")
    if k < 2 or k ** m > (1 << 62):
        raise ValueError("need 2 <= k with k^m inside BIGINT")
    if iterations < 0:
        raise ValueError("iterations must be >= 0")
    sub = dim // m
    nan = " OR ".join(
        f"{vec_col}[{i}] IS NULL OR isnan(CAST({vec_col}[{i}] AS DOUBLE))"
        for i in range(1, dim + 1))
    complete = (f"SELECT {id_col}, {vec_col} FROM ({table_sql}) "
                f"WHERE {vec_col} IS NOT NULL AND len({vec_col}) = {dim} "
                f"AND NOT ({nan})")
    parts = []
    for s_i in range(m):
        inner = (f"SELECT {id_col}, "
                 f"{vec_col}[{s_i * sub + 1}:{(s_i + 1) * sub}] "
                 f"AS {vec_col} FROM ({complete})")
        ksql = kmeans_assign_sql(inner, vec_col=vec_col, id_col=id_col,
                                 dim=sub, k=k, iterations=iterations,
                                 dp=dp)
        parts.append(f"__pq{s_i} AS (SELECT {id_col} AS id, cluster "
                     f"FROM ({ksql}))")
    joins = " ".join(f"JOIN __pq{s} ON __pq{s}.id = __pq0.id"
                     for s in range(1, m))
    pack = " + ".join(f"{k ** s} * __pq{s}.cluster" for s in range(m))
    return ("WITH " + ",\n".join(parts)
            + f"\nSELECT __pq0.id AS {id_col}, "
              f"CAST({pack} AS BIGINT) AS pq_code FROM __pq0 {joins}")


def pq_adc_topk(corpus: DataFrame, queries: DataFrame, *,
                vec_col: str = "embedding", id_col: str = "vec_id",
                query_id_col: str = "query_id", dim: int, m: int = 4,
                k: int = 16, iterations: int = 2, dp: int = 4,
                topk: int = 10) -> DataFrame:
    """Asymmetric-distance (ADC) top-k search over PQ codes (Jégou et
    al. 2011) — the search half of product quantization: the corpus is
    scanned as m small integer codes per row (never the float vectors),
    and each query's distance to a code is m lookups into its
    per-subspace table of exact integer distances to the k codebook
    entries.

    Scale shape: ONE narrow pass over the corpus — per-subspace code
    columns are literal-codebook Column expressions and each query's
    LUT is a k-entry literal array (`element_at`), so the scan carries
    |queries|·(one BIGINT) per row into the per-query top-k window; no
    joins, no Python.  Queries and codebooks are the bounded driver
    state (O(q·d + k·d)), exactly like `cosine_topk`'s broadcast query
    side.  All integer arithmetic ⇒ bit-identical, value-oracle-able
    ranks (ties broken by id).

    Returns ``(query_id_col, id_col, adc_dist_q, rank)``, rank 1..topk
    per query.  ADC is an APPROXIMATION of the true distance (the
    quantization residual is lost) — the oracle twin models the same
    approximation, so the check is exact even though the search is not.
    """
    from pyspark.sql.window import Window

    if dim < 1 or m < 1 or dim % m:
        raise ValueError("need dim >= 1, m >= 1, and m | dim")
    if k < 2 or topk < 1 or iterations < 0:
        raise ValueError("need k >= 2, topk >= 1, iterations >= 0")
    sub = dim // m
    base = corpus.filter(_complete_filter(vec_col, dim)).select(
        F.col(id_col), _quantize(vec_col, dp).alias("__qv0")).persist()
    codebooks = _train_subspaces(base, id_col, sub, m, k, iterations)
    qrows = queries.filter(_complete_filter(vec_col, dim)).select(
        F.col(query_id_col), _quantize(vec_col, dp).alias("__qv")
    ).collect()

    if not qrows or any(not cb for cb in codebooks):
        empty = (base.join(
            queries.select(query_id_col).limit(0), how="cross")
            .select(query_id_col, id_col,
                    F.lit(0).cast("long").alias("adc_dist_q"),
                    F.lit(0).alias("rank"))
            .filter(F.lit(False)))
        return release_on_gc(empty, base)

    enc = base
    for s, cb in enumerate(codebooks):
        enc = enc.withColumn(
            f"__c{s}",
            _best(cb, F.slice("__qv0", s * sub + 1, sub)).getField("c"))

    structs = []
    for r in qrows:
        qv = list(r["__qv"])
        score = None
        for s, cb in enumerate(codebooks):
            lut = [sum((qv[s * sub + i] - c[i]) ** 2 for i in range(sub))
                   for c in cb]
            term = F.element_at(
                _bigint_array_lit(lut), (F.col(f"__c{s}") + 1).cast("int"))
            score = term if score is None else score + term
        qid = r[query_id_col]
        qid_lit = F.lit(qid).cast("long") if isinstance(qid, int) \
            else F.lit(qid)
        structs.append(F.struct(qid_lit.alias("qid"), score.alias("s")))

    scored = enc.select(
        F.col(id_col), F.explode(F.array(*structs)).alias("__q")
    ).select(F.col("__q.qid").alias(query_id_col), id_col,
             F.col("__q.s").alias("adc_dist_q"))
    w = Window.partitionBy(query_id_col).orderBy("adc_dist_q", id_col)
    out = scored.withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= topk)
    return release_on_gc(out, base)


def pq_adc_topk_sql(corpus_sql: str, queries_sql: str, *,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    query_id_col: str = "query_id", dim: int, m: int = 4,
                    k: int = 16, iterations: int = 2, dp: int = 4,
                    topk: int = 10) -> str:
    """DuckDB twin of :func:`pq_adc_topk`: m prefixed codebook CTE
    chains in one WITH, codes joined on id, LUT lookups expressed as
    joins to the final centroid CTEs, identical integer arithmetic."""
    if dim < 1 or m < 1 or dim % m:
        raise ValueError("need dim >= 1, m >= 1, and m | dim")
    if k < 2 or topk < 1 or iterations < 0:
        raise ValueError("need k >= 2, topk >= 1, iterations >= 0")
    sub = dim // m
    scale = 10 ** dp
    nan = " OR ".join(
        f"{vec_col}[{i}] IS NULL OR isnan(CAST({vec_col}[{i}] AS DOUBLE))"
        for i in range(1, dim + 1))
    complete_corpus = (
        f"SELECT {id_col}, {vec_col} FROM ({corpus_sql}) "
        f"WHERE {vec_col} IS NOT NULL AND len({vec_col}) = {dim} "
        f"AND NOT ({nan})")
    parts: list[str] = []
    a_names, c_names = [], []
    for s in range(m):
        inner = (f"SELECT {id_col}, "
                 f"{vec_col}[{s * sub + 1}:{(s + 1) * sub}] AS {vec_col} "
                 f"FROM ({complete_corpus})")
        ps, a_n, c_n = _kmeans_ctes(
            inner, vec_col=vec_col, id_col=id_col, dim=sub, k=k,
            iterations=iterations, dp=dp, prefix=f"__sp{s}_")
        parts += ps
        a_names.append(a_n)
        c_names.append(c_n)
    qq = [f"CAST(floor(CAST({vec_col}[{i}] AS DOUBLE) * {scale}) AS BIGINT)"
          for i in range(1, dim + 1)]
    parts.append(
        f"__q AS (SELECT {query_id_col}, [{', '.join(qq)}] AS qv "
        f"FROM ({queries_sql}) WHERE {vec_col} IS NOT NULL "
        f"AND len({vec_col}) = {dim} AND NOT ({nan}))")
    contribs = []
    for s in range(m):
        contribs.append(" + ".join(
            f"(q.qv[{s * sub + i}] - c{s}.qv[{i}]) "
            f"* (q.qv[{s * sub + i}] - c{s}.qv[{i}])"
            for i in range(1, sub + 1)))
    total = " + ".join(f"({c})" for c in contribs)
    code_joins = " ".join(
        f"JOIN {a_names[s]} a{s} ON a{s}.id = a0.id"
        for s in range(1, m))
    lut_joins = " ".join(
        f"JOIN {c_names[s]} c{s} ON c{s}.cluster = a{s}.cluster"
        for s in range(m))
    return ("WITH " + ",\n".join(parts) + f"""
SELECT {query_id_col}, {id_col}, adc_dist_q, rank FROM (
  SELECT q.{query_id_col}, a0.id AS {id_col},
         CAST({total} AS BIGINT) AS adc_dist_q,
         row_number() OVER (PARTITION BY q.{query_id_col}
                            ORDER BY CAST({total} AS BIGINT), a0.id)
           AS rank
  FROM {a_names[0]} a0 {code_joins} CROSS JOIN __q q {lut_joins}
) WHERE rank <= {topk}""")


def kmeans_balanced_sample(df: DataFrame, *, vec_col: str = "embedding",
                           id_col: str = "vec_id", dim: int, k: int = 8,
                           iterations: int = 3, dp: int = 4,
                           target: int = 50, seed: int = 42) -> DataFrame:
    """Cluster-balanced sampling: k-means the embedding space, then
    keep each row with probability ``min(1, target/|cluster|)`` — ≈
    `target` EXPECTED rows per cluster (binomial, not exact), the
    diversity-preserving curation sample (big boilerplate-heavy
    clusters are downweighted, small topical ones kept whole).

    Fully in-plan: the per-cluster thresholds come from a k-row
    aggregate broadcast-joined back (no driver state beyond the
    codebook), and the keep decision is the content-stable md5 bucket
    of :mod:`.sampling` — reproducible across engines, reruns and
    partitionings, like every sampler here.  Returns ``(id_col,
    cluster)``.
    """
    from .sampling import _BUCKETS, hash_bucket

    if target < 1:
        raise ValueError("target must be >= 1")
    asg = kmeans_assign(df, vec_col=vec_col, id_col=id_col, dim=dim,
                        k=k, iterations=iterations, dp=dp).persist()
    thr = F.floor(
        F.least(F.lit(1.0),
                F.lit(float(target)) / F.col("__n").cast("double"))
        * F.lit(float(_BUCKETS))).cast("long")
    sizes = asg.groupBy("cluster").agg(F.count(F.lit(1)).alias("__n")) \
        .select("cluster", thr.alias("__thr"))
    out = (asg.join(F.broadcast(sizes), on="cluster")
           .filter(hash_bucket([id_col], seed) < F.col("__thr"))
           .select(id_col, "cluster"))
    return release_on_gc(out, asg)


def kmeans_balanced_sample_sql(table_sql: str, *,
                               vec_col: str = "embedding",
                               id_col: str = "vec_id", dim: int,
                               k: int = 8, iterations: int = 3,
                               dp: int = 4, target: int = 50,
                               seed: int = 42) -> str:
    """DuckDB twin of :func:`kmeans_balanced_sample` (bit-identical
    rows: assignments, counts, thresholds and md5 buckets are all
    engine-portable)."""
    from .sampling import _BUCKETS, _bucket_sql

    ksql = kmeans_assign_sql(table_sql, vec_col=vec_col, id_col=id_col,
                             dim=dim, k=k, iterations=iterations, dp=dp)
    b = _bucket_sql([f"a.{id_col}"], seed)
    return f"""
WITH __asg AS ({ksql}),
__sz AS (SELECT cluster, count(*) AS n FROM __asg GROUP BY cluster)
SELECT a.{id_col}, a.cluster
FROM __asg a JOIN __sz s USING (cluster)
WHERE {b} < CAST(floor(LEAST(1.0, {float(target)!r} /
      CAST(s.n AS DOUBLE)) * {float(_BUCKETS)!r}) AS BIGINT)
""".strip()


def pq_adc_rerank(corpus: DataFrame, queries: DataFrame, *,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  query_id_col: str = "query_id", dim: int, m: int = 4,
                  k: int = 16, iterations: int = 2, dp: int = 4,
                  shortlist: int = 50, topk: int = 10) -> DataFrame:
    """Two-stage ANN search — the production PQ pattern: the cheap ADC
    scan produces a `shortlist` per query (codes only, never floats),
    then ONLY those shortlist rows fetch their true vectors for an
    exact cosine re-rank to `topk`.  Recall is set by the shortlist
    depth; the expensive exact math touches queries×shortlist rows
    instead of the corpus.

    Returns ``(query_id_col, id_col, cos_sim, rank)`` like
    `cosine_topk` (cos_sim rounded to 6 dp — the repo's cross-engine
    float convention), so re-ranked quality can be compared
    directly against the exact and single-stage ADC forms.
    """
    from pyspark.sql.window import Window

    from .similarity import cosine_similarity

    if shortlist < topk:
        raise ValueError("shortlist must be >= topk")
    short = pq_adc_topk(
        corpus, queries, vec_col=vec_col, id_col=id_col,
        query_id_col=query_id_col, dim=dim, m=m, k=k,
        iterations=iterations, dp=dp, topk=shortlist
    ).select(query_id_col, id_col)
    dbl = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    cvec = corpus.select(F.col(id_col), dbl.alias("__cv"))
    qvec = queries.select(F.col(query_id_col), dbl.alias("__qv2"))
    joined = (short.join(cvec, on=id_col)
              .join(F.broadcast(qvec), on=query_id_col))
    cos = F.round(cosine_similarity(F.col("__qv2"), F.col("__cv")), 6)
    w = Window.partitionBy(query_id_col) \
        .orderBy(F.desc("cos_sim"), F.col(id_col))
    return (joined.select(query_id_col, id_col, cos.alias("cos_sim"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= topk))


def pq_adc_rerank_sql(corpus_sql: str, queries_sql: str, *,
                      vec_col: str = "embedding",
                      id_col: str = "vec_id",
                      query_id_col: str = "query_id", dim: int,
                      m: int = 4, k: int = 16, iterations: int = 2,
                      dp: int = 4, shortlist: int = 50,
                      topk: int = 10) -> str:
    """DuckDB twin of :func:`pq_adc_rerank` — the ADC twin at
    `shortlist` wrapped by the exact-cosine re-rank (list_dot_product
    arithmetic identical to the ann_topk oracle)."""
    if shortlist < topk:
        raise ValueError("shortlist must be >= topk")
    adc = pq_adc_topk_sql(
        corpus_sql, queries_sql, vec_col=vec_col, id_col=id_col,
        query_id_col=query_id_col, dim=dim, m=m, k=k,
        iterations=iterations, dp=dp, topk=shortlist)
    cos = ("list_dot_product(q.__qv2, c.__cv) / "
           "(sqrt(list_dot_product(q.__qv2, q.__qv2)) * "
           "sqrt(list_dot_product(c.__cv, c.__cv)))")
    return f"""
WITH __short AS ({adc}),
__cv AS (SELECT {id_col},
                CAST({vec_col} AS DOUBLE[]) AS __cv
         FROM ({corpus_sql})),
__qv AS (SELECT {query_id_col},
                CAST({vec_col} AS DOUBLE[]) AS __qv2
         FROM ({queries_sql})),
__scored AS (
  SELECT s.{query_id_col}, s.{id_col},
         round({cos}, 6) AS cos_sim
  FROM __short s
  JOIN __cv c ON c.{id_col} = s.{id_col}
  JOIN __qv q ON q.{query_id_col} = s.{query_id_col}
)
SELECT {query_id_col}, {id_col}, cos_sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY {query_id_col}
                               ORDER BY cos_sim DESC, {id_col}) AS rank
  FROM __scored
) WHERE rank <= {topk}
""".strip()
