"""Similarity search over embedding columns (array<float>).

* :func:`cosine_topk` — exact brute-force top-k: broadcast the (small)
  query set against the corpus, dot product via `F.aggregate`/`zip_with`
  (JVM-side), rank with a window partitioned by query.  The baseline and
  the oracle-checkable path.
* :func:`cosine_topk_ivf` — IVF scale path: k-means coarse centroids
  (driver-side NumPy on a sample), each vector assigned to its nearest
  centroid (literal-folded JVM expression for tiny codebooks, broadcast
  matrix + Arrow-batched pandas argmin beyond that); queries probe only
  the `nprobe` nearest cells, so the join is equi on cell id instead of
  a full cross product.
* :func:`embedding_near_dup_pairs` — all corpus pairs with cosine ≥ τ,
  blocked to keep the join bounded.

At 100 TB the corpus side stays partitioned and scanned once; queries
are broadcast (small dim table) — no shuffle of the corpus.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "cosine_similarity",
    "cosine_topk",
    "cosine_topk_gemm",
    "cosine_topk_ivf",
    "embedding_near_dup_lsh",
    "embedding_near_dup_lsh_sql",
    "embedding_near_dup_lsh_cross",
    "embedding_near_dup_lsh_cross_sql",
    "embedding_near_dup_pairs",
    "embedding_signatures",
    "knn_graph",
    "knn_graph_sql",
    "rrf_fuse",
    "rrf_fuse_sql",
]


def _dot(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def _norm(a: Column | str) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v,
    ))


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Column expr: cosine similarity of two double-array columns."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _pin_if_unpinned(df: DataFrame) -> "tuple[DataFrame, bool]":
    """Persist `df` only when the caller has not: returns (frame,
    owned) where `owned` means THIS operator created the pin and must
    release it.  An already-persisted input belongs to the caller —
    persisting again is a no-op and unpersisting would silently drop
    the cache the caller is still reusing (review r9)."""
    lvl = df.storageLevel
    if lvl.useMemory or lvl.useDisk or lvl.useOffHeap:
        return df, False
    return df.persist(), True


def _as_double(df: DataFrame, vec_col: str) -> DataFrame:
    # float32 parquet arrays → double for stable arithmetic
    return df.withColumn(
        vec_col, F.transform(F.col(vec_col), lambda x: x.cast("double"))
    )


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 10, *,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, vec_id, cos_sim, rank), rank 1..k, deterministic
    tie-break on neighbor id.
    """
    c = _as_double(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv")
    )
    q = _as_double(queries, vec_col).select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv")
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id", "vec_id", cosine_similarity("__cv", "__qv").alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def rrf_fuse(*rankings: DataFrame, k0: int = 60, k: int = 10,
             query_id_col: str = "query_id",
             id_col: str = "doc_id") -> DataFrame:
    """Reciprocal Rank Fusion over any number of (query_id, id, rank)
    ranking frames — the standard hybrid-retrieval combiner (Cormack,
    Clarke & Büttcher 2009): fused score = Σ_r 1/(k0 + rank_r), summed
    over the rankings that returned the item.  Fuses the sparse BM25
    list with the dense ANN list (or any mix) without score
    calibration — only ranks matter.

    Engine-exact integer arithmetic: each contribution is the BIGINT
    ``floor(1e9 / (k0 + rank))`` and the fused score their exact sum
    (1/(k0+r) is not representable in binary OR finite decimal, so a
    float sum would be engine-order-dependent; the integer grid is the
    same move as the exact-integer PageRank).  Output (query_id, id,
    rrf_score, rank), rank 1..k under (rrf_score DESC, id ASC).

    Scale shape: inputs are already top-k-per-query lists (tiny —
    |queries|·k rows each), so the union + sum + window is a few
    hundred rows per query regardless of corpus size.
    """
    if not rankings:
        raise ValueError("need at least one ranking frame")
    # `div` is Spark SQL's integer division (`/` would go through a
    # double and round); DuckDB's `//` is the same operation
    w_expr = F.expr(f"cast(1000000000 div ({int(k0)} + rank) as long)")
    parts = [
        r.select(F.col(query_id_col), F.col(id_col).alias("__id"),
                 w_expr.alias("__w"))
        for r in rankings
    ]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    fused = allr.groupBy(query_id_col, "__id").agg(
        F.sum("__w").alias("rrf_score"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("rrf_score"), F.asc("__id"))
    return (fused.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(query_id_col, F.col("__id").alias(id_col),
                    "rrf_score", "rank"))


def rrf_fuse_sql(*ranking_sqls: str, k0: int = 60, k: int = 10,
                 query_id_col: str = "query_id",
                 id_col: str = "doc_id") -> str:
    """DuckDB twin of :func:`rrf_fuse` (identical integer grid)."""
    if not ranking_sqls:
        raise ValueError("need at least one ranking SQL")
    unions = "\nUNION ALL\n".join(
        f"SELECT {query_id_col}, {id_col} AS id, "
        f"(1000000000 // ({int(k0)} + rank))::BIGINT AS w FROM ({r})"
        for r in ranking_sqls)
    return f"""
WITH allr AS (
{unions}
),
fused AS (
  SELECT {query_id_col}, id, sum(w)::BIGINT AS rrf_score
  FROM allr GROUP BY 1, 2
)
SELECT {query_id_col}, id AS {id_col}, rrf_score,
       row_number() OVER (
         PARTITION BY {query_id_col}
         ORDER BY rrf_score DESC, id ASC
       )::INTEGER AS rank
FROM fused
QUALIFY rank <= {k}
""".strip()


def cosine_topk_gemm(corpus: DataFrame, queries: DataFrame, k: int = 10, *,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact top-k cosine neighbors — the 100 TB path.

    Same semantics as :func:`cosine_topk`, different physics: the query
    set (small by contract — it is broadcast either way) is collected
    ONCE into an L2-normalized float64 matrix and broadcast; the corpus
    is scanned in Arrow batches and scored with one GEMM per batch
    (vectorized, ~100× the throughput of the interpreted higher-order
    `aggregate`/`zip_with` expression); each batch emits only its own
    top-k per query, so the final exact rank runs over
    O(batches × queries × k) rows, never the n_corpus × n_queries score
    matrix.  Partial top-k is prefix-closed under the (−sim, id) order,
    so the two-level selection is exact, ties and all.

    Ids must be integral (cast to long in the output schema).
    """
    q_pdf = queries.select(query_id_col, vec_col).toPandas()
    spark = corpus.sparkSession
    if q_pdf.empty:
        return spark.createDataFrame(
            [], "query_id long, vec_id long, cos_sim double, rank int")
    qids = q_pdf[query_id_col].to_numpy(dtype=np.int64)
    qm = np.asarray(
        [np.asarray(v, dtype=np.float64) for v in q_pdf[vec_col]])
    qn = np.linalg.norm(qm, axis=1, keepdims=True)
    qm = qm / np.where(qn == 0.0, 1.0, qn)
    bc = corpus.sparkSession.sparkContext.broadcast((qids, qm))

    def score(batches):
        ids_q, qmat = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            v = np.asarray(
                [np.asarray(x, dtype=np.float64) for x in pdf[vec_col]])
            n = np.linalg.norm(v, axis=1, keepdims=True)
            sims = (v / np.where(n == 0.0, 1.0, n)) @ qmat.T  # (n, m)
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            kk = min(k, len(ids))
            out_q, out_i, out_s = [], [], []
            for j in range(len(ids_q)):
                s = sims[:, j]
                if len(s) > kk:
                    # argpartition alone breaks similarity ties arbitrarily
                    # — with >kk rows tied at the kk-th similarity (exact
                    # duplicate embeddings) it can drop the smallest-id
                    # tied neighbor the final (−sim, id) rank would keep.
                    # Select under the full order: partition for speed,
                    # then lexsort only the rows at-or-above the kk-th
                    # similarity (ties included) and cut to kk.
                    part = np.argpartition(-s, kk - 1)[:kk]
                    tied = np.flatnonzero(s >= s[part].min())
                    part = tied[np.lexsort((ids[tied], -s[tied]))[:kk]]
                else:
                    part = np.arange(len(s))
                out_q.append(np.full(len(part), ids_q[j]))
                out_i.append(ids[part])
                out_s.append(s[part])
            yield pd.DataFrame({
                "query_id": np.concatenate(out_q),
                "vec_id": np.concatenate(out_i),
                "cos_sim": np.concatenate(out_s),
            })

    from .partitioners import scale_out

    # scale out the raw (id, vec) BEFORE the GEMM pass: a few-split
    # corpus otherwise serializes the per-batch matmul on one task
    # (round-8 finding; no-op at real split counts)
    partial = scale_out(corpus.select(id_col, vec_col),
                        probe=corpus).mapInPandas(
        score, schema="query_id long, vec_id long, cos_sim double")
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("vec_id"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _sq_dists(pts: np.ndarray, centroids: np.ndarray) -> np.ndarray:
    """(n, k) squared distances via the expansion ||p||² − 2p·c + ||c||².

    Never materializes the (n, k, dim) broadcast tensor — at production
    IVF sizes (10k sample × 4096 cells × 768 dims) the naive form is
    ~250 GB; this is an (n, k) matrix plus two GEMV-sized vectors.
    """
    d = (
        (pts * pts).sum(1)[:, None]
        - 2.0 * (pts @ centroids.T)
        + (centroids * centroids).sum(1)[None, :]
    )
    np.maximum(d, 0.0, out=d)  # clamp fp-negative zeros
    return d


def _kmeans(sample: np.ndarray, n_cells: int, iters: int = 10,
            seed: int = 42) -> np.ndarray:
    rs = np.random.RandomState(seed)
    centroids = sample[rs.choice(len(sample), size=n_cells, replace=False)]
    for _ in range(iters):
        assign = _sq_dists(sample, centroids).argmin(1)
        for c in range(n_cells):
            pts = sample[assign == c]
            if len(pts):
                centroids[c] = pts.mean(0)
    return centroids


def _nearest_cells_expr(vec_col: str, centroids: np.ndarray,
                        n: int = 1) -> Column:
    """Array of the `n` nearest centroid ids, as a literal-folded expression."""
    dists = []
    for ci, c in enumerate(centroids):
        # ONE parsed literal per centroid — per-element F.lit costs a
        # py4j round-trip each (~0.35 s per 1024 terms); the `D` suffix
        # keeps every element a DOUBLE literal (repr round-trips)
        arr = F.expr(
            "array(" + ",".join(f"{float(x)!r}D" for x in c) + ")")
        d = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                arr,
                lambda x, y: (x - y) * (x - y),
            ),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        dists.append(F.struct(d.alias("d"), F.lit(ci).alias("cell")))
    # distance ties break on cell id EXPLICITLY (not via sort stability)
    # — guaranteed parity with the pandas path's lexsort.
    ordered = F.array_sort(
        F.array(*dists),
        lambda a, b: F.when(a["d"] < b["d"], -1)
                      .when(a["d"] > b["d"], 1)
                      .when(a["cell"] < b["cell"], -1)
                      .when(a["cell"] > b["cell"], 1)
                      .otherwise(0),
    )
    return F.transform(F.slice(ordered, 1, n), lambda s: s["cell"])


# Above this many `F.lit` terms (n_cells × dim), the literal-folded cell
# expression stops being a win: Catalyst analysis + codegen cost grows
# with expression size and eventually blows the 64 KB JIT method limit.
# Past it we broadcast the centroid matrix and assign cells in an
# Arrow-batched pandas UDF instead (VERDICT r1 "What's wrong" #5).
_MAX_LITERAL_TERMS = 2048


def _with_nearest_cells(df: DataFrame, vec_col: str, centroids: np.ndarray,
                        n: int, out_col: str) -> DataFrame:
    """Attach `out_col` = array of the `n` nearest centroid ids.

    Small codebooks stay all-JVM (literal-folded expression, zero
    Python); larger ones broadcast the (n_cells, dim) float64 matrix
    once per executor and compute the argmin per Arrow batch — O(batch
    × n_cells) GEMM work, no driver round-trip, no literal blowup.
    Ties broken by cell id in both paths.
    """
    n = min(n, len(centroids))
    if centroids.size <= _MAX_LITERAL_TERMS:
        return df.withColumn(
            out_col, _nearest_cells_expr(vec_col, centroids, n))

    bc = df.sparkSession.sparkContext.broadcast(
        np.ascontiguousarray(centroids, dtype=np.float64))

    @F.pandas_udf("array<int>")
    def nearest(vs: pd.Series) -> pd.Series:
        cents = bc.value
        if vs.empty:
            return pd.Series([], dtype=object)
        pts = np.asarray([np.asarray(x, dtype=np.float64) for x in vs])
        d = _sq_dists(pts, cents)
        part = np.argpartition(d, n - 1, axis=1)[:, :n]
        out = []
        for i in range(len(pts)):
            cells = part[i]
            # exact order among the n survivors: distance, then cell id
            cells = cells[np.lexsort((cells, d[i, cells]))]
            out.append([int(c) for c in cells])
        return pd.Series(out)

    return df.withColumn(out_col, nearest(F.col(vec_col)))


def cosine_topk_ivf(corpus: DataFrame, queries: DataFrame, k: int = 10, *,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    query_id_col: str = "query_id", n_cells: int = 16,
                    nprobe: int = 4, sample_size: int = 10_000,
                    seed: int = 42) -> DataFrame:
    """Approximate top-k: IVF coarse quantizer + per-cell exact rerank.

    Recall < 1.0 by design; verified against :func:`cosine_topk` in tests.
    """
    c = _as_double(corpus, vec_col)
    sample = np.array(
        [r[0] for r in c.select(vec_col)
         .limit(sample_size).collect()],
        dtype=np.float64,
    )
    n_cells = min(n_cells, len(sample))
    centroids = _kmeans(sample, n_cells, seed=seed)
    cd = _with_nearest_cells(c, vec_col, centroids, 1, "__cells").select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("__cv"),
        F.element_at("__cells", 1).alias("cell"),
    )
    q = _with_nearest_cells(
        _as_double(queries, vec_col), vec_col, centroids, nprobe, "__cells",
    ).select(
        F.col(query_id_col).alias("query_id"), F.col(vec_col).alias("__qv"),
        F.explode("__cells").alias("cell"),
    )
    scored = cd.join(F.broadcast(q), "cell").select(
        "query_id", "vec_id", cosine_similarity("__cv", "__qv").alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_signatures(df: DataFrame, *, dim: int | None = None,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding",
                         n_planes: int = 32, bands: int = 8,
                         seed: int = 42) -> DataFrame:
    """Hyperplane-LSH band signatures: ``(id, vec_col, b0..b{bands-1})``.

    The persistent-store form of :func:`embedding_near_dup_lsh`'s
    signature pass (identical arithmetic: sign bits of seeded Gaussian
    projections, packed per band little-endian): at 100 TB the admitted
    corpus's signatures are computed ONCE at admission and every later
    batch bands this compact table instead of re-projecting the
    vectors — the embedding analogue of
    :func:`~.dedup.minhash_signatures`.  Carries the vector itself
    (the exact-cosine verify needs both sides' vectors).
    """
    assert n_planes % bands == 0
    rows_per_band = n_planes // bands
    if dim is None:
        first = df.select(vec_col).first()
        if first is None:
            raise ValueError("cannot infer dim from an empty frame")
        dim = len(first[0])
    planes = np.random.RandomState(seed).standard_normal((dim, n_planes))
    bc = df.sparkSession.sparkContext.broadcast(planes)

    def signs(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            v = np.asarray([np.asarray(x, dtype=np.float64)
                            for x in pdf[vec_col]])
            bits = (v @ bc.value) >= 0  # (n, n_planes)
            weights = 1 << np.arange(rows_per_band, dtype=np.int64)
            out = {"id": pdf[id_col], vec_col: pdf[vec_col]}
            for band in range(bands):
                chunk = bits[:, band * rows_per_band:(band + 1) * rows_per_band]
                out[f"b{band}"] = chunk.astype(np.int64) @ weights
            yield pd.DataFrame(out)

    sig_schema = (f"id long, {vec_col} array<float>, "
                  + ", ".join(f"b{i} long" for i in range(bands)))
    # raw vectors scaled out BEFORE the Arrow projection pass (the
    # few-split trap — see minhash_signatures)
    from .partitioners import scale_out

    return scale_out(df.select(F.col(id_col), F.col(vec_col)), probe=df) \
        .mapInPandas(signs, schema=sig_schema)


def embedding_near_dup_lsh(df: DataFrame, threshold: float = 0.9, *,
                           id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           n_planes: int = 32, bands: int = 8,
                           seed: int = 42,
                           max_bucket: int = 2000,
                           signatures: DataFrame | None = None
                           ) -> DataFrame:
    """Near-duplicate pairs WITHOUT a blocking column — the 100 TB path.

    Random-hyperplane (SimHash-for-cosine) LSH: sign bits of `n_planes`
    fixed Gaussian projections, banded into `bands` equi-join keys
    (pigeonhole on sign agreement); exact cosine computed only on bucket
    cohabitants.  Recall is probabilistic (P[same bit] = 1 − θ/π per
    plane), tunable via n_planes/bands; candidates are verified exactly,
    so precision is 1.  `max_bucket` caps degenerate buckets; the cap is
    observable via the lazy companion ``result.lsh_dropped`` (one row:
    dropped_buckets / dropped_rows / dropped_pairs — VERDICT r3 #3).

    `signatures` supplies a precomputed :func:`embedding_signatures`
    frame for `df` (the admission loop bands each batch ONCE and reuses
    the frame for the self-check, the cross-check, and the store write)
    — the signature pass and the dim probe are then skipped entirely.
    Cache ownership follows who pinned the frame: an ALREADY-persisted
    `signatures` belongs to the caller (used as-is, never unpersisted
    here — the caller reuses it after the pairs result dies); an
    unpersisted one is pinned here and released with the result.
    """
    assert n_planes % bands == 0
    if signatures is not None:
        sig, sig_owned = _pin_if_unpinned(signatures)
    else:
        first = df.select(vec_col).first()
        if first is None:  # empty corpus: no pairs, empty drop stats
            spark = df.sparkSession
            out = spark.createDataFrame(
                [], "id_a long, id_b long, cos_sim double")
            out.lsh_dropped = spark.createDataFrame(
                [(0, 0, 0)],
                "dropped_buckets long, dropped_rows long, dropped_pairs long")
            return out
        sig = embedding_signatures(
            df, dim=len(first[0]), id_col=id_col, vec_col=vec_col,
            n_planes=n_planes, bands=bands, seed=seed).persist()
        sig_owned = True
    banded = sig.select(
        "id", vec_col,
        F.posexplode(F.array(*[F.col(f"b{i}") for i in range(bands)]))
        .alias("band", "bucket"))
    sizes = banded.groupBy("band", "bucket").agg(F.count("*").alias("n"))
    from .dedup import _dropped_bucket_stats

    dropped = _dropped_bucket_stats(sizes, max_bucket)
    banded = banded.join(
        F.broadcast(sizes.filter(F.col("n") <= max_bucket).drop("n")),
        ["band", "bucket"])
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col(f"a.{vec_col}").alias("va"),
                F.col(f"b.{vec_col}").alias("vb"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = F.transform("va", lambda x: x.cast("double"))
    vb = F.transform("vb", lambda x: x.cast("double"))
    from .caching import release_on_gc

    out = cand.select(
        "id_a", "id_b", cosine_similarity(va, vb).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)
    if sig_owned:
        out = release_on_gc(out, sig)
    out.lsh_dropped = dropped
    return out


def embedding_near_dup_lsh_sql(table_sql: str, dim: int,
                               threshold: float = 0.9, *,
                               id_col: str = "vec_id",
                               vec_col: str = "embedding",
                               n_planes: int = 32, bands: int = 8,
                               seed: int = 42,
                               max_bucket: int = 2000) -> str:
    """DuckDB twin of :func:`embedding_near_dup_lsh`.

    The Gaussian plane matrix is regenerated from the same seeded
    RandomState and embedded as DOUBLE[] literals; sign bits, band
    packing, the bucket-size cap, and the exact cosine verify are
    reproduced relationally.  Sign parity between numpy's pairwise-
    summed GEMM and DuckDB's sequential dot product would only diverge
    for a projection within ~1 ulp of zero — vanishing for real
    embeddings (same class of fp risk the exact-cosine oracles accept).
    """
    assert n_planes % bands == 0
    rpb = n_planes // bands
    planes = np.random.RandomState(seed).standard_normal((dim, n_planes))
    rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(
            j, ", ".join(repr(float(planes[i, j])) for i in range(dim)))
        for j in range(n_planes)
    )
    cos = ("list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v))"
           " * sqrt(list_dot_product(b.v, b.v)))")
    return f"""
WITH e AS (
  SELECT {id_col} AS id, cast({vec_col} AS DOUBLE[]) AS v FROM {table_sql}
),
planes(j, p) AS (
  VALUES
    {rows}
),
bits AS (
  SELECT e.id, p.j,
         CASE WHEN list_dot_product(e.v, p.p) >= 0
              THEN 1::BIGINT ELSE 0::BIGINT END AS bit
  FROM e, planes p
),
buckets AS (
  SELECT id, j // {rpb} AS band,
         sum(bit * (1::BIGINT << (j % {rpb})))::BIGINT AS bucket
  FROM bits GROUP BY id, j // {rpb}
),
ok AS (
  SELECT band, bucket FROM buckets GROUP BY band, bucket
  HAVING count(*) <= {max_bucket}
),
okb AS (SELECT buckets.* FROM buckets JOIN ok USING (band, bucket)),
cand AS (
  SELECT DISTINCT x.id AS id_a, y.id AS id_b
  FROM okb x JOIN okb y
    ON x.band = y.band AND x.bucket = y.bucket AND x.id < y.id
)
SELECT c.id_a, c.id_b, round({cos}, 6) AS cos_sim
FROM cand c
JOIN e a ON a.id = c.id_a
JOIN e b ON b.id = c.id_b
WHERE {cos} >= {threshold!r}
""".strip()


def embedding_near_dup_lsh_cross(new_df: DataFrame = None,
                                 old_df: DataFrame = None, *,
                                 threshold: float = 0.9,
                                 id_col: str = "vec_id",
                                 vec_col: str = "embedding",
                                 n_planes: int = 32, bands: int = 8,
                                 seed: int = 42, max_bucket: int = 2000,
                                 old_signatures: DataFrame | None = None,
                                 new_signatures: DataFrame | None = None
                                 ) -> DataFrame:
    """Cross-corpus embedding near-dup pairs: ``(new_id, old_id,
    cos_sim)`` between a new batch and the standing admitted corpus —
    the SemDeDup-at-ingest admission check (the embedding analogue of
    :func:`~.dedup.minhash_lsh_pairs_cross`).

    old×old pairs are never generated (the standing corpus is already
    deduped); new×new is a separate (much smaller) self-join.  At
    100 TB the old side arrives as the precomputed signature store
    (``old_signatures``, schema of :func:`embedding_signatures`) — each
    batch bands the compact store instead of re-projecting admitted
    vectors.  The bucket cap applies to the COMBINED (new+old) band
    population, observable via ``result.lsh_dropped``.
    """
    assert n_planes % bands == 0
    if old_df is None and old_signatures is None:
        raise ValueError("need old_df or old_signatures")
    if new_df is None and new_signatures is None:
        raise ValueError("need new_df or new_signatures")

    def side(df: "DataFrame | None", pre_sig: "DataFrame | None"):
        """(sig, banded, owned) — owned follows :func:`_pin_if_unpinned`
        (a caller-persisted signature store is never unpersisted here);
        None when the side is empty."""
        if pre_sig is not None:
            sig, owned = _pin_if_unpinned(pre_sig)
        else:
            first = df.select(vec_col).first()
            if first is None:
                return None
            sig, owned = embedding_signatures(
                df, dim=len(first[0]), id_col=id_col, vec_col=vec_col,
                n_planes=n_planes, bands=bands, seed=seed).persist(), True
        sig.count()
        banded = sig.select(
            "id", vec_col,
            F.posexplode(F.array(*[F.col(f"b{i}") for i in range(bands)]))
            .alias("band", "bucket"))
        return sig, banded, owned

    spark = (new_df if new_df is not None else new_signatures).sparkSession
    empty = spark.createDataFrame(
        [], "new_id long, old_id long, cos_sim double")
    empty_drop = spark.createDataFrame(
        [(0, 0, 0)],
        "dropped_buckets long, dropped_rows long, dropped_pairs long")
    new_side = side(new_df, new_signatures)
    old_side = side(old_df, old_signatures)
    if new_side is None or old_side is None:
        # release any pin the NON-empty side already took (review r9:
        # the early return otherwise strands a persisted signature
        # frame in the plan-keyed cache for the session)
        for s in (new_side, old_side):
            if s is not None and s[2]:
                s[0].unpersist(False)
        empty.lsh_dropped = empty_drop
        return empty
    new_sig, new_banded, new_owned = new_side
    old_sig, old_banded, old_owned = old_side
    sizes = (new_banded.select("band", "bucket")
             .unionByName(old_banded.select("band", "bucket"))
             .groupBy("band", "bucket").agg(F.count("*").alias("n")))
    from .dedup import _dropped_bucket_stats

    dropped = _dropped_bucket_stats(sizes, max_bucket)
    ok = F.broadcast(sizes.filter(F.col("n") <= max_bucket).drop("n"))
    a = new_banded.join(ok, ["band", "bucket"]).alias("a")
    b = old_banded.join(ok, ["band", "bucket"]).alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket")))
        .select(F.col("a.id").alias("new_id"), F.col("b.id").alias("old_id"),
                F.col(f"a.{vec_col}").alias("va"),
                F.col(f"b.{vec_col}").alias("vb"))
        .dropDuplicates(["new_id", "old_id"])
    )
    va = F.transform("va", lambda x: x.cast("double"))
    vb = F.transform("vb", lambda x: x.cast("double"))
    from .caching import release_on_gc

    out = cand.select(
        "new_id", "old_id", cosine_similarity(va, vb).alias("cos_sim")
    ).filter(F.col("cos_sim") >= threshold)
    owned = [s for s, o in ((new_sig, new_owned), (old_sig, old_owned)) if o]
    if owned:
        out = release_on_gc(out, *owned)
    out.lsh_dropped = dropped
    return out


def embedding_near_dup_lsh_cross_sql(new_sql: str, old_sql: str, dim: int,
                                     threshold: float = 0.9, *,
                                     id_col: str = "vec_id",
                                     vec_col: str = "embedding",
                                     n_planes: int = 32, bands: int = 8,
                                     seed: int = 42,
                                     max_bucket: int = 2000) -> str:
    """DuckDB twin of :func:`embedding_near_dup_lsh_cross`: the
    self-join twin's CTE chain instantiated once per side, combined
    (new+old) bucket cap, cross-side candidate join (no id ordering —
    the sides are disjoint corpora)."""
    assert n_planes % bands == 0
    rpb = n_planes // bands
    planes = np.random.RandomState(seed).standard_normal((dim, n_planes))
    rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(
            j, ", ".join(repr(float(planes[i, j])) for i in range(dim)))
        for j in range(n_planes)
    )

    def chain(p: str, src: str) -> str:
        return f"""{p}e AS (
  SELECT {id_col} AS id, cast({vec_col} AS DOUBLE[]) AS v FROM {src}
),
{p}bits AS (
  SELECT e.id, p.j,
         CASE WHEN list_dot_product(e.v, p.p) >= 0
              THEN 1::BIGINT ELSE 0::BIGINT END AS bit
  FROM {p}e e, planes p
),
{p}buckets AS (
  SELECT id, j // {rpb} AS band,
         sum(bit * (1::BIGINT << (j % {rpb})))::BIGINT AS bucket
  FROM {p}bits GROUP BY id, j // {rpb}
)"""

    cos = ("list_dot_product(a.v, b.v) / (sqrt(list_dot_product(a.v, a.v))"
           " * sqrt(list_dot_product(b.v, b.v)))")
    return f"""
WITH planes(j, p) AS (
  VALUES
    {rows}
),
{chain("n_", new_sql)},
{chain("o_", old_sql)},
ok AS (
  SELECT band, bucket FROM (
    SELECT band, bucket FROM n_buckets
    UNION ALL SELECT band, bucket FROM o_buckets
  ) GROUP BY band, bucket HAVING count(*) <= {max_bucket}
),
n_okb AS (SELECT n_buckets.* FROM n_buckets JOIN ok USING (band, bucket)),
o_okb AS (SELECT o_buckets.* FROM o_buckets JOIN ok USING (band, bucket)),
cand AS (
  SELECT DISTINCT x.id AS new_id, y.id AS old_id
  FROM n_okb x JOIN o_okb y
    ON x.band = y.band AND x.bucket = y.bucket
)
SELECT c.new_id, c.old_id, round({cos}, 6) AS cos_sim
FROM cand c
JOIN n_e a ON a.id = c.new_id
JOIN o_e b ON b.id = c.old_id
WHERE {cos} >= {threshold!r}
""".strip()


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.95, *,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             block_col: str | None = None) -> DataFrame:
    """Corpus pairs (id_a < id_b) with cosine similarity ≥ threshold.

    `block_col` restricts comparisons to equal blocking keys (equi-join);
    without it this is an all-pairs cross product — small corpora only.
    """
    d = _as_double(df, vec_col).select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    a, b = d.alias("a"), d.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    return (
        a.join(b, cond)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                cosine_similarity(F.col("a.v"), F.col("b.v")).alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def knn_graph(vectors: DataFrame, k: int = 5, *,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """Exact k-nearest-neighbor graph over a vector set: for every
    vector, its `k` most cosine-similar OTHER vectors — the adjacency
    list that seeds graph-based dedup, semantic clustering, and
    diversity-aware curation (SemDeDup/DBSCAN-style passes all start
    from exactly this edge set).

    Physics: the GEMM top-k kernel (:func:`cosine_topk_gemm`) with the
    whole set as the query side, fetching k+1 and dropping self-edges.
    A duplicate vector with a smaller id can legitimately outrank the
    self-pair, so self is NOT assumed to be rank 1 — the final rank is
    recomputed over the ≤ k+1 surviving rows per node (a bounded
    window, never the n² score matrix).  The final rank ties on the
    9-dp-ROUNDED similarity (ADVICE r7) so sub-epsilon arithmetic
    differences between engines can't reorder the rank-k boundary;
    the per-batch GEMM pre-selection still cuts on raw similarity —
    a divergence there additionally needs the 9-dp near-tie to
    straddle a batch-internal top-(k+1) cut, a strictly smaller
    probability event than the rank flake this guards against.

    Scale: exact all-pairs kNN is O(n²·d) GEMM work — right for
    bounded vector sets (≤ a few hundred thousand rows: the broadcast
    query matrix is n·d float64).  For corpus-scale n the LSH-bucketed
    near-dup path (:func:`embedding_near_dup_lsh`) is the same edge
    set restricted to a similarity floor; use it and rank within
    buckets instead.
    """
    qs = vectors.select(F.col(id_col).alias("query_id"), vec_col)
    top = cosine_topk_gemm(vectors, qs, k=k + 1,
                           id_col=id_col, vec_col=vec_col)
    # rank on the 9-dp-rounded similarity: the two engines compute
    # cos_sim with different arithmetic (pre-normalized GEMM here,
    # dot/(|a||b|) in the SQL twin), and near-ties at the rank-k
    # boundary would otherwise order differently across engines
    # (ADVICE r7); 9 dp is far above double noise, far below any
    # meaningful similarity difference
    w = Window.partitionBy("query_id").orderBy(
        F.desc(F.round("cos_sim", 9)), F.asc("vec_id"))
    return (top.filter(F.col("vec_id") != F.col("query_id"))
            .withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select(F.col("query_id").alias("src"),
                    F.col("vec_id").alias("dst"),
                    "cos_sim", "rank"))


def knn_graph_sql(table: str, k: int = 5, *,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding") -> str:
    """DuckDB twin of :func:`knn_graph` (full n² cross join — oracle
    only; 6-dp rounding mirrors the registered query's output)."""
    return f"""
WITH c AS (SELECT {id_col} AS id, cast({vec_col} AS DOUBLE[]) AS v
           FROM {table}),
scored AS (
  SELECT a.id AS src, b.id AS dst,
         list_dot_product(a.v, b.v)
           / (sqrt(list_dot_product(a.v, a.v))
              * sqrt(list_dot_product(b.v, b.v))) AS sim
  FROM c a JOIN c b ON a.id <> b.id
), ranked AS (
  SELECT src, dst, sim,
         row_number() OVER (PARTITION BY src
                            ORDER BY round(sim, 9) DESC, dst) AS rn
  FROM scored
)
SELECT src, dst, round(sim, 6) AS cos_sim, cast(rn AS int) AS rank
FROM ranked WHERE rn <= {k}
""".strip()
