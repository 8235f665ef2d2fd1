"""Deduplication operators for large-scale training-data pipelines.

All hot paths are JVM-side Column expressions (shingling via
`transform(sequence(...))`, hashing via `xxhash64`, min-hashing via
`array_min`/`transform`) — no Python in the row path except the
SimHash bit-fold, which is a vectorized pandas UDF over Arrow batches.

Scale notes (100 TB):
* exact dedup — hash-groupBy on a 128-bit digest; one shuffle on the
  digest, AQE handles skew (identical boilerplate docs are the skew case).
* MinHash LSH — per-doc signature is narrow (scan-only); the only wide
  op is the band-bucket self-join, whose fan-out is bounded by bucket
  size; near-duplicate clusters are the skew risk → cap bucket size
  with a count filter before the join.
* candidate verification — exact Jaccard only on LSH candidates, never
  all-pairs.
"""

from __future__ import annotations

from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "exact_dedup",
    "char_shingles",
    "word_shingles",
    "minhash_signature",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "simhash_near_dup_pairs",
]

# 31-bit Mersenne prime: with h,a,b < 2³¹, a·h+b < 2⁶³ — no 64-bit overflow
# inside the JVM expression (xxhash64 output is first reduced with pmod).
_MERSENNE = (1 << 31) - 1


def _scale_out(df: DataFrame, probe: DataFrame | None = None) -> DataFrame:
    """Ensure at least default-parallelism partitions before heavy
    per-row compute.

    A small parquet table arrives as one split and would serialize the
    shingling/hashing stage on a single core; at 100 TB inputs already
    carry thousands of splits and this is a no-op.  `probe` lets the
    partition count be read off a simpler upstream plan (``.rdd`` plan
    conversion on a heavy projection is not free).
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if (probe if probe is not None else df).rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def exact_dedup(df: DataFrame, text_col: str = "text", *,
                id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per exact text value.

    md5 digest + groupBy — portable to the SQL oracle verbatim.
    """
    return (
        df.withColumn("__digest", F.md5(F.col(text_col)))
        .groupBy("__digest")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("dup_count"))
        .drop("__digest")
    )


def char_shingles(text: Column, k: int = 5, *, distinct: bool = True) -> Column:
    """Array of k-character shingles (JVM-side, no UDF).

    `distinct=False` skips the dedup pass — correct wherever the
    consumer is idempotent over duplicates (MinHash signatures).
    """
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1))),
        lambda i: text.substr(i, F.lit(k)),
    )
    return F.array_distinct(sh) if distinct else sh


def word_shingles(text: Column, k: int = 3, *, distinct: bool = True) -> Column:
    """Array of k-word shingles from whitespace tokenization."""
    toks = F.split(F.trim(text), r"\s+")
    n = F.size(toks)
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(n - k, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)),
    )
    return F.array_distinct(sh) if distinct else sh


def _hash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    rs = np.random.RandomState(seed)
    # a odd/non-zero, b arbitrary, both < p
    a = rs.randint(1, _MERSENNE, size=num_hashes, dtype=np.int64) | 1
    b = rs.randint(0, _MERSENNE, size=num_hashes, dtype=np.int64)
    return list(zip(a.tolist(), b.tolist()))


def shingle_hashes(shingles: Column) -> Column:
    """Base hash array: `xxhash64` per shingle reduced into [0, 2³¹-1)."""
    return F.transform(shingles, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))


def minhash_signature(base_hashes: Column, num_hashes: int = 64, *,
                      seed: int = 42) -> Column:
    """Array<long> MinHash signature from a base-hash array.

    Single `aggregate` fold over the shingles: each step permutes the
    hash `num_hashes` ways ((a·h + b) mod 2³¹-1) and folds element-wise
    minima — the base array is traversed exactly once regardless of
    signature width (the 64-×-array_min formulation re-evaluates the
    input per permutation; Catalyst's ProjectCollapse would undo any
    two-step projection).
    """
    params = _hash_params(num_hashes, seed)

    def _perms(h: Column) -> Column:
        return F.array(*[
            ((h * F.lit(a) % _MERSENNE) + F.lit(b)) % _MERSENNE
            for a, b in params
        ])

    init = F.array_repeat(F.lit(_MERSENNE).cast("long"), num_hashes)
    return F.aggregate(
        base_hashes, init,
        lambda acc, h: F.zip_with(acc, _perms(h), lambda x, y: F.least(x, y)),
    )


def _minhash_fold_np(num_hashes: int, seed: int):
    """mapInPandas kernel: (id, base-hash array) → (id, signature array).

    All permutations evaluated as one (num_hashes × n) NumPy broadcast
    per row — same arithmetic as :func:`minhash_signature`'s JVM fold
    ((a·h + b) mod p, elementwise min), ~20× faster: the JVM expression
    allocates a 64-long array per shingle, this allocates two matrices
    per row.  Signatures are bit-identical between the two paths.
    """
    params = _hash_params(num_hashes, seed)
    a = np.array([p[0] for p in params], dtype=np.int64)[:, None]
    b = np.array([p[1] for p in params], dtype=np.int64)[:, None]

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            sigs = []
            for hashes in pdf["__h"]:
                if hashes is None or len(hashes) == 0:
                    sigs.append([_MERSENNE] * num_hashes)
                    continue
                h = np.asarray(hashes, dtype=np.int64)[None, :]
                # h < p < 2³¹ and a < p ⇒ a·h < 2⁶² — no int64 overflow
                sigs.append(((a * h + b) % _MERSENNE).min(axis=1).tolist())
            yield pd.DataFrame({"id": pdf["id"], "sig": sigs})

    return fn


def minhash_lsh_pairs(df: DataFrame, *, id_col: str = "doc_id",
                      text_col: str = "text", num_hashes: int = 64,
                      bands: int = 16, shingle_k: int = 5,
                      shingle_unit: str = "char", seed: int = 42,
                      max_bucket: int = 1000,
                      threshold: float | None = None,
                      impl: str = "numpy") -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + banded LSH.

    Returns (id_a, id_b, est_jaccard) with id_a < id_b, deduped across
    bands.  `threshold` filters on the signature-estimated Jaccard.
    `max_bucket` drops degenerate buckets (cap against quadratic blowup
    on boilerplate-heavy corpora).  `impl="numpy"` (default) computes
    signatures in an Arrow-batched kernel; `impl="expr"` keeps the
    all-JVM expression fold (identical signatures, no Python workers).
    """
    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    # distinct=False: min() is idempotent, duplicates cannot change a
    # signature, and the distinct pass over ~10⁶ strings is pure cost.
    sh = (char_shingles(F.col(text_col), shingle_k, distinct=False)
          if shingle_unit == "char"
          else word_shingles(F.col(text_col), shingle_k, distinct=False))
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(_MERSENNE)))
        .alias("__h"),
    )
    # scale-out AFTER the JVM hashing projection: the shuffle then moves
    # compact hash arrays (not raw text) and parallelizes the signature
    # fold + banding on few-split inputs (measured faster than either
    # no-repartition or repartitioning the text itself on local[32]).
    hashed = _scale_out(hashed, probe=df)
    if impl == "numpy":
        sig = hashed.mapInPandas(
            _minhash_fold_np(num_hashes, seed),
            schema="id long, sig array<long>").persist()
    else:
        sig = hashed.select(
            "id",
            minhash_signature(F.col("__h"), num_hashes, seed=seed)
            .alias("sig"),
        ).persist()
    sig.count()  # pin the cache before the banded self-join (see ngram)
    band_cols = [
        F.xxhash64(F.lit(b), *[F.element_at("sig", b * rows_per_band + r + 1)
                               for r in range(rows_per_band)]).alias("bucket")
        for b in range(bands)
    ]
    banded = sig.select(
        "id", "sig",
        F.posexplode(F.array(*[F.struct(F.lit(b).alias("band"), c)
                               for b, c in enumerate(band_cols)]))
        .alias("pos", "bb"),
    ).select("id", "sig", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))
    # cap pathological buckets before the self-join
    sizes = banded.groupBy("band", "bucket").agg(F.count("*").alias("n"))
    banded = banded.join(
        F.broadcast(sizes.filter(F.col("n") <= max_bucket).drop("n")),
        ["band", "bucket"],
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.bucket") == F.col("b.bucket"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    est = F.aggregate(
        F.zip_with("sig_a", "sig_b",
                   lambda x, y: F.when(x == y, 1).otherwise(0)),
        F.lit(0), lambda acc, v: acc + v,
    ) / F.lit(float(num_hashes))
    out = pairs.select("id_a", "id_b", est.alias("est_jaccard"))
    if threshold is not None:
        out = out.filter(F.col("est_jaccard") >= threshold)
    return out


def ngram_jaccard_pairs(df: DataFrame, *, id_col: str = "doc_id",
                        text_col: str = "text", k: int = 3,
                        unit: str = "word",
                        threshold: float = 0.5) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs above `threshold`.

    Inverted-index style: explode distinct shingles, self-join on
    shingle, count intersections, derive |A∪B| = |A|+|B|−|A∩B|.  This is
    the exact verifier for LSH candidates; on its own it is quadratic in
    per-shingle document frequency — use after blocking at scale.
    """
    sh = (char_shingles(F.col(text_col), k) if unit == "char"
          else word_shingles(F.col(text_col), k))
    ex = _scale_out(df).select(F.col(id_col).alias("id"), sh.alias("sh"))
    # join on a 64-bit gram hash, not the gram text: narrows the shuffle
    # (8 B vs whole strings) and makes the equi-join key fixed-width.
    # Collision risk merges two grams — P ≈ n²/2⁶⁵, immaterial next to
    # the shingle-level noise this estimator already carries.
    # persist: the self-join + sizes would otherwise re-shingle the
    # corpus three times.
    flat = ex.select("id", F.explode("sh").alias("g")) \
        .select("id", F.xxhash64("g").alias("g")).persist()
    # eager materialization: a persisted frame referenced on BOTH sides
    # of a self-join inside one action races its own cache population —
    # both sides recompute whenever the write loses the race (observed
    # 5× run-to-run swings).  One tiny count job pins the cache first.
    flat.count()
    # |shingle set| per doc, off the persisted index (shingles are
    # already distinct, so the count of exploded rows IS the set size)
    sizes = flat.groupBy("id").agg(F.count("*").alias("n_sh"))
    # grams present in a single document can never produce a pair: drop
    # them from BOTH join sides (sizes above still count them, so |A∪B|
    # stays exact).  On web-scale corpora the df=1 tail is the bulk of
    # the index, so this semi-join prunes most of the self-join shuffle.
    # Regular (not broadcast) semi-join: `shared` scales with the corpus,
    # and it co-partitions on `g` with the self-join that follows; AQE
    # still downgrades to broadcast when it is actually small.
    shared = (flat.groupBy("g").agg(F.count("*").alias("__df"))
              .filter(F.col("__df") > 1).drop("__df"))
    joinable = flat.join(shared, "g", "left_semi")
    inter = (
        joinable.alias("a")
        .join(joinable.alias("b"),
              (F.col("a.g") == F.col("b.g")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_inter"))
    )
    size_a = sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a")
    size_b = sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b")
    out = (
        inter.join(F.broadcast(size_a), "id_a")
        .join(F.broadcast(size_b), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("n_inter")
             / (F.col("n_a") + F.col("n_b") - F.col("n_inter")).cast("double")
             ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return out


def _simhash_fold(num_bits: int = 64):
    """pandas-UDF kernel: fold per-token 64-bit hashes into a SimHash."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(num_bits, dtype=np.uint64)
        for pdf in batches:
            out = np.zeros(len(pdf), dtype=np.uint64)
            for row_i, hashes in enumerate(pdf["token_hashes"]):
                if hashes is None or len(hashes) == 0:
                    continue
                h = np.asarray(hashes, dtype=np.int64)[:, None].view(np.uint64)
                bits = (h >> shifts[None, :]) & np.uint64(1)
                votes = 2 * bits.astype(np.int32) - 1
                sim_bits = (votes.sum(axis=0) > 0).astype(np.uint64)
                out[row_i] = (sim_bits << shifts).sum(dtype=np.uint64)
            yield pd.DataFrame({"id": pdf["id"],
                                "simhash": out.view(np.int64)})

    return fn


def simhash(df: DataFrame, *, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(id, simhash long): 64-bit SimHash over whitespace tokens.

    Token hashing stays JVM-side (`xxhash64` per token); only the 64-way
    bit-majority fold runs in NumPy over Arrow batches.
    """
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda t: t != "")
    hashed = df.select(
        F.col(id_col).alias("id"),
        F.transform(toks, lambda t: F.xxhash64(t)).alias("token_hashes"),
    )
    return hashed.mapInPandas(_simhash_fold(), schema="id long, simhash long")


def simhash_near_dup_pairs(df: DataFrame, *, id_col: str = "doc_id",
                           text_col: str = "text",
                           max_hamming: int = 3) -> DataFrame:
    """Pairs whose SimHashes differ in ≤ `max_hamming` bits.

    Blocked on 16-bit quarters (pigeonhole: ≤3 differing bits ⇒ at least
    one of 4 quarters identical) so the join is equi- not cross-.
    """
    sh = simhash(df, id_col=id_col, text_col=text_col)
    quarters = sh.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(q).alias("q"),
                     F.shiftrightunsigned("simhash", 16 * q)
                     .bitwiseAND(F.lit(0xFFFF)).alias("key"))
            for q in range(4)
        ])).alias("blk"),
    ).select("id", "simhash", "blk.q", "blk.key")
    a, b = quarters.alias("a"), quarters.alias("b")
    cand = (
        a.join(b, (F.col("a.q") == F.col("b.q"))
               & (F.col("a.key") == F.col("b.key"))
               & (F.col("a.id") < F.col("b.id")))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("h_a"), F.col("b.simhash").alias("h_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
    return cand.select("id_a", "id_b", hamming.alias("hamming")) \
        .filter(F.col("hamming") <= max_hamming)
