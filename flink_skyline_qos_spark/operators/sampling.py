"""Deterministic sampling and dataset splitting for training pipelines.

A 100 TB corpus is sampled/split by *content-stable hashing*, never by
`rand()`: the decision for a row is a pure function of its key, so it
is reproducible across runs, engines, executors, and re-partitioning,
and rows never migrate between train/val/test when the pipeline is
re-run on a grown corpus.  (The reference has no sampling surface; this
extends the engine for the training-data use cases the brief mandates.)

Everything is a JVM-side Column expression — md5 of the key, first 32
bits as an integer bucket in [0, 2³²) — with a bit-identical SQL twin
(`conv(substr(md5(..)..),16,10)` ≡ DuckDB `('0x'||substr(md5(..)..))::BIGINT`),
so both operators are exactly oracle-checkable.  Filters sit directly
on the scan (predicate pushdown of the md5 expr itself is not possible,
but column pruning is, and the filter is evaluated inside whole-stage
codegen with zero shuffles).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "hash_bucket",
    "budget_mix",
    "budget_mix_sql",
    "group_cap",
    "group_cap_sql",
    "deterministic_sample",
    "deterministic_sample_sql",
    "hash_split",
    "hash_split_sql",
    "stratified_sample",
    "stratified_sample_sql",
    "weighted_sample",
    "weighted_sample_sql",
    "temperature_sample",
    "temperature_sample_sql",
]

_BUCKETS = 1 << 32


def _q(s: str) -> str:
    """SQL string-literal escape: double embedded single quotes (a
    stratum/split name like pt-BR'x would otherwise break or inject
    into the oracle SQL, while the Spark side handles any value)."""
    return str(s).replace("'", "''")


def hash_bucket(key_cols: Sequence[str], seed: int = 42) -> Column:
    """Uniform bucket in [0, 2³²) from md5 of (seed, *key columns)."""
    parts = [F.lit(str(seed))] + [F.col(c).cast("string") for c in key_cols]
    hex8 = F.substring(F.md5(F.concat_ws("|", *parts)), 1, 8)
    return F.conv(hex8, 16, 10).cast("long")


def _bucket_sql(key_cols: Sequence[str], seed: int) -> str:
    parts = ", ".join([f"'{seed}'"] + [f"CAST({c} AS VARCHAR)" for c in key_cols])
    return f"('0x' || substr(md5(concat_ws('|', {parts})), 1, 8))::BIGINT"


def deterministic_sample(df: DataFrame, fraction: float,
                         key_cols: Sequence[str], *,
                         seed: int = 42) -> DataFrame:
    """Content-stable `fraction` sample: row kept iff its hash bucket
    falls below `fraction · 2³²`.  Exact expectation, zero variance
    across reruns, no shuffle."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.filter(hash_bucket(key_cols, seed) < int(fraction * _BUCKETS))


def deterministic_sample_sql(table_sql: str, fraction: float,
                             key_cols: Sequence[str], *,
                             seed: int = 42) -> str:
    """DuckDB twin of :func:`deterministic_sample` (bit-identical rows)."""
    return (f"SELECT * FROM {table_sql} "
            f"WHERE {_bucket_sql(key_cols, seed)} < {int(fraction * _BUCKETS)}")


def _thresholds(weights: Mapping[str, float]) -> list[tuple[str, int]]:
    total = sum(weights.values())
    acc, out = 0.0, []
    for name, w in weights.items():
        acc += w / total
        out.append((name, int(acc * _BUCKETS)))
    # guard against float round-down leaving a sliver unassigned
    out[-1] = (out[-1][0], _BUCKETS)
    return out


def hash_split(df: DataFrame, weights: Mapping[str, float],
               key_cols: Sequence[str], *, seed: int = 42,
               split_col: str = "split") -> DataFrame:
    """Assign every row a split label (e.g. train/val/test) by hash
    bucket against cumulative weight thresholds.  Disjoint, exhaustive,
    content-stable: a document keeps its split across reruns and corpus
    growth, which is what prevents train/test leakage in practice."""
    b = hash_bucket(key_cols, seed)
    expr = None
    for name, hi in _thresholds(weights):
        cond = b < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn(split_col, expr)


def hash_split_sql(table_sql: str, weights: Mapping[str, float],
                   key_cols: Sequence[str], *, seed: int = 42,
                   split_col: str = "split") -> str:
    """DuckDB twin of :func:`hash_split`."""
    b = _bucket_sql(key_cols, seed)
    whens = " ".join(
        f"WHEN {b} < {hi} THEN '{_q(name)}'"
        for name, hi in _thresholds(weights))
    return f"SELECT *, CASE {whens} END AS {split_col} FROM {table_sql}"


def stratified_sample(df: DataFrame, rates: Mapping[str, float],
                      stratum_col: str, key_cols: Sequence[str], *,
                      default_rate: float = 0.0,
                      seed: int = 42) -> DataFrame:
    """Per-stratum content-stable sampling — the training-mix
    rebalancing op (e.g. downsample 'en' to 10 %, keep all 'zh').

    ``rates`` maps stratum values (of ``stratum_col``) to keep
    fractions; strata not listed keep ``default_rate``.  The keep
    decision is the same md5 bucket as :func:`deterministic_sample`,
    so a row's fate is stable across reruns/engines AND across rate
    changes for *other* strata (each row compares its own bucket to
    its own stratum's threshold — re-mixing one language never
    reshuffles another's sample).  Zero shuffle: one scan-side filter.
    """
    for name, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for {name!r} must be in [0, 1]")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError("default_rate must be in [0, 1]")
    thr = F.lit(int(default_rate * _BUCKETS))
    for name, r in rates.items():
        thr = F.when(F.col(stratum_col) == name,
                     F.lit(int(r * _BUCKETS))).otherwise(thr)
    return df.filter(hash_bucket(key_cols, seed) < thr)


def stratified_sample_sql(table_sql: str, rates: Mapping[str, float],
                          stratum_col: str, key_cols: Sequence[str], *,
                          default_rate: float = 0.0,
                          seed: int = 42) -> str:
    """DuckDB twin of :func:`stratified_sample` (bit-identical rows)."""
    b = _bucket_sql(key_cols, seed)
    # Spark builds when/otherwise INSIDE-OUT (later rates wrap earlier
    # ones), but stratum values are distinct so order cannot matter.
    whens = " ".join(
        f"WHEN {stratum_col} = '{_q(name)}' THEN {int(r * _BUCKETS)}"
        for name, r in rates.items())
    thr = f"CASE {whens} ELSE {int(default_rate * _BUCKETS)} END"
    return f"SELECT * FROM {table_sql} WHERE {b} < {thr}"


def weighted_sample(df: DataFrame, rate: float, weight_col: str,
                    key_cols: Sequence[str], *, seed: int = 42) -> DataFrame:
    """Importance sampling: keep a row with probability
    ``min(1, weight · rate)`` — the quality-proportional training-mix
    op (upweight high-quality documents, downweight boilerplate)
    as the same content-stable md5 decision as
    :func:`deterministic_sample`, so the sample is reproducible across
    engines/reruns/partitionings AND across rate changes the row's own
    keep-threshold doesn't cross.  Rows with NULL/NaN weight are
    dropped (stated identically in the SQL twin); negative weights
    clamp to probability 0.  Zero shuffle: one scan-side filter whose
    threshold is a per-row Column expression (one multiply + clamp +
    floor — bit-identical in DuckDB)."""
    if rate < 0.0:
        raise ValueError("rate must be >= 0")
    w = F.col(weight_col).cast("double")
    p = F.least(F.lit(1.0), F.greatest(F.lit(0.0), w * F.lit(float(rate))))
    thr = F.floor(p * F.lit(float(_BUCKETS))).cast("long")
    return df.filter(w.isNotNull() & ~F.isnan(w)
                     & (hash_bucket(key_cols, seed) < thr))


def weighted_sample_sql(table_sql: str, rate: float, weight_expr: str,
                        key_cols: Sequence[str], *, seed: int = 42) -> str:
    """DuckDB twin of :func:`weighted_sample` (bit-identical rows;
    `weight_expr` is the SQL expression for the weight column)."""
    if rate < 0.0:
        raise ValueError("rate must be >= 0")
    w = f"CAST({weight_expr} AS DOUBLE)"
    p = f"LEAST(1.0, GREATEST(0.0, {w} * {float(rate)!r}))"
    thr = f"CAST(floor({p} * {float(_BUCKETS)!r}) AS BIGINT)"
    return (f"SELECT * FROM {table_sql} "
            f"WHERE {w} IS NOT NULL AND NOT isnan({w}) "
            f"AND {_bucket_sql(key_cols, seed)} < {thr}")


def _temp_factor(ratio, temperature: float):
    """(c_max/c_g)^(1-1/T) for T ∈ {1, 2, ∞} — the exponents whose
    float evaluation is IEEE-exact on every engine (identity, sqrt,
    division are correctly rounded; libm pow is NOT, so general T
    would break the bit-exact oracle and is rejected)."""
    if temperature == 1.0:
        return None  # factor 1: plain proportional sampling
    if temperature == 2.0:
        return F.sqrt(ratio)
    if temperature == float("inf"):
        return ratio
    raise ValueError(
        "temperature must be 1, 2, or inf for engine-exact sampling")


def temperature_sample(df: DataFrame, group_cols: Sequence[str],
                       key_cols: Sequence[str], *, base_rate: float,
                       temperature: float = 2.0,
                       seed: int = 42) -> DataFrame:
    """Temperature-scaled mix rebalancing — the standard multilingual
    training-mix op (sampling languages ∝ c^(1/T) flattens the natural
    distribution so low-resource groups aren't drowned; T=2 is the
    classic multilingual-pretraining setting).

    Keep probability for group g with count c_g:
    ``min(1, base_rate · (c_max/c_g)^(1−1/T))`` — `base_rate` is the
    keep rate of the LARGEST group; expected kept rows per group are
    then ∝ c_g^(1/T).  T=1 reduces to uniform `base_rate`, T=∞ to full
    balance (every group ≈ the largest group's kept size).  Max-
    normalization (not sum): the only cross-group statistic is an
    integer max, so there is no order-dependent float summation and
    the per-row decision is bit-identical across engines, reruns and
    partitionings (the md5 bucket of :func:`hash_bucket`).

    Scale shape: one map-side-combined count aggregate (k rows),
    broadcast back; the keep decision is a scan-side filter.
    """
    if base_rate < 0.0:
        raise ValueError("base_rate must be >= 0")
    gcols = list(group_cols)
    counts = df.groupBy(*gcols).agg(F.count(F.lit(1)).alias("__c"))
    cmax = counts.agg(F.max("__c").alias("__cmax"))
    ratio = F.col("__cmax").cast("double") / F.col("__c").cast("double")
    factor = _temp_factor(ratio, temperature)
    p = F.lit(float(base_rate)) if factor is None \
        else F.lit(float(base_rate)) * factor
    thr = F.floor(F.least(F.lit(1.0), p) * F.lit(float(_BUCKETS))) \
        .cast("long")
    gates = counts.crossJoin(F.broadcast(cmax)) \
        .select(*gcols, thr.alias("__thr"))
    return (df.join(F.broadcast(gates), on=gcols)
            .filter(hash_bucket(key_cols, seed) < F.col("__thr"))
            .drop("__thr"))


def temperature_sample_sql(table_sql: str, group_cols: Sequence[str],
                           key_cols: Sequence[str], *, base_rate: float,
                           temperature: float = 2.0,
                           seed: int = 42) -> str:
    """DuckDB twin of :func:`temperature_sample` (bit-identical rows)."""
    if base_rate < 0.0:
        raise ValueError("base_rate must be >= 0")
    g = ", ".join(group_cols)
    ratio = "(CAST(m.__cmax AS DOUBLE) / CAST(c.__c AS DOUBLE))"
    if temperature == 1.0:
        p = f"{float(base_rate)!r}"
    elif temperature == 2.0:
        p = f"{float(base_rate)!r} * sqrt({ratio})"
    elif temperature == float("inf"):
        p = f"{float(base_rate)!r} * {ratio}"
    else:
        raise ValueError(
            "temperature must be 1, 2, or inf for engine-exact sampling")
    thr = f"CAST(floor(LEAST(1.0, {p}) * {float(_BUCKETS)!r}) AS BIGINT)"
    on = " AND ".join(f"t.{c} = __g.{c}" for c in group_cols)
    keys = [f"t.{c}" for c in key_cols]
    return f"""
WITH __c AS (SELECT {g}, count(*) AS __c FROM ({table_sql}) GROUP BY {g}),
__m AS (SELECT max(__c) AS __cmax FROM __c),
__g AS (SELECT {', '.join(f'c.{c}' for c in group_cols)}, {thr} AS __thr
        FROM __c c CROSS JOIN __m m)
SELECT t.* FROM ({table_sql}) t JOIN __g ON {on}
WHERE {_bucket_sql(keys, seed)} < __g.__thr
""".strip()


def group_cap(df: DataFrame, group_cols: Sequence[str], cap: int,
              key_cols: Sequence[str], *, seed: int = 42,
              n_salts: int = 64) -> DataFrame:
    """Frequency cap: keep at most `cap` rows per group, chosen by
    content-stable hash order — the "at most K documents per domain /
    source" pass that stops over-represented hosts from dominating a
    training mix (C4/FineWeb-style URL- and domain-level caps).

    Selection is the `cap` smallest `(hash_bucket, *key_cols)` rows of
    each group: deterministic (a pure function of row content, like
    every sampler here), uniform (md5 buckets), and stable under
    corpus growth — a kept row is only ever evicted by a new row
    hashing below it, never by re-partitioning or row order.

    **`key_cols` must uniquely identify rows within each group**
    (ADVICE r7): the selection order is only a total order under that
    contract — rows agreeing on every key column but differing
    elsewhere would tie at the cap boundary, and which one survives
    would then be engine/partitioning-dependent despite the
    "pure function of row content" claim.  Every registered use passes
    a unique document id; callers without one should extend `key_cols`
    with enough columns to disambiguate.

    Scale shape: the naive plan is one `row_number()` window
    partitioned by group — at 100 TB a single hot domain becomes one
    task sorting billions of rows.  Instead, exact salted two-level
    top-K: level 1 ranks within (group, salt) — `n_salts`
    content-derived sub-partitions bound the per-task sort to
    |group|/n_salts — and keeps `cap` per sub-partition; level 2 ranks
    the ≤ cap·n_salts survivors per group.  Any global top-`cap` row
    is in its salt's top-`cap`, so the composition is exact.  Both
    windows are bounded; no group ever sorts in one task.  (Same
    two-level selection as the reference-free samplers; the reference
    engine has no sampling surface — SURVEY.md §2.6.)
    """
    if cap < 1:
        raise ValueError("cap must be >= 1")
    g = list(group_cols)
    b = hash_bucket(key_cols, seed).alias("__b")
    salted = df.select("*", b).withColumn(
        "__salt", hash_bucket(key_cols, seed + 1) % n_salts)
    order = [F.col("__b"), *[F.col(c) for c in key_cols]]
    w1 = Window.partitionBy(*g, "__salt").orderBy(*order)
    lvl1 = (salted
            .withColumn("__r1", F.row_number().over(w1))
            .filter(F.col("__r1") <= cap))
    w2 = Window.partitionBy(*g).orderBy(*order)
    return (lvl1
            .withColumn("__r2", F.row_number().over(w2))
            .filter(F.col("__r2") <= cap)
            .drop("__b", "__salt", "__r1", "__r2"))


def group_cap_sql(table_sql: str, group_cols: Sequence[str], cap: int,
                  key_cols: Sequence[str], *, seed: int = 42) -> str:
    """DuckDB twin of :func:`group_cap` — the single global window the
    Spark side deliberately avoids (fine for an oracle, wrong at scale)."""
    g = ", ".join(group_cols)
    order = f"{_bucket_sql(key_cols, seed)}, " + ", ".join(key_cols)
    return f"""
SELECT * EXCLUDE (__rn) FROM (
  SELECT *, row_number() OVER (PARTITION BY {g} ORDER BY {order}) AS __rn
  FROM ({table_sql})
) WHERE __rn <= {cap}
""".strip()


def budget_mix(df: DataFrame, group_cols: Sequence[str], budget: int,
               count_col: str, key_cols: Sequence[str], *,
               seed: int = 42) -> DataFrame:
    """Token-budget training mix: downsample each group (language,
    source, …) to ≈ `budget` total `count_col` units — "2B tokens of
    code, 1B of wiki" as one deterministic filter.  Keep probability
    per group is min(1, budget / group_total); rows are selected by
    the same content-stable md5 bucket as every sampler here, so the
    kept set is reproducible and grows monotonically as the budget
    rises.

    Scale shape: one map-side-combined aggregate (|groups| rows),
    thresholds broadcast back, then a scan-side filter — the corpus is
    never sorted or shuffled.  Expected kept mass is exactly the
    budget (hash buckets are uniform); variance is O(√n) like any
    Bernoulli mix.
    """
    if budget <= 0:
        raise ValueError("budget must be > 0")
    g = list(group_cols)
    tot = df.groupBy(*g).agg(F.sum(count_col).alias("__tot"))
    thr = tot.select(
        *g,
        F.floor(F.least(
            F.lit(1.0),
            F.lit(float(budget)) / F.col("__tot").cast("double"),
        ) * F.lit(float(_BUCKETS))).cast("long").alias("__thr"))
    return (df.join(F.broadcast(thr), g)
            .filter(hash_bucket(key_cols, seed) < F.col("__thr"))
            .drop("__thr"))


def budget_mix_sql(table_sql: str, group_cols: Sequence[str], budget: int,
                   count_expr: str, key_cols: Sequence[str], *,
                   seed: int = 42) -> str:
    """DuckDB twin of :func:`budget_mix` (bit-identical rows: IEEE
    double divide + the same floor(min(1, r)·2³²) threshold)."""
    g = ", ".join(group_cols)
    on = " AND ".join(f"t.{c} = __g.{c}" for c in group_cols)
    keys = [f"t.{c}" for c in key_cols]
    thr = (f"CAST(floor(LEAST(1.0, {float(budget)!r} / "
           f"CAST(__tot AS DOUBLE)) * {float(_BUCKETS)!r}) AS BIGINT)")
    return f"""
WITH __g AS (
  SELECT {g}, {thr} AS __thr
  FROM (SELECT {g}, sum({count_expr}) AS __tot
        FROM ({table_sql}) GROUP BY {g})
)
SELECT t.* FROM ({table_sql}) t JOIN __g ON {on}
WHERE {_bucket_sql(keys, seed)} < __g.__thr
""".strip()
