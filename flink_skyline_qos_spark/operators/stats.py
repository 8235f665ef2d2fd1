"""Exact numeric profiling: deterministic pairwise correlation matrix.

`Statistics.corr` / `DataFrame.stat.corr` accumulate double sums whose
value depends on partial-aggregation order — two runs of the same data
can disagree in the last ulps, and two engines certainly do.  Here the
inputs are QUANTIZED (``floor(x·10^dp)`` as integers) and every sum
runs in exact DECIMAL/HUGEINT arithmetic, so the Pearson correlation
of the quantized values is a pure function of the data — bit-identical
across engines, runs, and partitionings — while differing from the
unquantized correlation by O(10^-dp / σ).

Scale shape: ONE map-side-combined aggregate computes every Σx, Σx²,
Σxy for all d·(d+1)/2 pairs in a single scan (the d×d matrix costs one
pass, not d² passes); the final d² arithmetic runs on the one-row
aggregate.  Rows with a NULL in any profiled column are dropped first
(complete-case, stated identically in the SQL twin).
"""

from __future__ import annotations

from itertools import combinations
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["corr_matrix", "corr_matrix_sql",
           "mad_outliers", "mad_outliers_sql",
           "quantile_bins", "quantile_bins_sql"]

_DEC = "decimal(38,0)"


def _q(col, dp: int):
    return F.floor(F.col(col).cast("double") * F.lit(float(10 ** dp))) \
        .cast(_DEC)


def corr_matrix(df: DataFrame, cols: Sequence[str], *,
                dp: int = 6) -> DataFrame:
    """Pearson correlation for every unordered pair of `cols` over the
    10^-dp-quantized values.  Output: ``col_x, col_y, n, corr`` (one
    row per pair, col_x < col_y lexically is NOT imposed — pairs follow
    the input order)."""
    cols = list(cols)
    if len(cols) < 2:
        raise ValueError("need at least two columns")
    ok = None
    for c in cols:
        # complete-case incl. NaN (dropna alone leaves the SQL twin
        # diverging: DuckDB can't cast NaN to HUGEINT)
        t = F.col(c).isNotNull() & ~F.isnan(F.col(c).cast("double"))
        ok = t if ok is None else ok & t
    complete = df.where(ok)
    qs = {c: _q(c, dp) for c in cols}
    aggs = [F.count(F.lit(1)).cast(_DEC).alias("__n")]
    for c in cols:
        aggs.append(F.sum(qs[c]).alias(f"__s_{c}"))
        aggs.append(F.sum(qs[c] * qs[c]).alias(f"__ss_{c}"))
    for a, b in combinations(cols, 2):
        aggs.append(F.sum(qs[a] * qs[b]).alias(f"__sp_{a}_{b}"))
    g = complete.agg(*aggs)

    def corr_expr(a: str, b: str):
        n = F.col("__n")
        num = (n * F.col(f"__sp_{a}_{b}")
               - F.col(f"__s_{a}") * F.col(f"__s_{b}")).cast("double")
        da = (n * F.col(f"__ss_{a}")
              - F.col(f"__s_{a}") * F.col(f"__s_{a}")).cast("double")
        db = (n * F.col(f"__ss_{b}")
              - F.col(f"__s_{b}") * F.col(f"__s_{b}")).cast("double")
        return num / (F.sqrt(da) * F.sqrt(db))

    pairs = F.array(*[
        F.struct(F.lit(a).alias("col_x"), F.lit(b).alias("col_y"),
                 F.col("__n").cast("long").alias("n"),
                 corr_expr(a, b).alias("corr"))
        for a, b in combinations(cols, 2)
    ])
    return g.select(F.explode(pairs).alias("__p")).select("__p.*")


def corr_matrix_sql(table: str, cols: Sequence[str], *,
                    dp: int = 6) -> str:
    """DuckDB twin of :func:`corr_matrix` — identical quantization,
    exact HUGEINT sums, and the identical double expression tree."""
    cols = list(cols)
    scale = float(10 ** dp)
    nn = " AND ".join(
        f"{c} IS NOT NULL AND NOT isnan(CAST({c} AS DOUBLE))"
        for c in cols)
    qdef = {c: (f"CAST(floor(CAST({c} AS DOUBLE) * {scale!r}) "
                f"AS HUGEINT)") for c in cols}
    sums = ["count(*)::HUGEINT AS __n"]
    for c in cols:
        sums.append(f"sum({qdef[c]}) AS __s_{c}")
        sums.append(f"sum({qdef[c]} * {qdef[c]}) AS __ss_{c}")
    for a, b in combinations(cols, 2):
        sums.append(f"sum({qdef[a]} * {qdef[b]}) AS __sp_{a}_{b}")
    agg = f"SELECT {', '.join(sums)} FROM {table} WHERE {nn}"
    parts = []
    for a, b in combinations(cols, 2):
        num = f"CAST(__n * __sp_{a}_{b} - __s_{a} * __s_{b} AS DOUBLE)"
        da = f"CAST(__n * __ss_{a} - __s_{a} * __s_{a} AS DOUBLE)"
        db = f"CAST(__n * __ss_{b} - __s_{b} * __s_{b} AS DOUBLE)"
        parts.append(
            f"SELECT '{a}' AS col_x, '{b}' AS col_y, "
            f"CAST(__n AS BIGINT) AS n, "
            f"{num} / (sqrt({da}) * sqrt({db})) AS corr FROM __agg")
    return f"WITH __agg AS ({agg})\n" + "\nUNION ALL ".join(parts)


def quantile_bins(df: DataFrame, value_col: str, *,
                  nbins: int = 10) -> DataFrame:
    """Equi-depth discretization: assign every row the index of its
    value's quantile bucket (0..nbins−1) and profile each bucket —
    ``bin, n, lo, hi`` — the feature-binning pass behind calibrated
    quality thresholds and balanced histogram features.

    Cutpoints are the exact interpolated percentiles at i/nbins,
    rounded to 6 dp on both engines (cf. `profile_events`); a value
    equal to a cutpoint goes to the upper bucket; NULL/NaN values
    drop.  Scale shape: one percentile aggregate (a single nbins−1
    array row, broadcast back) + one map-side-combined profile
    aggregate — the corpus is never sorted; at 100 TB substitute
    :func:`~.sketches.histogram_quantiles` for the exact cutpoints.
    """
    if not 2 <= int(nbins) <= 1000:
        raise ValueError("nbins must be in [2, 1000]")
    v = F.col(value_col).cast("double")
    ok = df.where(F.col(value_col).isNotNull() & ~F.isnan(v))
    qs = ", ".join(repr(i / nbins) for i in range(1, nbins))
    cuts = ok.agg(F.transform(
        F.expr(f"percentile({value_col}, array({qs}))"),
        lambda x: F.round(x, 6)).alias("__cuts"))
    binned = (ok.crossJoin(F.broadcast(cuts))
              .withColumn("__bin", F.size(F.filter(
                  F.col("__cuts"), lambda c: c <= v)).cast("long")))
    return (binned.groupBy(F.col("__bin").alias("bin"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.round(F.min(v), 6).alias("lo"),
                 F.round(F.max(v), 6).alias("hi")))


def quantile_bins_sql(table_sql: str, value_col: str, *,
                      nbins: int = 10) -> str:
    """DuckDB twin of :func:`quantile_bins` (quantile_cont ≡ Spark's
    exact `percentile`; identical rounding and boundary rule)."""
    if not 2 <= int(nbins) <= 1000:
        raise ValueError("nbins must be in [2, 1000]")
    qs = ", ".join(repr(i / nbins) for i in range(1, nbins))
    v = f"CAST({value_col} AS DOUBLE)"
    return f"""
WITH __ok AS (
  SELECT {v} AS __x FROM ({table_sql})
  WHERE {value_col} IS NOT NULL AND NOT isnan({v})
),
__cuts AS (
  SELECT list_transform(quantile_cont(__x, [{qs}]),
                        x -> round(x, 6)) AS cuts
  FROM __ok
)
SELECT CAST(len(list_filter(c.cuts, x -> x <= o.__x)) AS BIGINT) AS bin,
       count(*)::BIGINT AS n,
       round(min(o.__x), 6) AS lo,
       round(max(o.__x), 6) AS hi
FROM __ok o CROSS JOIN __cuts c
GROUP BY 1
""".strip()


def mad_outliers(df: DataFrame, value_col: str, *,
                 group_cols: Sequence[str] = (),
                 threshold: float = 3.5) -> DataFrame:
    """Robust outlier flagging: |x − median| > threshold · MAD per
    group (median absolute deviation) — the data-quality gate that
    survives heavy tails, where mean/stddev z-scores are dragged by
    the very outliers they should flag.

    Both the median and the MAD are exact interpolated percentiles
    rounded to 6 dp on both engines; rows in a group with MAD = 0
    (over half the values identical) are never flagged (the standard
    degenerate-MAD convention, stated identically in the twin);
    NULL/NaN values drop.  Returns the input columns plus
    ``med, mad, is_outlier``.

    Scale shape: two percentile aggregates (one row per group,
    broadcast back) + scan-side flagging — never a sort of the corpus;
    at 100 TB substitute the histogram sketch for the percentiles.
    """
    if threshold <= 0:
        raise ValueError("threshold must be > 0")
    v = F.col(value_col).cast("double")
    ok = df.where(F.col(value_col).isNotNull() & ~F.isnan(v))
    gcols = list(group_cols)

    def agg(frame, expr, name):
        a = F.round(F.expr(expr), 6).alias(name)
        return frame.groupBy(*gcols).agg(a) if gcols else frame.agg(a)

    med = agg(ok, f"percentile({value_col}, 0.5)", "med")
    with_med = (ok.join(F.broadcast(med), on=gcols) if gcols
                else ok.crossJoin(F.broadcast(med)))
    dev = with_med.withColumn("__adev", F.abs(v - F.col("med")))
    mad = agg(dev, "percentile(__adev, 0.5)", "mad")
    # mad frame lacks gcols-free join key; re-join on the same keys
    out = (dev.join(F.broadcast(mad), on=gcols) if gcols
           else dev.crossJoin(F.broadcast(mad)))
    flag = (F.col("mad") > 0) & \
        (F.abs(v - F.col("med")) > F.lit(float(threshold)) * F.col("mad"))
    return out.drop("__adev").withColumn("is_outlier", flag)


def mad_outliers_sql(table_sql: str, value_col: str, *,
                     group_cols: Sequence[str] = (),
                     threshold: float = 3.5) -> str:
    """DuckDB twin of :func:`mad_outliers` (quantile_cont ≡ Spark's
    exact percentile; identical rounding, join and flag expressions)."""
    if threshold <= 0:
        raise ValueError("threshold must be > 0")
    gcols = list(group_cols)
    v = f"CAST(t.{value_col} AS DOUBLE)"
    gsel = ", ".join(gcols) + ", " if gcols else ""
    gsel_t = ", ".join(f"t.{g}" for g in gcols) + ", " if gcols else ""
    on_med = (" AND ".join(f"m.{g} = t.{g}" for g in gcols)
              if gcols else "TRUE")
    on_mad = (" AND ".join(f"d.{g} = t.{g}" for g in gcols)
              if gcols else "TRUE")
    grp = f"GROUP BY {', '.join(gcols)}" if gcols else ""
    grp_t = (f"GROUP BY {', '.join('t.' + g for g in gcols)}"
             if gcols else "")
    return f"""
WITH __ok AS (
  SELECT * FROM ({table_sql}) t
  WHERE {value_col} IS NOT NULL AND NOT isnan(CAST({value_col} AS DOUBLE))
),
__med AS (
  SELECT {gsel}round(quantile_cont(CAST({value_col} AS DOUBLE), 0.5), 6)
         AS med
  FROM __ok {grp}
),
__mad AS (
  SELECT {gsel_t}round(quantile_cont(
           abs(CAST(t.{value_col} AS DOUBLE) - m.med), 0.5), 6) AS mad
  FROM __ok t JOIN __med m ON {on_med} {grp_t}
)
SELECT t.*, m.med, d.mad,
       (d.mad > 0 AND abs({v} - m.med) > {float(threshold)!r} * d.mad)
         AS is_outlier
FROM __ok t
JOIN __med m ON {on_med}
JOIN __mad d ON {on_mad}
""".strip()
