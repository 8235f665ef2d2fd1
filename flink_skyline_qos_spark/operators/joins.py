"""Temporal join operators Spark lacks natively: as-of and range joins.

Both are classic event-enrichment primitives (attach the latest quote
to each trade; attach the session/interval a reading falls into) that
a QoS event engine needs next to its windowed operators.  Neither is a
Catalyst built-in — the naive formulations are theta joins — so each is
re-expressed as an equi-shuffle shape that survives 100 TB:

* :func:`as_of_join` — union both sides, ONE shuffle per input on the
  `by` key, and a running ``last(right payload)`` window: every left
  row picks the most recent right row with ``ts ≤ left.ts`` in a
  single sorted pass.  No join node at all, let alone a range theta.
* :func:`range_join` — intervals and points are bucketed onto a fixed
  grid; the join becomes an EQUI join on bucket id (plus a residual
  band predicate), so Spark hash-partitions both sides instead of
  falling back to BroadcastNestedLoop.  Intervals spanning k buckets
  are replicated k times — bounded by `bucket_width`.

Both ship deterministic SQL twins (same union+window / bucket
formulation; DuckDB's native ``ASOF JOIN`` is deliberately NOT used as
the oracle because its duplicate-timestamp tie-break is unspecified,
while the twin's explicit (ts, side, tiebreak) order is total).
"""

from __future__ import annotations

from functools import reduce
from operator import and_
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "as_of_join",
    "as_of_join_sql",
    "range_join",
    "range_join_sql",
    "bloom_semi_join",
    "bloom_semi_join_sql",
]


def as_of_join(left: DataFrame, right: DataFrame, *, on: str = "ts",
               by: Sequence[str] | str = (), right_cols: Sequence[str],
               tiebreak: str, suffix: str = "_asof") -> DataFrame:
    """For every left row, attach the payload of the LATEST right row
    with ``right.{on} ≤ left.{on}`` (per `by` key) — trades←quotes,
    events←config-changes, readings←calibrations.

    `right_cols` are the payload columns to attach (suffixed);
    `tiebreak` is a right-side column making the order among
    equal-timestamp right rows total (latest (on, tiebreak) wins) —
    required, because "some arbitrary tied row" is not reproducible.
    Left rows with no admissible right row get NULL payload.

    Physical shape: tag + union, then one window partitioned by `by`
    ordered by (on, side, tiebreak) with a running
    ``last(payload, ignorenulls)`` — right rows sort BEFORE left rows
    at equal `on` (inclusive ≤), each side crosses exactly one hash
    exchange on `by`, and no join operator exists in the plan.  NULL
    payload values in the right rows are indistinguishable from "no
    match" under ignorenulls — attach the matched timestamp
    (``{on}{suffix}``) to disambiguate.
    """
    by = [by] if isinstance(by, str) else list(by)
    if not by:
        raise ValueError("as_of_join needs at least one `by` key "
                         "(a global as-of would serialize on one task)")
    payload = list(right_cols)
    # order by the tiebreak's NATIVE type — casting to long would turn
    # a string/uuid tiebreak into NULL for every row and silently
    # reintroduce the nondeterministic tie the parameter exists to kill
    tb_type = right.schema[tiebreak].dataType.simpleString()
    r = right.select(
        *by,
        F.col(on).alias("__t"),
        F.lit(0).alias("__side"),
        F.col(tiebreak).alias("__tb"),
        F.col(on).alias(f"{on}{suffix}"),
        *[F.col(c).alias(f"{c}{suffix}") for c in payload],
    )
    l = left.select(
        "*",
        F.col(on).alias("__t"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(tb_type).alias("__tb"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (Window.partitionBy(*by)
         .orderBy(F.col("__t").asc(), F.col("__side").asc(),
                  F.col("__tb").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    attached = u.select(
        "*",
        *[F.last(f"{c}{suffix}", ignorenulls=True).over(w)
          .alias(f"__a_{c}") for c in [on, *payload]],
    )
    out_cols = [c for c in left.columns]
    return (
        attached.filter(F.col("__side") == 1)
        .select(*out_cols,
                *[F.col(f"__a_{c}").alias(f"{c}{suffix}")
                  for c in [on, *payload]])
    )


def as_of_join_sql(left_sql: str, right_sql: str, *, on: str = "ts",
                   by: Sequence[str] | str = (),
                   left_cols: Sequence[str],
                   right_cols: Sequence[str],
                   tiebreak: str, suffix: str = "_asof") -> str:
    """DuckDB twin of :func:`as_of_join` — the SAME union+window
    formulation (total order), not DuckDB's native ASOF JOIN, whose
    tie-break among duplicate timestamps is unspecified."""
    by = [by] if isinstance(by, str) else list(by)
    payload = list(right_cols)
    lcols = ", ".join(left_cols)
    rsel = ", ".join(
        [*by, f"{on} AS __t", "0 AS __side",
         f"{tiebreak} AS __tb",
         f"{on} AS {on}{suffix}"]
        + [f"{c} AS {c}{suffix}" for c in payload])
    lnull = ", ".join(
        [f"NULL AS {on}{suffix}"] + [f"NULL AS {c}{suffix}"
                                     for c in payload])
    win = (f"PARTITION BY {', '.join(by)} "
           f"ORDER BY __t ASC, __side ASC, __tb ASC "
           f"ROWS UNBOUNDED PRECEDING")
    attach = ", ".join(
        f"last_value({c}{suffix} IGNORE NULLS) OVER ({win}) AS __a_{c}"
        for c in [on, *payload])
    outs = ", ".join(
        [lcols] + [f"__a_{c} AS {c}{suffix}" for c in [on, *payload]])
    return f"""
WITH u AS (
  SELECT {lcols}, {on} AS __t, 1 AS __side, NULL AS __tb, {lnull}
  FROM ({left_sql})
  UNION ALL BY NAME
  SELECT {rsel} FROM ({right_sql})
),
a AS (SELECT *, {attach} FROM u)
SELECT {outs} FROM a WHERE __side = 1
""".strip()


def range_join(points: DataFrame, intervals: DataFrame, *,
               point_col: str, start_col: str, end_col: str,
               by: Sequence[str] | str = (),
               bucket_width: float,
               how: str = "inner") -> DataFrame:
    """Join each point row to every interval row containing it
    (``start ≤ point < end``), optionally per `by` key.

    The naive predicate is a band theta join (BroadcastNestedLoop at
    scale).  Here both sides land on a fixed bucket grid
    (``floor(x / bucket_width)``): an interval covering buckets
    [⌊s/w⌋, ⌊(e−ulp)/w⌋] is replicated once per covered bucket (via
    ``sequence``+``explode``), points map to one bucket, and the join
    is EQUI on (by…, bucket) with the exact band predicate as a
    residual filter — hash-partitioned, AQE-skew-handled, no nested
    loop.  Replication factor = mean interval length / bucket_width;
    pick `bucket_width` near the typical interval length.
    """
    by = [by] if isinstance(by, str) else list(by)
    w = float(bucket_width)
    if w <= 0:
        raise ValueError("bucket_width must be > 0")
    if how not in ("inner", "left"):
        # outer/right would emit one null-padded row per BUCKET REPLICA
        # of an unmatched interval (intervals are exploded before the
        # join) — wrong cardinality, so those modes are rejected
        raise ValueError("range_join supports how='inner' or 'left' "
                         "(points side) only")
    iv = intervals.withColumn(
        "__b",
        F.explode(F.sequence(
            F.floor(F.col(start_col) / w).cast("long"),
            F.greatest(
                F.floor(F.col(start_col) / w),
                F.ceil(F.col(end_col) / w) - 1,
            ).cast("long"),
        )),
    )
    pt = points.withColumn(
        "__b", F.floor(F.col(point_col) / w).cast("long"))
    from functools import reduce
    from operator import and_

    cond = reduce(and_, [pt["__b"] == iv["__b"]] + [
        pt[k] == iv[k] for k in by
    ] + [
        iv[start_col] <= pt[point_col],
        pt[point_col] < iv[end_col],
    ])
    joined = pt.join(iv, cond, how)
    keep = [pt[c] for c in points.columns] + [
        iv[c] for c in intervals.columns if c not in by
    ]
    return joined.select(*keep)


def _bloom_positions(key: "F.Column", nbits: int, num_hashes: int):
    """`num_hashes` independent bit positions in [0, nbits) from md5 of
    (i, key) — the repo-wide engine-portable hash convention."""
    out = []
    for i in range(num_hashes):
        h = F.conv(F.substring(
            F.md5(F.concat(F.lit(f"{i}|"), key.cast("string"))),
            1, 15), 16, 10).cast("long")
        out.append(h % nbits)
    return out


def bloom_semi_join(fact: DataFrame, dim: DataFrame, key: str, *,
                    dim_key: str | None = None,
                    bits_log2: int = 17, num_hashes: int = 5,
                    exact: bool = True) -> DataFrame:
    """Semi join ``fact ⋉ dim`` on `key`, pre-pruned by a Bloom filter
    built from the dim keys — the explicit, deterministic form of the
    runtime filter every 100 TB star-schema scan needs.

    The regime this targets: `dim` has too many keys to broadcast as a
    hash relation, so a plain semi join shuffles the ENTIRE fact table
    on `key`.  A Bloom bitmap of the dim keys is tiny (2^bits_log2 bits
    = 16 KiB at the default) and is inlined as one constant-folded
    array literal, making the probe a pure fact-side predicate; fact
    rows failing the membership test — the vast majority, when the dim
    side is selective — are dropped at the scan, below the final join,
    inside whole-stage codegen.  The final equi semi
    join (``exact=True``, default) removes the false positives, so the
    result is exactly the plain semi join; ``exact=False`` returns the
    superset (FP rate ≈ (1−e^{−kn/m})^k ≈ 0.1 % at k=5, m/n≈16) for
    pipelines that tolerate it and want zero fact-side shuffle at all.

    Everything is deterministic md5 Column math (no driver-side
    `DataFrame.stat.bloomFilter`, whose bit layout is engine-private):
    the bitmap aggregation shuffles ≤ 2^(bits_log2−6) word rows — the
    driver collects that bounded word list, never the keys.  Spark's
    own adaptive runtime bloom (`spark.sql.optimizer.runtime.
    bloomFilter.enabled`) picks this plan only when stats allow; this
    operator guarantees it.
    """
    nbits = 1 << int(bits_log2)
    if not 10 <= int(bits_log2) <= 24:
        raise ValueError("bits_log2 must be in [10, 24]")
    if not 1 <= int(num_hashes) <= 8:
        raise ValueError("num_hashes must be in [1, 8]")
    nwords = nbits >> 6
    dk = dim_key or key
    dimkeys = dim.select(F.col(dk).alias(key)) \
        .where(F.col(key).isNotNull()).distinct()
    words = (
        dimkeys
        .select(F.explode(F.array(
            *_bloom_positions(F.col(key), nbits, num_hashes))).alias("__p"))
        .select(F.shiftright(F.col("__p"), 6).alias("__w"),
                F.expr("shiftleft(CAST(1 AS BIGINT), "
                       "CAST(__p & 63 AS INT))").alias("__m"))
        .groupBy("__w").agg(F.expr("bit_or(__m)").alias("__m"))
        .collect()
    )
    bitmap = [0] * nwords
    for r in words:
        bitmap[r["__w"]] = r["__m"]
    # inline as an array LITERAL (constant-folded to one object, ≤16 KiB
    # at the default) rather than a broadcast one-row frame: a literal
    # keeps the probe a pure predicate on fact columns, which Catalyst
    # pushes below the final semi join all the way to the scan — a
    # joined bitmap column would pin the probe ABOVE the join.
    bm = F.lit(bitmap)
    test = reduce(and_, [
        F.getbit(F.element_at(bm, F.shiftright(pos, 6).cast("int") + 1),
                 pos.bitwiseAND(F.lit(63))) == 1
        for pos in _bloom_positions(F.col(key), nbits, num_hashes)
    ])
    pruned = fact.where(test)
    if not exact:
        return pruned
    return pruned.join(dimkeys, on=key, how="leftsemi")


def bloom_semi_join_sql(fact_sql: str, dim_sql: str, key: str, *,
                        dim_key: str | None = None,
                        fact_cols: Sequence[str]) -> str:
    """DuckDB twin of :func:`bloom_semi_join` (exact mode) — the plain
    semi join; the Bloom stage is a pure physical pre-filter whose
    false positives the final equi join provably removes."""
    dk = dim_key or key
    cols = ", ".join(f"f.{c}" for c in fact_cols)
    return (
        f"SELECT {cols} FROM ({fact_sql}) f "
        f"WHERE f.{key} IN (SELECT {dk} FROM ({dim_sql}) "
        f"WHERE {dk} IS NOT NULL)"
    )


def range_join_sql(points_sql: str, intervals_sql: str, *,
                   point_col: str, start_col: str, end_col: str,
                   by: Sequence[str] | str = (),
                   point_cols: Sequence[str],
                   interval_cols: Sequence[str]) -> str:
    """DuckDB twin of :func:`range_join` — the direct band predicate
    (the bucket decomposition is a pure physical rewrite; results are
    identical by construction, which is exactly what the oracle
    checks)."""
    by = [by] if isinstance(by, str) else list(by)
    eq = " AND ".join([f"p.{k} = i.{k}" for k in by]) or "TRUE"
    psel = ", ".join(f"p.{c}" for c in point_cols)
    isel = ", ".join(f"i.{c}" for c in interval_cols)
    return (
        f"SELECT {psel}, {isel} FROM ({points_sql}) p "
        f"JOIN ({intervals_sql}) i ON {eq} "
        f"AND i.{start_col} <= p.{point_col} "
        f"AND p.{point_col} < i.{end_col}"
    )
