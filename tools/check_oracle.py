"""Emulate the driver's correctness gate locally.

Runs every ``queries()`` entry against its ``oracle_sql()`` twin at a
given sf dir (default sf0.01), comparing row-count, column names, and an
order-insensitive multiset of values (columns sorted by name, floats
rounded).  Usage:  python tools/check_oracle.py [sf_dir] [name ...]
Set ORACLE_JSON=<path> to also write a machine-diffable JSON summary
(one object per query: rows, match booleans, wall seconds).
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod  # noqa: E402
from flink_skyline_qos_spark.session import get_spark  # noqa: E402
from flink_skyline_qos_spark.sources.tables import TABLES  # noqa: E402


def norm(v):
    if isinstance(v, float):
        return round(v, 6)
    return v


def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(norm(r[i]) for i in order) for r in rows)


def _warmup(spark) -> None:
    """One-time engine spin-up OUTSIDE any per-query timing: the Arrow
    Python worker pool (fork + numpy/pandas import per daemon — the
    same warmup bench.py does) and the Structured Streaming machinery
    (state-store providers, micro-batch engine init), which otherwise
    bill ~5-6 s to whichever registered query happens to run a stream
    first — an ordering artifact, not a query cost (round 8: the same
    query measured 12.3 s cold-engine vs 4.3 s warm)."""
    import os
    import tempfile

    t0 = time.time()

    def _ident(batches):
        for pdf in batches:
            yield pdf

    par = spark.sparkContext.defaultParallelism
    spark.range(0, 64 * par, 1, 2 * par).selectExpr("id", "rand() x") \
        .mapInPandas(_ident, schema="id long, x double").count()
    work = tempfile.mkdtemp(prefix="oracle_warm_")
    src = os.path.join(work, "src")
    spark.range(8).selectExpr("id", "cast(id as string) s") \
        .coalesce(1).write.mode("overwrite").parquet(src)

    def _touch(batch_df, batch_id):
        batch_df.persist().count()
        batch_df.write.mode("overwrite").parquet(
            os.path.join(work, f"out{batch_id}"))
        batch_df.unpersist()

    q = (spark.readStream.schema("id long, s string").parquet(src)
         .writeStream.foreachBatch(_touch)
         .option("checkpointLocation", os.path.join(work, "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    print(f"# engine warmup (Arrow pool + streaming init): "
          f"{time.time() - t0:.1f}s")


def main():
    import json
    import os

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    _warmup(spark)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    failures = []
    report = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        df = fn(spark, sf_dir)
        scols = df.columns
        srows = [tuple(r) for r in df.collect()]
        t_spark = time.time() - t0
        if name not in os_:
            print(f"  {name}: rows={len(srows)} (rows-only, no oracle) "
                  f"[{t_spark:.1f}s]")
            continue
        t0 = time.time()
        rel = con.sql(os_[name])
        ocols = rel.columns
        orows = rel.fetchall()
        t_duck = time.time() - t0
        ok_cols = sorted(scols) == sorted(ocols)
        ok_vals = ok_cols and canon(scols, srows) == canon(ocols, orows)
        status = "OK" if ok_vals else "FAIL"
        report[name] = {
            "rows_spark": len(srows), "rows_duck": len(orows),
            "rows_match": len(srows) == len(orows),
            "schema_match": ok_cols, "hash_match": ok_vals,
            "spark_s": round(t_spark, 1), "duck_s": round(t_duck, 1),
        }
        print(f"  {name}: {status} spark={len(srows)} duck={len(orows)} "
              f"[spark {t_spark:.1f}s, duck {t_duck:.1f}s]")
        if not ok_vals:
            failures.append(name)
            if not ok_cols:
                print(f"    cols spark={sorted(scols)} duck={sorted(ocols)}")
            else:
                a, b = canon(scols, srows), canon(ocols, orows)
                sa, sb = set(a), set(b)
                print(f"    only-spark={list(sa - sb)[:3]}")
                print(f"    only-duck={list(sb - sa)[:3]}")
    print("FAILURES:", failures or "none")
    out = os.environ.get("ORACLE_JSON")
    if out:
        with open(out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "n_queries": len(report),
                       "failures": failures, "queries": report}, fh,
                      indent=1, sort_keys=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
