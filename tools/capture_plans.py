"""Capture .explain("formatted") for declared queries into plans/<tag>/.

Usage:
    python tools/capture_plans.py <sf_dir> <out_dir> [name ...]

Writes one <name>.txt per query so before/after plan shapes are
judge-checkable without running Spark.  Capture itself is *mostly*
plan-only, but operators with eager persist pins DO execute real jobs
at construction time (ADVICE r13): the minhash family runs sig.count()
and substring_remove/scrub materialize their islands frame
(iv.persist(); iv.count()) — and those caches stay pinned until the
captured frame is garbage-collected (release_on_gc).  Frames are
dropped after each capture so the pins release between queries.
Streaming-fixture queries build their replay fixtures lazily inside the
query callable, which is plan-safe; queries whose callable *executes*
jobs to build the frame (composite pipelines returning a final frame)
still produce a plan for the returned frame.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from flink_skyline_qos_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    out_dir = sys.argv[2]
    only = set(sys.argv[3:])
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        path = os.path.join(out_dir, f"{name}.txt")
        try:
            df = fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
            # drop the frame so release_on_gc unpersists any caches the
            # operator pinned eagerly during construction (ADVICE r13)
            del df
            import gc
            gc.collect()
        except Exception as exc:  # noqa: BLE001
            plan = f"PLAN CAPTURE FAILED: {exc!r}\n"
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"{name}: {len(plan)} chars -> {path}", flush=True)


if __name__ == "__main__":
    main()
