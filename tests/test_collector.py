"""Metrics collector (reference metrics_collector.py) + graph data prep."""

import csv
import os
import sys

import numpy as np
import pytest
from pyspark.sql import functions as F

from flink_skyline_qos_spark.streaming.collector import (
    CSV_HEADERS, _canonical_row, collect_pipeline_metrics, collect_stream,
    parse_result_json, read_collector_csv)
from flink_skyline_qos_spark.streaming.engine import SkylinePipeline

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from graphs import perf_series, skyline_step  # noqa: E402


def _write_text(path, name, lines):
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as fh:
        fh.write("\n".join(lines) + "\n")


def test_canonical_row_maps_all_spellings():
    # reference JSON names
    r = _canonical_row({
        "query_id": "7", "record_count": 10, "skyline_size": 3,
        "optimality": 0.5, "ingestion_time_ms": 1,
        "local_processing_time_ms": 2, "global_processing_time_ms": 3,
        "total_processing_time_ms": 4, "query_latency_ms": 5,
        "skyline_points": "[[1,2]]",
    })
    assert r == ["7", 10, 3, 0.5, 1, 2, 3, 4, 5, "[[1,2]]"]
    # pipeline metric names + missing-field defaults
    r = _canonical_row({"query_id": "q", "record_count": 2,
                        "skyline_size": 1, "optimality": 1.0,
                        "ingest_ms": 9, "global_ms": 8, "total_ms": 17,
                        "latency_ms": 17})
    assert r == ["q", 2, 1, 1.0, 9, 0, 8, 17, 17, "[]"]
    # empty record → collector defaults (metrics_collector.py:91-101)
    assert _canonical_row({}) == ["N/A", 0, 0, 0.0, 0, 0, 0, 0, 0, "[]"]


def test_parse_result_json_roundtrip(spark):
    js = ('{"query_id":"5","record_count":100,"skyline_size":4,'
          '"optimality":0.25,"total_processing_time_ms":12}')
    row = parse_result_json(
        spark.createDataFrame([(js,)], "value string")).first()
    assert (row["query_id"], row["record_count"], row["skyline_size"],
            row["optimality"], row["total_processing_time_ms"]) == \
        ("5", 100, 4, 0.25, 12)
    assert row["query_latency_ms"] is None


def test_collector_end_to_end_and_idempotent(spark, tmp_path, points_2d):
    work = str(tmp_path / "work")
    data_dir = str(tmp_path / "data")
    trig_dir = str(tmp_path / "trig")
    rows = points_2d.collect()
    lines = [f"{r['id']},{r['d0']},{r['d1']}" for r in rows]
    _write_text(data_dir, "a.csv", lines)
    _write_text(trig_dir, "t.csv", [f"q_all,{len(lines)}"])
    pipe = SkylinePipeline(spark, work, dims=2, algo="mr-dim",
                           num_partitions=4, domain_max=120000.0)
    pipe.run_available_now(data_dir, trig_dir)

    out_csv = str(tmp_path / "metrics.csv")
    q = collect_pipeline_metrics(
        spark, pipe.metrics_dir, out_csv,
        checkpoint=str(tmp_path / "ckpt"),
        results_dir=pipe.results_dir, point_cols=("d0", "d1"))
    q.awaitTermination()

    with open(out_csv, newline="") as fh:
        got = list(csv.reader(fh))
    assert got[0] == CSV_HEADERS
    assert len(got) == 2  # header + the one answered query
    mrow = pipe.metrics().first()
    body = got[1]
    assert body[0] == "q_all"
    assert int(body[1]) == mrow["record_count"]
    assert int(body[2]) == mrow["skyline_size"]
    assert float(body[3]) == mrow["optimality"]
    # SkylinePoints cell carries the real geometry
    pts = read_collector_csv(out_csv)["SkylinePoints"].iloc[0]
    assert len(pts) == mrow["skyline_size"]
    assert all(len(p) == 2 for p in pts)

    # a fresh run over the same source+checkpoint appends nothing
    # (availableNow with a committed checkpoint has no new batches), and
    # a replayed batch id is skipped by the progress sidecar
    q2 = collect_pipeline_metrics(
        spark, pipe.metrics_dir, out_csv,
        checkpoint=str(tmp_path / "ckpt"),
        results_dir=pipe.results_dir, point_cols=("d0", "d1"))
    q2.awaitTermination()
    with open(out_csv, newline="") as fh:
        assert len(list(csv.reader(fh))) == 2


def test_collect_stream_from_json_records(spark, tmp_path):
    # Kafka-twin drive: a text stream of JSON result records → canonical CSV
    src_dir = str(tmp_path / "json")
    _write_text(src_dir, "r.jsonl", [
        '{"query_id":"1","record_count":5,"skyline_size":2,'
        '"optimality":0.75,"total_processing_time_ms":3}',
        '{"query_id":"2","record_count":6,"skyline_size":1,'
        '"optimality":0.5,"total_processing_time_ms":4}',
    ])
    stream = parse_result_json(
        spark.readStream.schema("value string").text(src_dir), "value")
    out_csv = str(tmp_path / "out.csv")
    q = collect_stream(stream, out_csv,
                       checkpoint=str(tmp_path / "ck"),
                       order_by=("query_id",))
    q.awaitTermination()
    with open(out_csv, newline="") as fh:
        got = list(csv.reader(fh))
    assert got[0] == CSV_HEADERS
    assert [r[0] for r in got[1:]] == ["1", "2"]
    assert [int(r[7]) for r in got[1:]] == [3, 4]


def test_skyline_step_geometry():
    pts, step = skyline_step([[3, 1], [1, 5], [2, 2]])
    assert pts.tolist() == [[1, 5], [2, 2], [3, 1]]
    # step: point, right-to-next-x, next point, ...
    assert step.tolist() == [[1, 5], [2, 5], [2, 2], [3, 2], [3, 1]]
    empty_pts, empty_step = skyline_step("[]")
    assert empty_pts.shape == (0, 2) and empty_step.shape == (0, 2)


def test_perf_series_transform(tmp_path):
    p = tmp_path / "m.csv"
    with open(p, "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(CSV_HEADERS)
        w.writerow(["1", 2_000_000, 3, 0.5, 1000, 200, 300, 4000, 4000, "[]"])
        w.writerow(["2", 1_000_000, 2, 0.6, 500, 100, 150, 2000, 2000, "[]"])
    s = perf_series(str(p))
    # sorted by record count, units converted
    assert np.allclose(s["records_m"], [1.0, 2.0])
    assert np.allclose(s["total_s"], [2.0, 4.0])
    assert np.allclose(s["ingest_s"], [0.5, 1.0])


def test_csv_appender_sidecar_resets_on_new_run(tmp_path):
    """A stale sidecar from a DIFFERENT run (fresh checkpoint, batch ids
    restarting at 0) must not suppress the new run's batches."""
    from flink_skyline_qos_spark.streaming.collector import _CsvAppender

    csv_path = str(tmp_path / "m.csv")
    old = _CsvAppender(csv_path, ("query_id",), run_id="ckpt-run-1")
    # simulate run 1 having committed through batch 7
    with open(old.progress, "w") as fh:
        fh.write('{"run": "ckpt-run-1", "batch_id": 7}')
    assert old._done_through() == 7
    new = _CsvAppender(csv_path, ("query_id",), run_id="ckpt-run-2")
    assert new._done_through() == -1  # fresh run: nothing done yet
    # legacy bare-int sidecar (pre-run_id format) also resets for a
    # run-id'd appender
    with open(old.progress, "w") as fh:
        fh.write("4")
    assert new._done_through() == -1
