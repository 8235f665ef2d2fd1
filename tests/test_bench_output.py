"""bench.py output-contract tests (no Spark needed).

The driver captures only a 2000-char tail of bench.py's stdout and
parses the last line as JSON; round 6's line grew to ~3.7 KB (per-query
load pairs) and the driver recorded ``parsed: null``, losing the
round's timings (VERDICT r6 #1).  These tests pin the contract: the
final JSON line stays comfortably under the capture window even with
every registered workload present and worst-case-width timing values.
"""

from __future__ import annotations

import json
import os

import bench


def _synthetic_names() -> list[str]:
    # the generated anti-correlated workloads bench.py appends after the
    # HEADLINE queries (kept in sync with bench.main's workload table)
    return [
        "anticorr_1m_2d", "anticorr_1m_3d", "anticorr_1m_4d",
        "synth_repsky_1m",
        "anticorr_10m_2d", "anticorr_10m_3d", "anticorr_10m_4d",
        "anticorr_100m_2d", "anticorr_100m_3d", "anticorr_100m_4d",
        "scatter_5m_4d_frac", "anticorr_1b_2d",
        "synth_minhash_100k", "synth_substring_100k",
        "synth_substr_rm_100k", "synth_dedup_1m",
    ]


def test_bench_json_line_fits_driver_capture():
    names = bench.HEADLINE + _synthetic_names()
    assert len(names) >= 48
    # realistic-worst widths: every value in the 4-char 1-dp tier (no
    # real run has all ~50 queries >=10 s; r6's clean sweep had 7), the
    # unconverged/floor_exited lists populated with the longest names
    # at their observed-worst sizes (r6 flagged 3)
    timings = {n: bench.bench_fmt(99.94) for n in names}
    long_names = sorted(names, key=len, reverse=True)
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "queries": timings,
        "cold_start_sec": 99.99,
        "sf": 0.1,
        "calib_sec": 9.999,
        "unconverged": long_names[:3],
        "floor_exited": long_names[3:5],
    }
    line = json.dumps(out, separators=(",", ":"))
    # the true ceiling is the driver's 2000-char tail (line + newline
    # must fit it, and the JSON is the last stdout line); 1900 is the
    # no-coarsening budget — realistic-worst must emit UNcoarsened so
    # floor_exited survives.  The bound moved 1800 -> 1900 in round 13
    # when the 52nd bench row pushed realistic-worst to 1828.
    assert len(line) < 1900, len(line)


def test_bench_coarsening_fallback_fits_even_pathological_widths():
    # the in-bench safety valve: if every query somehow hit the 9999 s
    # tier AND every flag list filled up, coarsening (whole seconds +
    # dropping floor_exited) must land the line back under 1800
    names = bench.HEADLINE + _synthetic_names()
    timings = {n: 9999.4 for n in names}
    out = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "queries": {n: (int(round(v)) if v >= 10 else round(v, 1))
                    for n, v in timings.items()},
        "cold_start_sec": 99.99,
        "sf": 0.1,
        "unconverged": sorted(names, key=len, reverse=True)[:4],
    }
    line = json.dumps(out, separators=(",", ":"))
    # the hard ceiling is the driver's 2000-char tail; 1900 keeps the
    # same cushion as the uncoarsened budget.  The bound moved
    # 1800 -> 1900 with the round-14 rotation swap: the returning set's
    # names are longer (skyline_3d_tree_merge_lineitem vs funnel_events)
    # and pushed this all-9999s pathological line to 1815.
    assert len(line) < 1900, len(line)


def test_bench_fmt_adaptive_precision():
    assert bench.bench_fmt(1.23456) == 1.23
    assert bench.bench_fmt(9.999) == 10.0  # rounding may cross the tier
    assert bench.bench_fmt(42.048) == 42.0
    assert bench.bench_fmt(123.456) == 123
    # every tier's JSON rendering is at most 4 chars up to 9999 s
    for v in (0.01, 9.99, 99.9, 42.0, 9999.4):
        assert len(json.dumps(bench.bench_fmt(v))) <= 6


def test_headline_and_rotation_names_are_registered():
    """Every benched / rotated name must be a registered query — a typo
    here silently drops a row from BENCH_r{N} (the loop skips unknown
    names)."""
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    for n in bench.HEADLINE + bench.ROTATED_OUT:
        assert n in q, n


def test_headline_rotation_is_a_swap_not_an_append():
    """The rotation schedule swaps equal-length sets — appending the
    rotated rows would blow the 2000-char capture line (a 64-row
    worst-case line measures ~2190 chars).  HEADLINE and ROTATED_OUT
    must stay disjoint and the union must cover both r10 sets."""
    assert set(bench.HEADLINE).isdisjoint(bench.ROTATED_OUT)
    # round-14 scheduled swap (VERDICT r13 #7): the 15 rows rotated out
    # in round 11 are back IN; the 15 stable returning-r10 rows retire
    # to ROTATED_OUT with recorded r11-r13 bands
    for n in ("hll_users_events", "ann_topk_embeddings",
              "skyline_3d_tree_merge_lineitem", "bloom_semi_join_orders"):
        assert n in bench.HEADLINE, n
    for n in ("paragraph_dedup_documents", "tfidf_documents",
              "funnel_events", "corr_profile_lineitem"):
        assert n in bench.ROTATED_OUT, n


def test_converged_floor_exit_takes_extra_sample_over_steady():
    """VERDICT r10 #2: a floor-exited row whose best sample lands
    >1.5x its recorded steady value must take one extra sample instead
    of shipping a single contended measurement (r10's anticorr_100m_4d
    recorded 78 s off one sample vs a 35 s steady band)."""
    # 30 s-floor branch: within 1.5x steady -> immediate floor exit
    fl: list = []
    assert bench.converged("a", [45.0, 80.0], {"a": 40.0}, fl)
    assert fl == ["a"]
    # >1.5x steady -> NOT converged at two samples; exits (flagged) at 3
    fl = []
    assert not bench.converged("a", [80.0, 100.0], {"a": 40.0}, fl)
    assert fl == []
    assert bench.converged("a", [80.0, 100.0, 99.0], {"a": 40.0}, fl)
    assert fl == ["a"]
    # >=60 s no-steady branch: two agreeing-ish samples exit flagged...
    fl = []
    assert bench.converged("b", [100.0, 130.0], {}, fl)
    assert fl == ["b"]
    # ...but a >2x divergence forces a third sample (pre-existing rule)
    fl = []
    assert not bench.converged("b", [100.0, 250.0], {}, fl)
    # >=60 s WITH a steady record: >1.5x steady forces the extra sample
    fl = []
    assert not bench.converged("c", [100.0, 130.0], {"c": 60.0}, fl)
    assert bench.converged("c", [100.0, 130.0, 128.0], {"c": 60.0}, fl)
    assert fl == ["c"]
    # plain 20%/0.3s agreement needs no flags
    fl = []
    assert bench.converged("d", [1.55, 1.26], {}, fl)
    assert fl == []


class _FakePinned:
    def __init__(self):
        self.unpersisted = None

    def unpersist(self, blocking=False):
        self.unpersisted = blocking


class _FakeResult:
    def __init__(self, n):
        self._n = n
        self._verify_strategy = ("broadcast", n, 0)

    def count(self):
        return self._n


def test_sample_pinned_always_unpersists_input():
    """VERDICT r10 #5: the pinned workload input (the 1B row pins
    ~24 GB) must be blocking-unpersisted before sample_pinned returns —
    i.e. before the NEXT row's samples start — including when a sample
    raises."""
    pts = _FakePinned()
    best, runs, n, disp = bench.sample_pinned(
        "w", pts, lambda p: _FakeResult(7), 4, {}, [], [])
    assert pts.unpersisted is True  # blocking unpersist happened
    assert n == 7 and disp == ("broadcast", 7, 0)
    assert best == min(runs) and len(runs) >= 2

    # int-returning composite pipelines (the dedup rows) work too
    pts = _FakePinned()
    best, runs, n, disp = bench.sample_pinned(
        "w2", pts, lambda p: 3, 4, {}, [], [])
    assert pts.unpersisted is True and n == 3 and disp is None

    # a raising sample still releases the pinned input
    pts = _FakePinned()
    def boom(p):
        raise RuntimeError("sample died")
    try:
        bench.sample_pinned("w3", pts, boom, 4, {}, [], [])
    except RuntimeError:
        pass
    assert pts.unpersisted is True


def test_stream_query_registry_guards_drift():
    """STREAM_QUERIES (the oracle gate's streaming-warmup metadata,
    ADVICE r9) must match exactly the registered queries whose source
    touches the streaming APIs — a new stream query that forgets to
    register itself would get ~5 s of engine init billed to its own
    spot-check timing."""
    import inspect

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    assert entrymod.STREAM_QUERIES <= set(qs)
    markers = ("readStream", "writeStream", "foreachBatch",
               "flink_skyline_qos_spark.streaming", "SkylinePipeline")
    flagged = {n for n, fn in qs.items()
               if any(m in inspect.getsource(fn) for m in markers)}
    assert flagged == set(entrymod.STREAM_QUERIES), \
        flagged ^ set(entrymod.STREAM_QUERIES)


def test_emit_load_hot_attribution(capsys):
    """Rows recorded >1.25x their steady floor carry their load
    context in the stdout JSON (VERDICT r11 #1); in-band rows do not,
    keeping the line inside the driver capture tail."""
    timings = {"q_inband": 10.0, "q_hot": 20.0, "q_new": 5.0}
    loads = {"q_inband": [3.0, 4.0, 30.1], "q_hot": [12.0, 28.0, 61.5],
             "q_new": [2.0, 2.0, 31.0]}
    steady = {"q_inband": 9.0, "q_hot": 10.0}  # q_new: no prior record
    bench._emit(timings, loads, [], [], 1.0, 0.1, steady)
    out = json.loads([ln for ln in capsys.readouterr().out.splitlines()
                      if ln.startswith("{")][-1])
    assert out["load_hot"] == {"q_hot": [12.0, 28.0, 61.5]}
    assert "q_inband" not in out["load_hot"]


def test_load_ctx_roundtrip_shape():
    """load_ctx_start/end produce [pre, post(, busy_cores)] with
    busy_cores bounded by the host cpu count."""
    import os
    import time

    ctx = bench.load_ctx_start()
    time.sleep(0.05)
    row = bench.load_ctx_end(ctx)
    assert len(row) in (2, 3)
    assert all(isinstance(v, float) for v in row)
    if len(row) == 3:
        assert 0.0 <= row[2] <= (os.cpu_count() or 1) + 0.1


def test_bench_line_fits_with_load_hot_worst_case(capsys):
    """Pathological sweep — every row 99.9 s, EVERY row >1.25x steady
    so every row carries load context: the valve must coarsen and trim
    load_hot until the final printed line fits the driver's 2000-char
    capture tail, keeping the largest-delta rows' attribution."""
    names = bench.HEADLINE + _synthetic_names()
    timings = {n: bench.bench_fmt(99.94) for n in names}
    loads = {n: [12.3, 28.1, 61.5] for n in names}
    steady = {n: 10.0 for n in names}
    bench._emit(timings, loads, sorted(names)[:2], [], 99.99, 0.1,
                steady)
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("{")][-1]
    assert len(line) < 2000, len(line)
    out = json.loads(line)
    assert 1 <= len(out["load_hot"]) <= 5


def test_steady_floor_reads_driver_wrapper_shape(tmp_path, monkeypatch):
    """_steady_floor must read BOTH artifact shapes: the builder's
    flat bench JSON and the driver's wrapper with the bench JSON
    nested under `parsed` (found r12: the wrapper shape silently
    yielded an EMPTY steady table — no 30 s floor, no load_hot)."""
    import os

    (tmp_path / "BENCH_r01.json").write_text(json.dumps({
        "n": 1, "rc": 0, "cpus": 32, "sf": 0.1,
        "parsed": {"queries": {"qa": 10.0, "qb": 3.0}, "sf": 0.1}}))
    (tmp_path / "BENCH_r02.json").write_text(json.dumps({
        "queries": {"qa": 8.0}, "sf": 0.1}))
    (tmp_path / "BENCH_r03.json").write_text(json.dumps({
        "queries": {"qa": 1.0}, "sf": 0.01}))   # other SF: ignored
    monkeypatch.setattr(
        "os.path.dirname", lambda _p, _real=os.path.dirname,
        _t=str(tmp_path): _t)
    floor = bench._steady_floor(0.1)
    assert floor == {"qa": 8.0, "qb": 3.0}


def test_host_calibration_is_fast_and_sane():
    """The GEMM fingerprint must cost well under a second per sample —
    it is a regime fingerprint, not a benchmark row.  The cross-batch
    repeatability assert that used to live here flaked through three
    rounds of loosening (single-shot 2x -> min-of-3 4x, still red on
    the round-13 driver host): wall-clock repeatability of a shared
    host is NOT a property of this code and must not gate the suite
    (VERDICT r13 item 1).  Builders can opt back in on a quiet host
    with SPARK_GRAFT_STRICT_CALIB=1."""
    a = min(bench.host_calibration() for _ in range(3))
    b = min(bench.host_calibration() for _ in range(3))
    assert 0.0 < a < 2.0 and 0.0 < b < 2.0
    if os.environ.get("SPARK_GRAFT_STRICT_CALIB"):
        assert max(a, b) <= 4.0 * max(min(a, b), 0.05)


def test_emit_includes_calibration(capsys):
    bench._emit({"q": 1.0}, {"q": [1.0, 1.0]}, [], [], 1.0, 0.1,
                {}, 0.143)
    out = json.loads([ln for ln in capsys.readouterr().out.splitlines()
                      if ln.startswith("{")][-1])
    assert out["calib_sec"] == 0.143
