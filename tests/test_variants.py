"""Variant suite: guarded P4 prefilter, top-k dominating, k-dominant
skyline, BPE-ish token counting."""

from pyspark.sql import functions as F

from flink_skyline_qos_spark.functions.text import bpe_token_count
from flink_skyline_qos_spark.operators.skyline import skyline
from flink_skyline_qos_spark.operators.variants import (
    grid_prefilter,
    k_dominant_skyline,
    top_k_dominating,
)


def test_grid_prefilter_lossless_for_skyline(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 9.0), (2, 9.0, 1.0), (3, 6.0, 6.0), (4, 4.0, 4.0),
         (5, 5.0, 5.0)],
        "id long, d0 double, d1 double")
    out = grid_prefilter(df, ["d0", "d1"], domain_max=10.0)
    # witness (4,4) exists → (6,6) dropped; midpoint tie (5,5) kept
    ids = {r["id"] for r in out.collect()}
    assert ids == {1, 2, 4, 5}
    # skyline unchanged by the prefilter
    a = {tuple(r) for r in skyline(df, ["d0", "d1"]).collect()}
    b = {tuple(r) for r in skyline(out, ["d0", "d1"]).collect()}
    assert a == b


def test_grid_prefilter_no_witness_keeps_all(spark):
    df = spark.createDataFrame(
        [(1, 6.0, 9.0), (2, 9.0, 6.0), (3, 8.0, 8.0)],
        "id long, d0 double, d1 double")
    out = grid_prefilter(df, ["d0", "d1"], domain_max=10.0)
    # upper-corner corpus: unguarded P4 would wrongly drop EVERYTHING
    assert out.count() == 3


def test_grid_envelope_prefilter_lossless_random(spark):
    """Hypothesis-style sweep: skyline(envelope(S)) == skyline(S) on
    random point sets with duplicates, ties, and boundary values —
    the losslessness claim of the per-cell witness field (round 10)."""
    import random

    from flink_skyline_qos_spark.operators.variants import (
        grid_envelope_prefilter,
    )

    rng = random.Random(7)
    for trial in range(4):
        dims = rng.choice([2, 3, 4])
        n = rng.randint(5, 300)
        rows = []
        for i in range(n):
            pt = tuple(float(rng.randint(0, 12)) for _ in range(dims))
            rows.append((i, *pt))
            if rng.random() < 0.3:
                rows.append((i + 1000, *pt))  # exact duplicate
        cols = [f"d{k}" for k in range(dims)]
        schema = "id long, " + ", ".join(f"{c} double" for c in cols)
        df = spark.createDataFrame(rows, schema)
        filt = grid_envelope_prefilter(df, cols, cells=4)
        a = sorted(tuple(r) for r in skyline(df, cols).collect())
        b = sorted(tuple(r) for r in skyline(filt, cols).collect())
        assert a == b, (trial, dims, n)


def test_grid_envelope_prefilter_degenerate_and_twin(spark):
    from flink_skyline_qos_spark.operators.variants import (
        grid_envelope_prefilter,
        grid_envelope_prefilter_sql,
    )

    # constant grid dim → filter disabled, everything kept
    dup = spark.createDataFrame([(1.0, 2.0, float(i)) for i in range(5)],
                                "d0 double, d1 double, d2 double")
    assert grid_envelope_prefilter(dup, ["d0", "d1", "d2"]).count() == 5

    # DuckDB twin parity on a deterministic generated corpus
    import duckdb

    from flink_skyline_qos_spark.sources.generators import (
        generate_points_hash,
        generate_points_sql,
    )

    pts = generate_points_hash(spark, 3000, 3, dist="anti_correlated")
    srows = sorted(tuple(r) for r in
                   grid_envelope_prefilter(pts, ["d0", "d1", "d2"])
                   .collect())
    twin = grid_envelope_prefilter_sql(
        f"({generate_points_sql(3000, 3, dist='anti_correlated')})",
        ["d0", "d1", "d2"])
    drows = sorted(duckdb.sql(twin).fetchall())
    assert srows == drows
    assert 0 < len(srows) < 3000  # it actually filtered something


def test_grid_envelope_prefilter_dirty_rows_cannot_poison(spark):
    """ADVICE r10 / round 11: NULL or NaN in ANY gridded dim (or the
    last dim) must be excluded from the witness aggregate — a NaN grid
    coord floor-casts toward cell 0 where the row could become a
    witness that does not actually dominate, and an all-NaN cell would
    put a NaN in the envelope, silently dropping every row in
    strictly-greater cells.  Dirty rows themselves are KEPT by the
    filter (NULL cell → no envelope match), and the clean subset's
    result is unchanged by adding dirty rows."""
    import math

    from flink_skyline_qos_spark.operators.variants import (
        grid_envelope_prefilter,
    )

    nan = float("nan")
    clean = [(i, 1.0 + i % 7, 1.0 + (i * 3) % 11, 1.0 + i % 5)
             for i in range(60)]
    schema = "id long, d0 double, d1 double, d2 double"
    cols = ["d0", "d1", "d2"]
    base = spark.createDataFrame(clean, schema)

    # (a) NaN in a GRIDDED dim poisons the min/max stats → the guard
    # disables the filter entirely: keep-all (the SQL twin's isnan
    # degenerate branch does the same — the engines must agree)
    for bad in ((100, nan, 0.5, 0.5), (101, 0.5, nan, 0.5)):
        both = spark.createDataFrame(clean + [bad], schema)
        assert grid_envelope_prefilter(both, cols, cells=4).count() \
            == len(clean) + 1

    # (b) filter ACTIVE: a NaN-last row sitting ALONE in the strictly
    # smallest cell must not become an all-NaN cell min (that envelope
    # value would drop every row in greater cells), and NULL rows must
    # not crash the null-cell grid build; all three dirty rows are
    # themselves kept (no legitimate witness can compare against them)
    dirty = [
        (102, 0.5, 0.5, nan),    # own smallest cell, NaN last dim
        (103, None, 0.5, 0.5),   # NULL grid dim → NULL cell id
        (104, 0.5, 0.5, None),   # NULL last dim
    ]
    both = spark.createDataFrame(clean + dirty, schema)
    out = grid_envelope_prefilter(both, cols, cells=4).collect()
    kept = {r["id"] for r in out}
    assert {102, 103, 104} <= kept
    # lossless for the clean rows: every clean row NOT strictly
    # dominated by another clean row must survive (the NaN cell would
    # have wiped ALL of them before the witness-hygiene fix)
    sky = {r["id"] for r in skyline(base, cols).collect()}
    assert sky <= kept
    # sanity: the NaN row really did come back as NaN, not coerced
    assert any(r["id"] == 102 and math.isnan(r["d2"]) for r in out)


def test_top_k_dominating(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, 2.0, 2.0), (3, 3.0, 3.0), (4, 0.0, 9.0)],
        "id long, d0 double, d1 double")
    out = top_k_dominating(df, ["d0", "d1"], k=2, id_cols=["id"]).collect()
    assert [(r["id"], r["dominated_count"]) for r in out] == [(1, 2), (2, 1)]


def test_k_dominant_reduces_to_skyline_at_full_k(spark, lineitem):
    df = lineitem.limit(2000).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    cols = ["l_extendedprice", "l_discount"]
    a = {tuple(r) for r in k_dominant_skyline(df, cols, k=2).collect()}
    b = {tuple(r) for r in skyline(df, cols).collect()}
    assert a == b


def test_k_dominant_known_answer(spark):
    """Constructed case with a provably non-empty k-dominant skyline."""
    df = spark.createDataFrame(
        [(1, 0.0, 0.0, 1.0),   # 2-dominates everyone, 2-dominated by nobody
         (2, 0.0, 1.0, 1.0),   # fully dominated by id=1
         (3, 1.0, 0.0, 1.0),   # fully dominated by id=1
         (4, 1.0, 1.0, 0.0)],  # full-skyline member, but 2-dominated by id=1
        "id long, d0 double, d1 double, d2 double")
    out = k_dominant_skyline(df, ["d0", "d1", "d2"], k=2).collect()
    assert [r["id"] for r in out] == [1]
    # ordinary skyline keeps 4 too → relaxation strictly shrinks, non-empty
    full = {r["id"] for r in skyline(df, ["d0", "d1", "d2"]).collect()}
    assert full == {1, 4}


def test_k_dominant_is_subset_and_smaller(spark, lineitem):
    df = lineitem.limit(2000).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice",
        "l_discount")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    full = {tuple(r) for r in skyline(df, cols).collect()}
    relaxed = {tuple(r) for r in k_dominant_skyline(df, cols, k=2).collect()}
    assert relaxed <= full
    assert len(relaxed) < len(full)


def test_bpe_token_count(spark):
    df = spark.createDataFrame(
        [("Hello, world! abc123 €",), ("",), ("   ",), ("a-b",)],
        "text string")
    got = [r[0] for r in
           df.select(bpe_token_count(F.col("text"))).collect()]
    # "Hello" "," "world" "!" "abc" "123" "€" = 7 ; "" = 0 ; blanks = 0 ;
    # "a" "-" "b" = 3
    assert got == [7, 0, 0, 3]


def test_top_k_dominating_prefilter_exact(spark):
    """Safe-by-default prune (VERDICT r3 #6): sampled k-skyband
    prefilter on vs off returns identical (point, count) answers."""
    from flink_skyline_qos_spark.sources.generators import (
        generate_points_hash,
    )

    pts = generate_points_hash(spark, 2_000, 3, dist="uniform")
    cols = ["d0", "d1", "d2"]
    on = top_k_dominating(pts, cols, k=5, id_cols=["id"]).collect()
    off = top_k_dominating(pts, cols, k=5, id_cols=["id"],
                           prefilter_sample=None).collect()
    assert [tuple(r) for r in on] == [tuple(r) for r in off]
    assert on[0]["dominated_count"] >= on[-1]["dominated_count"]


def test_top_k_dominating_1m_reduced_theta_join(spark):
    """At 1M rows the theta-join's left side must be the REDUCED
    candidate set (the unreduced n x n join is intractable), and the
    returned counts must be exact (verified by direct recount)."""
    from flink_skyline_qos_spark.functions.dominance import dominates
    from flink_skyline_qos_spark.sources.generators import generate_points

    pts = generate_points(spark, 1_000_000, 3, dist="uniform",
                          num_partitions=32).persist()
    try:
        n = pts.count()
        cols = ["d0", "d1", "d2"]
        out = top_k_dominating(pts, cols, k=10, id_cols=["id"])
        # the joined left side is the skyband-pruned frame, and it is
        # a tiny fraction of the input
        reduced = out.skyband_candidates.count()
        assert reduced < n // 100
        top = out.collect()
        assert len(top) == 10
        # exact recount of the winner's dominated set against the full 1M
        best = top[0]
        cond = dominates([F.lit(float(best[c])) for c in cols],
                         [F.col(c) for c in cols])
        assert pts.filter(cond).count() == best["dominated_count"]
        assert [r["dominated_count"] for r in top] == sorted(
            (r["dominated_count"] for r in top), reverse=True)
    finally:
        pts.unpersist()


def test_skycube_crafted_ties_kept_per_cuboid(spark):
    """Subset-sharing is unsound under ties — assert each cuboid keeps
    its own ties independently."""
    from flink_skyline_qos_spark.operators.variants import skycube

    pts = spark.createDataFrame(
        [(1, 0.0, 5.0), (2, 0.0, 1.0), (3, 2.0, 0.0)],
        "id long, x double, y double",
    )
    out = {}
    for r in skycube(pts, ["x", "y"]).collect():
        out.setdefault(r.subspace, set()).add(r.id)
    # x alone: ids 1,2 tie at min x; y alone: id 3; full space: 2,3
    # (1 is dominated by 2 in (x,y) but STILL in the x cuboid)
    assert out == {"x": {1, 2}, "y": {3}, "x,y": {2, 3}}


def test_skycube_full_space_cuboid_equals_skyline(spark, points_2d):
    from flink_skyline_qos_spark.operators.skyline import skyline
    from flink_skyline_qos_spark.operators.variants import skycube

    cube = skycube(points_2d, ["d0", "d1"])
    full = {r.id for r in
            cube.filter(cube.subspace == "d0,d1").collect()}
    sky = {r.id for r in skyline(points_2d, ["d0", "d1"]).collect()}
    assert full == sky


def test_skycube_duckdb_parity(spark, sf_dir):
    import duckdb

    from flink_skyline_qos_spark.operators.variants import (
        skycube,
        skycube_sql,
    )
    from flink_skyline_qos_spark.sources.tables import load_table

    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM '{sf_dir}/part.parquet'")
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_size", "p_retailprice")
    cols = ["p_size", "p_retailprice"]
    sp = sorted(map(tuple, skycube(part, cols).collect()))
    dk = sorted(map(tuple, con.sql(skycube_sql(
        "(SELECT p_partkey, p_size, p_retailprice FROM part)",
        cols)).fetchall()))
    assert sp == dk


def test_dynamic_skyline_crafted(spark):
    """Dynamic dominance is w.r.t. |p - q|: a point ON the query point
    dominates everything else strictly farther in every dim."""
    from flink_skyline_qos_spark.operators.variants import dynamic_skyline

    pts = spark.createDataFrame(
        [(1, 10.0, 10.0), (2, 12.0, 12.0), (3, 8.0, 12.0),
         (4, 30.0, 30.0)],
        "id long, x double, y double",
    )
    got = {r.id for r in
           dynamic_skyline(pts, ["x", "y"], [10.0, 10.0]).collect()}
    # |p1-q| = (0,0) dominates (2,2), (2,2), (20,20) -> only p1 survives
    assert got == {1}
    # move the target: p2 is exactly on it now
    got = {r.id for r in
           dynamic_skyline(pts, ["x", "y"], [12.0, 12.0]).collect()}
    assert got == {2}


def test_dynamic_skyline_zero_point_is_plain_skyline(spark, points_2d):
    """q = origin over non-negative dims reduces to the ordinary
    skyline."""
    from flink_skyline_qos_spark.operators.skyline import skyline
    from flink_skyline_qos_spark.operators.variants import dynamic_skyline

    dyn = {r.id for r in
           dynamic_skyline(points_2d, ["d0", "d1"], [0.0, 0.0]).collect()}
    sky = {r.id for r in skyline(points_2d, ["d0", "d1"]).collect()}
    assert dyn == sky


def test_epsilon_skyline_crafted(spark):
    from flink_skyline_qos_spark.operators.variants import epsilon_skyline

    pts = spark.createDataFrame(
        [(0.0, 10.0), (10.0, 0.0), (1.0, 9.5)],
        "x double, y double",
    )
    # plain skyline keeps all three (mutually non-dominated);
    # eps=2: (0,10) is eps-dominated by (1,9.5) (1<=0+2, 9.5<=10+2,
    # strict), and (1,9.5) by (0,10) (0<=3, 10<=11.5) -> both die;
    # (10,0) survives (others have y >= 9.5 > 0+2)
    got = {(r.x, r.y) for r in
           epsilon_skyline(pts, ["x", "y"], 2.0).collect()}
    assert got == {(10.0, 0.0)}


def test_epsilon_zero_is_plain_skyline(spark, points_2d):
    from flink_skyline_qos_spark.operators.skyline import skyline
    from flink_skyline_qos_spark.operators.variants import epsilon_skyline

    pts = points_2d.select("d0", "d1").distinct()
    e0 = sorted(map(tuple, epsilon_skyline(pts, ["d0", "d1"], 0.0)
                    .collect()))
    sky = sorted(map(tuple, skyline(pts, ["d0", "d1"]).collect()))
    assert e0 == sky


def test_epsilon_skyline_rejects_bad_eps(spark, points_2d):
    import pytest as _pt

    from flink_skyline_qos_spark.operators.variants import epsilon_skyline

    with _pt.raises(ValueError):
        epsilon_skyline(points_2d, ["d0", "d1"], -1.0)
    with _pt.raises(ValueError):
        epsilon_skyline(points_2d, ["d0", "d1"], [1.0])


def test_thick_skyline_superset_and_zero_eps(spark, points_2d):
    from flink_skyline_qos_spark.operators.skyline import skyline
    from flink_skyline_qos_spark.operators.variants import thick_skyline

    pts = points_2d
    sky = {r.id for r in skyline(pts, ["d0", "d1"]).collect()}
    thick = {r.id for r in
             thick_skyline(pts, ["d0", "d1"], [50.0, 50.0]).collect()}
    assert sky <= thick
    assert len(thick) >= len(sky)
    zero = {r.id for r in
            thick_skyline(pts, ["d0", "d1"], 0.0).collect()}
    assert zero == sky


def test_thick_skyline_crafted(spark):
    from flink_skyline_qos_spark.operators.variants import thick_skyline

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 1.0, 1.0), (3, 5.0, 5.0)],
        "id long, x double, y double",
    )
    # eps=2: p2 is within margin of p1 (1 > 0+... 0 <= 1-2 is false)
    # -> survives; p3 is margin-dominated by p1 (0 <= 5-2, strict)
    got = {r.id for r in
           thick_skyline(pts, ["x", "y"], 2.0).collect()}
    assert got == {1, 2}


def test_variants_match_bruteforce_property(spark):
    """k_skyband, epsilon_skyline, thick_skyline vs pure-Python brute
    force over random small point sets (hypothesis)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from flink_skyline_qos_spark.operators.variants import (
        epsilon_skyline,
        k_skyband,
        thick_skyline,
    )

    def dom(a, b):
        return all(x <= y for x, y in zip(a, b)) and \
            any(x < y for x, y in zip(a, b))

    coord = st.integers(min_value=0, max_value=6).map(float)
    point = st.tuples(coord, coord)

    @settings(max_examples=12, deadline=None)
    @given(st.lists(point, min_size=1, max_size=14, unique=True),
           st.integers(min_value=1, max_value=3),
           st.sampled_from([0.0, 1.0, 2.5]))
    def run(pts, k, eps):
        rows = [(i, x, y) for i, (x, y) in enumerate(pts)]
        df = spark.createDataFrame(rows, "id long, x double, y double")
        cols = ["x", "y"]

        # k-skyband brute force: dominator count < k
        expect = {i for i, p in enumerate(pts)
                  if sum(dom(q, p) for q in pts) < k}
        got = {r.id for r in k_skyband(df, cols, k).collect()}
        assert got == expect, ("skyband", pts, k)

        # epsilon: eliminated if any OTHER-dims point is within eps
        def eps_dom(q, p):
            return q != p and \
                all(a <= b + eps for a, b in zip(q, p)) and \
                any(a < b + eps for a, b in zip(q, p))
        sky = {i for i, p in enumerate(pts)
               if not any(dom(q, p) for q in pts)}
        expect = {i for i in sky
                  if not any(eps_dom(q, pts[i]) for q in pts)}
        got = {r.id for r in epsilon_skyline(df, cols, eps).collect()}
        assert got == expect, ("epsilon", pts, eps)

        # thick: survives unless beaten by a clear eps margin
        def margin_dom(q, p):
            return all(a <= b - eps for a, b in zip(q, p)) and \
                any(a < b - eps for a, b in zip(q, p))
        expect = {i for i, p in enumerate(pts)
                  if not any(margin_dom(q, p) for q in pts)}
        got = {r.id for r in thick_skyline(df, cols, eps).collect()}
        assert got == expect, ("thick", pts, eps)

    run()


# --- reverse skyline -------------------------------------------------

def test_reverse_skyline_crafted_corners(spark):
    from flink_skyline_qos_spark.operators.variants import reverse_skyline
    # four isolated points around q, plus one disqualified by id=1:
    # |9-10|<=|0-9| and |1-0|<=|0-1| strictly in dim0 → 5 is out; the
    # corners' boxes contain no other point
    rows = [(1, 10.0, 0.0), (2, -10.0, 0.0), (3, 0.0, 10.0),
            (4, 0.0, -10.0), (5, 9.0, 1.0)]
    df = spark.createDataFrame(rows, "id bigint, x double, y double")
    got = sorted(r.id for r in reverse_skyline(
        df, ["x", "y"], [0.0, 0.0], id_col="id").collect())
    assert got == [1, 2, 3, 4]


def test_reverse_skyline_duplicates_disqualify_each_other(spark):
    from flink_skyline_qos_spark.operators.variants import reverse_skyline
    rows = [(1, 5.0, 5.0), (2, 5.0, 5.0), (3, 1.0, 1.0)]
    df = spark.createDataFrame(rows, "id bigint, x double, y double")
    got = sorted(r.id for r in reverse_skyline(
        df, ["x", "y"], [0.0, 0.0], id_col="id").collect())
    assert got == [3]  # the coincident pair kill each other


def test_reverse_skyline_matches_oracle_and_partitioning(spark, sf_dir):
    import duckdb
    from flink_skyline_qos_spark.operators.variants import (
        reverse_skyline, reverse_skyline_sql)
    part = spark.read.parquet(f"{sf_dir}/part.parquet") \
        .select("p_partkey", "p_size", "p_retailprice")
    # q chosen to yield a NON-EMPTY answer at sf0.001 AND sf0.01 —
    # empty==empty==empty would make every assertion below vacuous
    q = [905.0, 2.0]
    a = sorted(tuple(r) for r in reverse_skyline(
        part, ["p_retailprice", "p_size"], q,
        id_col="p_partkey").collect())
    assert len(a) > 0
    b = sorted(tuple(r) for r in reverse_skyline(
        part.repartition(7), ["p_retailprice", "p_size"], q,
        id_col="p_partkey", num_partitions=3).collect())
    assert a == b  # partitioning-invariant (local prune is sound)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT p_partkey, p_size, "
            f"p_retailprice FROM '{sf_dir}/part.parquet'")
    want = sorted(tuple(r) for r in con.sql(reverse_skyline_sql(
        "part", ["p_retailprice", "p_size"], q,
        id_col="p_partkey")).fetchall())
    assert a == want


def test_reverse_skyline_local_prune_actually_prunes(spark):
    from flink_skyline_qos_spark.operators.variants import (
        _rsl_prune_fn)
    import pandas as pd
    # a dense cluster far from q: everything kills everything except
    # isolated outliers — the batch kernel must shrink the batch
    rows = [(i, 100.0 + i * 0.001, 100.0) for i in range(50)]
    rows.append((99, 0.5, 0.5))
    pdf = pd.DataFrame(rows, columns=["id", "x", "y"])
    out = list(_rsl_prune_fn(["x", "y"], [0.0, 0.0])(iter([pdf])))[0]
    assert len(out) < len(pdf)
    assert 99 in set(out["id"])  # the isolated point survives locally


# --- representative skyline ------------------------------------------

def test_representative_skyline_crafted_greedy(spark):
    from flink_skyline_qos_spark.operators.variants import (
        representative_skyline)
    # skyline = {1,2,3} (4 is dominated by 2); seed ties on dim-sum 10
    # -> id 1; farthest from (0,10) is (10,0) [d2=200]; radius is then
    # point 2's min(50, 50)
    rows = [(1, 0.0, 10.0), (2, 5.0, 5.0), (3, 10.0, 0.0),
            (4, 8.0, 8.0)]
    df = spark.createDataFrame(rows, "id bigint, x double, y double")
    got = sorted(tuple(r) for r in representative_skyline(
        df, ["x", "y"], 2, id_col="id").collect())
    assert got == [(1, 1, 0.0, 10.0, 50.0), (2, 3, 10.0, 0.0, 50.0)]


def test_representative_skyline_k_beyond_frontier_repeats(spark):
    from flink_skyline_qos_spark.operators.variants import (
        representative_skyline)
    rows = [(1, 0.0, 10.0), (2, 5.0, 5.0), (3, 10.0, 0.0)]
    df = spark.createDataFrame(rows, "id bigint, x double, y double")
    out = {r.rep_rank: r for r in representative_skyline(
        df, ["x", "y"], 4, id_col="id").collect()}
    # ranks 1-3 cover the whole frontier; rank 4 repeats the seed via
    # the (dim-sum, id) tie-break and the cover radius collapses to 0
    assert [out[i].id for i in (1, 2, 3, 4)] == [1, 3, 2, 1]
    assert out[4].radius2 == 0.0


def test_representative_skyline_duckdb_parity(spark, sf_dir):
    import duckdb
    from flink_skyline_qos_spark.operators.variants import (
        representative_skyline, representative_skyline_sql)
    part = spark.read.parquet(f"{sf_dir}/part.parquet") \
        .select("p_partkey", "p_size", "p_retailprice")
    a = sorted(tuple(r) for r in representative_skyline(
        part, ["p_retailprice", "p_size"], 3,
        id_col="p_partkey").collect())
    assert len(a) == 3
    con = duckdb.connect()
    con.sql(f"CREATE VIEW part AS SELECT * FROM '{sf_dir}/part.parquet'")
    want = sorted(tuple(r) for r in con.sql(representative_skyline_sql(
        "(SELECT p_partkey, p_size, p_retailprice FROM part)",
        ["p_retailprice", "p_size"], 3,
        id_col="p_partkey")).fetchall())
    assert a == want


def test_representative_skyline_matches_bruteforce_greedy(spark):
    """Exact agreement with an independent pure-Python implementation
    of the same greedy (seed = min (dim-sum, id); next = farthest
    squared distance, ties by (dim-sum, id)) across seeded random
    datasets — catches any divergence in seeding, tie-breaks, or the
    radius aggregate that the crafted cases might miss."""
    import random

    from flink_skyline_qos_spark.operators.variants import (
        representative_skyline)

    for seed in range(6):
        rng = random.Random(seed)
        pts = [(i, float(rng.randint(0, 12)), float(rng.randint(0, 12)))
               for i in range(30)]
        # brute-force skyline (strict dominance, minimization)
        sky = [p for p in pts
               if not any(q[1] <= p[1] and q[2] <= p[2]
                          and (q[1] < p[1] or q[2] < p[2])
                          for q in pts)]

        def d2(a, b):
            return (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2

        k = 3
        centers = [min(sky, key=lambda p: (p[1] + p[2], p[0]))]
        while len(centers) < k:
            centers.append(max(
                sky, key=lambda p: (min(d2(p, c) for c in centers),
                                    -(p[1] + p[2]), -p[0])))
        radius2 = round(max(min(d2(p, c) for c in centers)
                            for p in sky), 6)
        want = sorted((i + 1, c[0], c[1], c[2], radius2)
                      for i, c in enumerate(centers))

        df = spark.createDataFrame(pts, "id bigint, x double, y double")
        got = sorted(tuple(r) for r in representative_skyline(
            df, ["x", "y"], k, id_col="id").collect())
        assert got == want, f"seed={seed}: {got} != {want}"
