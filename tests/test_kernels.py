"""Property tests for the NumPy skyline kernels against a brute-force oracle."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from flink_skyline_qos_spark.operators.kernels import (
    dominated_by_any,
    merge_skylines,
    skyline_mask,
)


def brute_skyline_mask(v: np.ndarray) -> np.ndarray:
    n = len(v)
    keep = np.ones(n, dtype=bool)
    for i in range(n):
        for j in range(n):
            if i == j:
                continue
            if (v[j] <= v[i]).all() and (v[j] < v[i]).any():
                keep[i] = False
                break
    return keep


def _arr(draw, d):
    n = draw(st.integers(0, 60))
    vals = draw(
        st.lists(
            st.lists(st.integers(0, 8), min_size=d, max_size=d),
            min_size=n, max_size=n,
        )
    )
    return np.array(vals, dtype=float).reshape(n, d)


@st.composite
def point_arrays(draw):
    return _arr(draw, draw(st.integers(1, 4)))


@st.composite
def point_array_pairs(draw):
    d = draw(st.integers(1, 4))
    return _arr(draw, d), _arr(draw, d)


@settings(max_examples=200, deadline=None)
@given(point_arrays())
def test_skyline_mask_matches_bruteforce(v):
    assert (skyline_mask(v) == brute_skyline_mask(v)).all()


@settings(max_examples=100, deadline=None)
@given(point_arrays())
def test_skyline_idempotent(v):
    m = skyline_mask(v)
    sky = v[m]
    assert skyline_mask(sky).all()


@settings(max_examples=100, deadline=None)
@given(point_arrays(), st.integers(1, 5))
def test_partition_invariance(v, parts):
    # sky(S) == sky(union of sky(S_i)) for arbitrary partitioning
    full = v[skyline_mask(v)]
    pieces = [v[i::parts] for i in range(parts)]
    union = np.concatenate([p[skyline_mask(p)] for p in pieces]) if len(v) else v
    merged = union[skyline_mask(union)]
    assert sorted(map(tuple, full)) == sorted(map(tuple, merged))


@settings(max_examples=100, deadline=None)
@given(point_array_pairs())
def test_merge_skylines(pair):
    a, b = pair
    sa = a[skyline_mask(a)]
    sb = b[skyline_mask(b)]
    ok, nk = merge_skylines(sa, sb)
    merged = np.concatenate([sa[ok], sb[nk]])
    u = np.concatenate([sa, sb])
    expected = u[skyline_mask(u)]
    assert sorted(map(tuple, merged)) == sorted(map(tuple, expected))


def test_duplicates_all_survive():
    v = np.array([[1.0, 2.0]] * 5 + [[3.0, 1.0]] * 3)
    assert skyline_mask(v).sum() == 8


def test_single_dominator():
    v = np.vstack([np.zeros((1, 3)), np.random.RandomState(0).rand(100, 3) + 0.1])
    m = skyline_mask(v)
    assert m.sum() == 1 and m[0]


def test_dominated_by_any_strictness():
    a = np.array([[1.0, 1.0]])
    b = np.array([[1.0, 1.0], [1.0, 2.0], [0.5, 0.5]])
    assert dominated_by_any(a, b).tolist() == [False, True, False]


def test_equal_fp_sum_across_block_boundary():
    # Regression: a dominating pair whose float64 dim-sums round to the SAME
    # value (1e16 + 1 == 1e16 in fp), with the dominated copies filling the
    # first _B_CHUNK block and the dominator landing in the next block.  A
    # sum-only stable sort would accept the dominated points first and never
    # re-check them; the lexicographic (sum, d0, d1, ...) tie-break sorts the
    # dominator strictly earlier.
    from flink_skyline_qos_spark.operators.kernels import _B_CHUNK

    dominated = [1e16, 1.0, 0.0]
    dominator = [1e16, 0.0, 0.0]
    v = np.array([dominated] * _B_CHUNK + [dominator])
    assert np.float64(1e16) + 1.0 == np.float64(1e16)  # premise of the test
    m = skyline_mask(v)
    assert m.sum() == 1 and m[-1]


def test_empty():
    assert skyline_mask(np.zeros((0, 2))).shape == (0,)
    ok, nk = merge_skylines(np.zeros((0, 2)), np.zeros((0, 2)))
    assert len(ok) == 0 and len(nk) == 0


@st.composite
def unique_3d_arrays(draw):
    n = draw(st.integers(0, 60))
    vals = draw(
        st.lists(
            st.lists(st.integers(0, 8), min_size=3, max_size=3),
            min_size=n, max_size=n,
        )
    )
    v = np.array(vals, dtype=float).reshape(n, 3)
    return np.unique(v, axis=0) if n else v


@settings(max_examples=200, deadline=None)
@given(unique_3d_arrays())
def test_sweep_mask_3d_matches_bruteforce(v):
    from flink_skyline_qos_spark.operators.kernels import sweep_mask_3d

    assert (sweep_mask_3d(v) == brute_skyline_mask(v)).all()


def test_sweep_mask_3d_crosses_block_boundary():
    """A dominator in block 0 must kill victims in later blocks via the
    staircase (block size is 8192 — build 3 blocks' worth)."""
    from flink_skyline_qos_spark.operators.kernels import sweep_mask_3d

    n = 20_000
    rng = np.random.RandomState(3)
    pts = rng.randint(1, 1000, size=(n, 3)).astype(float)
    pts[0] = [0.0, 0.0, 0.0]          # dominates everything else
    uniq = np.unique(pts, axis=0)
    m = sweep_mask_3d(uniq)
    assert m.sum() == 1
    assert (uniq[m] == 0.0).all()


def test_sweep_mask_3d_ties_on_swept_dim():
    """Points equal in d0 must still dominate within the plane (the
    staircase test covers the q.d0 == p.d0 case after dedup)."""
    from flink_skyline_qos_spark.operators.kernels import sweep_mask_3d

    v = np.array([[5., 1., 1.], [5., 1., 2.], [5., 2., 1.], [5., 2., 2.],
                  [5., 0., 9.]])
    m = sweep_mask_3d(v)
    assert m.tolist() == [True, False, False, False, True]


def test_sweep_mask_3d_rejects_other_dims():
    from flink_skyline_qos_spark.operators.kernels import sweep_mask_3d

    with pytest.raises(ValueError):
        sweep_mask_3d(np.zeros((2, 2)))


def test_sweep_mask_3d_keeps_inf_coordinates():
    """+inf in the staircase dim must not vanish behind the inf
    sentinel: [1, 5, inf] is undominated here (everything else has a
    larger d1) and must survive."""
    from flink_skyline_qos_spark.operators.kernels import sweep_mask_3d

    rng = np.random.RandomState(5)
    bulk = rng.randint(10, 1000, size=(9000, 3)).astype(float)
    pts = np.vstack([bulk, [[1.0, 5.0, np.inf]]])
    uniq = np.unique(pts, axis=0)
    m = sweep_mask_3d(uniq)
    assert m[np.isinf(uniq[:, 2])].all()
    assert (m == brute_skyline_mask(uniq)).all()


def test_skyline_mask_2d_keeps_inf_in_first_group():
    """[0, inf] is undominated ([1, 0] has larger d0) — the first
    d0-group must not compare against the inf seed."""
    v = np.array([[0.0, np.inf], [1.0, 0.0]])
    assert skyline_mask(v).tolist() == [True, True]
    v2 = np.array([[0.0, np.inf], [0.5, np.inf], [1.0, 0.0]])
    # [0.5, inf] IS dominated (by [0, inf]: smaller d0, equal d1)
    assert skyline_mask(v2).tolist() == [True, False, True]


def test_skyline_mask_3d_sweep_dispatch_above_threshold():
    """skyline_mask dispatches 3-D inputs >= _SWEEP_3D_MIN rows to the
    plane-sweep over deduped vectors (round 8); the dispatch must agree
    with the forward scan exactly — including duplicate rows (which the
    sweep path handles via the unique-inverse mapping) and anti-
    correlated structure (the regime the dispatch exists for)."""
    from flink_skyline_qos_spark.operators.kernels import (
        _SWEEP_3D_MIN,
        _skyline_mask_forward,
        skyline_mask,
    )

    rng = np.random.RandomState(11)
    n = max(3 * _SWEEP_3D_MIN, 12_288)
    base = rng.randint(0, 400, size=(n, 3)).astype(float)
    # anti-correlated-ish: push points toward the anti-diagonal plane
    base[:, 2] = np.clip(900.0 - base[:, 0] - base[:, 1]
                         + rng.randint(-40, 40, size=n), 0, None)
    # plant exact duplicates, including duplicates of frontier points
    dup_idx = rng.choice(n, size=n // 4, replace=False)
    v = np.vstack([base, base[dup_idx]])
    assert len(v) >= _SWEEP_3D_MIN  # the sweep path engages
    got = skyline_mask(v)
    want = _skyline_mask_forward(v)
    assert (got == want).all()
    # duplicates share their representative's verdict
    assert (got[dup_idx] == got[n:]).all()


def test_sweep_block_3d_divide_and_conquer_parity():
    """_sweep_block_3d (round 13: the D&C that replaced the O(b·s)
    forward scan inside sweep_mask_3d) must agree with the forward
    scan on lex-sorted unique blocks ACROSS the recursion base case
    (256) and on a dense anti-correlated block where most rows
    survive — the regime that motivated it."""
    from flink_skyline_qos_spark.operators.kernels import (
        _skyline_mask_forward,
        _sweep_block_3d,
    )

    rng = np.random.default_rng(13)
    for n in (1, 2, 255, 256, 257, 1023, 5000):
        v = np.unique(rng.integers(0, 50, size=(n, 3)).astype(float),
                      axis=0)
        v = v[np.lexsort((v[:, 2], v[:, 1], v[:, 0]))]
        assert (_sweep_block_3d(v) == _skyline_mask_forward(v)).all(), n
    # anti-correlated shell: x+y+z ~ const, high survivor fraction
    x = rng.random((8192, 3))
    x = x / x.sum(axis=1, keepdims=True)
    x = np.unique(x, axis=0)
    x = x[np.lexsort((x[:, 2], x[:, 1], x[:, 0]))]
    m = _sweep_block_3d(x)
    assert (m == _skyline_mask_forward(x)).all()
    assert m.sum() > len(x) // 2  # the dense regime is actually hit
