"""Vectorized NumPy skyline kernels (the BNL replacement).

The reference computes local/global skylines with a row-at-a-time
Block-Nested-Loop (`/root/reference/java/org.main/FlinkSkyline.java:407-444`,
`:546-568`).  Here the same set semantics are computed with
block-vectorized NumPy inside Arrow-batched pandas UDFs.

Key algorithmic fact (minimization): if sum(a) > sum(b) then a cannot
dominate b — a dominator is ≤ in every dim, so its dim-sum is strictly
smaller.  Sorting candidates by dim-sum therefore makes the scan
*monotone*: accepted points are never evicted later, giving a single
forward pass instead of BNL's evict-and-rescan loop.

All comparisons are chunked so peak memory is O(chunk² · d) regardless
of input size.
"""

from __future__ import annotations

import numpy as np

# Chunk sizes tuned for L2/L3 residency; semantics are chunk-invariant.
_B_CHUNK = 2048   # candidate block
_A_CHUNK = 8192   # skyline slab compared against


def dominated_by_any(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Boolean mask over rows of `b`: is b[j] strictly dominated by some a[i].

    Strict Pareto dominance, minimization; ties never dominate.
    """
    nb = b.shape[0]
    out = np.zeros(nb, dtype=bool)
    if a.shape[0] == 0 or nb == 0:
        return out
    d = a.shape[1]
    for s in range(0, nb, _B_CHUNK):
        bc = b[s : s + _B_CHUNK]
        dom = np.zeros(bc.shape[0], dtype=bool)
        for t in range(0, a.shape[0], _A_CHUNK):
            ac = a[t : t + _A_CHUNK]
            le = np.ones((ac.shape[0], bc.shape[0]), dtype=bool)
            lt = np.zeros((ac.shape[0], bc.shape[0]), dtype=bool)
            for k in range(d):
                av = ac[:, k][:, None]
                bv = bc[None, :, k]
                le &= av <= bv
                lt |= av < bv
            dom |= (le & lt).any(axis=0)
            if dom.all():
                break
        out[s : s + _B_CHUNK] = dom
    return out


def _skyline_mask_2d(values: np.ndarray) -> np.ndarray:
    """Exact 2-D skyline in O(n log n): sort by (d0, d1), one scan.

    After sorting, p is dominated iff some strictly-smaller-d0 point has
    d1 ≤ p.d1, or a same-d0 point has d1 < p.d1.  So p survives iff it
    holds its d0-group's min d1 AND that min beats (strictly) the
    running min over all earlier groups.  Duplicate points all survive
    (ties never dominate), matching the generic kernel.
    """
    n = values.shape[0]
    idx = np.lexsort((values[:, 1], values[:, 0]))
    d0 = values[idx, 0]
    d1 = values[idx, 1]
    new_grp = np.empty(n, dtype=bool)
    new_grp[0] = True
    np.not_equal(d0[1:], d0[:-1], out=new_grp[1:])
    gid = np.cumsum(new_grp) - 1
    gmin = d1[new_grp]  # min d1 per group (d1-sorted within group)
    prefix_before = np.concatenate(
        ([np.inf], np.minimum.accumulate(gmin)[:-1]))[gid]
    keep_sorted = (d1 == gmin[gid]) & (d1 < prefix_before)
    out = np.zeros(n, dtype=bool)
    out[idx] = keep_sorted
    return out


def _dominated_sorted(a: np.ndarray, a_sums: np.ndarray,
                      b: np.ndarray, b_sums: np.ndarray) -> np.ndarray:
    """Mask over rows of `b`: dominated by some row of `a`, EXPLOITING
    sums: a dominates b ⟹ sum(a) < sum(b) exactly (all-≤ with one-<
    strictly shrinks the dim-sum).  So the d `lt` matrices of the
    generic test collapse into ONE sum comparison — (d+1) matrix ops
    instead of (2d+1).

    FP soundness: rounded float sums of a dominating pair can collide
    (difference below ulp).  fp addition is monotone, so le_all ⇒
    fl_sum(a) ≤ fl_sum(b); the ambiguous le_all ∧ sum-equal pairs (true
    duplicates, plus the pathological near-dup case) get the exact
    any-< check — a branch that almost never fires on real data.
    """
    nb = b.shape[0]
    out = np.zeros(nb, dtype=bool)
    if a.shape[0] == 0 or nb == 0:
        return out
    d = a.shape[1]
    a_sorted = bool(a_sums.size) and bool((a_sums[1:] >= a_sums[:-1]).all())
    for s in range(0, nb, _B_CHUNK):
        bc = b[s : s + _B_CHUNK]
        bs = b_sums[s : s + _B_CHUNK]
        bs_max = bs.max()
        dom = np.zeros(bc.shape[0], dtype=bool)
        for t in range(0, a.shape[0], _A_CHUNK):
            if a_sorted and a_sums[t] > bs_max:
                break  # all later slabs have larger sums — cannot dominate
            ac = a[t : t + _A_CHUNK]
            le_all = ac[:, 0][:, None] <= bc[None, :, 0]
            for k in range(1, d):
                le_all &= ac[:, k][:, None] <= bc[None, :, k]
            sum_lt = a_sums[t : t + _A_CHUNK][:, None] < bs[None, :]
            dom_bt = le_all & sum_lt
            amb = le_all & ~sum_lt
            if amb.any():
                lt_any = ac[:, 0][:, None] < bc[None, :, 0]
                for k in range(1, d):
                    lt_any |= ac[:, k][:, None] < bc[None, :, k]
                dom_bt |= amb & lt_any
            dom |= dom_bt.any(axis=0)
            if dom.all():
                break
        out[s : s + _B_CHUNK] = dom
    return out


def skyline_mask(values: np.ndarray) -> np.ndarray:
    """Boolean mask of skyline membership for an (n, d) float array.

    2-D inputs take the O(n log n) sort-scan path; higher dimensions use
    a sort-by-sum single forward pass, O(n·S) comparisons where S is the
    running skyline size, fully vectorized in blocks with the sum-trick
    (see :func:`_dominated_sorted`).
    """
    n = values.shape[0]
    if n == 0:
        return np.zeros(0, dtype=bool)
    if values.shape[1] == 2:
        return _skyline_mask_2d(values)
    sums = values.sum(axis=1)
    # Sort by (sum, d0, d1, ...): fp-rounded sums of a dominating pair can
    # collide (all-<= only guarantees fl_sum(a) <= fl_sum(b)), and with a
    # sum-only stable sort an equal-sum dominator could land in a LATER
    # block than its victim — which, once accepted, is never re-checked.
    # Lexicographic tie-break closes this: a dominator is all-<= and != its
    # victim, hence strictly lexicographically smaller, so dominators always
    # sort strictly earlier and accepted points are never evicted.
    order = np.lexsort(
        tuple(values[:, k] for k in reversed(range(values.shape[1]))) + (sums,))
    sv = values[order]
    ssums = sums[order]
    keep_sorted = np.zeros(n, dtype=bool)
    sky = np.empty((0, values.shape[1]), dtype=values.dtype)
    sky_sums = np.empty(0, dtype=sums.dtype)
    for s in range(0, n, _B_CHUNK):
        blk = sv[s : s + _B_CHUNK]
        bsums = ssums[s : s + _B_CHUNK]
        dom = _dominated_sorted(sky, sky_sums, blk, bsums)
        # Within-block: dominators sort strictly earlier (smaller sum), and
        # dominance is transitive, so only block survivors can dominate.
        idx = np.flatnonzero(~dom)
        cand = blk[idx]
        if idx.size > 1:
            sub_dom = _dominated_sorted(cand, bsums[idx], cand, bsums[idx])
            idx = idx[~sub_dom]
            cand = blk[idx]
        keep_sorted[s + idx] = True
        sky = np.concatenate([sky, cand], axis=0)
        sky_sums = np.concatenate([sky_sums, ssums[s : s + _B_CHUNK][idx]])
    out = np.zeros(n, dtype=bool)
    out[order] = keep_sorted
    return out


def merge_skylines(old: np.ndarray, new: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Merge two sets that are each already skylines.

    Returns (old_keep_mask, new_keep_mask) such that the union of the kept
    rows is the skyline of old ∪ new.  Matches the reference's global BNL
    merge semantics (FlinkSkyline.java:546-568) including tie survival.
    """
    if old.shape[0] == 0:
        return np.zeros(0, dtype=bool), np.ones(new.shape[0], dtype=bool)
    if new.shape[0] == 0:
        return np.ones(old.shape[0], dtype=bool), np.zeros(0, dtype=bool)
    if old.shape[1] == 2:
        mask = _skyline_mask_2d(np.concatenate([old, new], axis=0))
        return mask[: old.shape[0]], mask[old.shape[0]:]
    new_keep = ~dominated_by_any(old, new)
    # Transitivity: a new point dominated by an old one can't evict anything
    # the old set didn't already evict — only surviving new points matter.
    old_keep = ~dominated_by_any(new[new_keep], old)
    return old_keep, new_keep
