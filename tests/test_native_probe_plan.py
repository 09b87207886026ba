"""Native group-collapse (native/probe_plan.cc) vs the numpy `_group_work`.

The C++ single-pass collapse must emit the exact same multiset of groups as
the numpy reference path for planner-ordered inputs, and decline (-> None)
on inputs that violate its sortedness precondition so the caller falls back.
"""

import numpy as np
import pytest

from tantivy_tpu.native_probe import group_work_sorted, _load
from tantivy_tpu.ops import pallas_probe as pp


def _numpy_group_work(*args, **kw):
    """Run `_group_work`'s numpy body by disabling the native fast path."""
    import tantivy_tpu.native_probe as nprobe

    orig = nprobe.group_work_sorted
    nprobe.group_work_sorted = lambda *a, **k: None
    try:
        return pp._group_work(*args, **kw)
    finally:
        nprobe.group_work_sorted = orig


def _canon(out):
    """Order-independent canonical form: rows sorted by full content."""
    base, mask, prow, cl, qid, seg, jlo, pk, eff = out
    n = len(base)
    rows = []
    for i in range(n):
        rows.append((
            int(base[i]), int(mask[i]), int(prow[i]), int(cl[i]),
            int(qid[i]), int(seg[i]), tuple(int(x) for x in jlo[i]),
            tuple(int(x) for x in np.asarray(pk[i]).reshape(-1)),
            int(eff[i]),
        ))
    return sorted(rows)


def _random_work(rng, n, T, dup_frac=0.1):
    """Planner-shaped work: sorted (prow, clause, block) keys, random
    windows, a mix of groupable and slice singletons."""
    prow = np.sort(rng.integers(0, 6, n)).astype(np.int32)
    clause = np.zeros(n, dtype=np.int32)
    blocks = np.zeros(n, dtype=np.int64)
    # within each prow, ascending (clause, block)
    for p in np.unique(prow):
        sel = prow == p
        m = int(sel.sum())
        cl = np.sort(rng.integers(0, T, m)).astype(np.int32)
        b = np.zeros(m, dtype=np.int64)
        for c in np.unique(cl):
            s2 = cl == c
            k = int(s2.sum())
            b[s2] = np.sort(rng.integers(0, 400, k))
        clause[sel] = cl
        blocks[sel] = b
    qid = (prow * 3 + 1).astype(np.int32)
    seg = (prow % 2).astype(np.int32)
    jlo = rng.integers(-1, 600, (n, T)).astype(np.int32)
    jlo = np.where(rng.random((n, T)) < 0.15, -1, np.maximum(jlo, -1))
    jlo = np.where(jlo >= 0, (jlo // 8) * 8, jlo)
    wid = np.where(jlo >= 0, rng.integers(1, 48, (n, T)), 0).astype(np.int32)
    frc = np.where(jlo >= 0, rng.integers(0, 8, (n, T)), 0).astype(np.int32)
    frc = np.minimum(frc, np.maximum(wid - 1, 0)).astype(np.int32)
    groupable = (rng.random(n) > dup_frac)
    return blocks, prow, clause, qid, seg, jlo, wid, frc, groupable


@pytest.mark.skipif(_load() is None, reason="native lib unavailable")
@pytest.mark.parametrize("seed", range(8))
def test_native_matches_numpy(seed):
    rng = np.random.default_rng(seed)
    T = int(rng.integers(1, 9))
    n = int(rng.integers(1, 300))
    kw_max = int(rng.choice([32, 64, 96]))
    work = _random_work(rng, n, T)
    native = group_work_sorted(*work, kw_max)
    assert native is not None, "sorted input must take the native path"
    ref = _numpy_group_work(*work, kw_max)
    assert _canon(native) == _canon(ref)


@pytest.mark.skipif(_load() is None, reason="native lib unavailable")
def test_native_declines_unsorted():
    rng = np.random.default_rng(0)
    T = 4
    work = list(_random_work(rng, 50, T, dup_frac=0.0))
    # force a key inversion among groupable items
    blocks = work[0].copy()
    blocks[10], blocks[40] = blocks[40] + 100, blocks[10]
    prow = work[1].copy()
    prow[:] = 0
    work[0], work[1] = blocks, prow
    work[2][:] = 0  # one clause so block order is the key
    out = group_work_sorted(*work, 64)
    ref = _numpy_group_work(*work, 64)
    if out is None:
        # declined -> caller falls back; nothing more to check
        return
    assert _canon(out) == _canon(ref)


@pytest.mark.skipif(_load() is None, reason="native lib unavailable")
def test_native_wide_demotion():
    """A unioned window wider than kw_max demotes to singleton groups."""
    rng = np.random.default_rng(3)
    T = 2
    n = 8
    blocks = np.arange(n, dtype=np.int64)  # one 8-run
    prow = np.zeros(n, dtype=np.int32)
    clause = np.zeros(n, dtype=np.int32)
    qid = np.zeros(n, dtype=np.int32)
    seg = np.zeros(n, dtype=np.int32)
    jlo = ((np.arange(n) * 64)[:, None] * np.ones((1, T))).astype(np.int32)
    wid = np.full((n, T), 16, dtype=np.int32)
    frc = np.zeros((n, T), dtype=np.int32)
    groupable = np.ones(n, dtype=bool)
    args = (blocks, prow, clause, qid, seg, jlo, wid, frc, groupable)
    native = group_work_sorted(*args, 32)
    ref = _numpy_group_work(*args, 32)
    assert native is not None
    assert len(native[0]) == n  # all demoted
    assert _canon(native) == _canon(ref)
