"""Host-side Block-WAND planning utilities.

Block-max pruning decisions are tiny dense-array computations over per-block
skip metadata — classic host planning work. The score upper bound used for a
candidate block B of clause c is

    UB(B, c) = w_c * bfac[B] + sum_{c' != c, positive} w_c' * ovmax(c', range(B))

where `bfac[b] = tf_b / (tf_b + cache[fnid_b])` is the query-independent
block-max BM25 tf-factor (the stored `(fieldnorm_id, tf)` skip pair of
reference `skip.rs:175-184`) and `ovmax(c', [lo, hi])` is the max bfac over
c's blocks whose doc range intersects [lo, hi] — the same bound reference
`block_wand_union.rs:148-216` computes incrementally per pivot, evaluated
here for all blocks at once.
"""

from __future__ import annotations

import numpy as np


class RangeMax:
    """Sparse table for vectorized range-max queries over an f32 array.

    O(n log n) build, O(1) per query; `query` is fully vectorized.
    """

    def __init__(self, vals: np.ndarray):
        vals = np.ascontiguousarray(vals, dtype=np.float32)
        self.n = len(vals)
        tables = [vals]
        j = 1
        while (1 << j) <= self.n:
            prev = tables[-1]
            half = 1 << (j - 1)
            m = self.n - (1 << j) + 1
            tables.append(np.maximum(prev[:m], prev[half : half + m]))
            j += 1
        self.tables = tables

    def query(self, i0: np.ndarray, i1: np.ndarray) -> np.ndarray:
        """max(vals[i0[r]:i1[r]]) per row; empty ranges yield 0.0."""
        i0 = np.asarray(i0, dtype=np.int64)
        i1 = np.minimum(np.asarray(i1, dtype=np.int64), self.n)
        length = i1 - i0
        out = np.zeros(len(i0), dtype=np.float32)
        nonempty = length > 0
        if not nonempty.any():
            return out
        lev = np.zeros(len(i0), dtype=np.int64)
        # exact for integer lengths (f64 mantissa >> any real block count)
        lev[nonempty] = np.floor(np.log2(length[nonempty])).astype(np.int64)
        for j in np.unique(lev[nonempty]):
            sel = nonempty & (lev == j)
            t = self.tables[j]
            out[sel] = np.maximum(t[i0[sel]], t[i1[sel] - (1 << j)])
        return out


class FieldWand:
    """Per-(segment, field) cached block-max planning state."""

    def __init__(self, dfp, avg_fieldnorm: np.float32):
        from ..query.bm25 import compute_tf_cache

        self.dfp = dfp
        self.cache = compute_tf_cache(np.float32(avg_fieldnorm))
        tf = dfp.blk_max_tf.astype(np.float32)
        self.bfac = (tf / (tf + self.cache[dfp.blk_max_fnid])).astype(np.float32)
        self.rmax = RangeMax(self.bfac)

    def clause_blocks_ub(
        self,
        start: int,
        n: int,
        weight: np.float32,
        others: list,
        self_pos: int = 0,
        return_detail: bool = False,
    ) -> tuple[np.ndarray, np.ndarray]:
        """For the clause region [start, start+n) of the block table, compute
        (block_ids, UB) with other-clause overlap bounds; blocks impossible
        under a MUST clause with no overlapping blocks are dropped.

        `others` = [(is_must, weight, start, n_blocks, pos)] for the query's
        other clauses present in this segment (weight 0.0 for MUST_NOT —
        they don't bound scores but their probe windows must still be
        sized); `pos`/`self_pos` are clause indices in the device kernel's
        summation order.

        **Exactness argument (replaces the former ±4e-6 ulp band):** the UB
        is accumulated per clause in the SAME index order and with the SAME
        f32 operations as the probe kernel's score loop
        (`probe_scorer.py`: `score += w_t * (tf/(tf+norm))`, t = 0..T-1;
        absent/non-positive clauses add literal 0.0, an exact identity on
        the non-negative partial sums). Each per-clause bound dominates the
        clause's true contribution (`bfac`/`ovmax` are maxima over the same
        f32 `tf/(tf+cache[fnid])` expression), and IEEE-754 rounding is
        monotone, so the running f32 UB dominates the running f32 score at
        every step: `ub >= score` holds *bit-exactly*, and a doc attaining
        every per-clause bound yields `ub == score` bit-for-bit. Hence
        `_phase2_keep` can prune on exact compares with no margin.

        Returns (block_ids, UB, widths): widths[i] is the widest other-clause
        block window overlapping block i — the probe kernel's per-work-item
        static window-size bucket is chosen from it (a block of a rare
        clause sees wide windows over a dense partner; a dense clause's
        blocks see ~1-3-block windows — bucketing per item keeps the common
        case cheap). Widths are measured from the 8-aligned-down window
        start (the kernel's DMA alignment), so `width <= kw` guarantees the
        kw-rung super-window covers the whole overlap.

        With `return_detail=True`, returns a dict additionally carrying the
        per-(block, other) aligned window starts (`jlo`), raw overlap bounds
        (`i0`/`i1`), and the per-clause-position f32 UB terms — what the
        fused planner needs to emit explicit kernel windows and to recompute
        per-slice UBs when a wide window is sliced.
        """
        dfp = self.dfp
        ids = np.arange(start, start + n, dtype=np.int64)
        lo = dfp.blk_base[ids].astype(np.uint64)
        hi = dfp.blk_last_doc[ids].astype(np.uint64)
        drop = np.zeros(n, dtype=bool)
        # per-(block, other-clause) overlap width — callers reduce with
        # .max(axis=1), or use per-clause widths for probe-skip decisions
        widths = np.zeros((n, len(others)), dtype=np.int64)
        jlo = np.zeros((n, len(others)), dtype=np.int64)
        i0s = np.zeros((n, len(others)), dtype=np.int64)
        i1s = np.zeros((n, len(others)), dtype=np.int64)
        terms: dict[int, np.ndarray] = {
            int(self_pos): (np.float32(weight) * self.bfac[ids]).astype(
                np.float32
            )
        }
        for oi, (is_must, w2, s2, n2, pos) in enumerate(others):
            blast = dfp.blk_last_doc[s2 : s2 + n2]
            bbase = dfp.blk_base[s2 : s2 + n2]
            i0 = s2 + np.searchsorted(blast, lo, side="left")
            i1 = s2 + np.searchsorted(bbase, hi, side="right")
            ov = self.rmax.query(i0, i1)
            if is_must:
                drop |= i1 <= i0
            terms[int(pos)] = (np.float32(w2) * ov).astype(np.float32)
            i0a = (i0 // 8) * 8
            jlo[:, oi] = i0a
            i0s[:, oi] = i0
            i1s[:, oi] = i1
            widths[:, oi] = i1 - i0a
        # accumulate in kernel clause order (see exactness argument above)
        ub = np.zeros(n, dtype=np.float32)
        for pos in sorted(terms):
            ub = (ub + terms[pos]).astype(np.float32)
        keep = ~drop
        if drop.any():
            ids, ub, widths = ids[keep], ub[keep], widths[keep]
        if return_detail:
            if drop.any():
                jlo, i0s, i1s = jlo[keep], i0s[keep], i1s[keep]
                terms = {p: t[keep] for p, t in terms.items()}
            return {
                "ids": ids, "ub": ub.astype(np.float32), "widths": widths,
                "jlo": jlo, "i0": i0s, "i1": i1s, "terms": terms,
            }
        return ids, ub.astype(np.float32), widths
