"""Batched + sharded search execution.

The batched executor amortizes TPU dispatch across thousands of concurrent
queries (the design center per BASELINE.json): query *planning* (termdict
lookups, stats, bucketing) happens on host, scoring + top-k on device,
cross-segment merge back on host — the same split as reference
`Executor::map` + `merge_fruits` (`core/searcher.rs:220-237`), with the device
taking the role of the rayon pool.

`shard.py` extends this across a `jax.sharding.Mesh` (segments sharded over
devices, per-device top-k, cross-device merge).

Host-side structure (everything here is numpy; the device only ever sees
fixed-tier launches):
* planning is BATCHED: every (query, clause, segment) upper-bound detail
  computes in one composite-key searchsorted sweep over the fused store
  (`wand.batched_clause_details`, `FusedStore.region_keys`) instead of a
  per-call loop;
* results collect as struct-of-arrays hit CHUNKS per query (score/seg/doc
  arrays); thresholds, dedup and final top-k run vectorized over whole
  columns (`_dedup_topk_chunks`) — no per-hit Python objects;
* every launch shape is data-independent (plan-row tiers, per-rung grid
  tiers, store row tiers), so fresh query batches hit only compiled
  programs and corpus growth recompiles nothing until a tier boundary.
"""

from __future__ import annotations

import numpy as np

from ..postings.format import TERMINATED as TERMINATED_U32
from ..query.bm25 import Bm25Weight
from ..searcher import DocAddress, Searcher
from ..utils.trace import debug_time

NEG_INF = np.float32(-np.inf)


#: phase-2 threshold-ratchet tuning (per-query units): ratchet when more
#: than _RATCHET_MIN_PER_Q * Q work items survive phase 1, shipping the
#: best-UB _RATCHET_TOP_PER_Q * Q items first (tests shrink these to force
#: the two-round path on tiny corpora)
_RATCHET_MIN_PER_Q = 16
_RATCHET_TOP_PER_Q = 8


def _k_eff_quant(v: int) -> int:
    """Quantize a per-row-top-k width to ONE of two ladder values (32, 128).
    The kernel `k` is a static arg; host finalize trims each query's
    chunk to the true k, and per-(launch, query) top-32 ⊇ top-k for any
    k whose dup-inflated width fits 32, so quantizing UP is exact. One
    ladder value per clause bucket = one compiled merge-tail shape
    regardless of the caller's k (the k=3 gate reuses the k=10 programs)."""
    return 32 if v <= 32 else 128


def _k_eff_tb(g, Tb: int, k: int) -> int:
    """Per-row-top-k width: always sized for the dup-capable worst case
    (up to Tb reporters per doc), then quantized (`_k_eff_quant`)."""
    return _k_eff_quant(min(k * Tb, 128))


#: fixed `num_queries` for fused launches. num_queries is a STATIC kernel
#: arg (it sizes the [Q, k] output and the padding sentinel); the planners
#: sub-batch every device batch to at most this many queries, so every
#: launch shares ONE compiled num_queries and expansion (phrase prefix,
#: dismax) can never mint a fresh shape. Padded output rows never receive
#: hits (no work item carries their qid) and cost only bytes in the tail.
_Q_FIXED = 256


def _q_tier(Q: int) -> int:
    assert Q <= _Q_FIXED, "device batch not sub-batched to _Q_FIXED"
    return _Q_FIXED


def _m1() -> int:
    """Phase-1 candidate blocks per (query, segment): more phase-1 work
    buys tighter thresholds and a smaller phase 2 (overridable for
    experiments via TANTIVY_TPU_M1)."""
    import os

    return int(os.environ.get("TANTIVY_TPU_M1", "4"))




def _dedup_hits(hits):
    """In-place: sort by (score desc, DocAddress asc) and drop later
    duplicates of the same DocAddress. Duplicates arise from the fused
    dual-report plan (a skipped-probe lane reports a partial score for a
    doc some full-probing lane also reports); sorting first means the kept
    occurrence carries the max — the exact full — score."""
    hits.sort(key=lambda x: (-float(x[0]), x[1]))
    seen = set()
    out = []
    for h in hits:
        if h[1] not in seen:
            seen.add(h[1])
            out.append(h)
    hits[:] = out


def _sortable_desc_np(v: np.ndarray) -> np.ndarray:
    """u32 key ascending in (f32 value DESCENDING) total order. `+0.0`
    first normalizes -0.0 to +0.0 so bit-keys agree with the host's
    numeric tie semantics (-0.0 == 0.0 ties break by DocAddress)."""
    v = np.ascontiguousarray(v + np.float32(0.0), dtype=np.float32)
    u = v.view(np.uint32)
    s = np.where(
        u & np.uint32(0x80000000), ~u, u | np.uint32(0x80000000)
    )
    return np.uint32(0xFFFFFFFF) - s


def _dedup_topk_chunks(hits: list, k: int):
    """Per-query hit CHUNKS [(scores f32, segs i32, docs u32), ...] ->
    one chunk sorted (score desc, DocAddress asc), first occurrence per
    address kept (= max score, the fused dual-report semantics), first k.
    The vectorized replacement for the tuple-based `_dedup_hits`."""
    if not hits:
        z = np.zeros(0, dtype=np.float32)
        return z, np.zeros(0, np.int32), np.zeros(0, np.uint32)
    if len(hits) == 1:
        v, s, d = hits[0]
    else:
        v = np.concatenate([h[0] for h in hits])
        s = np.concatenate([h[1] for h in hits])
        d = np.concatenate([h[2] for h in hits])
    order = np.lexsort((d, s, _sortable_desc_np(v)))
    v, s, d = v[order], s[order], d[order]
    addr = (s.astype(np.uint64) << np.uint64(32)) | d.astype(np.uint64)
    _, first = np.unique(addr, return_index=True)
    first.sort()
    sel = first[:k]
    return v[sel], s[sel], d[sel]


def _chunk_hits(hits: list, k: int):
    """Finalize per-query chunks to the public list[(score, DocAddress)]."""
    v, s, d = _dedup_topk_chunks(hits, k)
    return [
        (np.float32(v[i]), DocAddress(int(s[i]), int(d[i])))
        for i in range(len(v))
    ]


def _topk_thresholds(per_query, k):
    """(score, seg, doc) thresholds per query from the phase-1 results:
    the kth hit's score AND DocAddress. Blocks whose upper bound ties the
    score can only contribute if they may hold a smaller DocAddress —
    tie-plateaus (ubiquitous under Zipf tf distributions) prune to nearly
    nothing instead of surviving wholesale."""
    Q = len(per_query)
    th = np.full(Q, NEG_INF, dtype=np.float32)
    th_seg = np.full(Q, -1, dtype=np.int64)
    th_doc = np.zeros(Q, dtype=np.int64)
    for qi in range(Q):
        v, s, d = _dedup_topk_chunks(per_query[qi], k)
        per_query[qi] = [(v, s, d)]
        if len(v) == k:
            th[qi] = v[-1]
            th_seg[qi] = s[-1]
            th_doc[qi] = d[-1]
    return th, th_seg, th_doc


def _phase2_keep(ub, blk_base, seg_ord, th, th_seg, th_doc):
    """Phase-2 survivor mask for one query's blocks in one segment.

    Exact compares, no margin: `FieldWand.clause_blocks_ub` guarantees
    `ub >= score` bit-exactly in f32 (UB accumulated in the kernel's clause
    order — see its docstring). So:
      * ub <  th: every doc scores < th — prune.
      * ub == th: a doc can at best TIE the kth hit; it wins only with a
        smaller DocAddress, impossible when the whole block starts after the
        kth hit's address — prune iff later.
      * ub >  th: may hold a strictly better doc — keep.
    """
    if th == NEG_INF:
        return np.ones(len(ub), dtype=bool)
    if seg_ord > th_seg:
        later = np.ones(len(ub), dtype=bool)
    elif seg_ord == th_seg:
        later = blk_base.astype(np.int64) > th_doc
    else:
        later = np.zeros(len(ub), dtype=bool)
    return (ub > th) | ((ub == th) & ~later)


class DeviceSearchWarmer:
    """Warmer (reference `src/reader/warming.rs:14`) that pre-builds the
    device search state for each new searcher generation: the fused HBM
    slabs for `fields` on every segment (+ position store if phrases are
    expected), and — on the first generation — the compiled shape grid via
    `BatchExecutor.prewarm` (later generations reuse the persistent
    compilation cache, so re-warming shapes is free). The warmed executor
    is stashed on the searcher; fetch it with
    `BatchExecutor.for_searcher(searcher)` so the first post-commit query
    pays neither HBM uploads nor compiles. Combined with IndexReader's
    reader reuse, an incremental commit only uploads its new segments'
    slabs."""

    def __init__(self, fields: list, queries_hint: list | None = None,
                 k: int = 10, with_positions: bool = False,
                 mode: str = "dense"):
        self.fields = list(fields)
        self.queries_hint = queries_hint
        self.k = k
        self.with_positions = with_positions
        self.mode = mode
        self._shapes_warmed = False

    def warm(self, searcher) -> None:
        ex = BatchExecutor(searcher, mode=self.mode)
        for seg_ord in range(len(searcher.segment_readers())):
            for f in self.fields:
                ex._ensure_fused_slab(seg_ord, f)
        fused = ex._fused().ready()
        if self.with_positions and fused.slabs:
            fused.ensure_positions()
        if self.queries_hint and not self._shapes_warmed:
            ex.prewarm(self.queries_hint, k=self.k)
            self._shapes_warmed = True
        searcher._warm_executor = ex


class BatchExecutor:
    """Executes homogeneous batches of term queries on device."""

    @classmethod
    def for_searcher(cls, searcher: Searcher,
                     mode: str = "dense") -> "BatchExecutor":
        """The searcher's warmed executor if a DeviceSearchWarmer ran on
        this generation (HBM slabs + shapes already hot), else a fresh
        one."""
        ex = getattr(searcher, "_warm_executor", None)
        if ex is not None and ex.mode == mode:
            return ex
        return cls(searcher, mode=mode)

    def __init__(self, searcher: Searcher, mode: str = "dense"):
        import threading

        self.searcher = searcher
        self.mode = mode
        self._device_segments = [
            self._device_for(r) for r in searcher.segment_readers()
        ]
        self._field_stats: dict[str, object] = {}
        self._term_weight_cache: dict[tuple[str, bytes], tuple] = {}
        self._term_ord_cache: dict[tuple[int, str, bytes], int] = {}
        # serializes fused-store slab building: slab offsets are assigned
        # by append order, so concurrent pipelined batches must not
        # interleave ensure_slab calls (reads of a built store are free)
        self._fused_lock = threading.RLock()

    def _device_for(self, reader):
        from ..ops.device_index import DeviceSegment

        if reader._device is None or reader._device.mode != self.mode:
            reader._device = DeviceSegment(reader, self.mode)
        return reader._device

    def _term_weight(self, term) -> tuple:
        key = (term.field, term.value_bytes)
        cached = self._term_weight_cache.get(key)
        if cached is None:
            fs = self._field_stats.get(term.field)
            if fs is None:
                fs = self.searcher.field_statistics(term.field)
                self._field_stats[term.field] = fs
            df = self.searcher.doc_freq(term)
            bm25 = Bm25Weight.for_one_term(
                max(df, 1), fs.total_num_docs, fs.average_fieldnorm
            )
            cached = (bm25.weight, bm25.cache)
            self._term_weight_cache[key] = cached
        return cached

    def _flat_scorer(self, seg_ord: int, field: str):
        from ..ops.flat_scorer import FlatBatchScorer

        key = (seg_ord, field)
        fs = getattr(self, "_flat_scorers", None)
        if fs is None:
            fs = self._flat_scorers = {}
        sc = fs.get(key)
        if sc is None:
            dseg = self._device_segments[seg_ord]
            sc = FlatBatchScorer(dseg.field_postings(field), dseg.alive)
            fs[key] = sc
        return sc

    def _term_ord(self, seg_ord: int, reader, field: str, value_bytes: bytes) -> int:
        ckey = (seg_ord, field, value_bytes)
        o = self._term_ord_cache.get(ckey, -2)
        if o == -2:
            o_ = reader.inverted_index(field).term_ord(value_bytes)
            o = -1 if o_ is None else o_
            self._term_ord_cache[ckey] = o
        return o

    def search_term_batch(self, terms: list, k: int):
        """Batched term-query top-k with tensorized Block-WAND pruning.

        Phase 1 scores each query's best block-max blocks everywhere to set a
        per-query threshold; phase 2 scores only blocks whose block-max beats
        it. Exact modulo the reference's own block-max caveat. Returns
        list[list[(score, DocAddress)]]."""
        Q = len(terms)
        if Q == 0:
            return []

        weights_pad = np.zeros(Q + 1, dtype=np.float32)
        caches_pad = np.ones((Q + 1, 256), dtype=np.float32)
        for qi, term in enumerate(terms):
            w, c = self._term_weight(term)
            weights_pad[qi] = w
            caches_pad[qi] = c

        readers = self.searcher.segment_readers()
        # host planning: per (segment, query) block lists + bmax scores
        plans = []  # [(seg_ord, field, np blocks, np qids, rest_blocks, rest_bmax)]
        per_seg_rest: dict[int, list] = {}
        pending1 = []
        for seg_ord, reader in enumerate(readers):
            p1_blocks: list[np.ndarray] = []
            p1_qids: list[np.ndarray] = []
            rest = []  # (qi, blocks, bmax)
            by_field: dict[str, list[int]] = {}
            for qi, t in enumerate(terms):
                by_field.setdefault(t.field, []).append(qi)
            for field, qids in by_field.items():
                scorer = self._flat_scorer(seg_ord, field)
                for qi in qids:
                    o = self._term_ord(seg_ord, reader, field, terms[qi].value_bytes)
                    if o < 0:
                        continue
                    ids, bmax = scorer.block_max_scores(
                        o, weights_pad[qi], caches_pad[qi]
                    )
                    m1 = scorer.m1
                    if len(ids) <= m1:
                        p1_blocks.append(ids)
                        p1_qids.append(np.full(len(ids), qi, dtype=np.int32))
                    else:
                        top = np.argpartition(-bmax, m1 - 1)[:m1]
                        keep_mask = np.zeros(len(ids), dtype=bool)
                        keep_mask[top] = True
                        p1_blocks.append(ids[keep_mask])
                        p1_qids.append(np.full(m1, qi, dtype=np.int32))
                        rest.append((qi, field, ids[~keep_mask], bmax[~keep_mask]))
            per_seg_rest[seg_ord] = rest
            # one dispatch per field (block ids index per-field stores)
            per_field_work: dict[str, tuple[list, list]] = {}
            for blk, qd in zip(p1_blocks, p1_qids):
                if len(blk) == 0:
                    continue
                f = terms[int(qd[0])].field
                w_ = per_field_work.setdefault(f, ([], []))
                w_[0].append(blk)
                w_[1].append(qd)
            for field, (blks, qds) in per_field_work.items():
                scorer = self._flat_scorer(seg_ord, field)
                for out in scorer.dispatch(
                    np.concatenate(blks), np.concatenate(qds),
                    weights_pad, caches_pad, k, Q,
                ):
                    pending1.append((seg_ord, out))

        # materialize phase 1, establish (score, DocAddress) thresholds
        per_query: list[list[tuple[np.float32, DocAddress]]] = [[] for _ in range(Q)]
        self._collect_flat(pending1, per_query, k)
        th, th_seg, th_doc = _topk_thresholds(per_query, k)

        # phase 2: surviving blocks only (tie-aware, conservative ulp margin)
        pending2 = []
        for seg_ord, rest in per_seg_rest.items():
            per_field_work = {}
            for qi, field, ids, bmax in rest:
                dfp = self._device_segments[seg_ord].field_postings(field)
                keep = _phase2_keep(
                    bmax, dfp.blk_base[ids], seg_ord,
                    th[qi], th_seg[qi], th_doc[qi],
                )
                if not keep.any():
                    continue
                w_ = per_field_work.setdefault(field, ([], []))
                w_[0].append(ids[keep])
                w_[1].append(np.full(int(keep.sum()), qi, dtype=np.int32))
            for field, (blks, qds) in per_field_work.items():
                scorer = self._flat_scorer(seg_ord, field)
                for out in scorer.dispatch(
                    np.concatenate(blks), np.concatenate(qds),
                    weights_pad, caches_pad, k, Q,
                ):
                    pending2.append((seg_ord, out))
        self._collect_flat(pending2, per_query, k)

        out = []
        for qi in range(Q):
            out.append(_chunk_hits(per_query[qi], k))
        return out

    # ------------------------------------------------------------------
    # boolean batches

    @staticmethod
    def _term_clause(sub):
        """(TermQuery, f32 boost) for device-eligible boolean clauses:
        plain terms and (nested) BoostQuery-wrapped terms — boost folds
        into the clause weight exactly like the host's
        `Bm25Weight.boost_by` (see BoostQuery.weight). None otherwise."""
        from ..query import BoostQuery, TermQuery

        if isinstance(sub, TermQuery):
            return sub, np.float32(1.0)
        if isinstance(sub, BoostQuery):
            tb = sub.term_and_boost()
            # negative boost inverts the block-max inequality (w * bfac_max
            # would LOWER-bound scores), so WAND pruning is unsound — keep
            # such clauses on the host path
            if tb is not None and tb[1] >= np.float32(0.0):
                return tb
        return None

    def _clause_weight(self, sub_term, boost) -> np.float32:
        w = np.float32(self._term_weight(sub_term.term)[0])
        if boost != np.float32(1.0):
            # bitwise-identical to Bm25Weight.boost_by
            w = np.float32(w * np.float32(boost))
        return w

    def _bool_device_eligible(self, q) -> bool:
        from ..ops.probe_scorer import T_MAX, _pallas_mode
        from ..query import BooleanQuery

        if not isinstance(q, BooleanQuery):
            return False
        if not 1 <= len(q.clauses) <= T_MAX:
            return False
        fields = set()
        for occ, sub in q.clauses:
            tb = self._term_clause(sub)
            if tb is None:
                return False
            fields.add(tb[0].term.field)
        # the fused store handles clauses across fields; the XLA fallback
        # path is single-field only
        return len(fields) == 1 or _pallas_mode() is not None

    def _field_wand(self, seg_ord: int, field: str):
        from .wand import FieldWand

        key = (seg_ord, field)
        cache = getattr(self, "_field_wand_cache", None)
        if cache is None:
            cache = self._field_wand_cache = {}
        fw = cache.get(key)
        if fw is None:
            fs = self._field_stats.get(field)
            if fs is None:
                fs = self.searcher.field_statistics(field)
                self._field_stats[field] = fs
            dfp = self._device_segments[seg_ord].field_postings(field)
            fw = FieldWand(dfp, fs.average_fieldnorm)
            cache[key] = fw
        return fw

    def search_boolean_batch(self, queries: list, k: int):
        """Batched boolean(term-clause) queries, single field each, on
        device via the probe kernel with two-phase Block-WAND pruning.

        Phase 1 ships each query's best-UB candidate blocks to establish a
        per-query threshold; phase 2 ships only remaining blocks whose upper
        bound beats it (see `parallel/wand.py` for the bound). Every shipped
        lane carries its doc's FULL score (probes), so chunking and pruning
        never split correctness across launches and no host fallback is
        needed. Returns list[list[(score, DocAddress)]].
        """
        from ..ops import probe_scorer as ps
        from ..query import Occur

        if ps._pallas_mode() is not None:
            return self._search_boolean_fused(queries, k)

        Q = len(queries)
        if Q == 0:
            return []
        kind_of = {
            Occur.MUST: ps.KIND_MUST,
            Occur.SHOULD: ps.KIND_SHOULD,
            Occur.MUST_NOT: ps.KIND_MUST_NOT,
        }
        req_must = np.zeros(Q + 1, dtype=np.int32)
        req_should = np.zeros(Q + 1, dtype=np.int32)
        req_must[Q] = 1 << 30
        qclauses = []  # per query: list[(kind, term, weight)]
        field_of_q: list[str] = []
        for qi, q in enumerate(queries):
            n_must = sum(1 for occ, _ in q.clauses if occ == Occur.MUST)
            n_should = sum(1 for occ, _ in q.clauses if occ == Occur.SHOULD)
            req_must[qi] = n_must
            ms = q.minimum_number_should_match
            if n_must == 0:
                ms = max(ms, 1)
            req_should[qi] = min(ms, n_should) if n_should else 0
            if n_should and q.minimum_number_should_match > n_should:
                req_should[qi] = 1 << 30  # unsatisfiable
            info = []
            for occ, sub in q.clauses:
                tq, boost = self._term_clause(sub)
                if occ == Occur.MUST_NOT:
                    w = np.float32(0.0)
                else:
                    w = self._clause_weight(tq, boost)
                info.append((kind_of[occ], tq.term, np.float32(w)))
            qclauses.append(info)
            field_of_q.append(info[0][1].field)

        readers = self.searcher.segment_readers()
        M1 = _m1()  # phase-1 candidate blocks per query per segment

        # ---- per-segment planning + phase-1 dispatch --------------------
        per_query: list[list[tuple[np.float32, DocAddress]]] = [
            [] for _ in range(Q)
        ]
        pending1 = []
        seg_groups = []  # per segment: {(field, Tb): group dict}
        _dt1 = debug_time("bool.plan_dispatch1")
        _dt1.__enter__()
        for seg_ord, reader in enumerate(readers):
            dseg = self._device_segments[seg_ord]
            groups: dict[tuple[str, int], dict] = {}
            for qi, info in enumerate(qclauses):
                field = field_of_q[qi]
                dfp = dseg.field_postings(field)
                fw = self._field_wand(seg_ord, field)
                T = len(info)
                ords = [
                    self._term_ord(seg_ord, reader, field, t.value_bytes)
                    for _, t, _ in info
                ]
                # a missing MUST term ⇒ no hits in this segment
                if any(
                    kd == ps.KIND_MUST and o < 0
                    for (kd, _, _), o in zip(info, ords)
                ):
                    continue
                positive = [
                    ci
                    for ci, ((kd, _, _), o) in enumerate(zip(info, ords))
                    if kd in (ps.KIND_MUST, ps.KIND_SHOULD) and o >= 0
                ]
                if not positive:
                    continue
                musts = [
                    ci for ci in positive if info[ci][0] == ps.KIND_MUST
                ]
                nblk = {
                    ci: int(dfp.term_num_blocks[ords[ci]]) for ci in positive
                }
                start = {
                    ci: int(dfp.term_block_start[ords[ci]]) for ci in positive
                }
                if musts:
                    leader = min(musts, key=lambda ci: nblk[ci])
                    shipped = [leader]
                else:
                    shipped = positive

                Tb = ps.t_bucket(T)
                g = groups.get((field, Tb))
                if g is None:
                    g = groups[(field, Tb)] = {
                        "tables": {
                            "cl_weight": np.zeros((Q + 1, Tb), np.float32),
                            "cl_kind": np.full((Q + 1, Tb), ps.KIND_ABSENT,
                                               np.int32),
                            "cl_start": np.zeros((Q + 1, Tb), np.int32),
                            "cl_len": np.zeros((Q + 1, Tb), np.int32),
                            "cl_shipped": np.zeros((Q + 1, Tb), bool),
                            "req_must": req_must,
                            "req_should": req_should,
                        },
                        "p1": [],    # (qi, clause, block_ids)
                        "rest": [],  # (qi, clause, block_ids, ub)
                    }
                tb = g["tables"]
                for ci, ((kd, term, w), o) in enumerate(zip(info, ords)):
                    if o < 0:
                        continue
                    tb["cl_weight"][qi, ci] = 0.0 if kd == ps.KIND_MUST_NOT else w
                    tb["cl_kind"][qi, ci] = kd
                    tb["cl_start"][qi, ci] = int(dfp.term_block_start[o])
                    tb["cl_len"][qi, ci] = int(dfp.term_num_blocks[o])
                    tb["cl_shipped"][qi, ci] = ci in shipped

                # candidate blocks + upper bounds per shipped clause;
                # MUST_NOT clauses join `others` with weight 0 so their
                # probe windows get sized too
                cand = []  # (clause, ids, ub, widths)
                for ci in shipped:
                    others = [
                        (info[c2][0] == ps.KIND_MUST,
                         info[c2][2] if c2 in positive else np.float32(0.0),
                         int(dfp.term_block_start[ords[c2]]),
                         int(dfp.term_num_blocks[ords[c2]]),
                         c2)
                        for c2 in range(T)
                        if c2 != ci and ords[c2] >= 0
                        and (c2 in positive or info[c2][0] == ps.KIND_MUST_NOT)
                    ]
                    ids, ub, widths = fw.clause_blocks_ub(
                        start[ci], nblk[ci], info[ci][2], others,
                        self_pos=ci,
                    )
                    widths = (
                        widths.max(axis=1)
                        if widths.shape[1]
                        else np.zeros(len(ids), dtype=np.int64)
                    )
                    if len(ids):
                        cand.append((ci, ids, ub, widths))
                if not cand:
                    continue
                self._count_plan(
                    "wand_candidates",
                    sum(len(ids) for _, ids, _, _ in cand),
                )
                # phase-1 = the query's top-M1 blocks by UB across clauses
                all_ub = np.concatenate([ub for _, _, ub, _ in cand])
                if len(all_ub) <= M1:
                    cut = NEG_INF
                else:
                    cut = np.partition(all_ub, len(all_ub) - M1)[len(all_ub) - M1]
                taken = 0
                for ci, ids, ub, widths in cand:
                    pick = ub >= cut
                    # cap exact ties so phase 1 stays small
                    extra = int(pick.sum()) - (M1 - taken)
                    if extra > 0:
                        sel = np.nonzero(pick)[0]
                        pick[sel[len(sel) - extra:]] = False
                    taken += int(pick.sum())
                    if pick.any():
                        g["p1"].append((qi, ci, ids[pick], widths[pick]))
                    if (~pick).any():
                        g["rest"].append(
                            (qi, ci, ids[~pick], ub[~pick], widths[~pick])
                        )

            for (field, Tb), g in groups.items():
                if not g["p1"]:
                    continue
                blocks = np.concatenate([ids for _, _, ids, _ in g["p1"]])
                qids = np.concatenate(
                    [np.full(len(ids), qi, np.int32)
                     for qi, _, ids, _ in g["p1"]]
                )
                cls = np.concatenate(
                    [np.full(len(ids), ci, np.int32)
                     for _, ci, ids, _ in g["p1"]]
                )
                wds = np.concatenate([wd for _, _, _, wd in g["p1"]])
                self._count_plan("wand_p1", len(blocks))
                dfp = dseg.field_postings(field)
                fw = self._field_wand(seg_ord, field)
                for out in ps.dispatch_probe(
                    dfp, dseg.alive, fw.cache, blocks, qids, cls,
                    g["tables"], k, Q, work_width=wds,
                ):
                    pending1.append((seg_ord, out))
            seg_groups.append(groups)

        _dt1.__exit__(None, None, None)
        # ---- (score, DocAddress) thresholds from phase 1 -----------------
        with debug_time("bool.collect1", n=len(pending1)):
            self._collect_flat(pending1, per_query, k)
        th, th_seg, th_doc = _topk_thresholds(per_query, k)

        # ---- phase 2: surviving blocks only (tie-aware) -------------------
        _dt2 = debug_time("bool.plan_dispatch2")
        _dt2.__enter__()
        pending2 = []
        for seg_ord, groups in enumerate(seg_groups):
            dseg = self._device_segments[seg_ord]
            for (field, Tb), g in groups.items():
                if not g["rest"]:
                    continue
                dfp = dseg.field_postings(field)
                blks, qids, cls, wds = [], [], [], []
                for qi, ci, ids, ub, widths in g["rest"]:
                    keep = _phase2_keep(
                        ub, dfp.blk_base[ids], seg_ord,
                        th[qi], th_seg[qi], th_doc[qi],
                    )
                    if not keep.any():
                        continue
                    blks.append(ids[keep])
                    qids.append(np.full(int(keep.sum()), qi, np.int32))
                    cls.append(np.full(int(keep.sum()), ci, np.int32))
                    wds.append(widths[keep])
                if not blks:
                    continue
                self._count_plan(
                    "wand_p2", sum(len(b) for b in blks)
                )
                fw = self._field_wand(seg_ord, field)
                for out in ps.dispatch_probe(
                    dfp, dseg.alive, fw.cache,
                    np.concatenate(blks), np.concatenate(qids),
                    np.concatenate(cls), g["tables"], k, Q,
                    work_width=np.concatenate(wds),
                ):
                    pending2.append((seg_ord, out))
        _dt2.__exit__(None, None, None)
        with debug_time("bool.collect2", n=len(pending2)):
            self._collect_flat(pending2, per_query, k)

        out = []
        for qi in range(Q):
            out.append(_chunk_hits(per_query[qi], k))
        return out

    # ------------------------------------------------------------------
    # fused boolean batches (pallas): ONE launch per phase for the whole
    # batch across every segment, field, and window rung

    def _fused(self):
        fs = getattr(self, "_fused_store_obj", None)
        if fs is None:
            from ..ops.fused_store import FusedStore

            with self._fused_lock:
                fs = getattr(self, "_fused_store_obj", None)
                if fs is None:
                    fs = self._fused_store_obj = FusedStore()
        return fs

    def _ensure_fused_slab(self, seg_ord: int, field: str):
        fused = self._fused()
        if (seg_ord, field) in fused.slabs:
            return
        with self._fused_lock:
            if (seg_ord, field) in fused.slabs:
                return
            fs = self._field_stats.get(field)
            if fs is None:
                fs = self.searcher.field_statistics(field)
                self._field_stats[field] = fs
            dseg = self._device_segments[seg_ord]
            fused.ensure_slab(
                seg_ord, field, dseg.field_postings(field), dseg.alive_np,
                fs.average_fieldnorm,
            )

    def _count_fallback(self, kind: str) -> None:
        fb = getattr(self, "fallbacks", None)
        if fb is None:
            fb = self.fallbacks = {}
        fb[kind] = fb.get(kind, 0) + 1

    def _count_plan(self, kind: str, n: int = 1) -> None:
        """Planner-branch telemetry (skip/slice/ratchet/re-anchor counters)
        — consumed by the property tests to assert every planner path
        actually fired, and by the bench for padding visibility."""
        st = getattr(self, "plan_stats", None)
        if st is None:
            st = self.plan_stats = {}
        st[kind] = st.get(kind, 0) + n

    @staticmethod
    def _prow_tier(n: int, Tb: int = 2) -> int:
        """Plan-row table tier. ONE value per clause bucket (not a ladder):
        plan rows are capped at 4096 by sub-batching, so a fixed tier makes
        every corpus/batch hit the same compiled shapes — warmup paid once,
        shared via the persistent compilation cache. Wider clause buckets
        shrink the tier to fit the SMEM scalar-prefetch budget."""
        if Tb <= 4:
            return 4096
        return 2048 if Tb <= 8 else 1024

    def _search_boolean_fused(self, queries: list, k: int):
        """Fused-store boolean batch: every (query, segment) plan row across
        all fields rides ONE pallas launch per phase (see
        `ops/fused_store.py` and `pallas_probe.fused_bool_topk`).

        Wide probe windows (a sparse clause's block spanning many blocks of
        a dense partner) are handled without host fallbacks in two sound
        ways, both emitting explicit per-item window starts (`jlo`):
        * wide MUST probes are SLICED: the item is replicated with the same
          block/lanes but consecutive `stride`-row windows covering the
          overlap. A matching doc's partner posting lies in exactly one
          region row, so exactly the slice(s) fetching that row satisfy the
          MUST and report the full exact score (adjacent slices overlap by
          the DMA alignment slack, so a doc can double-report with identical
          scores — host dedup-by-address absorbs it). Non-matching slices
          fail the MUST count and report nothing. Per-slice UBs are
          recomputed with the slice's own range-max, so phase-2 pruning
          tightens as the window shrinks.
        * wide SHOULD probes are SKIPPED (jlo = -1, partial scores) and the
          skipped clause is itself shipped in full; the doc's densest
          present positive clause probes everything through narrow windows,
          so some reporting lane always carries the exact full score and
          host dedup keeps the max. (For pure-SHOULD rows the skip is
          restricted to strictly denser clauses, preserving that invariant
          structurally.)
        Rows with any skip/slice lose the single-reporter `fullprobe`
        optimization (every enumerator reports; k_eff is widened for the
        duplicates). Remaining wide cases (wide MUST_NOT probes, two wide
        MUST columns on one item) fall back to exact host evaluation per
        (query, segment), counted in `self.fallbacks`.
        """
        from ..ops import pallas_probe as pp
        from ..ops import probe_scorer as ps
        from ..query import Occur

        Q = len(queries)
        if Q == 0:
            return []
        # plan-row tables ride SMEM scalar prefetch: cap Q x n_segments at
        # the (fixed, per-clause-bucket) plan-row tier and sub-batch beyond
        from ..ops.probe_scorer import t_bucket

        n_segs = max(1, len(self.searcher.segment_readers()))
        max_tb = max(t_bucket(len(q.clauses)) for q in queries)
        if n_segs > self._prow_tier(0, max_tb):
            # even one query would exceed the plan-row tier (one row per
            # (query, segment)); sub-batching cannot help — surface it
            # rather than overflow the table silently
            raise ValueError(
                f"{n_segs} segments exceed the plan-row tier "
                f"{self._prow_tier(0, max_tb)}; merge segments first"
            )
        max_q = min(
            max(1, self._prow_tier(0, max_tb) // n_segs), _Q_FIXED
        )
        if Q > max_q:
            out = []
            for lo in range(0, Q, max_q):
                out.extend(
                    self._search_boolean_fused(queries[lo : lo + max_q], k)
                )
            return out
        Qp = _q_tier(Q)  # static num_queries: fixed (see _q_tier)
        interpret = ps._pallas_mode() == "interpret"
        kind_of = {
            Occur.MUST: ps.KIND_MUST,
            Occur.SHOULD: ps.KIND_SHOULD,
            Occur.MUST_NOT: ps.KIND_MUST_NOT,
        }

        qclauses = []  # per query: [(kind, term, weight, field)]
        q_req_must = np.zeros(Q, dtype=np.int32)
        q_req_should = np.zeros(Q, dtype=np.int32)
        q_report_all = np.zeros(Q, dtype=bool)
        for qi, q in enumerate(queries):
            n_must = sum(1 for occ, _ in q.clauses if occ == Occur.MUST)
            n_should = sum(1 for occ, _ in q.clauses if occ == Occur.SHOULD)
            q_req_must[qi] = n_must
            ms = q.minimum_number_should_match
            if n_must == 0:
                ms = max(ms, 1)
            q_req_should[qi] = min(ms, n_should) if n_should else 0
            if n_should and q.minimum_number_should_match > n_should:
                q_req_should[qi] = 1 << 30
            info = []
            for occ, sub in q.clauses:
                tq, boost = self._term_clause(sub)
                w = (
                    np.float32(0.0)
                    if occ == Occur.MUST_NOT
                    else self._clause_weight(tq, boost)
                )
                info.append((kind_of[occ], tq.term, w, tq.term.field))
            qclauses.append(info)
            q_report_all[qi] = n_must == 0 and q_req_should[qi] <= 1

        readers = self.searcher.segment_readers()
        fields = {c[3] for info in qclauses for c in info}
        for seg_ord in range(len(readers)):
            for f in fields:
                self._ensure_fused_slab(seg_ord, f)
        fused = self._fused().ready()

        M1 = _m1()
        per_query: list[list] = [[] for _ in range(Q)]
        per_tb: dict[int, dict] = {}

        _dt1 = debug_time("bool.plan_fused")
        _dt1.__enter__()
        _dtp1 = debug_time("bool.plan_pass1")
        _dtp1.__enter__()
        # pass 1: resolve term regions per (segment, query) and batch-plan
        # EVERY positive clause's UB detail in one vectorized sweep
        # (`wand.batched_clause_details`) — the per-call loop was ~2k small
        # numpy invocations per 256-query batch
        from .wand import batched_clause_details

        plans = []
        ub_calls = []
        det_of: dict[tuple[int, int, int], int] = {}
        for seg_ord, reader in enumerate(readers):
            for qi, info in enumerate(qclauses):
                T = len(info)
                ords = [
                    self._term_ord(seg_ord, reader, c[3], c[1].value_bytes)
                    for c in info
                ]
                if any(
                    c[0] == ps.KIND_MUST and o < 0
                    for c, o in zip(info, ords)
                ):
                    continue
                positive = [
                    ci
                    for ci, (c, o) in enumerate(zip(info, ords))
                    if c[0] in (ps.KIND_MUST, ps.KIND_SHOULD) and o >= 0
                ]
                if not positive:
                    continue
                regions = {
                    ci: fused.region(seg_ord, info[ci][3], ords[ci])
                    for ci in range(T)
                    if ords[ci] >= 0
                }
                musts = [ci for ci in positive if info[ci][0] == ps.KIND_MUST]
                nblk = {ci: regions[ci][1] for ci in regions}
                shipped = (
                    [min(musts, key=lambda ci: nblk[ci])] if musts
                    else list(positive)
                )
                others = {
                    ci: [
                        (
                            info[c2][0] == ps.KIND_MUST,
                            info[c2][2] if c2 in positive else np.float32(0.0),
                            regions[c2][0],
                            regions[c2][1],
                            c2,
                        )
                        for c2 in range(T)
                        if c2 != ci and ords[c2] >= 0
                        and (
                            c2 in positive
                            or info[c2][0] == ps.KIND_MUST_NOT
                        )
                    ]
                    for ci in positive
                }
                for ci in positive:
                    det_of[(seg_ord, qi, ci)] = len(ub_calls)
                    ub_calls.append((
                        regions[ci][0], regions[ci][1], info[ci][2],
                        others[ci], ci,
                    ))
                plans.append((seg_ord, reader, qi, info, T, ords,
                              positive, regions, musts, nblk, shipped,
                              others))
        _dtp1.__exit__(None, None, None)
        with debug_time("bool.plan_details", n=len(ub_calls)):
            dets = batched_clause_details(fused, ub_calls)

        _dtp2 = debug_time("bool.plan_pass2")
        _dtp2.__enter__()
        for (seg_ord, reader, qi, info, T, ords, positive, regions, musts,
             nblk, shipped, others) in plans:
            def others_for(ci):
                return others[ci]

            report_all = bool(q_report_all[qi])
            Tb = ps.t_bucket(T)
            KWMAX = pp.fused_kw_max(Tb)
            # slices step `stride` rows and fetch `stride_cov` rows from
            # 8-aligned starts (8-row overlap absorbs alignment slack);
            # stride_cov must fit the widest rung's fetched rows exactly
            # (group rungs fetch kw rows, no slack)
            stride = max(8, ((KWMAX - 8) // 8) * 8)
            stride_cov = stride + 8
            staged = []  # (clause, ids, ub, eff_width, jlo, wid [n, Tb])
            fallback = False
            any_skip_row = False
            any_slice_row = False
            ship_set = set(shipped)
            to_ship = list(shipped)
            while to_ship and not fallback:
                ci = to_ship.pop()
                oth = others_for(ci)
                det = dets[det_of[(seg_ord, qi, ci)]]
                ids, ub = det["ids"], det["ub"]
                n_it = len(ids)
                if not n_it:
                    continue
                # -1 jlo = no window: clause columns with no probe
                # (absent clauses, and the OWN clause — its lane IS the
                # clause, presence by construction) skip their window
                # DMA entirely in the kernel. `frc` = true first
                # overlapping row minus the 8-aligned DMA start: the
                # kernel probes exactly [jlo+frc, jlo+wid).
                jlo = np.full((n_it, Tb), -1, dtype=np.int32)
                wid = np.zeros((n_it, Tb), dtype=np.int32)
                frc = np.zeros((n_it, Tb), dtype=np.int32)
                eff = np.zeros(n_it, dtype=np.int32)
                slice_cols = []  # (oi, c2, wide mask) — wide MUST probes
                for oi, (_, _, _, n2, c2) in enumerate(oth):
                    wcol = det["widths"][:, oi]
                    jlo[:, c2] = det["jlo"][:, oi]
                    wid[:, c2] = wcol
                    frc[:, c2] = det["i0"][:, oi] - det["jlo"][:, oi]
                    wide = wcol > KWMAX
                    if not wide.any():
                        eff = np.maximum(eff, wcol)
                        continue
                    kind2 = info[c2][0]
                    if kind2 == ps.KIND_SHOULD and c2 in positive:
                        if report_all and not (n2, c2) > (nblk[ci], ci):
                            # pure-SHOULD skips must target a strictly
                            # denser clause (full-reporter invariant)
                            fallback = True
                            break
                        jlo[wide, c2] = -1  # skip; ship c2 in full
                        eff = np.maximum(eff, np.where(wide, 0, wcol))
                        any_skip_row = True
                        if c2 not in ship_set:
                            ship_set.add(c2)
                            to_ship.append(c2)
                    elif kind2 == ps.KIND_MUST:
                        slice_cols.append((oi, c2, wide))
                        eff = np.maximum(eff, np.where(wide, 0, wcol))
                    else:  # wide MUST_NOT probe: no sound device plan
                        fallback = True
                        break
                if fallback:
                    break
                if slice_cols:
                    n_wide_cols = np.zeros(n_it, dtype=np.int64)
                    for _, _, wide in slice_cols:
                        n_wide_cols += wide
                    if (n_wide_cols > 1).any():
                        fallback = True  # 2+ wide MUSTs: cross product
                        break
                    any_slice_row = True
                    base_keep = n_wide_cols == 0
                    for oi, c2, wide in slice_cols:
                        rows = np.nonzero(wide)[0]
                        i0a = det["jlo"][rows, oi]
                        i0r = det["i0"][rows, oi]
                        i1r = det["i1"][rows, oi]
                        nsl = -(-(i1r - i0a) // stride)
                        tot = int(nsl.sum())
                        rep = np.repeat(rows, nsl)
                        off = (
                            np.arange(tot, dtype=np.int64)
                            - np.repeat(np.cumsum(nsl) - nsl, nsl)
                        )
                        starts = np.repeat(i0a, nsl) + off * stride
                        jlo_sl = jlo[rep].copy()
                        jlo_sl[:, c2] = starts
                        wid_sl = wid[rep].copy()
                        # clip the slice's probed range to the true
                        # overlap [i0, i1): rows beyond i1 may belong
                        # to the NEXT region (doc ids repeat across
                        # regions -> spurious matches without the old
                        # in-kernel region mask)
                        wid_sl[:, c2] = np.minimum(
                            stride_cov, np.repeat(i1r, nsl) - starts
                        )
                        frc_sl = frc[rep].copy()
                        frc_sl[:, c2] = np.maximum(
                            np.repeat(i0r, nsl) - starts, 0
                        )
                        # per-slice UB: same ordered f32 sum, with this
                        # clause's range-max taken over the slice's
                        # fetched rows only (tighter, still a bound)
                        ov = fused.rmax.query(
                            np.maximum(starts, np.repeat(i0r, nsl)),
                            np.minimum(
                                starts + stride_cov, np.repeat(i1r, nsl)
                            ),
                        )
                        w2 = np.float32(info[c2][2])
                        ub_sl = np.zeros(tot, dtype=np.float32)
                        for pos in sorted(det["terms"]):
                            term = (
                                (w2 * ov).astype(np.float32)
                                if pos == c2
                                else det["terms"][pos][rep]
                            )
                            ub_sl = (ub_sl + term).astype(np.float32)
                        eff_sl = np.maximum(eff[rep], stride)
                        # slice windows are intentionally partial: keep
                        # as singleton groups (groupable=False)
                        staged.append(
                            (ci, False, ids[rep], ub_sl, eff_sl, jlo_sl,
                             wid_sl, frc_sl)
                        )
                    if not base_keep.all():
                        ids, ub = ids[base_keep], ub[base_keep]
                        eff, jlo = eff[base_keep], jlo[base_keep]
                        wid, frc = wid[base_keep], frc[base_keep]
                if len(ids):
                    staged.append((ci, True, ids, ub, eff, jlo, wid, frc))
            if fallback:
                per_query[qi].append(
                    self._host_segment_topk(queries[qi], seg_ord, reader, k)
                )
                self._count_fallback("bool_wide")
                continue
            if not staged:
                continue

            # commit the plan row
            g = per_tb.get(Tb)
            if g is None:
                g = per_tb[Tb] = {
                    "rows": [],     # per prow table rows
                    "p1": [],       # work tuples
                    "rest": [],
                    "any_skip": False,
                    "any_dup": False,
                }
            prow = len(g["rows"])
            row = {
                "qi": qi,
                "seg": seg_ord,
                "cl_weight": np.zeros(Tb, dtype=np.float32),
                "cl_kind": np.full(Tb, ps.KIND_ABSENT, dtype=np.int32),
                "cl_start": np.zeros(Tb, dtype=np.int32),
                "cl_len": np.zeros(Tb, dtype=np.int32),
                "cl_fullprobe": np.zeros(Tb, dtype=np.int32),
                "req_must": int(q_req_must[qi]),
                "req_should": int(q_req_should[qi]),
            }
            for ci, (c, o) in enumerate(zip(info, ords)):
                if o < 0:
                    continue
                row["cl_weight"][ci] = (
                    0.0 if c[0] == ps.KIND_MUST_NOT else c[2]
                )
                row["cl_kind"][ci] = c[0]
                row["cl_start"][ci] = regions[ci][0]
                row["cl_len"][ci] = regions[ci][1]
            # fullprobe single-reporter optimization only for plain rows
            # (no skipped probes, no sliced windows): any complexity
            # means dual reports — every enumerator reports, the host
            # dedups by DocAddress keeping the (exact, maximal) score.
            if not any_skip_row and not any_slice_row:
                for ci in ship_set:
                    row["cl_fullprobe"][ci] = 1
            g["rows"].append(row)
            if any_skip_row:
                g["any_skip"] = True
                self._count_plan("bool_skip_rows")
            if any_slice_row:
                self._count_plan("bool_slice_rows")
            if any_slice_row or (any_skip_row and not report_all):
                g["any_dup"] = True

            # clause-ascending staging order keeps the flat work columns'
            # (prow, clause, block) keys sorted — the native single-pass
            # group collapse (native/probe_plan.cc) requires it, and the
            # numpy path skips its argsort
            staged.sort(key=lambda s: s[0])

            # phase-1 = the prow's top-M1 blocks by UB across clauses
            all_ub = np.concatenate([s[3] for s in staged])
            if len(all_ub) <= M1:
                cut = NEG_INF
            else:
                cut = np.partition(all_ub, len(all_ub) - M1)[
                    len(all_ub) - M1
                ]
            taken = 0
            self._count_plan(
                "wand_candidates",
                sum(len(s[2]) for s in staged),
            )
            for ci, grp, ids, ub, eff, jlo, wid, frc in staged:
                pick = ub >= cut
                extra = int(pick.sum()) - (M1 - taken)
                if extra > 0:
                    selidx = np.nonzero(pick)[0]
                    pick[selidx[len(selidx) - extra:]] = False
                taken += int(pick.sum())
                self._count_plan("wand_p1", int(pick.sum()))
                if pick.any():
                    g["p1"].append(
                        (prow, qi, seg_ord, ci, grp, ids[pick],
                         eff[pick], jlo[pick], wid[pick], frc[pick])
                    )
                if (~pick).any():
                    g["rest"].append(
                        (prow, qi, seg_ord, ci, grp, ids[~pick],
                         ub[~pick], eff[~pick], jlo[~pick], wid[~pick],
                         frc[~pick])
                    )
        _dtp2.__exit__(None, None, None)
        _dt1.__exit__(None, None, None)

        def finalize_tables(g, Tb):
            n = len(g["rows"])
            tier = self._prow_tier(n, Tb)
            assert n <= tier, "plan rows exceed the fixed prow tier"
            t = {
                "cl_weight": np.zeros((tier + 1, Tb), np.float32),
                "cl_kind": np.full((tier + 1, Tb), 3, np.int32),
                "cl_start": np.zeros((tier + 1, Tb), np.int32),
                "cl_len": np.zeros((tier + 1, Tb), np.int32),
                "cl_shipped": np.zeros((tier + 1, Tb), np.int32),
                "req_must": np.zeros(tier + 1, np.int32),
                "req_should": np.zeros(tier + 1, np.int32),
            }
            t["req_must"][n:] = 1 << 30
            for i, row in enumerate(g["rows"]):
                t["cl_weight"][i] = row["cl_weight"]
                t["cl_kind"][i] = row["cl_kind"]
                t["cl_start"][i] = row["cl_start"]
                t["cl_len"][i] = row["cl_len"]
                t["cl_shipped"][i] = row["cl_fullprobe"]
                t["req_must"][i] = row["req_must"]
                t["req_should"][i] = row["req_should"]
            return t

        def build_work(items):
            blocks = np.concatenate([it[5] for it in items])
            prow = np.concatenate(
                [np.full(len(it[5]), it[0], np.int32) for it in items]
            )
            clause = np.concatenate(
                [np.full(len(it[5]), it[3], np.int32) for it in items]
            )
            width = np.concatenate([it[-4] for it in items])
            qid = np.concatenate(
                [np.full(len(it[5]), it[1], np.int32) for it in items]
            )
            seg = np.concatenate(
                [np.full(len(it[5]), it[2], np.int32) for it in items]
            )
            jlo = np.vstack([it[-3] for it in items])
            wid = np.vstack([it[-2] for it in items])
            frc = np.vstack([it[-1] for it in items])
            grp = np.concatenate(
                [np.full(len(it[5]), bool(it[4])) for it in items]
            )
            return blocks, prow, clause, width, qid, seg, jlo, wid, frc, grp

        # ---- phase 1: one fused launch per T-bucket ----------------------
        pending1 = []
        tb_tables = {}
        for Tb, g in per_tb.items():
            tb_tables[Tb] = finalize_tables(g, Tb)
            if not g["p1"]:
                continue
            k_eff = _k_eff_tb(g, Tb, k)
            with debug_time("bool.fused_dispatch1"):
                for out in pp.launch_fused_bool(
                    fused, build_work(g["p1"]), tb_tables[Tb], k_eff, Qp,
                    interpret,
                ):
                    pending1.append((None, out))
        with debug_time("bool.collect1", n=len(pending1)):
            self._collect_flat(pending1, per_query, k)
        th, th_seg, th_doc = _topk_thresholds(per_query, k)

        # ---- phase 2: survivors only, in up to two UB-ordered rounds ------
        # Threshold RATCHET: phase-1 thresholds sit a median ~9% (p90 ~20%)
        # below the final k-th scores at 1M-doc scale, so when many blocks
        # survive, ship only the best-UB slice first, re-tighten thresholds
        # from its exact results, and prune the bulk with the tighter bar.
        # Both rounds prune with `_phase2_keep` against thresholds that only
        # ever rise, so exactness is preserved (pruning stays conservative).
        # FLAT phase-2 columns: the per-item "rest" tuples are concatenated
        # ONCE per T-bucket; pruning, the ratchet split and the launch all
        # operate on whole columns (vectorized _phase2_keep over every
        # (item, block) at once) instead of ~2k per-item numpy calls.
        # Concatenation order preserves item order, so _group_work still
        # sees consecutive groupable runs.
        def _flat_rest(items):
            lens = np.array([len(it[5]) for it in items])

            def rep(idx, dt):
                return np.repeat(
                    np.array([it[idx] for it in items], dtype=dt), lens
                )

            return {
                "prow": rep(0, np.int32),
                "qid": rep(1, np.int32),
                "seg": rep(2, np.int32),
                "clause": rep(3, np.int32),
                "grp": rep(4, bool),
                "ids": np.concatenate([it[5] for it in items]),
                "ub": np.concatenate([it[6] for it in items]),
                "eff": np.concatenate([it[7] for it in items]),
                "jlo": np.vstack([it[8] for it in items]),
                "wid": np.vstack([it[9] for it in items]),
                "frc": np.vstack([it[10] for it in items]),
            }

        def _keep_flat(f, th, th_seg, th_doc):
            """Vectorized `_phase2_keep` over flat columns (same exact
            no-margin compares — see its docstring)."""
            th_q = th[f["qid"]]
            ts_q = th_seg[f["qid"]]
            later = (f["seg"] > ts_q) | (
                (f["seg"] == ts_q)
                & (fused.blk_base[f["ids"]].astype(np.int64)
                   > th_doc[f["qid"]])
            )
            return (
                (th_q == NEG_INF)
                | (f["ub"] > th_q)
                | ((f["ub"] == th_q) & ~later)
            )

        def _sel_flat(f, m):
            idx = np.nonzero(m)[0]
            return {kk_: v.take(idx, axis=0) for kk_, v in f.items()}

        def _work_of(f):
            return (
                f["ids"], f["prow"], f["clause"], f["eff"], f["qid"],
                f["seg"], f["jlo"], f["wid"], f["frc"], f["grp"],
            )

        def _k_eff(g, Tb):
            return _k_eff_tb(g, Tb, k)

        def _th_tables(Tb, f, th):
            """Per-phase plan tables + row_th: each plan row's CURRENT kth
            score, shipped to the kernel so per-group extraction stops at
            the survivors (score >= th) instead of a blind kk loop — the
            extract loop was 62% of fused-kernel time
            (scripts/diag_kernel_ablate.py)."""
            t = tb_tables[Tb]
            rt = np.full(len(t["req_must"]), NEG_INF, dtype=np.float32)
            rt[f["prow"]] = th[f["qid"]]
            return dict(t, row_th=rt)

        surv = {}
        for Tb, g in per_tb.items():
            if not g["rest"]:
                continue
            f = _flat_rest(g["rest"])
            m = _keep_flat(f, th, th_seg, th_doc)
            if m.any():
                surv[Tb] = _sel_flat(f, m)
        total_surv = sum(len(f["ids"]) for f in surv.values())
        ratchet = total_surv > _RATCHET_MIN_PER_Q * Q
        if ratchet:
            self._count_plan("bool_ratchet")
            all_ub = np.concatenate([f["ub"] for f in surv.values()])
            top = min(max(_RATCHET_TOP_PER_Q * Q, 1), len(all_ub))
            cut_a = np.partition(all_ub, len(all_ub) - top)[len(all_ub) - top]
            pending_a = []
            for Tb, f in surv.items():
                sel = f["ub"] >= cut_a
                if not sel.any():
                    continue
                fa = _sel_flat(f, sel)
                self._count_plan("wand_p2", len(fa["ids"]))
                with debug_time("bool.fused_dispatch2a"):
                    for out in pp.launch_fused_bool(
                        fused, _work_of(fa), _th_tables(Tb, fa, th),
                        _k_eff(per_tb[Tb], Tb), Qp, interpret,
                    ):
                        pending_a.append((None, out))
            with debug_time("bool.collect2a", n=len(pending_a)):
                self._collect_flat(pending_a, per_query, k)
            th, th_seg, th_doc = _topk_thresholds(per_query, k)
            # remainder, re-pruned against the ratcheted thresholds
            new_surv = {}
            for Tb, f in surv.items():
                rest = _sel_flat(f, f["ub"] < cut_a)
                if not len(rest["ids"]):
                    continue
                m = _keep_flat(rest, th, th_seg, th_doc)
                if m.any():
                    new_surv[Tb] = _sel_flat(rest, m)
            surv = new_surv

        pending2 = []
        for Tb, f in surv.items():
            if not len(f["ids"]):
                continue
            self._count_plan("wand_p2", len(f["ids"]))
            with debug_time("bool.fused_dispatch2"):
                for out in pp.launch_fused_bool(
                    fused, _work_of(f), _th_tables(Tb, f, th),
                    _k_eff(per_tb[Tb], Tb), Qp, interpret,
                ):
                    pending2.append((None, out))
        with debug_time("bool.collect2", n=len(pending2)):
            self._collect_flat(pending2, per_query, k)

        out = []
        for qi in range(Q):
            out.append(_chunk_hits(per_query[qi], k))
        return out

    def prewarm(self, queries_hint: list, k: int = 10, concurrency: int = 8,
                levels=(0, 1, 2)):
        """Concurrently compile the fused-kernel shape grid that batches
        shaped like `queries_hint` will hit (only the batch SIZE, query
        types, clause counts and fields matter — not the terms).

        XLA/Mosaic compilation releases the GIL, so a small thread pool
        overlaps the tens-of-seconds per-shape compiles; with the fixed
        plan-row tiers and canonical rung tier levels every corpus shares
        one grid, and the persistent compilation cache makes repeat runs
        free. Returns the number of shapes warmed."""
        import concurrent.futures as cf

        from ..ops import pallas_phrase as php
        from ..ops import pallas_probe as pp
        from ..ops import probe_scorer as ps
        from ..query import BooleanQuery, TermQuery
        from ..query.phrase_query import PhraseQuery

        interpret = ps._pallas_mode() == "interpret"
        if ps._pallas_mode() is None:
            return 0
        Q = _Q_FIXED
        fields = set()
        bool_tbs = set()
        phrase_sbs = set()
        for q in queries_hint:
            if isinstance(q, TermQuery):
                bool_tbs.add(ps.t_bucket(1))
                fields.add(q.term.field)
            elif isinstance(q, BooleanQuery):
                bool_tbs.add(ps.t_bucket(len(q.clauses)))
                fields.update(
                    tb[0].term.field
                    for tb in (self._term_clause(s) for _, s in q.clauses)
                    if tb is not None
                )
            elif type(q) is PhraseQuery:
                phrase_sbs.add(ps.t_bucket(len(q.term_bytes)) - 1)
                fields.add(q.field)
        for seg_ord in range(len(self.searcher.segment_readers())):
            for f in fields:
                self._ensure_fused_slab(seg_ord, f)
        fused = self._fused().ready()
        if phrase_sbs:
            fused.ensure_positions()
        nbp = max(-(-fused.num_blocks // 8) * 8, 8)

        jobs = []
        for Tb in bool_tbs:
            tier = self._prow_tier(0, Tb)
            tables = {
                "cl_weight": np.zeros((tier + 1, Tb), np.float32),
                "cl_kind": np.full((tier + 1, Tb), 3, np.int32),
                "cl_start": np.zeros((tier + 1, Tb), np.int32),
                "cl_len": np.zeros((tier + 1, Tb), np.int32),
                "cl_shipped": np.zeros((tier + 1, Tb), np.int32),
                "req_must": np.full(tier + 1, 1 << 30, np.int32),
                "req_should": np.zeros(tier + 1, np.int32),
            }
            rungs = pp.fused_rungs(Tb)
            # ONE shared tier level across rungs per launch (the launcher's
            # diagonal signature set): warm each level once
            for lvl in levels:
                # tier[lvl] items per rung (distinct prows so grouping keeps
                # them apart), window widths placed to populate every rung;
                # all work is no-op (cl_len 0) so execution is fast
                blocks, prow, clause, width, qid, seg = [], [], [], [], [], []
                jlo, wid, frc = [], [], []
                for kw in rungs:
                    tiers = pp._GRP_W_TIERS[kw]
                    nn = tiers[min(lvl, len(tiers) - 1)]
                    blocks.append(np.zeros(nn, dtype=np.int64))
                    prow.append(np.arange(nn, dtype=np.int64) % tier)
                    clause.append(np.zeros(nn, dtype=np.int64))
                    width.append(np.full(nn, kw, dtype=np.int64))
                    qid.append(np.arange(nn, dtype=np.int64) % Q)
                    seg.append(np.zeros(nn, dtype=np.int64))
                    j = np.full((nn, Tb), -1, dtype=np.int64)
                    w_ = np.zeros((nn, Tb), dtype=np.int64)
                    if Tb > 1:
                        j[:, 1] = 0
                        w_[:, 1] = kw
                    jlo.append(j)
                    wid.append(w_)
                    frc.append(np.zeros((nn, Tb), dtype=np.int64))
                work = (
                    np.concatenate(blocks), np.concatenate(prow),
                    np.concatenate(clause), np.concatenate(width),
                    np.concatenate(qid), np.concatenate(seg),
                    np.vstack(jlo), np.vstack(wid), np.vstack(frc),
                    np.ones(sum(len(b) for b in blocks), dtype=bool),
                )
                k_eff = _k_eff_quant(min(Tb * k, 128))
                jobs.append(("bool", work, tables, k_eff, Q, interpret))
        for Sb in phrase_sbs:
            qw = np.zeros(self._prow_tier(0, Sb + 1) + 1, dtype=np.float32)
            rungs = php._PHRASE_RUNGS
            for lvl in levels:
                per_rung = []
                for rows, tiers in rungs:
                    nn = tiers[min(lvl, len(tiers) - 1)]
                    llen = max((rows - 16) * 128, 1)
                    per_rung.append((nn, llen))
                cols = {kk_: [] for kk_ in (
                    "ids", "prow", "qid", "seg", "lpos", "llen", "anchor"
                )}
                cp_, cl_, dl_ = [], [], []
                for nn, llen in per_rung:
                    cols["ids"].append(np.arange(nn, dtype=np.int64) * 8 % nbp)
                    cols["prow"].append(
                        np.arange(nn, dtype=np.int64) % (len(qw) - 1)
                    )
                    cols["qid"].append(np.arange(nn, dtype=np.int64) % Q)
                    cols["seg"].append(np.zeros(nn, dtype=np.int64))
                    cols["lpos"].append(np.zeros(nn, dtype=np.int64))
                    cols["llen"].append(np.full(nn, llen, dtype=np.int64))
                    cols["anchor"].append(np.zeros(nn, dtype=np.int64))
                    cp_.append(np.zeros((nn, Sb), dtype=np.int64))
                    cl_.append(np.full((nn, Sb), llen, dtype=np.int64))
                    dl_.append(np.ones((nn, Sb), dtype=np.int64))
                work = (
                    np.concatenate(cols["ids"]),
                    np.concatenate(cols["prow"]),
                    np.concatenate(cols["qid"]),
                    np.concatenate(cols["seg"]),
                    np.concatenate(cols["lpos"]),
                    np.concatenate(cols["llen"]),
                    np.vstack(cp_), np.vstack(cl_), np.vstack(dl_),
                    np.concatenate(cols["anchor"]),
                )
                k_eff = _k_eff_quant(min(2 * k, 128))
                jobs.append(("phrase", work, qw, Sb, k_eff, Q, interpret))

        def run(job):
            if job[0] == "bool":
                _, work, tables, k_eff, Qn, interp = job
                outs = pp.launch_fused_bool(
                    fused, work, tables, k_eff, Qn, interp
                )
            else:
                _, work, qw, Sb, k_eff, Qn, interp = job
                outs = php.launch_fused_phrase(
                    fused, work, qw, Sb, k_eff, Qn, interp
                )
            for o in outs:
                np.asarray(o)
            return 1

        with cf.ThreadPoolExecutor(max_workers=concurrency) as pool:
            done = list(pool.map(run, jobs))
        return sum(done)

    def _expand_phrase_prefix(self, q):
        """Expand a PhrasePrefixQuery into per-expansion sub-queries for the
        device kernels, or None when device expansion can't reproduce the
        host semantics (per-segment truncation at max_expansions).

        Exactness: the host merges expansions with max-score-per-doc
        (`query/phrase_query.py` PhrasePrefixWeight). If doc d is in the
        union-max top-k, it is in the top-k of the expansion where it
        attains its max (any doc beating it there beats it in the union
        too), so merging the per-expansion top-k lists with
        dedup-by-address-keep-max is exact."""
        from ..query import TermQuery
        from ..query.phrase_query import PhraseQuery
        from ..schema.term import Term

        prefix = q.term_bytes[-1]
        union: set[bytes] = set()
        for reader in self.searcher.segment_readers():
            td = reader.inverted_index(q.field).termdict
            ords = list(td.prefix_ords(prefix))
            if len(ords) > q.max_expansions:
                return None  # per-segment truncation: host semantics only
            union.update(td.term(o) for o in ords)
        subs = []
        for tb in sorted(union):
            if len(q.term_bytes) == 1:
                subs.append(TermQuery(Term(q.field, tb)))
            else:
                subs.append(
                    PhraseQuery(q.field, q.term_bytes[:-1] + [tb])
                )
        return subs

    def search_batch(self, queries: list, k: int):
        """Generic batched search: routes term, boolean(term), phrase and
        phrase-prefix (expanded) queries to the device kernels, everything
        else to the host engine (which itself prunes via `Weight.topk`)."""
        from ..collector import TopDocs
        from ..query import TermQuery

        from ..ops.probe_scorer import _pallas_mode
        from ..query import BooleanQuery
        from ..query.phrase_query import PhrasePrefixQuery

        n_orig = len(queries)
        results: list = [None] * n_orig
        queries = list(queries)
        pallas = _pallas_mode() is not None

        # expansions: sub-queries appended to the batch; their per-expansion
        # top-k lists merge by dedup-keep-max afterward. Exact for
        # phrase-prefix (host PhrasePrefixWeight merges max-per-doc) AND for
        # dismax with tie_breaker 0 (score = max over clause scores; a doc's
        # max is attained in some clause c, and anything beating it in c's
        # top-k beats it in the union — so union-max of per-clause top-k is
        # the true top-k).
        from ..query import DisjunctionMaxQuery

        sub_of: dict[int, list[int]] = {}
        if pallas:
            for i in range(n_orig):
                q = queries[i]
                subs = None
                if isinstance(q, PhrasePrefixQuery):
                    if self._prefix_device_eligible(q):
                        continue  # rides the fused phrase launch directly
                    subs = self._expand_phrase_prefix(q)
                    if subs is None:
                        self._count_fallback("phrase_prefix_trunc")
                        continue
                elif (
                    isinstance(q, DisjunctionMaxQuery)
                    and q.tie_breaker == 0.0
                    and q.queries
                    and all(
                        self._term_clause(c) is not None for c in q.queries
                    )
                ):
                    subs = q.queries
                if subs is None:
                    continue
                ids = []
                for s in subs:
                    ids.append(len(queries))
                    queries.append(s)
                sub_of[i] = ids

        term_ids = [
            i
            for i, q in enumerate(queries)
            if isinstance(q, TermQuery)
        ]
        boosted_ids = [
            i
            for i, q in enumerate(queries)
            if not isinstance(q, TermQuery)
            and self._term_clause(q) is not None
        ]
        bool_ids = [
            i
            for i, q in enumerate(queries)
            if self._bool_device_eligible(q)
        ]
        if (term_ids or boosted_ids) and pallas:
            # single-SHOULD boolean == term query (identical scores and
            # tie-breaks); the pallas probe path beats the flat term
            # kernel. Top-level boosted terms fold like boolean clauses.
            for i in term_ids + boosted_ids:
                queries[i] = BooleanQuery.union([queries[i]])
            bool_ids = sorted(set(bool_ids) | set(term_ids) |
                              set(boosted_ids))
            term_ids = []
        phrase_ids = [
            i
            for i, q in enumerate(queries)
            if self._phrase_device_eligible(q)
            or (pallas and self._prefix_device_eligible(q))
        ]
        sub_ids = {i for ids in sub_of.values() for i in ids}
        other = (
            set(range(n_orig))
            - set(term_ids)
            - set(bool_ids)
            - set(phrase_ids)
            - set(sub_of.keys())
        )
        sub_results: dict[int, list] = {}

        def put(i, r):
            if i < n_orig:
                results[i] = r
            else:
                sub_results[i] = r

        if term_ids:
            sub = self.search_term_batch(
                [queries[i].term for i in term_ids], k
            )
            for i, r in zip(term_ids, sub):
                put(i, r)
        if bool_ids:
            sub = self.search_boolean_batch([queries[i] for i in bool_ids], k)
            for i, r in zip(bool_ids, sub):
                put(i, r)
        if phrase_ids:
            sub = self.search_phrase_batch(
                [queries[i] for i in phrase_ids], k
            )
            for i, r in zip(phrase_ids, sub):
                put(i, r)
        # any sub-query that missed every device route runs on host
        for i in sorted(sub_ids - set(bool_ids) - set(phrase_ids)):
            if i not in sub_results:
                sub_results[i] = self.searcher.search(queries[i], TopDocs(k))
        for i, ids in sub_of.items():
            hits = [h for j in ids for h in sub_results.get(j, [])]
            _dedup_hits(hits)
            results[i] = hits[:k]
        for i in sorted(other):
            results[i] = self.searcher.search(queries[i], TopDocs(k))
        return results

    def search_batches(self, batches: list, k: int, pipeline: int = 3):
        """Pipelined execution of consecutive query batches: up to
        `pipeline` batches in flight on worker threads, so one batch's
        host work (numpy planning, which releases the GIL on large ops,
        and device-result fetches, which block outside the GIL) overlaps
        another batch's device execution. Depth 3 measures best on the
        1M-doc OR suite (~150-170 QPS vs 128 sequential, GIL thrash beyond
        depth 4 — scripts/profile_or.py). The TPU stream serializes the
        actual kernel launches; the pipeline hides host latency behind
        them — the steady-state rate approaches
        max(host_s, device_s) per batch instead of their sum.

        Per-batch worker spans (seconds, processing start -> finish, so
        queue wait is excluded) land in `self.batch_spans`. Results are
        returned one list per batch, in submission order.

        Reference contrast: tantivy fans one query out across segments via
        a rayon pool (`core/searcher.rs:220-237`); here the query stream
        itself is the parallel axis and the overlap is host-vs-device."""
        import concurrent.futures as cf
        import time as _time

        if not batches:
            self.batch_spans = []
            return []
        results: list = [None] * len(batches)
        spans = [0.0] * len(batches)

        def run(i: int):
            t0 = _time.monotonic()
            results[i] = self.search_batch(batches[i], k)
            spans[i] = _time.monotonic() - t0

        if pipeline <= 1 or len(batches) == 1:
            for i in range(len(batches)):
                run(i)
        else:
            with cf.ThreadPoolExecutor(max_workers=pipeline) as pool:
                list(pool.map(run, range(len(batches))))
        self.batch_spans = spans
        return results

    # ------------------------------------------------------------------
    # batched aggregation (shares the per-segment doc pass across requests)

    def agg_batch(self, requests: list[dict], query=None) -> list[dict]:
        """Execute N aggregation requests over one query's doc set,
        evaluating the query ONCE per segment and sharing the candidate
        docs (and the per-reader cached column factorizations) across all
        requests — the reference runs one `AggregationCollector` per
        request, re-driving the query each time (`collector.rs:23`)."""
        from ..aggregation import (
            AggregationCollector,
            collect_segment_aggs,
        )
        from ..query import AllQuery

        if not requests:
            return []
        cols = [AggregationCollector(r) for r in requests]
        query = query or AllQuery()
        scoring = any(c.requires_scoring() for c in cols)
        weight = query.weight(self.searcher, scoring=scoring)
        fruits: list[list] = [[] for _ in requests]
        from ..collector import _alive_filter

        for seg_ord, reader in enumerate(self.searcher.segment_readers()):
            res = weight.execute(reader)
            docs, scores = _alive_filter(res, reader)
            if not scoring:
                scores = None
            for ci, c in enumerate(cols):
                fruits[ci].append(
                    collect_segment_aggs(
                        c.aggs, reader, seg_ord, docs, scores, c.limits
                    )
                )
        return [c.merge_fruits(f) for c, f in zip(cols, fruits)]

    # ------------------------------------------------------------------
    # batched counting (the reference's Count collector, batched)

    def _sorted_column(self, seg_ord: int, field: str):
        cache = getattr(self, "_sorted_col_cache", None)
        if cache is None:
            cache = self._sorted_col_cache = {}
        key = (seg_ord, field)
        sv = cache.get(key)
        if sv is None:
            col = self.searcher.segment_readers()[seg_ord].fast_fields() \
                .column(field)
            sv = cache[key] = np.sort(col.values)
        return sv

    def count_batch(self, queries: list) -> list[int]:
        """Batched Count collection. Fast-field range queries over FULL
        columns in delete-free segments collapse to two `searchsorted`
        probes on a cached sorted copy of the column — O(log n) per
        (query, segment) instead of the reference's per-query column scan
        (`range_query_fastfield.rs`, `fast_field_range_doc_set.rs:43`).
        Everything else (deletes, optional/multi columns, non-range
        queries) takes the host Count path."""
        from ..collector import Count
        from ..fastfield import CARD_FULL
        from ..query.range_query import FastFieldRangeWeight, RangeQuery

        out = [0] * len(queries)
        readers = self.searcher.segment_readers()
        other = []
        for i, q in enumerate(queries):
            if not isinstance(q, RangeQuery):
                other.append(i)
                continue
            w = q.weight(self.searcher, False)
            if not isinstance(w, FastFieldRangeWeight):
                other.append(i)
                continue
            lo, hi = w._bounds_u64()
            total = 0
            fast_ok = True
            for seg_ord, reader in enumerate(readers):
                if reader.alive_bitset() is not None:
                    fast_ok = False
                    break
                col = reader.fast_fields().column(q.field)
                if col is None:
                    continue
                if col.cardinality != CARD_FULL:
                    fast_ok = False
                    break
                if lo > hi:
                    continue
                sv = self._sorted_column(seg_ord, q.field)
                total += int(
                    np.searchsorted(sv, np.uint64(hi), side="right")
                    - np.searchsorted(sv, np.uint64(lo), side="left")
                )
            if fast_ok:
                out[i] = total
            else:
                other.append(i)
        for i in other:
            out[i] = self.searcher.search(queries[i], Count())
        return out

    # ------------------------------------------------------------------
    # phrase batches

    def _phrase_device_eligible(self, q) -> bool:
        from ..ops.phrase_scorer import T_MAX
        from ..query.phrase_query import PhraseQuery
        from ..schema import IndexRecordOption

        if type(q) is not PhraseQuery:
            return False
        if q.slop != 0 or not (2 <= len(q.term_bytes) <= T_MAX):
            return False
        entry = self.searcher.schema.get_field(q.field)
        return (
            entry.index_record_option()
            == IndexRecordOption.WITH_FREQS_AND_POSITIONS
        )

    def _prefix_device_eligible(self, q) -> bool:
        """Multi-term PhrasePrefixQuery rides the fused phrase launch
        directly (per-segment capped expansions as plan rows — see
        `_search_phrase_fused`); single-term prefixes expand to term
        sub-queries in `search_batch` instead."""
        from ..ops.phrase_scorer import T_MAX
        from ..query.phrase_query import PhrasePrefixQuery
        from ..schema import IndexRecordOption

        if type(q) is not PhrasePrefixQuery:
            return False
        if not (2 <= len(q.term_bytes) <= T_MAX):
            return False
        entry = self.searcher.schema.get_field(q.field)
        return (
            entry.index_record_option()
            == IndexRecordOption.WITH_FREQS_AND_POSITIONS
        )

    def _host_segment_topk(self, query, seg_ord: int, reader, k: int):
        """Exact host evaluation of one query over one segment, as a hit
        CHUNK (scores, segs, docs arrays) — the per-segment fallback for
        device-path corner cases (e.g. pathological in-doc tf)."""
        weight = query.weight(self.searcher, True)
        res = weight.topk(reader, k)  # alive-filtered, may prune
        docs, scores = res.docs, res.scores
        order = np.lexsort((docs, _sortable_desc_np(scores)))[:k]
        return (
            scores[order].astype(np.float32, copy=False),
            np.full(len(order), seg_ord, dtype=np.int32),
            docs[order].astype(np.uint32, copy=False),
        )

    def _phrase_plan_rows(self, q) -> int:
        """Upper bound on the plan rows one phrase(-prefix) query adds:
        one per segment for plain phrases; the per-segment CAPPED
        expansion count for phrase-prefixes (each expansion is its own
        plan row with its own BM25 weight)."""
        from ..query.phrase_query import PhrasePrefixQuery

        readers = self.searcher.segment_readers()
        if type(q) is not PhrasePrefixQuery:
            return max(1, len(readers))
        tot = 0
        for reader in readers:
            td = reader.inverted_index(q.field).termdict
            tot += min(
                len(td.prefix_ords(q.term_bytes[-1])), q.max_expansions
            )
        return max(tot, 1)

    def _search_phrase_fused(self, queries: list, k: int):
        """Fused pallas phrase batch: position-slab kernel, one launch per
        phase (see `ops/pallas_phrase.py`). Work items anchor on the rarest
        term's blocks; anchor blocks whose own position slab exceeds the
        anchor cap, or whose partner spans exceed the widest rung, are
        re-anchored through the densest other term (all phrase terms are
        MUSTs, so any term's blocks cover every match in their doc range);
        re-anchoring can double-report docs with identical exact scores —
        the merge-tail dedup-by-address absorbs that. Irreducibly wide
        prows fall back to exact host evaluation (counted).

        PhrasePrefixQuery rides the SAME launch: each (query, segment,
        expansion) becomes its own plan row — the segment's capped
        `prefix_ords` range in term order, exactly the host truncation
        (`phrase_query.py` PhrasePrefixWeight.execute) — carrying that
        expansion's own Bm25 weight; all rows share the query's qid and
        the merge tail's dedup-keep-max realizes the union-max expansion
        semantics exactly (reference `phrase_prefix_query/`, 660 LoC)."""
        from ..ops import pallas_phrase as php
        from ..ops import probe_scorer as ps
        from ..query.bm25 import Bm25Weight
        from ..query.phrase_query import PhrasePrefixQuery
        from ..schema.term import Term

        Q = len(queries)
        if Q == 0:
            return []
        readers = self.searcher.segment_readers()
        # plan rows (one per (query, segment, expansion) with all terms
        # present) ride SMEM scalar prefetch: cap total rows at the fixed
        # plan-row tier and sub-batch beyond
        n_segs = max(1, len(readers))
        max_tb = max(ps.t_bucket(len(q.term_bytes)) for q in queries)
        tier = self._prow_tier(0, max_tb)
        rows_of = [self._phrase_plan_rows(q) for q in queries]
        if Q > 1 and (Q > _Q_FIXED or sum(rows_of) > tier):
            # greedy row-budget chunking (recursing per chunk)
            out = []
            lo = 0
            acc = 0
            for i in range(Q):
                if i > lo and (
                    acc + rows_of[i] > tier or i - lo >= _Q_FIXED
                ):
                    out.extend(
                        self._search_phrase_fused(queries[lo:i], k)
                    )
                    lo, acc = i, 0
                acc += rows_of[i]
            out.extend(self._search_phrase_fused(queries[lo:], k))
            return out
        if rows_of and rows_of[0] > tier and Q == 1:
            # a single query's expansion rows exceed the tier: exact host
            from ..collector import TopDocs

            self._count_fallback("phrase_rows_overflow")
            return [self.searcher.search(queries[0], TopDocs(k))]
        Qp = _q_tier(Q)  # static num_queries: fixed (see _q_tier)
        interpret = ps._pallas_mode() == "interpret"
        wcache: dict = {}

        def _w_terms(field: str, term_bytes: list[bytes]) -> np.float32:
            key = (field, tuple(term_bytes))
            w = wcache.get(key)
            if w is None:
                fs = self._field_stats.get(field)
                if fs is None:
                    fs = self.searcher.field_statistics(field)
                    self._field_stats[field] = fs
                dfs = [
                    self.searcher.doc_freq(Term(field, tb))
                    for tb in term_bytes
                ]
                w = wcache[key] = Bm25Weight.for_terms(
                    dfs, fs.total_num_docs, fs.average_fieldnorm
                ).weight
            return w
        for seg_ord in range(len(readers)):
            for f in {q.field for q in queries}:
                self._ensure_fused_slab(seg_ord, f)
        fused = self._fused().ready()
        fused.ensure_positions()
        blk_pos = fused.blk_pos

        M1 = _m1()
        per_query: list[list] = [[] for _ in range(Q)]
        groups: dict[int, dict] = {}  # keyed by n_partners bucket

        def overlaps(ids, s2, n2):
            lo = fused.blk_base[ids].astype(np.uint64)
            hi = fused.blk_last_doc[ids].astype(np.uint64)
            i0 = s2 + np.searchsorted(
                fused.blk_last_doc[s2 : s2 + n2], lo, side="left"
            )
            i1 = s2 + np.searchsorted(
                fused.blk_base[s2 : s2 + n2], hi, side="right"
            )
            return i0, i1

        def plan_anchor(qw, anchor, regions, offsets, ids):
            """Work columns for anchor-term blocks `ids` (global): returns
            (ok items dict, bad mask) — bad = fat anchor slab or over-wide
            partner span. `qw` = the plan row's phrase weight."""
            T = len(regions)
            n = len(ids)
            lpos = blk_pos[ids].astype(np.int64)
            llen = blk_pos[ids + 1] - lpos
            S = ps.t_bucket(T) - 1
            cpos = np.zeros((n, S), dtype=np.int64)
            clen = np.zeros((n, S), dtype=np.int64)
            delta = np.zeros((n, S), dtype=np.int64)
            drop = np.zeros(n, dtype=bool)
            span = np.zeros(n, dtype=np.int64)
            # UB factor: phrase tf <= every term's tf in the doc, so the
            # anchor's block-max tf-factor AND each partner's windowed
            # block-max both dominate the phrase factor — take the min
            # (all f32, rounding monotone, so `ub >= score` stays
            # bit-exact; see FieldWand.clause_blocks_ub)
            fac = fused.bfac[ids].copy()
            slot = 0
            for t in range(T):
                if t == anchor:
                    continue
                s2, n2 = regions[t]
                i0, i1 = overlaps(ids, s2, n2)
                drop |= i1 <= i0  # a phrase term is a MUST
                fac = np.minimum(fac, fused.rmax.query(i0, i1))
                p0 = blk_pos[i0]
                p1 = blk_pos[i1]
                cpos[:, slot] = p0
                clen[:, slot] = p1 - p0
                delta[:, slot] = offsets[t] - offsets[anchor]
                span = np.maximum(span, p1 - p0)
                slot += 1
            bad = (llen > php.ANCHOR_POS_CAP) | (span > php.PARTNER_POS_CAP)
            ub = (np.float32(qw) * fac).astype(np.float32)
            keep = ~drop
            return {
                "ids": ids[keep], "lpos": lpos[keep], "llen": llen[keep],
                "cpos": cpos[keep], "clen": clen[keep],
                "delta": delta[keep], "span": span[keep], "ub": ub[keep],
                "bad": bad[keep],
                "anchor": np.full(int(keep.sum()), anchor, dtype=np.int64),
            }

        def plan_anchors_batched(calls):
            """Vectorized `plan_anchor` over many (qw, anchor, regions,
            offsets, ids) calls: ONE composite-key searchsorted
            (`FusedStore.region_keys`) replaces the per-(query, segment,
            partner) sub-array searches; per-partner f32 `min` folds are
            exact and commutative, so results are bitwise identical to the
            per-call loop."""
            if not calls:
                return []
            ns_ = np.array([len(c[4]) for c in calls], dtype=np.int64)
            offs = np.zeros(len(calls) + 1, dtype=np.int64)
            np.cumsum(ns_, out=offs[1:])
            R = int(offs[-1])
            ids = np.concatenate([c[4] for c in calls]) if R else \
                np.zeros(0, dtype=np.int64)
            lpos = blk_pos[ids].astype(np.int64)
            llen = blk_pos[ids + 1] - lpos
            lo = fused.blk_base[ids].astype(np.uint64)
            hi = fused.blk_last_doc[ids].astype(np.uint64)
            S_max = 1
            p_call, p_slot, p_s2, p_delta = [], [], [], []
            for c_i, (qw_, anchor, regions, offsets_, _) in enumerate(calls):
                T = len(regions)
                S_max = max(S_max, ps.t_bucket(T) - 1)
                slot = 0
                for t in range(T):
                    if t == anchor:
                        continue
                    p_call.append(c_i)
                    p_slot.append(slot)
                    p_s2.append(regions[t][0])
                    p_delta.append(offsets_[t] - offsets_[anchor])
                    slot += 1
            cpos = np.zeros((R, S_max), dtype=np.int64)
            clen = np.zeros((R, S_max), dtype=np.int64)
            delta = np.zeros((R, S_max), dtype=np.int64)
            drop = np.zeros(R, dtype=bool)
            span = np.zeros(R, dtype=np.int64)
            fac = fused.bfac[ids].copy()
            if p_call:
                p_call_a = np.array(p_call, dtype=np.int64)
                cnt = ns_[p_call_a]
                pofs = np.zeros(len(p_call_a) + 1, dtype=np.int64)
                np.cumsum(cnt, out=pofs[1:])
                P = int(pofs[-1])
                rix = (
                    np.repeat(offs[p_call_a] - pofs[:-1], cnt)
                    + np.arange(P, dtype=np.int64)
                )
                sh = np.uint64(32)
                rid = np.repeat(np.array(p_s2, dtype=np.uint64), cnt) << sh
                cblast, cbbase = fused.region_keys
                i0 = np.searchsorted(cblast, rid | lo[rix], side="left")
                i1 = np.searchsorted(cbbase, rid | hi[rix], side="right")
                bad_ov = i1 <= i0
                if bad_ov.any():
                    drop[rix[bad_ov]] = True
                ov = fused.rmax.query(i0, i1)
                p0 = blk_pos[i0]
                p1 = blk_pos[i1]
                col = np.repeat(np.array(p_slot, dtype=np.int64), cnt)
                cpos[rix, col] = p0
                clen[rix, col] = p1 - p0
                delta[rix, col] = np.repeat(
                    np.array(p_delta, dtype=np.int64), cnt
                )
                slot_rows = col
                for s_i in range(S_max):
                    sel = slot_rows == s_i
                    if not sel.any():
                        continue
                    r_s = rix[sel]
                    fac[r_s] = np.minimum(fac[r_s], ov[sel])
                    span[r_s] = np.maximum(span[r_s], (p1 - p0)[sel])
            qw_rows = np.repeat(
                np.array([np.float32(c[0]) for c in calls],
                         dtype=np.float32),
                ns_,
            )
            ub = (qw_rows * fac).astype(np.float32)
            bad = (llen > php.ANCHOR_POS_CAP) | (span > php.PARTNER_POS_CAP)
            anchors = np.repeat(
                np.array([c[1] for c in calls], dtype=np.int64), ns_
            )
            out = []
            for c_i, (qw_, anchor, regions, offsets_, _) in enumerate(calls):
                s, e = int(offs[c_i]), int(offs[c_i + 1])
                keep = ~drop[s:e]
                S = ps.t_bucket(len(regions)) - 1

                def cut(a):
                    part = a[s:e]
                    return part[keep] if not keep.all() else part

                out.append({
                    "ids": cut(ids), "lpos": cut(lpos), "llen": cut(llen),
                    "cpos": cut(cpos)[:, :S], "clen": cut(clen)[:, :S],
                    "delta": cut(delta)[:, :S], "span": cut(span),
                    "ub": cut(ub), "bad": cut(bad), "anchor": cut(anchors),
                })
            return out

        _dtp = debug_time("phrase.plan")
        _dtp.__enter__()
        phrase_plans = []
        anchor_calls = []
        for seg_ord, reader in enumerate(readers):
            for qi, q in enumerate(queries):
                field = q.field
                T = len(q.term_bytes)
                is_prefix = type(q) is PhrasePrefixQuery
                fixed = q.term_bytes[:-1] if is_prefix else q.term_bytes
                ords = [
                    self._term_ord(seg_ord, reader, field, tb)
                    for tb in fixed
                ]
                if any(o < 0 for o in ords):
                    continue
                offsets = (
                    list(range(T)) if is_prefix else q.offsets
                )
                if is_prefix:
                    # one plan row per CAPPED expansion (host truncation
                    # semantics: first max_expansions ords in term order,
                    # per segment)
                    td = reader.inverted_index(field).termdict
                    exp_ords = list(
                        td.prefix_ords(q.term_bytes[-1])
                    )[: q.max_expansions]
                    expansions = [
                        (eo, td.term(eo)) for eo in exp_ords
                    ]
                else:
                    expansions = [(ords[-1], None)]
                    ords = ords[:-1]
                for eo, etb in expansions:
                    regions = [
                        fused.region(seg_ord, field, o) for o in ords
                    ] + [fused.region(seg_ord, field, eo)]
                    if is_prefix:
                        w = _w_terms(field, fixed + [etb])
                    else:
                        w = _w_terms(field, q.term_bytes)
                    leader = min(range(T), key=lambda t: regions[t][1])
                    s0, n0 = regions[leader]
                    anchor_calls.append((
                        w, leader, regions, offsets,
                        np.arange(s0, s0 + n0, dtype=np.int64),
                    ))
                    phrase_plans.append(
                        (seg_ord, reader, qi, q, T, regions, leader, w,
                         offsets)
                    )
        batched = plan_anchors_batched(anchor_calls)

        fell: set = set()  # (qi, seg_ord) already host-fallbacked
        pending_rows: dict[int, list] = {}  # qi -> [(Sb, prow, seg, staged)]
        for (seg_ord, reader, qi, q, T, regions, leader, w, offsets), \
                plan in zip(phrase_plans, batched):
            if (qi, seg_ord) in fell:
                continue
            staged = [(leader, plan)]
            fallback = False
            if plan["bad"].any():
                others_nblk = [
                    (regions[t][1], t) for t in range(T) if t != leader
                ]
                t_alt = max(others_nblk)[1]
                s2, n2 = regions[t_alt]
                bad_ids = plan["ids"][plan["bad"]]
                # doc-level alt-block selection: when the bad anchor blocks
                # are few (a rare term whose sparse blocks span the whole
                # segment — every phrase-prefix expansion looks like this),
                # decode their doc ids from the slab's host cstore and keep
                # only alt blocks CONTAINING one, instead of every alt
                # block in the doc-range overlap (which is ALL of a common
                # partner's blocks). Exact: a phrase match needs all terms
                # in the doc, so a matching doc's alt block always holds
                # one of these docs. This is the reference's
                # enumerate-rarest / seek-denser intersection shape
                # (`phrase_scorer.rs`, `block_wand_intersection.rs`).
                if len(bad_ids) <= 64:
                    slab = fused.slabs[(seg_ord, q.field)]
                    local = bad_ids - slab["offset"]
                    docs = slab["cstore"][local, 0:128].ravel()
                    docs = docs[docs != TERMINATED_U32]
                    lastd = fused.blk_last_doc[s2 : s2 + n2]
                    j = s2 + np.searchsorted(lastd, docs)
                    union = np.unique(j[j < s2 + n2]).astype(np.int64)
                else:
                    i0, i1 = overlaps(bad_ids, s2, n2)
                    union = np.unique(
                        np.concatenate(
                            [np.arange(a, b) for a, b in zip(i0, i1)]
                            or [np.zeros(0, dtype=np.int64)]
                        )
                    )
                plan2 = plan_anchor(
                    w, t_alt, regions, offsets, union
                )
                if plan2["bad"].any():
                    fallback = True
                else:
                    # drop the bad originals; exploded cover them
                    good = ~plan["bad"]
                    plan = {
                        kk_: vv[good] for kk_, vv in plan.items()
                    }
                    staged = [(leader, plan), (t_alt, plan2)]
                    self._count_plan("phrase_reanchor")
            if fallback:
                # once per (query, segment): the host result is the exact
                # union-max over ALL expansions, so any expansion rows of
                # this pair already staged stay sound (dedup keeps max)
                fell.add((qi, seg_ord))
                per_query[qi].append(
                    self._host_segment_topk(q, seg_ord, reader, k)
                )
                self._count_fallback("phrase_wide")
                continue
            if sum(len(p["ids"]) for _, p in staged) == 0:
                continue

            Sb = ps.t_bucket(T) - 1
            g = groups.get(Sb)
            if g is None:
                g = groups[Sb] = {
                    "qw_rows": [], "meta": [], "p1": [], "rest": [],
                    "any_dup": False,
                }
            prow = len(g["qw_rows"])
            g["qw_rows"].append(w)
            g["meta"].append((qi, seg_ord))
            if len(staged) > 1:
                g["any_dup"] = True
            self._count_plan(
                "wand_candidates",
                sum(len(p["ids"]) for _, p in staged),
            )
            pr = pending_rows.setdefault(qi, [])
            pr.append((Sb, prow, seg_ord, staged))

        # phase-1 slice with a per-QUERY budget: M1 best-UB items per
        # (query, segment-with-rows) shared ACROSS the query's plan rows.
        # A plain phrase has one row per segment so the budget matches the
        # old per-row cut; a phrase-PREFIX has one row per (segment,
        # expansion) — up to max_expansions per segment — and the old
        # per-row cut shipped M1 x expansions items into phase 1 (~26x a
        # plain phrase at the bench's 1M-doc prefix mix), defeating the
        # point of the slice. The split is planning-only: phase 2 prunes
        # the remainder against exact thresholds, so results are
        # unchanged (reference contrast: block_wand pivots per query, not
        # per expansion — `block_wand_union.rs:16`).
        for qi, rows in pending_rows.items():
            segs_q = {so for _, _, so, _ in rows}
            budget = M1 * max(len(segs_q), 1)
            all_ub = np.concatenate(
                [p["ub"] for _, _, _, staged in rows for _, p in staged]
            )
            if len(all_ub) <= budget:
                cut = NEG_INF
            else:
                cut = np.partition(all_ub, len(all_ub) - budget)[
                    len(all_ub) - budget
                ]
            taken = 0
            for Sb, prow, seg_ord, staged in rows:
                g = groups[Sb]
                for _, p in staged:
                    pick = p["ub"] >= cut
                    extra = int(pick.sum()) - (budget - taken)
                    if extra > 0:
                        selidx = np.nonzero(pick)[0]
                        pick[selidx[len(selidx) - extra:]] = False
                    taken += int(pick.sum())
                    self._count_plan("wand_p1", int(pick.sum()))
                    for name, sel in (("p1", pick), ("rest", ~pick)):
                        if sel.any():
                            g[name].append(
                                (prow, qi, seg_ord,
                                 {kk_: vv[sel] for kk_, vv in p.items()})
                            )

        def build_work(items):
            cols = {}
            for key in ("ids", "lpos", "llen", "cpos", "clen", "delta",
                        "anchor"):
                cols[key] = np.concatenate([p[key] for _, _, _, p in items])
            prow = np.concatenate(
                [np.full(len(p["ids"]), pr, np.int32)
                 for pr, _, _, p in items]
            )
            qid = np.concatenate(
                [np.full(len(p["ids"]), qi_, np.int32)
                 for _, qi_, _, p in items]
            )
            seg = np.concatenate(
                [np.full(len(p["ids"]), so, np.int32)
                 for _, _, so, p in items]
            )
            return (
                cols["ids"], prow, qid, seg, cols["lpos"], cols["llen"],
                cols["cpos"], cols["clen"], cols["delta"], cols["anchor"],
            )

        _dtp.__exit__(None, None, None)
        pending1 = []
        tb_qw = {}
        _dt1 = debug_time("phrase.dispatch1")
        _dt1.__enter__()
        for Sb, g in groups.items():
            # pad the plan-row table to the FIXED tier (like the boolean
            # path's finalize_tables): its length is a STATIC jit arg
            # (num_prows), so sizing it to the actual row count — which
            # varies with batch content — recompiled both phase programs
            # (~40s) on every fresh batch
            tier = self._prow_tier(len(g["qw_rows"]), Sb + 1)
            assert len(g["qw_rows"]) <= tier, \
                "plan rows exceed the fixed prow tier"
            qw_table = np.zeros(tier + 1, dtype=np.float32)
            qw_table[: len(g["qw_rows"])] = g["qw_rows"]
            tb_qw[Sb] = qw_table
            if not g["p1"]:
                continue
            k_eff = _k_eff_quant(min(2 * k, 128))
            for out in php.launch_fused_phrase(
                fused, build_work(g["p1"]), qw_table, Sb, k_eff, Qp,
                interpret,
            ):
                pending1.append((None, out))
        _dt1.__exit__(None, None, None)
        with debug_time("phrase.collect1", n=len(pending1)):
            self._collect_flat(pending1, per_query, k)
        th, th_seg, th_doc = _topk_thresholds(per_query, k)

        # phase 2 with the same threshold RATCHET as the boolean path: when
        # many anchor blocks survive (phrase UBs are loose — UB assumes
        # phrase tf = leader tf), ship the best-UB slice, re-tighten, then
        # prune the bulk. Thresholds only rise, so pruning stays exact.
        def _keep_groups(groups_rest, th, th_seg, th_doc):
            out = {}
            for Sb, rest in groups_rest.items():
                kept = []
                for prow, qi, seg_ord, p in rest:
                    keep = _phase2_keep(
                        p["ub"], fused.blk_base[p["ids"]], seg_ord,
                        th[qi], th_seg[qi], th_doc[qi],
                    )
                    if keep.any():
                        kept.append(
                            (prow, qi, seg_ord,
                             {kk_: vv[keep] for kk_, vv in p.items()})
                        )
                out[Sb] = kept
            return out

        surv = _keep_groups(
            {Sb: g["rest"] for Sb, g in groups.items()}, th, th_seg, th_doc
        )
        total_surv = sum(
            len(p["ids"]) for items in surv.values() for _, _, _, p in items
        )
        if total_surv > _RATCHET_MIN_PER_Q * Q:
            self._count_plan("phrase_ratchet")
            all_ub = np.concatenate(
                [p["ub"] for items in surv.values() for _, _, _, p in items]
            )
            top = min(max(_RATCHET_TOP_PER_Q * Q, 1), len(all_ub))
            cut_a = np.partition(all_ub, len(all_ub) - top)[len(all_ub) - top]
            pending_a = []
            remainder = {}
            _dta = debug_time("phrase.dispatch2a")
            _dta.__enter__()
            for Sb, items in surv.items():
                round_a, rest = [], []
                for prow, qi, seg_ord, p in items:
                    sel = p["ub"] >= cut_a
                    if sel.any():
                        round_a.append(
                            (prow, qi, seg_ord,
                             {kk_: vv[sel] for kk_, vv in p.items()})
                        )
                    if (~sel).any():
                        rest.append(
                            (prow, qi, seg_ord,
                             {kk_: vv[~sel] for kk_, vv in p.items()})
                        )
                remainder[Sb] = rest
                if round_a:
                    self._count_plan(
                        "wand_p2",
                        sum(len(p["ids"]) for _, _, _, p in round_a),
                    )
                    k_eff = _k_eff_quant(min(2 * k, 128))
                    rt = np.full(len(tb_qw[Sb]), NEG_INF, dtype=np.float32)
                    for prow, qi, _, _p in round_a:
                        rt[prow] = th[qi]
                    for out in php.launch_fused_phrase(
                        fused, build_work(round_a), tb_qw[Sb], Sb, k_eff, Qp,
                        interpret, row_th=rt,
                    ):
                        pending_a.append((None, out))
            _dta.__exit__(None, None, None)
            with debug_time("phrase.collect2a", n=len(pending_a)):
                self._collect_flat(pending_a, per_query, k)
            th, th_seg, th_doc = _topk_thresholds(per_query, k)
            surv = _keep_groups(remainder, th, th_seg, th_doc)

        pending2 = []
        _dt2 = debug_time("phrase.dispatch2")
        _dt2.__enter__()
        for Sb, items in surv.items():
            if not items:
                continue
            self._count_plan(
                "wand_p2", sum(len(p["ids"]) for _, _, _, p in items)
            )
            k_eff = _k_eff_quant(min(2 * k, 128))
            rt = np.full(len(tb_qw[Sb]), NEG_INF, dtype=np.float32)
            for prow, qi, _, _p in items:
                rt[prow] = th[qi]
            for out in php.launch_fused_phrase(
                fused, build_work(items), tb_qw[Sb], Sb, k_eff, Qp,
                interpret, row_th=rt,
            ):
                pending2.append((None, out))
        _dt2.__exit__(None, None, None)
        with debug_time("phrase.collect2", n=len(pending2)):
            self._collect_flat(pending2, per_query, k)

        out = []
        for qi in range(Q):
            out.append(_chunk_hits(per_query[qi], k))
        return out

    def search_phrase_batch(self, queries: list, k: int):
        """Batched phrase(slop=0) queries on device with the same two-phase
        Block-WAND pruning as booleans: candidates come from the rarest
        term's blocks; UB = phrase_weight * leader bfac (phrase tf <= leader
        tf). Per-(query, segment) host fallback covers pathological in-doc
        tf (> MAX_P on the leader / >= 2^(POS_ITERS-1) elsewhere)."""
        from ..ops import phrase_scorer as ph
        from ..query.bm25 import Bm25Weight
        from ..schema.term import Term

        from ..ops.probe_scorer import _pallas_mode

        if _pallas_mode() is not None:
            return self._search_phrase_fused(queries, k)

        Q = len(queries)
        if Q == 0:
            return []
        qweight = np.zeros(Q + 1, dtype=np.float32)
        for qi, q in enumerate(queries):
            fs = self._field_stats.get(q.field)
            if fs is None:
                fs = self.searcher.field_statistics(q.field)
                self._field_stats[q.field] = fs
            dfs = [
                self.searcher.doc_freq(Term(q.field, tb)) for tb in q.term_bytes
            ]
            qweight[qi] = Bm25Weight.for_terms(
                dfs, fs.total_num_docs, fs.average_fieldnorm
            ).weight

        readers = self.searcher.segment_readers()
        M1 = _m1()
        max_other_tf = ph.MAX_OTHER_TF
        per_query: list[list[tuple[np.float32, DocAddress]]] = [
            [] for _ in range(Q)
        ]
        pending1 = []
        seg_groups = []
        for seg_ord, reader in enumerate(readers):
            dseg = self._device_segments[seg_ord]
            groups: dict[tuple[str, int], dict] = {}
            for qi, q in enumerate(queries):
                field = q.field
                dfp = dseg.field_postings(field)
                fw = self._field_wand(seg_ord, field)
                T = len(q.term_bytes)
                ords = [
                    self._term_ord(seg_ord, reader, field, tb)
                    for tb in q.term_bytes
                ]
                if any(o < 0 for o in ords):
                    continue  # phrase can't match in this segment
                starts = [int(dfp.term_block_start[o]) for o in ords]
                nblks = [int(dfp.term_num_blocks[o]) for o in ords]
                maxtf = [
                    int(dfp.ensure_blk_top_tf()[s : s + n].max(initial=0))
                    for s, n in zip(starts, nblks)
                ]
                leader = min(range(T), key=lambda t: nblks[t])
                if maxtf[leader] > ph.MAX_P or any(
                    m > max_other_tf for m in maxtf
                ):
                    per_query[qi].append(
                        self._host_segment_topk(q, seg_ord, reader, k)
                    )
                    continue
                others = [
                    (True, np.float32(0.0), starts[t], nblks[t], t)
                    for t in range(T)
                    if t != leader
                ]
                ids, ub, widths = fw.clause_blocks_ub(
                    starts[leader], nblks[leader], qweight[qi], others,
                    self_pos=leader,
                )
                widths = (
                    widths.max(axis=1)
                    if widths.shape[1]
                    else np.zeros(len(ids), dtype=np.int64)
                )
                if not len(ids):
                    continue
                if int(widths.max(initial=0)) > ph.MAX_KW:
                    # a near-singleton leader block spanning a dense
                    # partner's region: device windows can't cover it —
                    # resolve exactly on host (cheap: sparse leader)
                    per_query[qi].append(
                        self._host_segment_topk(q, seg_ord, reader, k)
                    )
                    continue
                Tb = ph.t_bucket(T)
                g = groups.get((field, Tb))
                if g is None:
                    g = groups[(field, Tb)] = {
                        "tables": {
                            "q_weight": qweight,
                            "cl_start": np.zeros((Q + 1, Tb), np.int32),
                            "cl_len": np.zeros((Q + 1, Tb), np.int32),
                            "cl_pos_start": np.zeros((Q + 1, Tb), np.int32),
                            "cl_shift": np.zeros((Q + 1, Tb), np.int32),
                        },
                        "p1": [],
                        "rest": [],
                    }
                tb = g["tables"]
                mx_off = max(q.offsets)
                for t, o in enumerate(ords):
                    tb["cl_start"][qi, t] = starts[t]
                    tb["cl_len"][qi, t] = nblks[t]
                    tb["cl_pos_start"][qi, t] = int(dfp.term_pos_start[o])
                    tb["cl_shift"][qi, t] = mx_off - q.offsets[t]
                tb["max_tf"] = max(tb.get("max_tf", 1), *maxtf)
                if "q_max_tf" not in tb:
                    tb["q_max_tf"] = np.ones(Q + 1, dtype=np.int64)
                tb["q_max_tf"][qi] = max(tb["q_max_tf"][qi], *maxtf)
                if len(ids) <= M1:
                    g["p1"].append((qi, leader, ids, widths))
                else:
                    top = np.argpartition(-ub, M1 - 1)[:M1]
                    pick = np.zeros(len(ids), dtype=bool)
                    pick[top] = True
                    g["p1"].append((qi, leader, ids[pick], widths[pick]))
                    g["rest"].append(
                        (qi, leader, ids[~pick], ub[~pick], widths[~pick])
                    )

            for (field, Tb), g in groups.items():
                if not g["p1"]:
                    continue
                blocks = np.concatenate([ids for _, _, ids, _ in g["p1"]])
                qids = np.concatenate(
                    [np.full(len(ids), qi, np.int32)
                     for qi, _, ids, _ in g["p1"]]
                )
                tms = np.concatenate(
                    [np.full(len(ids), t, np.int32)
                     for _, t, ids, _ in g["p1"]]
                )
                wds = np.concatenate([wd for _, _, _, wd in g["p1"]])
                dfp = dseg.field_postings(field)
                fw = self._field_wand(seg_ord, field)
                for out in ph.dispatch_phrase(
                    dfp, dseg.alive, fw.cache, blocks, qids, tms,
                    g["tables"], k, Q, work_width=wds,
                ):
                    pending1.append((seg_ord, out))
            seg_groups.append(groups)

        self._collect_flat(pending1, per_query, k)
        th, th_seg, th_doc = _topk_thresholds(per_query, k)

        pending2 = []
        for seg_ord, groups in enumerate(seg_groups):
            dseg = self._device_segments[seg_ord]
            for (field, Tb), g in groups.items():
                if not g["rest"]:
                    continue
                dfp = dseg.field_postings(field)
                blks, qids, tms, wds = [], [], [], []
                for qi, t, ids, ub, widths in g["rest"]:
                    keep = _phase2_keep(
                        ub, dfp.blk_base[ids], seg_ord,
                        th[qi], th_seg[qi], th_doc[qi],
                    )
                    if not keep.any():
                        continue
                    blks.append(ids[keep])
                    qids.append(np.full(int(keep.sum()), qi, np.int32))
                    tms.append(np.full(int(keep.sum()), t, np.int32))
                    wds.append(widths[keep])
                if not blks:
                    continue
                dfp = dseg.field_postings(field)
                fw = self._field_wand(seg_ord, field)
                for out in ph.dispatch_phrase(
                    dfp, dseg.alive, fw.cache,
                    np.concatenate(blks), np.concatenate(qids),
                    np.concatenate(tms), g["tables"], k, Q,
                    work_width=np.concatenate(wds),
                ):
                    pending2.append((seg_ord, out))
        self._collect_flat(pending2, per_query, k)

        out = []
        for qi in range(Q):
            out.append(_chunk_hits(per_query[qi], k))
        return out

    def _collect_flat(self, pending, per_query, k):
        """Append device results as per-query hit CHUNKS (score/seg/doc
        arrays) — no per-hit Python objects; `_dedup_topk_chunks` sorts,
        dedups and truncates vectorized at threshold/finalize time."""
        from ..ops.probe_scorer import unpack_results, unpack_results_seg

        for seg_ord, out in pending:
            segs = None
            if isinstance(out, tuple):
                vals = np.asarray(out[0])
                docs = np.asarray(out[1])
            else:
                packed = np.asarray(out)
                if packed.shape[0] == 3:
                    # fused cross-segment result: seg ord rides the payload
                    vals, docs, segs = unpack_results_seg(packed)
                else:  # packed [2, Q, k] single-fetch result
                    vals, docs = unpack_results(packed)
            qs, js = np.nonzero(vals > NEG_INF)  # qs ascending (row-major)
            if not len(qs):
                continue
            vsel = vals[qs, js].astype(np.float32, copy=False)
            dsel = docs[qs, js].astype(np.uint32, copy=False)
            if segs is not None:
                ssel = segs[qs, js].astype(np.int32, copy=False)
            else:
                ssel = np.full(len(qs), seg_ord, dtype=np.int32)
            uq = np.unique(qs)
            bounds = np.searchsorted(qs, uq)
            bounds = np.append(bounds, len(qs))
            for i, qi in enumerate(uq.tolist()):
                lo, hi = bounds[i], bounds[i + 1]
                per_query[qi].append(
                    (vsel[lo:hi], ssel[lo:hi], dsel[lo:hi])
                )
