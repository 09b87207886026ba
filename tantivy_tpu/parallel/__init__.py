"""Batched + sharded search execution.

The batched executor amortizes TPU dispatch across thousands of concurrent
queries (the design center per BASELINE.json): query *planning* (termdict
lookups, stats, bucketing) happens on host, scoring + top-k on device,
cross-segment merge back on host — the same split as reference
`Executor::map` + `merge_fruits` (`core/searcher.rs:220-237`), with the device
taking the role of the rayon pool.

`shard.py` extends this across a `jax.sharding.Mesh` (segments sharded over
devices, per-device top-k, cross-device merge).
"""

from __future__ import annotations

import numpy as np

from ..query.bm25 import Bm25Weight
from ..searcher import DocAddress, Searcher

NEG_INF = np.float32(-np.inf)


class BatchExecutor:
    """Executes homogeneous batches of term queries on device."""

    def __init__(self, searcher: Searcher, mode: str = "dense"):
        self.searcher = searcher
        self.mode = mode
        self._device_segments = [
            self._device_for(r) for r in searcher.segment_readers()
        ]
        self._field_stats: dict[str, object] = {}
        self._term_weight_cache: dict[tuple[str, bytes], tuple] = {}
        self._term_ord_cache: dict[tuple[int, str, bytes], int] = {}

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

        # materialize phase 1, establish thresholds
        per_query: list[list[tuple[np.float32, DocAddress]]] = [[] for _ in range(Q)]
        self._collect_flat(pending1, per_query, k)
        thresholds = np.full(Q, NEG_INF, dtype=np.float32)
        for qi in range(Q):
            hits = per_query[qi]
            hits.sort(key=lambda x: (-float(x[0]), x[1]))
            del hits[k:]
            if len(hits) == k:
                thresholds[qi] = hits[-1][0]

        # phase 2: surviving blocks only (conservative ulp margin)
        pending2 = []
        margin = np.float32(1.0 - 4e-6)
        for seg_ord, rest in per_seg_rest.items():
            per_field_work = {}
            for qi, field, ids, bmax in rest:
                th = thresholds[qi]
                if th == NEG_INF:
                    keep = np.ones(len(ids), dtype=bool)
                else:
                    keep = bmax >= th * margin
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
            hits = per_query[qi]
            hits.sort(key=lambda x: (-float(x[0]), x[1]))
            out.append(hits[:k])
        return out

    # ------------------------------------------------------------------
    # boolean batches

    def _bool_device_eligible(self, q) -> bool:
        from ..ops.bool_scorer import T_MAX
        from ..query import BooleanQuery, Occur, TermQuery

        if not isinstance(q, BooleanQuery):
            return False
        if not 1 <= len(q.clauses) <= T_MAX:
            return False
        fields = set()
        for occ, sub in q.clauses:
            if not isinstance(sub, TermQuery):
                return False
            fields.add(sub.term.field)
        return len(fields) == 1

    def search_boolean_batch(self, queries: list, k: int):
        """Batched boolean(term-clause) queries, single field each, on
        device. Returns list[list[(score, DocAddress)]]."""
        from ..ops.bool_scorer import (
            KIND_MUST,
            KIND_MUST_NOT,
            KIND_SHOULD,
            flat_bool_topk,
        )
        from ..ops.flat_scorer import _W_LADDER
        from ..query import Occur

        import jax.numpy as jnp

        Q = len(queries)
        if Q == 0:
            return []
        kind_of = {
            Occur.MUST: KIND_MUST,
            Occur.SHOULD: KIND_SHOULD,
            Occur.MUST_NOT: KIND_MUST_NOT,
        }
        req_must = np.zeros(Q + 1, dtype=np.int32)
        req_should = np.zeros(Q + 1, dtype=np.int32)
        req_must[Q] = 1 << 30
        clause_info = []  # per query: list[(kind, term, weight)]
        field_of_q: list[str] = []
        for qi, q in enumerate(queries):
            n_must = sum(1 for occ, _ in q.clauses if occ == Occur.MUST)
            n_should = sum(1 for occ, _ in q.clauses if occ == Occur.SHOULD)
            req_must[qi] = n_must
            ms = q.minimum_number_should_match
            if n_must == 0:
                ms = max(ms, 1)
            req_should[qi] = min(ms, n_should) if n_should else 0
            info = []
            for occ, sub in q.clauses:
                if occ == Occur.MUST_NOT:
                    w = np.float32(0.0)
                else:
                    w, _ = self._term_weight(sub.term)
                info.append((kind_of[occ], sub.term, w))
            clause_info.append(info)
            field_of_q.append(q.clauses[0][1].term.field)
            if n_should and q.minimum_number_should_match > n_should:
                req_should[qi] = 1 << 30  # unsatisfiable

        readers = self.searcher.segment_readers()
        top = _W_LADDER[-1]
        per_query: list[list[tuple[np.float32, DocAddress]]] = [[] for _ in range(Q)]
        pending = []
        host_fallback: set[int] = set()
        for seg_ord, reader in enumerate(readers):
            # per field work lists (clause-major per query for stable order)
            per_field: dict[str, dict] = {}
            for qi, info in enumerate(clause_info):
                if qi in host_fallback:
                    continue
                field = field_of_q[qi]
                wl = per_field.setdefault(
                    field,
                    {"blocks": [], "qid": [], "weight": [], "kind": [],
                     "clause": []},
                )
                dfp = self._device_segments[seg_ord].field_postings(field)
                q_blocks = []
                for ci, (kd, term, w) in enumerate(info):
                    o = self._term_ord(seg_ord, reader, field, term.value_bytes)
                    if o < 0:
                        continue
                    s0 = int(dfp.term_block_start[o])
                    n = int(dfp.term_num_blocks[o])
                    ids = np.arange(s0, s0 + n)
                    q_blocks.append((ids, kd, w, ci))
                total = sum(len(b) for b, _, _, _ in q_blocks)
                if total > top:
                    host_fallback.add(qi)
                    continue
                for ids, kd, w, ci in q_blocks:
                    wl["blocks"].append(ids)
                    wl["qid"].append(np.full(len(ids), qi, dtype=np.int32))
                    wl["weight"].append(np.full(len(ids), w, dtype=np.float32))
                    wl["kind"].append(np.full(len(ids), kd, dtype=np.int32))
                    wl["clause"].append(np.full(len(ids), ci, dtype=np.int32))

            for field, wl in per_field.items():
                if not wl["blocks"]:
                    continue
                blocks = np.concatenate(wl["blocks"])
                qids = np.concatenate(wl["qid"])
                ws = np.concatenate(wl["weight"])
                kinds = np.concatenate(wl["kind"])
                clauses = np.concatenate(wl["clause"])
                # chunk on query boundaries
                dseg = self._device_segments[seg_ord]
                dfp = dseg.field_postings(field)
                fs = self._field_stats.get(field)
                if fs is None:
                    fs = self.searcher.field_statistics(field)
                    self._field_stats[field] = fs
                from ..query.bm25 import compute_tf_cache

                cache = compute_tf_cache(np.float32(fs.average_fieldnorm))
                alive = dseg.alive
                if alive is None:
                    alive = jnp.ones(dfp.norm_ids.shape[0], dtype=bool)
                lo = 0
                n_items = len(blocks)
                while lo < n_items:
                    hi = min(lo + top, n_items)
                    # never split a query across chunks
                    if hi < n_items:
                        while hi > lo and qids[hi] == qids[hi - 1]:
                            hi -= 1
                        if hi == lo:
                            hi = min(lo + top, n_items)  # degenerate; safe: fits
                    from ..ops.flat_scorer import _w_bucket

                    W = _w_bucket(hi - lo)
                    b_pad = np.zeros(W, dtype=np.int64)
                    q_pad = np.full(W, Q, dtype=np.int32)
                    w_pad = np.zeros(W, dtype=np.float32)
                    k_pad = np.zeros(W, dtype=np.int32)
                    c_pad = np.zeros(W, dtype=np.int32)
                    v_pad = np.zeros(W, dtype=bool)
                    b_pad[: hi - lo] = blocks[lo:hi]
                    q_pad[: hi - lo] = qids[lo:hi]
                    w_pad[: hi - lo] = ws[lo:hi]
                    k_pad[: hi - lo] = kinds[lo:hi]
                    c_pad[: hi - lo] = clauses[lo:hi]
                    v_pad[: hi - lo] = True
                    docs, tfs = dfp.gather_blocks(b_pad)
                    out = flat_bool_topk(
                        docs, tfs, jnp.asarray(q_pad), jnp.asarray(w_pad),
                        jnp.asarray(k_pad), jnp.asarray(c_pad),
                        jnp.asarray(v_pad),
                        dfp.norm_ids, alive, jnp.asarray(cache),
                        jnp.asarray(req_must), jnp.asarray(req_should),
                        k, Q,
                    )
                    pending.append((seg_ord, out))
                    lo = hi

        self._collect_flat(pending, per_query, k)
        out = []
        for qi in range(Q):
            if qi in host_fallback:
                from ..collector import TopDocs

                out.append(
                    self.searcher.search(queries[qi], TopDocs(k))
                )
                continue
            hits = per_query[qi]
            hits.sort(key=lambda x: (-float(x[0]), x[1]))
            out.append(hits[:k])
        return out

    def search_batch(self, queries: list, k: int):
        """Generic batched search: routes term and boolean(term) queries to
        the device kernels, everything else to the host engine."""
        from ..collector import TopDocs
        from ..query import TermQuery

        results: list = [None] * len(queries)
        term_ids = [i for i, q in enumerate(queries) if isinstance(q, TermQuery)]
        bool_ids = [
            i
            for i, q in enumerate(queries)
            if self._bool_device_eligible(q)
        ]
        other = set(range(len(queries))) - set(term_ids) - set(bool_ids)
        if term_ids:
            sub = self.search_term_batch([queries[i].term for i in term_ids], k)
            for i, r in zip(term_ids, sub):
                results[i] = r
        if bool_ids:
            sub = self.search_boolean_batch([queries[i] for i in bool_ids], k)
            for i, r in zip(bool_ids, sub):
                results[i] = r
        for i in sorted(other):
            results[i] = self.searcher.search(queries[i], TopDocs(k))
        return results

    def _collect_flat(self, pending, per_query, k):
        for seg_ord, (vals_dev, docs_dev) in pending:
            vals = np.asarray(vals_dev)
            docs = np.asarray(docs_dev)
            for qi in range(vals.shape[0]):
                row = vals[qi]
                n = int(np.count_nonzero(row > NEG_INF))
                for j in range(n):
                    per_query[qi].append(
                        (np.float32(row[j]), DocAddress(seg_ord, int(docs[qi, j])))
                    )

    def search_term_batch_bucketed(self, terms: list, k: int):
        """Legacy bucketed path (no WAND); kept for cross-checking."""
        from ..ops.term_scorer import dispatch_term_topk

        Q = len(terms)
        if Q == 0:
            return []

        # global statistics (host), cached per unique term
        weights = np.zeros(Q, dtype=np.float32)
        caches = np.zeros((Q, 256), dtype=np.float32)
        for qi, term in enumerate(terms):
            w, c = self._term_weight(term)
            weights[qi] = w
            caches[qi] = c

        # dispatch everything asynchronously, then sync once
        pending: list[tuple[int, np.ndarray, int, object, object]] = []
        readers = self.searcher.segment_readers()
        by_field: dict[str, list[int]] = {}
        for qi, term in enumerate(terms):
            by_field.setdefault(term.field, []).append(qi)
        for seg_ord, (reader, dseg) in enumerate(zip(readers, self._device_segments)):
            for field, qids in by_field.items():
                inv = reader.inverted_index(field)
                ords = np.full(len(qids), -1, dtype=np.int64)
                for row, qi in enumerate(qids):
                    ckey = (seg_ord, field, terms[qi].value_bytes)
                    o = self._term_ord_cache.get(ckey, -2)
                    if o == -2:
                        o_ = inv.term_ord(terms[qi].value_bytes)
                        o = -1 if o_ is None else o_
                        self._term_ord_cache[ckey] = o
                    ords[row] = o
                qids_arr = np.asarray(qids)
                for sub_qids, kk, vals, docs in dispatch_term_topk(
                    dseg, field, ords, weights[qids_arr], caches[qids_arr], k
                ):
                    pending.append((seg_ord, qids_arr[sub_qids], kk, vals, docs))

        # single sync point: materialize all device results
        per_query: list[list[tuple[float, DocAddress]]] = [[] for _ in range(Q)]
        for seg_ord, qids, kk, vals_dev, docs_dev in pending:
            vals = np.asarray(vals_dev)[: len(qids)]
            docs = np.asarray(docs_dev)[: len(qids)]
            finite = vals > NEG_INF
            for row, qi in enumerate(qids):
                n = int(np.count_nonzero(finite[row]))
                hits = per_query[qi]
                for j in range(n):
                    hits.append(
                        (np.float32(vals[row, j]), DocAddress(seg_ord, int(docs[row, j])))
                    )

        # cross-segment merge (the "fruit merge" reduce)
        out = []
        for qi in range(Q):
            hits = per_query[qi]
            hits.sort(key=lambda x: (-float(x[0]), x[1]))
            out.append(hits[:k])
        return out
