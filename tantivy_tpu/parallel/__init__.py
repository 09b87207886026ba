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

    def _device_for(self, reader):
        from ..ops.device_index import DeviceSegment

        if reader._device is None or reader._device.mode != self.mode:
            reader._device = DeviceSegment(reader, self.mode)
        return reader._device

    def search_term_batch(self, terms: list, k: int):
        """terms: list[Term] (one term query each). Returns
        list[list[(score, DocAddress)]] of length len(terms)."""
        from ..ops.term_scorer import topk_term_batch

        Q = len(terms)
        if Q == 0:
            return []

        # global statistics (host)
        weights = np.zeros(Q, dtype=np.float32)
        caches = np.zeros((Q, 256), dtype=np.float32)
        field_stats: dict[str, object] = {}
        for qi, term in enumerate(terms):
            fs = field_stats.get(term.field)
            if fs is None:
                fs = self.searcher.field_statistics(term.field)
                field_stats[term.field] = fs
            df = self.searcher.doc_freq(term)
            bm25 = Bm25Weight.for_one_term(
                max(df, 1), fs.total_num_docs, fs.average_fieldnorm
            )
            weights[qi] = bm25.weight
            caches[qi] = bm25.cache

        # per-segment device scoring
        per_query: list[list[tuple[float, DocAddress]]] = [[] for _ in range(Q)]
        for seg_ord, (reader, dseg) in enumerate(
            zip(self.searcher.segment_readers(), self._device_segments)
        ):
            by_field: dict[str, list[int]] = {}
            for qi, term in enumerate(terms):
                by_field.setdefault(term.field, []).append(qi)
            for field, qids in by_field.items():
                inv = reader.inverted_index(field)
                ords = np.full(len(qids), -1, dtype=np.int64)
                for row, qi in enumerate(qids):
                    o = inv.term_ord(terms[qi].value_bytes)
                    if o is not None:
                        ords[row] = o
                qids_arr = np.asarray(qids)
                scores, docs = topk_term_batch(
                    dseg, field, ords, weights[qids_arr], caches[qids_arr], k
                )
                for row, qi in enumerate(qids):
                    for j in range(k):
                        s = scores[row, j]
                        if s == NEG_INF:
                            break
                        per_query[qi].append(
                            (np.float32(s), DocAddress(seg_ord, int(docs[row, j])))
                        )

        # cross-segment merge (the "fruit merge" reduce)
        out = []
        for qi in range(Q):
            hits = per_query[qi]
            hits.sort(key=lambda x: (-float(x[0]), x[1]))
            out.append(hits[:k])
        return out
