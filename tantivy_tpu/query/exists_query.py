"""ExistsQuery — docs where a field has any value (reference
`src/query/exist_query.rs:36`, column-index based)."""

from __future__ import annotations

import numpy as np

from ..fastfield import CARD_FULL, CARD_MULTI, CARD_OPTIONAL
from . import Query, SegmentResult, Weight


class ExistsQuery(Query):
    def __init__(self, field: str):
        self.field = field

    def weight(self, searcher, scoring: bool = True) -> Weight:
        return ExistsWeight(self.field)


class ExistsWeight(Weight):
    def __init__(self, field: str):
        self.field = field

    def execute(self, segment_reader) -> SegmentResult:
        col = segment_reader.fast_fields().column(self.field)
        if col is None:
            # fall back to the inverted index: union of all postings
            try:
                inv = segment_reader.inverted_index(self.field)
            except KeyError:
                return SegmentResult.empty()
            parts = []
            for o in range(inv.num_terms()):
                docs, _ = inv.read_postings(o)
                parts.append(docs)
            if not parts:
                return SegmentResult.empty()
            docs = np.unique(np.concatenate(parts))
            return SegmentResult(docs, np.ones(len(docs), dtype=np.float32))
        if col.cardinality == CARD_FULL:
            docs = np.arange(col.max_doc, dtype=np.uint32)
        elif col.cardinality == CARD_OPTIONAL:
            docs = col.present_docs.astype(np.uint32)
        else:
            docs = np.nonzero(np.diff(col.offsets) > 0)[0].astype(np.uint32)
        return SegmentResult(docs, np.ones(len(docs), dtype=np.float32))
