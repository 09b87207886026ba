"""Term dictionary: sorted term bytes -> TermInfo (term ordinal).

Reference counterpart: `src/termdict/` (FST or sstable backends). TPU-first
choice: the sstable-style *sorted dense layout* — concatenated key bytes +
offsets — because (a) ordinals are positions, so the postings tables are
indexed directly by term ordinal, and (b) range queries are two binary
searches. Lookups run on host (query planning); the postings/scoring run on
device. A device-resident hashed variant can be added for fully on-device
query planning later.

TermInfo is implicit: `term ordinal` indexes the per-field postings arrays
(`term_block_start/term_num_blocks/term_doc_freq`), mirroring reference
`TermInfo{doc_freq, postings_range, positions_range}`
(`src/postings/term_info.rs:9-16`).
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right
from typing import Iterator

import numpy as np


class TermDictionary:
    def __init__(self, term_data: np.ndarray, term_offsets: np.ndarray):
        self._data = bytes(term_data.tobytes())
        self._offsets = np.ascontiguousarray(term_offsets, dtype=np.int64)

    @classmethod
    def from_sorted_terms(cls, terms: list[bytes]) -> "TermDictionary":
        offsets = np.zeros(len(terms) + 1, dtype=np.int64)
        for i, t in enumerate(terms):
            offsets[i + 1] = offsets[i] + len(t)
        data = b"".join(terms)
        return cls(np.frombuffer(data, dtype=np.uint8), offsets)

    def to_arrays(self) -> dict[str, np.ndarray]:
        return {
            "term_data": np.frombuffer(self._data, dtype=np.uint8),
            "term_offsets": self._offsets,
        }

    @classmethod
    def from_arrays(cls, arrays: dict[str, np.ndarray]) -> "TermDictionary":
        return cls(arrays["term_data"], arrays["term_offsets"])

    def __len__(self) -> int:
        return len(self._offsets) - 1

    def term(self, ordinal: int) -> bytes:
        return self._data[self._offsets[ordinal] : self._offsets[ordinal + 1]]

    class _View:
        """List-like adapter for bisect over the concatenated keys."""

        __slots__ = ("td",)

        def __init__(self, td: "TermDictionary"):
            self.td = td

        def __len__(self):
            return len(self.td)

        def __getitem__(self, i):
            return self.td.term(i)

    def term_ord(self, key: bytes) -> int | None:
        """Exact lookup -> term ordinal, or None."""
        view = self._View(self)
        i = bisect_left(view, key)
        if i < len(self) and self.term(i) == key:
            return i
        return None

    def range_ords(
        self,
        lower: bytes | None = None,
        upper: bytes | None = None,
        include_lower: bool = True,
        include_upper: bool = False,
    ) -> range:
        """Ordinal range for terms in [lower, upper) (bounds optional)."""
        view = self._View(self)
        lo = 0
        if lower is not None:
            lo = bisect_left(view, lower) if include_lower else bisect_right(view, lower)
        hi = len(self)
        if upper is not None:
            hi = bisect_right(view, upper) if include_upper else bisect_left(view, upper)
        return range(lo, max(lo, hi))

    def prefix_ords(self, prefix: bytes) -> range:
        """Ordinals of terms starting with `prefix`."""
        if not prefix:
            return range(len(self))
        # upper bound: prefix with last byte incremented (with carry)
        upper = bytearray(prefix)
        while upper and upper[-1] == 0xFF:
            upper.pop()
        if upper:
            upper[-1] += 1
            return self.range_ords(prefix, bytes(upper))
        return self.range_ords(prefix, None)

    def stream(self) -> Iterator[tuple[int, bytes]]:
        for i in range(len(self)):
            yield i, self.term(i)

    def search_automaton(self, accepts) -> list[int]:
        """Ordinals of terms accepted by `accepts: bytes -> bool` (used by
        regex/fuzzy — reference `automaton_weight.rs`). Linear scan; automaton
        intersection with block pruning can replace this later."""
        return [i for i in range(len(self)) if accepts(self.term(i))]
