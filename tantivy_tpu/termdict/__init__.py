"""Term dictionary: sorted term bytes -> TermInfo (term ordinal).

Reference counterpart: `src/termdict/` (FST or sstable backends). TPU-first
choice: the sstable-style *sorted dense layout* (reference
`sstable/README.md:30-80`) — 16-term blocks of front-compressed keys
(per-term shared-prefix length + suffix) on disk, reconstructed at open into
a flat concat + offsets + a u64 "prefix8" companion column (the first 8 key
bytes, big-endian, so u64 order == lexicographic order on those bytes).

Lookups are then vectorized host work:
* `term_ord`/`term_ords`: one `np.searchsorted` over prefix8 narrows to the
  (tiny) run of keys sharing 8 bytes, then full-key bisect;
* `search_levenshtein`: length prefilter + banded edit-distance DP where
  every DP cell is a numpy vector over all surviving terms (the batched
  dual of the reference's Levenshtein DFA ∩ FST walk,
  `fuzzy_query.rs:80`);
* `search_regex`: a literal-prefix scan of the pattern prunes to a prefix
  range before matching (reference `block_match_automaton.rs` prunes
  blocks the same way).

TermInfo is implicit: `term ordinal` indexes the per-field postings arrays
(`term_block_start/term_num_blocks/term_doc_freq`), mirroring reference
`TermInfo{doc_freq, postings_range, positions_range}`
(`src/postings/term_info.rs:9-16`).
"""

from __future__ import annotations

from bisect import bisect_left, bisect_right
from typing import Iterator

import numpy as np

#: terms per front-compression block (reference sstable uses 16-key blocks)
SST_BLOCK = 16

_P8_POW = (np.uint64(1) << (np.arange(7, -1, -1, dtype=np.uint64) * np.uint64(8)))


def _common_prefix_len(a: bytes, b: bytes) -> int:
    n = min(len(a), len(b))
    i = 0
    while i < n and a[i] == b[i]:
        i += 1
    return i


class TermDictionary:
    def __init__(self, term_data: np.ndarray, term_offsets: np.ndarray):
        self._data_np = np.ascontiguousarray(term_data, dtype=np.uint8)
        self._data = self._data_np.tobytes()
        self._offsets = np.ascontiguousarray(term_offsets, dtype=np.int64)
        self._prefix8 = self._build_prefix8()
        self._ascii: bool | None = None
        self._decoded: list[str] | None = None

    def _build_prefix8(self) -> np.ndarray:
        """u64 of the first 8 bytes of every key (big-endian, zero-padded) —
        one vectorized gather."""
        n = len(self._offsets) - 1
        if n == 0:
            return np.zeros(0, dtype=np.uint64)
        off = self._offsets[:-1]
        lens = np.diff(self._offsets)
        total = len(self._data_np)
        idx = np.minimum(off[:, None] + np.arange(8), max(total - 1, 0))
        by = self._data_np[idx].astype(np.uint64)
        by *= (np.arange(8) < lens[:, None]).astype(np.uint64)
        return (by * _P8_POW).sum(axis=1, dtype=np.uint64)

    @staticmethod
    def _key8(key: bytes) -> np.uint64:
        return np.uint64(int.from_bytes(key[:8].ljust(8, b"\0"), "big"))

    @classmethod
    def from_sorted_terms(cls, terms: list[bytes]) -> "TermDictionary":
        offsets = np.zeros(len(terms) + 1, dtype=np.int64)
        for i, t in enumerate(terms):
            offsets[i + 1] = offsets[i] + len(t)
        data = b"".join(terms)
        return cls(np.frombuffer(data, dtype=np.uint8), offsets)

    # -- storage: 16-term blocks of front-compressed keys ---------------------

    def to_arrays(self) -> dict[str, np.ndarray]:
        n = len(self)
        prefix_lens = np.zeros(n, dtype=np.uint8)
        suffixes: list[bytes] = []
        suffix_offsets = np.zeros(n + 1, dtype=np.uint32)
        prev = b""
        for i in range(n):
            t = self.term(i)
            if i % SST_BLOCK == 0:
                pl = 0  # block restart: full key
            else:
                pl = min(_common_prefix_len(prev, t), 0xFF)
            prefix_lens[i] = pl
            suf = t[pl:]
            suffixes.append(suf)
            suffix_offsets[i + 1] = suffix_offsets[i] + len(suf)
            prev = t
        data = b"".join(suffixes)
        return {
            "sst_suffix_data": np.frombuffer(data, dtype=np.uint8),
            "sst_suffix_offsets": suffix_offsets,
            "sst_prefix_lens": prefix_lens,
        }

    @classmethod
    def from_arrays(cls, arrays: dict[str, np.ndarray]) -> "TermDictionary":
        if "term_data" in arrays:  # round-1 uncompressed layout
            return cls(arrays["term_data"], arrays["term_offsets"])
        pl = np.asarray(arrays["sst_prefix_lens"], dtype=np.int64)
        soff = np.asarray(arrays["sst_suffix_offsets"], dtype=np.int64)
        sdata = np.ascontiguousarray(arrays["sst_suffix_data"], dtype=np.uint8)
        n = len(pl)
        slens = np.diff(soff)
        lens = pl + slens
        offsets = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lens, out=offsets[1:])
        out = np.empty(int(offsets[-1]), dtype=np.uint8)

        def _run_scatter(dst_starts, src_starts, run_lens, src):
            """out[dst_starts[i] + j] = src[src_starts[i] + j] for j < len[i],
            fully vectorized."""
            total = int(run_lens.sum())
            if total == 0:
                return
            starts = np.zeros(len(run_lens), dtype=np.int64)
            np.cumsum(run_lens[:-1], out=starts[1:])
            within = np.arange(total, dtype=np.int64) - np.repeat(starts, run_lens)
            out[np.repeat(dst_starts, run_lens) + within] = src[
                np.repeat(src_starts, run_lens) + within
            ]

        # all suffix bytes land in one scatter; prefix chains resolve in
        # SST_BLOCK-1 vectorized steps (position p copies from position p-1,
        # already materialized)
        _run_scatter(offsets[:-1] + pl, soff[:-1], slens, sdata)
        pos = np.arange(n) % SST_BLOCK
        for p in range(1, SST_BLOCK):
            sel = np.nonzero((pos == p) & (pl > 0))[0]
            if len(sel) == 0:
                continue
            _run_scatter(offsets[sel], offsets[sel - 1], pl[sel], out)
        return cls(out, offsets)

    def __len__(self) -> int:
        return len(self._offsets) - 1

    def term(self, ordinal: int) -> bytes:
        return self._data[self._offsets[ordinal] : self._offsets[ordinal + 1]]

    # -- lookups ---------------------------------------------------------------

    def _bisect(self, key: bytes, side: str) -> int:
        """prefix8 searchsorted narrows to the run of keys sharing the first
        8 bytes; full-key bisect resolves within it."""
        k8 = self._key8(key)
        lo = int(np.searchsorted(self._prefix8, k8, side="left"))
        hi = int(np.searchsorted(self._prefix8, k8, side="right"))
        if lo == hi:
            return lo
        view = _View(self)
        if side == "left":
            return bisect_left(view, key, lo, hi)
        return bisect_right(view, key, lo, hi)

    def term_ord(self, key: bytes) -> int | None:
        """Exact lookup -> term ordinal, or None. One prefix8 searchsorted +
        a scan of the (tiny) equal-prefix8 run."""
        k8 = self._key8(key)
        p8 = self._prefix8
        i = int(np.searchsorted(p8, k8, side="left"))
        n = len(self)
        while i < n and p8[i] == k8:
            t = self.term(i)
            if t == key:
                return i
            if t > key:
                return None
            i += 1
        return None

    def term_ords(self, keys: list[bytes]) -> np.ndarray:
        """Batch exact lookup -> int64 ordinals (-1 where absent)."""
        n = len(keys)
        out = np.full(n, -1, dtype=np.int64)
        if n == 0 or len(self) == 0:
            return out
        k8 = np.array([self._key8(k) for k in keys], dtype=np.uint64)
        lo = np.searchsorted(self._prefix8, k8, side="left")
        hi = np.searchsorted(self._prefix8, k8, side="right")
        view = _View(self)
        for r in range(n):
            a, b = int(lo[r]), int(hi[r])
            if a == b:
                continue
            i = bisect_left(view, keys[r], a, b)
            if i < len(self) and self.term(i) == keys[r]:
                out[r] = i
        return out

    def range_ords(
        self,
        lower: bytes | None = None,
        upper: bytes | None = None,
        include_lower: bool = True,
        include_upper: bool = False,
    ) -> range:
        """Ordinal range for terms in [lower, upper) (bounds optional)."""
        lo = 0
        if lower is not None:
            lo = self._bisect(lower, "left" if include_lower else "right")
        hi = len(self)
        if upper is not None:
            hi = self._bisect(upper, "right" if include_upper else "left")
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

    # -- automaton search -------------------------------------------------------

    def _is_ascii(self) -> bool:
        if self._ascii is None:
            self._ascii = bool(
                len(self._data_np) == 0 or int(self._data_np.max()) < 128
            )
        return self._ascii

    def decoded_terms(self) -> list[str]:
        """All terms as strings, decoded once and cached."""
        if self._decoded is None:
            data = self._data
            off = self._offsets
            self._decoded = [
                data[off[i] : off[i + 1]].decode("utf-8", errors="replace")
                for i in range(len(self))
            ]
        return self._decoded

    def search_levenshtein(
        self, target: str, k: int, transposition: bool = False,
        prefix: bool = False,
    ) -> list[int]:
        """Ordinals within edit distance <= k of `target`. Vectorized banded
        DP over all length-eligible terms at once (ASCII fast path); falls
        back to the scalar matcher otherwise."""
        from ..query.automaton_queries import levenshtein_within

        if not (self._is_ascii() and target.isascii()) or len(self) == 0:
            out = []
            for i, tb in self.stream():
                text = tb.decode("utf-8", errors="replace")
                if prefix and len(text) > len(target):
                    text = text[: len(target)]
                if levenshtein_within(target, text, k, transposition):
                    out.append(i)
            return out

        lens = np.diff(self._offsets)
        if prefix:
            eff_lens = np.minimum(lens, len(target))
        else:
            eff_lens = lens
        cand = np.nonzero(np.abs(eff_lens - len(target)) <= k)[0]
        if len(cand) == 0:
            return []
        # padded byte matrix of the candidates (only first len(target)+k
        # bytes matter)
        L = len(target) + k
        off = self._offsets[cand]
        clens = np.minimum(eff_lens[cand], L).astype(np.int64)
        total = len(self._data_np)
        idx = np.minimum(off[:, None] + np.arange(max(L, 1)), max(total - 1, 0))
        mat = self._data_np[idx]
        ok = _banded_levenshtein_leq(
            np.frombuffer(target.encode("ascii"), dtype=np.uint8),
            mat, clens, k, transposition,
        )
        return [int(c) for c in cand[ok]]

    def search_regex(self, pattern) -> list[int]:
        """Ordinals whose term full-matches `pattern` (compiled re). A
        literal prefix extracted from the pattern prunes the scan range."""
        lit = _literal_prefix(pattern.pattern)
        rng = self.prefix_ords(lit.encode("utf-8")) if lit else range(len(self))
        if len(rng) < len(self) // 4:
            # pruned range: decode only the candidates
            data, off = self._data, self._offsets
            return [
                i
                for i in rng
                if pattern.fullmatch(
                    data[off[i] : off[i + 1]].decode("utf-8", errors="replace")
                )
            ]
        decoded = self.decoded_terms()
        return [i for i in rng if pattern.fullmatch(decoded[i])]

    def search_automaton(self, accepts) -> list[int]:
        """Ordinals of terms accepted by `accepts: bytes -> bool` — generic
        fallback (reference `automaton_weight.rs`)."""
        return [i for i in range(len(self)) if accepts(self.term(i))]


class _View:
    """List-like adapter for bisect over the concatenated keys."""

    __slots__ = ("td",)

    def __init__(self, td: TermDictionary):
        self.td = td

    def __len__(self):
        return len(self.td)

    def __getitem__(self, i):
        return self.td.term(i)


def _has_toplevel_alternation(pattern: str) -> bool:
    """True if the pattern has an unescaped '|' at group depth 0 (outside
    character classes). Such a pattern matches strings that need not share
    any literal prefix, so prefix pruning is unsound."""
    depth = 0
    in_class = False
    i = 0
    while i < len(pattern):
        ch = pattern[i]
        if ch == "\\":
            i += 2
            continue
        if in_class:
            if ch == "]":
                in_class = False
        elif ch == "[":
            in_class = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth = max(0, depth - 1)
        elif ch == "|" and depth == 0:
            return True
        i += 1
    return False


def _literal_prefix(pattern: str) -> str:
    """Longest literal prefix of a regex pattern (conservative)."""
    if _has_toplevel_alternation(pattern):
        # 'apple|banana' shares no prefix: pruning to 'apple' would drop
        # every match of the other branches.
        return ""
    out = []
    i = 0
    meta = set(".^$*+?{}[]|()\\")
    while i < len(pattern):
        ch = pattern[i]
        if ch in meta:
            # a trailing quantifier applies to the previous char: drop it
            if ch in "*+?{" and out:
                out.pop()
            break
        out.append(ch)
        i += 1
    return "".join(out)


def _banded_levenshtein_leq(
    a: np.ndarray, mat: np.ndarray, blens: np.ndarray, k: int,
    transposition: bool,
) -> np.ndarray:
    """dist(a, mat[r, :blens[r]]) <= k per row, banded DP fully vectorized
    over rows. `a`: [la] u8; `mat`: [m, L] u8; returns bool [m].

    Band coordinate d = j - i + k (d in [0, 2k]); cell (i, d) = dist(i, j):
      deletion      dist(i-1, j)   -> prev[d+1] + 1
      insertion     dist(i,   j-1) -> band[d-1] + 1  (same row, earlier d)
      substitution  dist(i-1, j-1) -> prev[d]  + cost
      transposition dist(i-2, j-2) -> prev2[d] + 1
    """
    la = len(a)
    m = mat.shape[0]
    L = mat.shape[1]
    inf = np.int32(k + 1)
    width = 2 * k + 1
    infrow = np.full(m, inf, dtype=np.int32)
    # i = 0 row: dist(0, j) = j for j <= k (d = j + k)
    prev = [
        np.full(m, d - k, dtype=np.int32) if d >= k else infrow.copy()
        for d in range(width)
    ]
    prev2 = [infrow.copy() for _ in range(width)]
    for i in range(1, la + 1):
        band = [infrow.copy() for _ in range(width)]
        for d in range(width):
            j = i + d - k
            if j < 0 or L == 0:
                continue
            if j == 0:
                if i <= k:
                    band[d][:] = i
                continue
            jj = min(j - 1, L - 1)
            bchar = mat[:, jj]
            cost = (bchar != a[i - 1]).astype(np.int32)
            best = prev[d] + cost  # substitution / match
            if d + 1 < width:
                best = np.minimum(best, prev[d + 1] + 1)  # deletion
            if d - 1 >= 0:
                best = np.minimum(best, band[d - 1] + 1)  # insertion
            if transposition and i > 1 and j > 1:
                b2 = mat[:, min(j - 2, L - 1)]
                tr = (bchar == a[i - 2]) & (b2 == a[i - 1])
                best = np.where(tr, np.minimum(best, prev2[d] + 1), best)
            band[d][:] = np.where(j <= blens, np.minimum(best, inf), inf)
        prev2, prev = prev, band
    d_final = blens - la + k
    out = np.zeros(m, dtype=bool)
    for d in range(width):
        sel = d_final == d
        if sel.any():
            out[sel] = prev[d][sel] <= k
    return out
