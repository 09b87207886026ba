"""Deferred vectorized numeric-term indexing (`SegmentWriter._numeric_exports`):
the per-(doc, value) subscribe path was replaced by one encode/lexsort/group
pass at serialize time — these tests pin its semantics: term ordering across
types (negative i64/f64 sort before positives), multi-valued duplicate values
(tf accumulation), doc_freq, sorted-index remapping, and parity between the
deferred path and the non-native per-doc path.

Reference semantics: `src/schema/term.rs:22-29` (order-preserving value
bytes), `src/indexer/segment_writer.rs:252-330` (per-field dispatch).
"""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.query import TermQuery
from tantivy_tpu.schema.term import Term, numeric_keys_u64


def _mk_index(sort_by_field=None):
    b = tt.Schema.builder()
    b.add_text_field("title", tt.TEXT)
    b.add_u64_field("u", tt.FAST | tt.INDEXED)
    b.add_i64_field("i", tt.FAST | tt.INDEXED)
    b.add_f64_field("f", tt.FAST | tt.INDEXED)
    b.add_bool_field("b", tt.INDEXED)
    schema = b.build()
    settings = (
        tt.IndexSettings(sort_by_field=sort_by_field) if sort_by_field else None
    )
    return tt.Index.create_in_ram(schema, settings=settings)


def test_numeric_keys_match_scalar_terms():
    rng = np.random.default_rng(0)
    us = rng.integers(0, 2**63, 50, dtype=np.uint64)
    assert all(
        Term.from_field_u64("u", int(v)).value_bytes
        == int(k).to_bytes(8, "big")
        for v, k in zip(us, numeric_keys_u64(us, "u64"))
    )
    is_ = rng.integers(-(2**62), 2**62, 50, dtype=np.int64)
    assert all(
        Term.from_field_i64("i", int(v)).value_bytes
        == int(k).to_bytes(8, "big")
        for v, k in zip(is_, numeric_keys_u64(is_, "i64"))
    )
    fs = rng.normal(size=50) * 1e6
    fs = np.append(fs, [0.0, -0.0, np.inf, -np.inf])
    assert all(
        Term.from_field_f64("f", float(v)).value_bytes
        == int(k).to_bytes(8, "big")
        for v, k in zip(fs, numeric_keys_u64(fs, "f64"))
    )
    bs = np.array([True, False, True])
    assert all(
        Term.from_field_bool("b", bool(v)).value_bytes
        == int(k).to_bytes(8, "big")
        for v, k in zip(bs, numeric_keys_u64(bs, "bool"))
    )


def test_numeric_term_and_range_queries():
    index = _mk_index()
    w = index.writer()
    rng = np.random.default_rng(3)
    us = rng.integers(0, 30, 300)
    for n, uv in enumerate(us):
        w.add_document(
            tt.Document(title=f"d{n}", u=int(uv), i=int(uv) - 15,
                        f=(float(uv) - 15.0) * 0.5, b=bool(uv % 2))
        )
    w.commit()
    s = index.reader().searcher()
    assert s.search(TermQuery(Term.from_field_u64("u", 7)), tt.Count()) == int(
        (us == 7).sum()
    )
    assert s.search(
        TermQuery(Term.from_field_i64("i", -8)), tt.Count()
    ) == int((us == 7).sum())
    assert s.search(
        TermQuery(Term.from_field_f64("f", -4.0)), tt.Count()
    ) == int((us == 7).sum())
    assert s.search(
        TermQuery(Term.from_field_bool("b", True)), tt.Count()
    ) == int((us % 2 == 1).sum())
    # termdict range over negatives crosses the sign flip
    q = index.parse_query("i:[-10 TO -1]", ["title"])
    assert s.search(q, tt.Count()) == int(((us >= 5) & (us <= 14)).sum())


def test_multivalued_duplicates_single_posting():
    """A doc repeating the same value must yield ONE posting for that
    (term, doc) — numeric fields are freq-less (IndexRecordOption Basic,
    reference `field_type.rs`), so decoded tf is the implied 1."""
    index = _mk_index()
    w = index.writer()
    d = tt.Document(title="x")
    for v in (5, 5, 5, 9):
        d.add_u64("u", v)
    w.add_document(d)
    w.add_document(tt.Document(title="y", u=5))
    w.commit()
    s = index.reader().searcher()
    reader = s.segment_readers()[0]
    inv = reader.inverted_index("u")
    ord5 = inv.termdict.term_ord(Term.from_field_u64("u", 5).value_bytes)
    docs, tfs = inv.read_postings(ord5)
    assert list(docs) == [0, 1]
    assert list(tfs) == [1, 1]
    ord9 = inv.termdict.term_ord(Term.from_field_u64("u", 9).value_bytes)
    docs9, _ = inv.read_postings(ord9)
    assert list(docs9) == [0]


def test_sorted_index_remaps_deferred_numerics():
    index = _mk_index(sort_by_field=("u", "desc"))
    w = index.writer()
    vals = [3, 17, 8, 25, 1]
    for n, v in enumerate(vals):
        w.add_document(tt.Document(title=f"d{n}", u=v, i=v, f=float(v), b=True))
    w.commit()
    s = index.reader().searcher()
    # sorted desc: doc 0 holds u=25
    col = s.segment_readers()[0].fast_fields().column("u")
    assert list(col.values) == sorted(vals, reverse=True)
    # numeric postings remapped to the sorted doc ids
    inv = s.segment_readers()[0].inverted_index("u")
    o = inv.termdict.term_ord(Term.from_field_u64("u", 25).value_bytes)
    docs, _ = inv.read_postings(o)
    assert list(docs) == [0]
    o = inv.termdict.term_ord(Term.from_field_u64("u", 1).value_bytes)
    docs, _ = inv.read_postings(o)
    assert list(docs) == [len(vals) - 1]


def test_deferred_path_matches_per_doc_path():
    """The native-batched writer (deferred numerics) and the non-native
    per-doc writer must serialize identical numeric postings."""
    from tantivy_tpu.indexer.segment_writer import SegmentWriter

    def build(use_native):
        b = tt.Schema.builder()
        b.add_text_field("title", tt.TEXT)
        b.add_u64_field("u", tt.INDEXED)
        b.add_i64_field("i", tt.INDEXED)
        schema = b.build()
        sw = SegmentWriter(schema, use_native=use_native)
        rng = np.random.default_rng(11)
        docs = [
            tt.Document(title=f"t{n}", u=int(v), i=int(v) - 4)
            for n, v in enumerate(rng.integers(0, 9, 64))
        ]
        if use_native:
            sw.add_documents(docs)
        else:
            for d in docs:
                sw.add_document(d)
        return sw.serialize()

    a, b_ = build(True), build(False)
    for comp in ("idx", "term"):
        assert set(a[comp]) == set(b_[comp]), comp
        for k in a[comp]:
            np.testing.assert_array_equal(
                np.asarray(a[comp][k]), np.asarray(b_[comp][k]),
                err_msg=f"{comp}/{k}",
            )
