"""Write-path race regressions (advisor r2 findings):

* a delete committed while a merge runs must survive the merge swap
  (reference end_merge / advance_deletes semantics, segment_updater.rs:617);
* GC must not reclaim files still readable by an older Searcher
  generation's lazy SegmentReaders (census Inventory, index_meta.rs:228);
* GC must not reclaim in-flight merge outputs or uncommitted worker
  segments.
"""

import numpy as np

import tantivy_tpu as tt
from tantivy_tpu.indexer.merge_policy import NoMergePolicy
from tantivy_tpu.indexer.merger import IndexMerger


def _two_segment_index():
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    w.set_merge_policy(NoMergePolicy())
    for c in range(2):
        for i in range(30):
            w.add_document(tt.Document(body=f"alpha tok{c}x{i}"))
        w.commit()
    return index, w


def test_delete_committed_mid_merge_survives_swap(monkeypatch):
    index, w = _two_segment_index()

    # interleave: after the merger builds its output (from pre-delete
    # readers) but before the meta swap, a delete_term + commit lands
    orig_write = IndexMerger.write
    fired = {"done": False}

    def patched_write(self):
        out = orig_write(self)
        if not fired["done"]:
            fired["done"] = True
            w.delete_term(tt.Term.from_field_text("body", "tok0x5"))
            w.commit()
        return out

    monkeypatch.setattr(IndexMerger, "write", patched_write)
    w.merge([s.segment_id for s in index.searchable_segment_metas()])
    monkeypatch.setattr(IndexMerger, "write", orig_write)
    w.wait_merging_threads()
    w.close()

    searcher = index.reader().searcher()
    # the deleted doc must NOT resurface from the merged segment
    assert searcher.search(
        tt.TermQuery(tt.Term.from_field_text("body", "tok0x5")), tt.Count()
    ) == 0
    assert searcher.search(tt.AllQuery(), tt.Count()) == 59


def test_gc_spares_files_of_live_old_searcher():
    index, w = _two_segment_index()

    old_searcher = index.reader().searcher()
    # force nothing loaded yet: the readers are lazy
    w.merge([s.segment_id for s in index.searchable_segment_metas()])
    w.wait_merging_threads()
    deleted = w.garbage_collect_files()
    # the old generation's files must have been census-protected
    assert old_searcher.search(
        tt.TermQuery(tt.Term.from_field_text("body", "alpha")), tt.Count()
    ) == 60
    for r in old_searcher.segment_readers():
        assert r.store_reader() is not None  # store loads fine too
    # new searcher sees the merged index
    assert index.reader().searcher().search(
        tt.TermQuery(tt.Term.from_field_text("body", "alpha")), tt.Count()
    ) == 60
    w.close()

    # once the old searcher dies, its files become reclaimable
    old_files = set()
    for s in old_searcher.segment_readers():
        old_files.update(s.meta.list_files())
    del old_searcher
    import gc

    gc.collect()
    w2 = index.writer_for_tests()
    reclaimed = set(w2.garbage_collect_files())
    assert old_files & reclaimed, "old generation files should be GC'd now"
    w2.close()


def test_gc_spares_pending_worker_segments():
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    w.add_document(tt.Document(body="alpha"))
    w.commit()
    # flush a segment WITHOUT committing (simulates a worker flush between
    # commits)
    w.add_document(tt.Document(body="beta"))
    w._flush_segment()
    assert w._pending_segments
    pending_files = set()
    for m, _ in w._pending_segments:
        pending_files.update(m.list_files())
    deleted = set(w.garbage_collect_files())
    assert not (pending_files & deleted), "GC must spare uncommitted segments"
    w.commit()
    w.close()
    assert index.reader().searcher().search(tt.AllQuery(), tt.Count()) == 2


def test_regex_toplevel_alternation_matches_all_branches():
    import re

    from tantivy_tpu.termdict import TermDictionary, _literal_prefix

    assert _literal_prefix("apple|banana") == ""
    assert _literal_prefix("(apple|banana)") == ""
    assert _literal_prefix(r"apple\|banana") == "apple"  # escaped: literal
    assert _literal_prefix("app[l|e]") == "app"  # class '|' is literal
    assert _literal_prefix("apple.*") == "apple"

    terms = sorted([b"apple", b"apricot", b"banana", b"cherry"])
    td = TermDictionary.from_sorted_terms(terms)
    got = td.search_regex(re.compile("apple|banana"))
    assert [terms[i] for i in got] == [b"apple", b"banana"]


def test_regex_query_alternation_end_to_end():
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    for word in ["apple", "banana", "cherry"] * 40:
        w.add_document(tt.Document(body=word))
    w.commit()
    w.close()
    searcher = index.reader().searcher()
    from tantivy_tpu.query import RegexQuery

    assert searcher.search(RegexQuery("apple|banana", "body"), tt.Count()) == 80
