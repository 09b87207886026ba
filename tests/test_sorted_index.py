"""Index sorting (sort_by_field) + executor + RegexPhraseQuery tests."""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.index import IndexSettings
from tantivy_tpu.query.phrase_query import RegexPhraseQuery


def build_sorted(order="asc", n=30, commits=2, seed=5):
    rng = np.random.default_rng(seed)
    b = tt.Schema.builder()
    b.add_text_field("name", tt.TEXT | tt.STORED_TEXT)
    b.add_u64_field("rank", tt.FAST | tt.STORED | tt.INDEXED)
    schema = b.build()
    index = tt.Index.create_in_ram(
        schema, settings=IndexSettings(sort_by_field=("rank", order))
    )
    w = index.writer_for_tests()
    ranks = rng.permutation(n)
    per = n // commits
    for c in range(commits):
        for i in range(c * per, min((c + 1) * per, n)):
            w.add_document(tt.Document(name=f"doc{ranks[i]} common", rank=int(ranks[i])))
        w.commit()
    w.close()
    return index, ranks


class TestSortedIndex:
    def test_segment_docs_sorted(self):
        index, _ = build_sorted()
        s = index.reader().searcher()
        for r in s.segment_readers():
            col = r.fast_fields().column("rank")
            vals = [col.first(d) for d in range(r.max_doc)]
            assert vals == sorted(vals)

    def test_store_follows_sort(self):
        index, _ = build_sorted()
        s = index.reader().searcher()
        r = s.segment_readers()[0]
        for d in range(r.max_doc):
            doc = r.doc(d)
            assert doc.get_first("name") == f"doc{doc.get_first('rank')} common"

    def test_desc_order(self):
        index, _ = build_sorted(order="desc", commits=1)
        r = index.reader().searcher().segment_readers()[0]
        col = r.fast_fields().column("rank")
        vals = [col.first(d) for d in range(r.max_doc)]
        assert vals == sorted(vals, reverse=True)

    def test_search_still_correct(self):
        index, ranks = build_sorted()
        s = index.reader().searcher()
        q = tt.TermQuery(tt.Term.from_field_u64("rank", int(ranks[3])))
        hits = s.search(q, tt.TopDocs(5))
        assert len(hits) == 1
        doc = s.doc(hits[0][1])
        assert doc.get_first("rank") == int(ranks[3])

    def test_merge_keeps_sort(self):
        index, _ = build_sorted(commits=3)
        w = index.writer_for_tests()
        w.merge([m.segment_id for m in index.searchable_segment_metas()])
        w.close()
        s = index.reader().searcher()
        assert len(s.segment_readers()) == 1
        r = s.segment_readers()[0]
        col = r.fast_fields().column("rank")
        vals = [col.first(d) for d in range(r.max_doc)]
        assert vals == sorted(vals)
        # store + postings aligned after sorted merge
        for d in range(0, r.max_doc, 7):
            doc = r.doc(d)
            assert doc.get_first("rank") == vals[d]
        hits = s.search(
            tt.TermQuery(tt.Term.from_field_text("name", "common")), tt.TopDocs(50)
        )
        assert len(hits) == r.max_doc


class TestExecutor:
    def test_multithread_executor(self):
        b = tt.Schema.builder()
        b.add_text_field("t", tt.TEXT)
        index = tt.Index.create_in_ram(b.build())
        w = index.writer_for_tests()
        for c in range(4):
            for i in range(20):
                w.add_document(tt.Document(t=f"tok{i} shared"))
            w.commit()
        w.close()
        index.set_multithread_executor(4)
        s = index.reader().searcher()
        hits = s.search(
            tt.TermQuery(tt.Term.from_field_text("t", "shared")), tt.TopDocs(100)
        )
        assert len(hits) == 80


class TestRegexPhrase:
    def test_regex_phrase(self):
        b = tt.Schema.builder()
        b.add_text_field("t", tt.TEXT)
        index = tt.Index.create_in_ram(b.build())
        w = index.writer_for_tests()
        w.add_document(tt.Document(t="the quick brown fox"))
        w.add_document(tt.Document(t="the quicker brown dog"))
        w.add_document(tt.Document(t="brown quick the"))
        w.commit()
        w.close()
        s = index.reader().searcher()
        q = RegexPhraseQuery("t", ["quick*", "brown"])
        hits = s.search(q, tt.TopDocs(10))
        assert sorted(h[1].doc_id for h in hits) == [0, 1]
        # `?` = any single char: "th." matches "the", "qu.ck" matches "quick"
        q2 = RegexPhraseQuery("t", ["th?", "qu?ck"])
        hits2 = s.search(q2, tt.TopDocs(10))
        assert [h[1].doc_id for h in hits2] == [0]
        q2b = RegexPhraseQuery("t", ["quick", "fo?"])
        assert [h[1].doc_id for h in s.search(q2b, tt.TopDocs(10))] == []
        q3 = RegexPhraseQuery("t", ["the", "quick*"])
        hits3 = s.search(q3, tt.TopDocs(10))
        assert sorted(h[1].doc_id for h in hits3) == [0, 1]


def test_open_or_create_settings_roundtrip(tmp_path):
    import tantivy_tpu as tt
    from tantivy_tpu.index import IndexSettings

    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    b.add_u64_field("rank", tt.FAST)
    schema = b.build()
    settings = IndexSettings(sort_by_field=("rank", "asc"))
    index = tt.Index.open_or_create(tmp_path / "idx", schema, settings=settings)
    assert index.settings.sort_by_field == ("rank", "asc")
    w = index.writer_for_tests()
    w.add_document(tt.Document(body="a", rank=5))
    w.add_document(tt.Document(body="b", rank=1))
    w.commit()
    w.close()
    # reopen: settings must survive via meta.json
    index2 = tt.Index.open_or_create(tmp_path / "idx", schema)
    assert index2.settings.sort_by_field == ("rank", "asc")
    index3 = tt.Index.open_in_dir(tmp_path / "idx")
    assert index3.settings.sort_by_field == ("rank", "asc")
