"""End-to-end index + search tests (host engine). Mirrors reference smoke
tests in `src/lib.rs:377-1277` and `examples/basic_search.rs`."""

import numpy as np
import pytest

import tantivy_tpu as tt


@pytest.fixture
def title_schema():
    b = tt.Schema.builder()
    b.add_text_field("title", tt.TEXT | tt.STORED_TEXT)
    return b.build()


def make_index(schema, docs):
    index = tt.Index.create_in_ram(schema)
    writer = index.writer_for_tests()
    for d in docs:
        writer.add_document(d)
    writer.commit()
    return index


class TestBasicSearch:
    def test_basic_search(self, title_schema):
        # examples/basic_search.rs shape: 3 docs, term + boolean query
        index = make_index(
            title_schema,
            [
                tt.Document(title="The Old Man and the Sea"),
                tt.Document(title="Of Mice and Men"),
                tt.Document(title="The modern Promotheus"),
            ],
        )
        searcher = index.reader().searcher()
        q = tt.TermQuery(tt.Term.from_field_text("title", "sea"))
        hits = searcher.search(q, tt.TopDocs(10))
        assert len(hits) == 1
        assert hits[0][1] == tt.DocAddress(0, 0)
        doc = searcher.doc(hits[0][1])
        assert doc.get_first("title") == "The Old Man and the Sea"

    def test_boolean_or_and(self, title_schema):
        index = make_index(
            title_schema,
            [
                tt.Document(title="a b c"),
                tt.Document(title="a c"),
                tt.Document(title="b d"),
                tt.Document(title="d e"),
            ],
        )
        s = index.reader().searcher()
        t = lambda w: tt.TermQuery(tt.Term.from_field_text("title", w))
        or_q = tt.BooleanQuery.union([t("a"), t("b")])
        hits = s.search(or_q, tt.TopDocs(10))
        assert sorted(h[1].doc_id for h in hits) == [0, 1, 2]
        and_q = tt.BooleanQuery.intersection([t("a"), t("b")])
        hits = s.search(and_q, tt.TopDocs(10))
        assert [h[1].doc_id for h in hits] == [0]
        # AND score = sum of term scores (clause order)
        s_a = s.search(t("a"), tt.TopDocs(10))
        s_b = s.search(t("b"), tt.TopDocs(10))
        score_a = [x[0] for x in s_a if x[1].doc_id == 0][0]
        score_b = [x[0] for x in s_b if x[1].doc_id == 0][0]
        and_score = hits[0][0]
        assert and_score == np.float32(score_a + score_b)

    def test_must_not(self, title_schema):
        index = make_index(
            title_schema,
            [tt.Document(title="a b"), tt.Document(title="a"), tt.Document(title="b")],
        )
        s = index.reader().searcher()
        t = lambda w: tt.TermQuery(tt.Term.from_field_text("title", w))
        q = tt.BooleanQuery(
            [(tt.Occur.MUST, t("a")), (tt.Occur.MUST_NOT, t("b"))]
        )
        hits = s.search(q, tt.TopDocs(10))
        assert [h[1].doc_id for h in hits] == [1]

    def test_minimum_should_match(self, title_schema):
        index = make_index(
            title_schema,
            [
                tt.Document(title="a b c"),
                tt.Document(title="a b"),
                tt.Document(title="a"),
                tt.Document(title="d"),
            ],
        )
        s = index.reader().searcher()
        t = lambda w: tt.TermQuery(tt.Term.from_field_text("title", w))
        q = tt.BooleanQuery(
            [(tt.Occur.SHOULD, t("a")), (tt.Occur.SHOULD, t("b")),
             (tt.Occur.SHOULD, t("c"))],
            minimum_number_should_match=2,
        )
        hits = s.search(q, tt.TopDocs(10))
        assert sorted(h[1].doc_id for h in hits) == [0, 1]

    def test_count(self, title_schema):
        index = make_index(
            title_schema,
            [tt.Document(title="x y"), tt.Document(title="x"), tt.Document(title="z")],
        )
        s = index.reader().searcher()
        q = tt.TermQuery(tt.Term.from_field_text("title", "x"))
        assert s.search(q, tt.Count()) == 2
        assert q.count(s) == 2

    def test_tie_break_doc_order(self, title_schema):
        # identical docs -> identical scores -> ascending doc ids
        index = make_index(
            title_schema, [tt.Document(title="tie") for _ in range(5)]
        )
        s = index.reader().searcher()
        hits = s.search(
            tt.TermQuery(tt.Term.from_field_text("title", "tie")), tt.TopDocs(3)
        )
        assert [h[1].doc_id for h in hits] == [0, 1, 2]
        assert len({h[0] for h in hits}) == 1

    def test_multivalue_text_and_offset(self, title_schema):
        index = make_index(
            title_schema,
            [tt.Document(title=["hello world", "goodbye world"])],
        )
        s = index.reader().searcher()
        hits = s.search(
            tt.TermQuery(tt.Term.from_field_text("title", "goodbye")), tt.TopDocs(5)
        )
        assert len(hits) == 1


class TestPhrase:
    def test_phrase_query(self, title_schema):
        index = make_index(
            title_schema,
            [
                tt.Document(title="the quick brown fox"),
                tt.Document(title="brown the quick"),
                tt.Document(title="quick brown dogs"),
            ],
        )
        s = index.reader().searcher()
        q = tt.PhraseQuery("title", ["quick", "brown"])
        hits = s.search(q, tt.TopDocs(10))
        assert sorted(h[1].doc_id for h in hits) == [0, 2]

    def test_phrase_with_slop(self, title_schema):
        index = make_index(
            title_schema,
            [tt.Document(title="a x b"), tt.Document(title="a b"),
             tt.Document(title="a x x x b")],
        )
        s = index.reader().searcher()
        q0 = tt.PhraseQuery("title", ["a", "b"], slop=0)
        assert [h[1].doc_id for h in s.search(q0, tt.TopDocs(10))] == [1]
        q1 = tt.PhraseQuery("title", ["a", "b"], slop=1)
        assert sorted(h[1].doc_id for h in s.search(q1, tt.TopDocs(10))) == [0, 1]

    def test_phrase_prefix(self, title_schema):
        index = make_index(
            title_schema,
            [tt.Document(title="quick brown fox"),
             tt.Document(title="quick brown foil"),
             tt.Document(title="quick red fox")],
        )
        s = index.reader().searcher()
        q = tt.PhrasePrefixQuery("title", ["brown", "fo"])
        hits = s.search(q, tt.TopDocs(10))
        assert sorted(h[1].doc_id for h in hits) == [0, 1]


class TestDeletesAndSegments:
    def test_delete_term(self, title_schema):
        index = tt.Index.create_in_ram(title_schema)
        w = index.writer_for_tests()
        w.add_document(tt.Document(title="keep me"))
        w.add_document(tt.Document(title="delete me"))
        w.commit()
        w.delete_term(tt.Term.from_field_text("title", "delete"))
        w.commit()
        s = index.reader().searcher()
        assert s.num_docs() == 1
        hits = s.search(
            tt.TermQuery(tt.Term.from_field_text("title", "me")), tt.TopDocs(10)
        )
        assert [h[1].doc_id for h in hits] == [0]

    def test_delete_then_add_same_commit(self, title_schema):
        # delete applies only to docs stamped before it
        index = tt.Index.create_in_ram(title_schema)
        w = index.writer_for_tests()
        w.add_document(tt.Document(title="apple one"))
        w.delete_term(tt.Term.from_field_text("title", "apple"))
        w.add_document(tt.Document(title="apple two"))
        w.commit()
        s = index.reader().searcher()
        hits = s.search(
            tt.TermQuery(tt.Term.from_field_text("title", "apple")), tt.TopDocs(10)
        )
        assert len(hits) == 1
        assert s.doc(hits[0][1]).get_first("title") == "apple two"

    def test_multi_segment_search(self, title_schema):
        index = tt.Index.create_in_ram(title_schema)
        w = index.writer_for_tests()
        w.add_document(tt.Document(title="alpha beta"))
        w.commit()
        w.add_document(tt.Document(title="alpha gamma"))
        w.commit()
        s = index.reader().searcher()
        assert len(s.segment_readers()) == 2
        hits = s.search(
            tt.TermQuery(tt.Term.from_field_text("title", "alpha")), tt.TopDocs(10)
        )
        assert len(hits) == 2

    def test_merge_segments(self, title_schema):
        index = tt.Index.create_in_ram(title_schema)
        w = index.writer_for_tests()
        for i in range(3):
            w.add_document(tt.Document(title=f"doc number{i} common"))
            w.commit()
        metas = index.searchable_segment_metas()
        assert len(metas) == 3
        w.merge([m.segment_id for m in metas])
        metas2 = index.searchable_segment_metas()
        assert len(metas2) == 1
        assert metas2[0].max_doc == 3
        s = index.reader().searcher()
        hits = s.search(
            tt.TermQuery(tt.Term.from_field_text("title", "common")), tt.TopDocs(10)
        )
        assert len(hits) == 3

    def test_merge_with_deletes_preserves_scores(self, title_schema):
        # build two identical indexes; in one, delete + merge; scores for the
        # surviving docs must match a fresh index of the survivors
        index = tt.Index.create_in_ram(title_schema)
        w = index.writer_for_tests()
        w.add_document(tt.Document(title="x a"))
        w.add_document(tt.Document(title="x b"))
        w.add_document(tt.Document(title="x c"))
        w.commit()
        w.delete_term(tt.Term.from_field_text("title", "b"))
        w.commit()
        w.merge([m.segment_id for m in index.searchable_segment_metas()])

        fresh = make_index(
            title_schema, [tt.Document(title="x a"), tt.Document(title="x c")]
        )
        q = tt.TermQuery(tt.Term.from_field_text("title", "x"))
        merged_hits = index.reader().searcher().search(q, tt.TopDocs(10))
        fresh_hits = fresh.reader().searcher().search(q, tt.TopDocs(10))
        assert [(h[0], h[1].doc_id) for h in merged_hits] == [
            (h[0], h[1].doc_id) for h in fresh_hits
        ]

    def test_rollback(self, title_schema):
        index = tt.Index.create_in_ram(title_schema)
        w = index.writer_for_tests()
        w.add_document(tt.Document(title="committed"))
        w.commit()
        w.add_document(tt.Document(title="uncommitted"))
        w.rollback()
        w.commit()
        s = index.reader().searcher()
        assert s.num_docs() == 1


class TestNumericAndRange:
    def test_u64_term_and_range(self):
        b = tt.Schema.builder()
        b.add_text_field("name", tt.TEXT)
        b.add_u64_field("year", tt.INDEXED | tt.FAST | tt.STORED)
        schema = b.build()
        docs = [
            tt.Document(name=f"doc{i}", year=1990 + i) for i in range(10)
        ]
        index = make_index(schema, docs)
        s = index.reader().searcher()
        q = tt.TermQuery(tt.Term.from_field_u64("year", 1995))
        assert s.search(q, tt.Count()) == 1
        rq = tt.RangeQuery("year", lower=1992, upper=1995, include_upper=False)
        hits = s.search(rq, tt.TopDocs(20))
        assert sorted(h[1].doc_id for h in hits) == [2, 3, 4]

    def test_i64_negative_range(self):
        b = tt.Schema.builder()
        b.add_i64_field("t", tt.INDEXED | tt.FAST)
        schema = b.build()
        index = make_index(schema, [tt.Document(t=v) for v in (-5, -1, 0, 3, 7)])
        s = index.reader().searcher()
        rq = tt.RangeQuery("t", lower=-2, upper=4)
        hits = s.search(rq, tt.TopDocs(10))
        assert sorted(h[1].doc_id for h in hits) == [1, 2, 3]

    def test_f64_fast_range(self):
        b = tt.Schema.builder()
        b.add_f64_field("v", tt.FAST)
        schema = b.build()
        index = make_index(schema, [tt.Document(v=v) for v in (0.5, 1.5, -3.25, 9.0)])
        s = index.reader().searcher()
        rq = tt.RangeQuery("v", lower=-1.0, upper=2.0)
        hits = s.search(rq, tt.TopDocs(10))
        assert sorted(h[1].doc_id for h in hits) == [0, 1]


class TestExpansionQueries:
    def test_fuzzy(self, title_schema):
        index = make_index(
            title_schema,
            [tt.Document(title="japan"), tt.Document(title="japon"),
             tt.Document(title="jupiter")],
        )
        s = index.reader().searcher()
        q = tt.FuzzyTermQuery(tt.Term.from_field_text("title", "japan"), distance=1)
        hits = s.search(q, tt.TopDocs(10))
        assert sorted(h[1].doc_id for h in hits) == [0, 1]

    def test_regex(self, title_schema):
        index = make_index(
            title_schema,
            [tt.Document(title="tantivy"), tt.Document(title="tenacity"),
             tt.Document(title="other")],
        )
        s = index.reader().searcher()
        q = tt.RegexQuery(r"t.*y", "title")
        hits = s.search(q, tt.TopDocs(10))
        assert sorted(h[1].doc_id for h in hits) == [0, 1]

    def test_term_set(self, title_schema):
        index = make_index(
            title_schema,
            [tt.Document(title="aa"), tt.Document(title="bb"), tt.Document(title="cc")],
        )
        s = index.reader().searcher()
        q = tt.TermSetQuery(
            [tt.Term.from_field_text("title", "aa"),
             tt.Term.from_field_text("title", "cc")]
        )
        hits = s.search(q, tt.TopDocs(10))
        assert sorted(h[1].doc_id for h in hits) == [0, 2]

    def test_exists(self):
        b = tt.Schema.builder()
        b.add_text_field("title", tt.TEXT)
        b.add_u64_field("opt", tt.INDEXED | tt.FAST)
        schema = b.build()
        index = make_index(
            schema,
            [tt.Document(title="with", opt=1), tt.Document(title="without")],
        )
        s = index.reader().searcher()
        hits = s.search(tt.ExistsQuery("opt"), tt.TopDocs(10))
        assert [h[1].doc_id for h in hits] == [0]


class TestStoreAndFs:
    def test_fs_index_roundtrip(self, tmp_path, title_schema):
        index = tt.Index.create_in_dir(tmp_path, title_schema)
        w = index.writer_for_tests()
        for i in range(50):
            w.add_document(tt.Document(title=f"body word{i} shared"))
        w.commit()
        w.close()

        reopened = tt.Index.open_in_dir(tmp_path)
        s = reopened.reader().searcher()
        assert s.num_docs() == 50
        hits = s.search(
            tt.TermQuery(tt.Term.from_field_text("title", "shared")), tt.TopDocs(60)
        )
        assert len(hits) == 50
        assert s.doc(tt.DocAddress(0, 7)).get_first("title") == "body word7 shared"

    def test_checksum_validation(self, tmp_path, title_schema):
        index = tt.Index.create_in_dir(tmp_path, title_schema)
        w = index.writer_for_tests()
        w.add_document(tt.Document(title="x"))
        w.commit()
        w.close()
        assert tt.Index.open_in_dir(tmp_path).validate_checksum() == []
        # corrupt one byte of a segment file
        meta = index.searchable_segment_metas()[0]
        path = tmp_path / meta.relative_path("idx")
        raw = bytearray(path.read_bytes())
        raw[len(raw) // 2] ^= 0xFF
        path.write_bytes(bytes(raw))
        damaged = tt.Index.open_in_dir(tmp_path).validate_checksum()
        assert damaged == [meta.relative_path("idx")]


class TestReaderReload:
    def test_on_commit_reload(self, title_schema):
        index = tt.Index.create_in_ram(title_schema)
        reader = index.reader()
        assert reader.searcher().num_docs() == 0
        w = index.writer_for_tests()
        w.add_document(tt.Document(title="new doc"))
        w.commit()
        assert reader.searcher().num_docs() == 1

    def test_manual_reload(self, title_schema):
        index = tt.Index.create_in_ram(title_schema)
        reader = index.reader(tt.ReloadPolicy.MANUAL)
        w = index.writer_for_tests()
        w.add_document(tt.Document(title="new doc"))
        w.commit()
        assert reader.searcher().num_docs() == 0
        reader.reload()
        assert reader.searcher().num_docs() == 1


def test_batched_docs_fetch():
    """Searcher.docs: input-order batched fetch grouped by (segment,
    block) (reference `store/reader.rs:25,63` block-cached reads)."""
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT | tt.STORED_TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    from tantivy_tpu.indexer.merge_policy import NoMergePolicy

    w.set_merge_policy(NoMergePolicy())
    for seg in range(2):
        for i in range(40):
            w.add_document(tt.Document(body=f"doc s{seg} n{i}"))
        w.commit()
    s = index.reader().searcher()
    addrs = [
        tt.DocAddress(1, 7), tt.DocAddress(0, 39), tt.DocAddress(0, 0),
        tt.DocAddress(1, 0), tt.DocAddress(0, 7),
    ]
    docs = s.docs(addrs)
    assert [d.get_first("body") for d in docs] == [
        "doc s1 n7", "doc s0 n39", "doc s0 n0", "doc s1 n0", "doc s0 n7",
    ]
    assert s.doc(addrs[0]).get_first("body") == "doc s1 n7"
