"""Snippets + facets."""

import pytest

import tantivy_tpu as tt
from tantivy_tpu.collector.facet_collector import Facet, FacetCollector
from tantivy_tpu.snippet import SnippetGenerator


class TestSnippet:
    @pytest.fixture(scope="class")
    def setup(self):
        b = tt.Schema.builder()
        b.add_text_field("body", tt.TEXT | tt.STORED_TEXT)
        schema = b.build()
        index = tt.Index.create_in_ram(schema)
        w = index.writer_for_tests()
        w.add_document(tt.Document(body=(
            "Rust is a multi-paradigm systems programming language focused on "
            "safety, especially safe concurrency. Rust is syntactically similar "
            "to C++ but provides memory safety without garbage collection."
        )))
        w.commit()
        w.close()
        return index

    def test_highlight(self, setup):
        index = setup
        searcher = index.reader().searcher()
        q = index.parse_query("rust safety")
        gen = SnippetGenerator.from_searcher(searcher, q, "body")
        hits = searcher.search(q, tt.TopDocs(1))
        doc = searcher.doc(hits[0][1])
        snip = gen.snippet_from_doc(doc)
        html = snip.to_html()
        assert "<b>" in html
        assert "<b>Rust</b>" in html or "<b>safety</b>" in html
        assert len(snip.fragment) <= 150

    def test_no_match_snippet(self, setup):
        index = setup
        searcher = index.reader().searcher()
        q = index.parse_query("nonexistentterm")
        gen = SnippetGenerator.from_searcher(searcher, q, "body")
        snip = gen.snippet("some text without the term")
        assert snip.is_empty()
        assert snip.to_html() == "some text without the term"

    def test_max_num_chars(self, setup):
        index = setup
        searcher = index.reader().searcher()
        q = index.parse_query("rust")
        gen = SnippetGenerator.from_searcher(searcher, q, "body")
        gen.set_max_num_chars(30)
        snip = gen.snippet("rust " * 30)
        assert len(snip.fragment) <= 30


class TestFacets:
    @pytest.fixture(scope="class")
    def setup(self):
        b = tt.Schema.builder()
        b.add_text_field("name", tt.TEXT)
        b.add_facet_field("category")
        schema = b.build()
        index = tt.Index.create_in_ram(schema)
        w = index.writer_for_tests()
        docs = [
            ("laptop", "/electronics/computers"),
            ("phone", "/electronics/phones"),
            ("tablet", "/electronics/computers"),
            ("novel", "/books/fiction"),
            ("cookbook", "/books/nonfiction"),
        ]
        for name, cat in docs:
            d = tt.Document(name=name)
            d.add_facet("category", cat)
            w.add_document(d)
        w.commit()
        w.close()
        return index

    def test_facet_counts(self, setup):
        index = setup
        searcher = index.reader().searcher()
        fc = FacetCollector("category")
        fc.add_facet("/")
        counts = searcher.search(tt.AllQuery(), fc)
        top = counts.get("/")
        assert [(f.to_path_string(), c) for f, c in top] == [
            ("/books", 2), ("/electronics", 3)
        ]

    def test_facet_children(self, setup):
        index = setup
        searcher = index.reader().searcher()
        fc = FacetCollector("category")
        fc.add_facet("/electronics")
        counts = searcher.search(tt.AllQuery(), fc)
        top = counts.top_k("/electronics", 10)
        assert [(f.to_path_string(), c) for f, c in top] == [
            ("/electronics/computers", 2), ("/electronics/phones", 1)
        ]

    def test_facet_filtered(self, setup):
        index = setup
        searcher = index.reader().searcher()
        q = index.parse_query("name:laptop OR name:novel")
        fc = FacetCollector("category")
        fc.add_facet("/")
        counts = searcher.search(q, fc)
        assert {f.to_path_string(): c for f, c in counts.get("/")} == {
            "/electronics": 1, "/books": 1
        }

    def test_facet_term_query(self, setup):
        index = setup
        searcher = index.reader().searcher()
        q = tt.TermQuery(tt.Term.from_facet("category", "/electronics/computers"))
        assert searcher.search(q, tt.Count()) == 2


def test_order_by_string_fast_field():
    """Cross-segment string ordering decodes per-segment ordinals to terms
    before the merge (reference `order_by_string_fast_field`)."""
    b = tt.Schema.builder()
    b.add_text_field("t", tt.TEXT)
    b.add_text_field(
        "name", tt.TextOptions(fast=True, indexed=True, tokenizer="raw")
    )
    index = tt.Index.create_in_ram(b.build())
    w = index.writer()
    # two segments with interleaved alphabet so per-segment ordinals alone
    # would merge wrong
    for n in ("delta", "alpha", "echo"):
        w.add_document(tt.Document(t="x", name=n))
    w.commit()
    for n in ("bravo", "charlie", "foxtrot"):
        w.add_document(tt.Document(t="x", name=n))
    w.commit()
    s = index.reader().searcher()
    top = tt.TopDocs(4).order_by_string_fast_field("name", descending=False)
    got = [v for v, _ in s.search(tt.AllQuery(), top)]
    got = [v.decode() if isinstance(v, bytes) else v for v in got]
    assert got == ["alpha", "bravo", "charlie", "delta"]


def test_tuple_collectors():
    """searcher.search with a tuple of collectors collects one pass and
    returns a tuple of fruits (reference `collector/mod.rs:322`)."""
    b = tt.Schema.builder()
    b.add_text_field("t", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer()
    for i in range(30):
        w.add_document(tt.Document(t=f"alpha {'beta' if i % 3 else 'gamma'}"))
    w.commit()
    s = index.reader().searcher()
    q = index.parse_query("alpha", ["t"])
    count, top = s.search(q, (tt.Count(), tt.TopDocs(5)))
    assert count == 30
    assert len(top) == 5
    assert count == s.search(q, tt.Count())
