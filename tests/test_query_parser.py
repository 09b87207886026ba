"""Query parser tests — behavior parity with reference
`query_parser.rs` test expectations (semantics, not AST shape)."""

import pytest

import tantivy_tpu as tt
from tantivy_tpu.query.parser import QueryParser, QueryParserError


@pytest.fixture(scope="module")
def setup():
    b = tt.Schema.builder()
    b.add_text_field("title", tt.TEXT | tt.STORED_TEXT)
    b.add_text_field("body", tt.TEXT)
    b.add_u64_field("year", tt.INDEXED | tt.FAST)
    b.add_i64_field("score", tt.INDEXED | tt.FAST)
    b.add_bool_field("flag", tt.INDEXED)
    b.add_json_field("attrs", tt.TEXT)
    schema = b.build()
    index = tt.Index.create_in_ram(schema)
    w = index.writer_for_tests()
    w.add_document(tt.Document(title="hello world", body="the quick fox", year=2001,
                               score=5, flag=True, attrs={"color": "red", "n": 7}))
    w.add_document(tt.Document(title="goodbye world", body="lazy dog", year=2005,
                               score=-3, flag=False, attrs={"color": "blue"}))
    w.add_document(tt.Document(title="hello again", body="quick brown dog", year=2010,
                               score=0))
    w.commit()
    w.close()
    searcher = index.reader().searcher()
    parser = QueryParser.for_index(index, ["title", "body"])
    return index, searcher, parser


def docs(searcher, q):
    return sorted(h[1].doc_id for h in searcher.search(q, tt.TopDocs(10)))


class TestParser:
    def test_single_term_default_fields(self, setup):
        _, s, p = setup
        q = p.parse_query("hello")
        assert docs(s, q) == [0, 2]
        q = p.parse_query("quick")
        assert docs(s, q) == [0, 2]

    def test_field_term(self, setup):
        _, s, p = setup
        assert docs(s, p.parse_query("title:world")) == [0, 1]
        assert docs(s, p.parse_query("body:dog")) == [1, 2]

    def test_bool_ops(self, setup):
        _, s, p = setup
        assert docs(s, p.parse_query("hello AND world")) == [0]
        assert docs(s, p.parse_query("goodbye OR again")) == [1, 2]
        assert docs(s, p.parse_query("+hello -again")) == [0]
        assert docs(s, p.parse_query("hello NOT again")) == [0]

    def test_default_occur_union(self, setup):
        _, s, p = setup
        assert docs(s, p.parse_query("hello goodbye")) == [0, 1, 2]

    def test_conjunction_by_default(self, setup):
        index, s, _ = setup
        p = QueryParser.for_index(index, ["title", "body"])
        p.set_conjunction_by_default()
        assert docs(s, p.parse_query("hello world")) == [0]

    def test_phrase(self, setup):
        _, s, p = setup
        assert docs(s, p.parse_query('"hello world"')) == [0]
        assert docs(s, p.parse_query('"quick dog"')) == []
        assert docs(s, p.parse_query('"quick dog"~1')) == [2]

    def test_phrase_prefix(self, setup):
        _, s, p = setup
        assert docs(s, p.parse_query('title:hel*')) == [0, 2]

    def test_numeric_term_and_range(self, setup):
        _, s, p = setup
        assert docs(s, p.parse_query("year:2005")) == [1]
        assert docs(s, p.parse_query("year:[2001 TO 2005]")) == [0, 1]
        assert docs(s, p.parse_query("year:{2001 TO 2010]")) == [1, 2]
        assert docs(s, p.parse_query("year:[2006 TO *]")) == [2]
        assert docs(s, p.parse_query("score:[-4 TO 0]")) == [1, 2]

    def test_bool_field(self, setup):
        _, s, p = setup
        assert docs(s, p.parse_query("flag:true")) == [0]
        assert docs(s, p.parse_query("flag:false")) == [1]

    def test_set_query(self, setup):
        _, s, p = setup
        assert docs(s, p.parse_query("year: IN [2001 2010]")) == [0, 2]

    def test_all_query(self, setup):
        _, s, p = setup
        assert docs(s, p.parse_query("*")) == [0, 1, 2]

    def test_grouping(self, setup):
        _, s, p = setup
        assert docs(s, p.parse_query("(goodbye OR again) AND world")) == [1]

    def test_boost(self, setup):
        _, s, p = setup
        hits1 = s.search(p.parse_query("hello^2 goodbye"), tt.TopDocs(10))
        hits2 = s.search(p.parse_query("hello goodbye"), tt.TopDocs(10))
        d1 = {h[1].doc_id: h[0] for h in hits1}
        d2 = {h[1].doc_id: h[0] for h in hits2}
        assert d1[2] == 2 * d2[2]  # doc 2 only matches 'hello'
        assert d1[1] == d2[1]  # doc 1 only matches 'goodbye'

    def test_json_field(self, setup):
        _, s, p = setup
        assert docs(s, p.parse_query("attrs.color:red")) == [0]
        assert docs(s, p.parse_query("attrs.color:blue")) == [1]
        assert docs(s, p.parse_query("attrs.n:7")) == [0]

    def test_unknown_field_strict_and_lenient(self, setup):
        _, s, p = setup
        with pytest.raises(QueryParserError):
            p.parse_query("nofield:x")
        q, errs = p.parse_query_lenient("nofield:x hello")
        assert errs
        assert docs(s, q) == [0, 2]

    def test_empty_query(self, setup):
        _, s, p = setup
        assert docs(s, p.parse_query("")) == []

    def test_index_parse_query_helper(self, setup):
        index, s, _ = setup
        q = index.parse_query("hello")
        assert docs(s, q) == [0, 2]


def test_comparison_shorthand_ranges(setup):
    """`field:>2004` / `>=` / `<` / `<=` half-open ranges (reference
    `query_grammar.rs:468-475`). Years present: 2001, 2005, 2010."""
    index, searcher = setup[0], setup[1]
    for qs, want in [
        ("year:>2005", 1), ("year:>=2005", 2), ("year:<2005", 1),
        ("year:<=2005", 2), ("score:>=0", 2), ("score:<0", 1),
    ]:
        q = index.parse_query(qs, ["title"])
        assert searcher.search(q, tt.Count()) == want, qs


def test_field_star_exists(setup):
    """`field:*` -> ExistsQuery (reference `query_grammar.rs:365`)."""
    index, searcher = setup[0], setup[1]
    q = index.parse_query("score:*", ["title"])
    assert searcher.search(q, tt.Count()) == 3
    # bare `*` (no field) stays AllQuery
    q2 = index.parse_query("*", ["title"])
    assert searcher.search(q2, tt.Count()) == 3
    # json-path presence needs a FAST json field (reference
    # `exist_query.rs:36` is column-index based) — build one
    b = tt.Schema.builder()
    b.add_text_field("t", tt.TEXT)
    b.add_json_field("j", tt.TEXT | tt.FAST)
    idx2 = tt.Index.create_in_ram(b.build())
    w2 = idx2.writer()
    w2.add_document(tt.Document(t="a", j={"color": "red"}))
    w2.add_document(tt.Document(t="b", j={"n": 1}))
    w2.commit()
    s2 = idx2.reader().searcher()
    q3 = idx2.parse_query("j.color:*", ["t"])
    assert s2.search(q3, tt.Count()) == 1
