"""Format compatibility: the committed fixture index (built by a previous
version of the code — see make_compat_fixture.py) must keep opening and
returning the same results (reference `src/compat_tests.rs:21-91`)."""

import os

import pytest

import tantivy_tpu as tt

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "compat_index")


@pytest.fixture(scope="module")
def searcher():
    index = tt.Index.open_in_dir(FIXTURE)
    return index.reader().searcher(), index


def test_fixture_exists():
    assert os.path.exists(os.path.join(FIXTURE, "meta.json")), (
        "committed compat fixture missing — run tests/make_compat_fixture.py"
    )


def test_open_and_counts(searcher):
    s, index = searcher
    assert s.search(tt.AllQuery(), tt.Count()) == 3  # one doc deleted
    assert s.search(
        tt.TermQuery(tt.Term.from_field_text("body", "sea")), tt.Count()
    ) == 2
    assert s.search(
        tt.TermQuery(tt.Term.from_field_text("body", "wolf")), tt.Count()
    ) == 0


def test_scored_search_and_store(searcher):
    s, index = searcher
    hits = s.search(
        tt.TermQuery(tt.Term.from_field_text("body", "old")), tt.TopDocs(10)
    )
    assert len(hits) == 2
    doc = s.doc(hits[0][1])
    vals = dict(doc.field_values())
    assert "title" in vals


def test_phrase_and_fast_fields(searcher):
    s, index = searcher
    assert s.search(
        tt.PhraseQuery("body", ["old", "man"]), tt.Count()
    ) == 1
    assert s.search(tt.RangeQuery("qty", 2, 5), tt.Count()) == 2
    assert s.search(
        tt.TermQuery(tt.Term.from_field_ip("ip", "2001:db8::1")), tt.Count()
    ) == 1


def test_query_parser(searcher):
    s, index = searcher
    q = index.parse_query("sea", ["body"])
    assert s.search(q, tt.Count()) == 2
