"""Query.explain — score explanation trees (reference `explanation.rs`,
`bm25.rs:196-226`, `term_weight.rs:41`, `boolean_weight.rs:483`)."""

import numpy as np
import pytest

import tantivy_tpu as tt


@pytest.fixture(scope="module")
def setup():
    b = tt.Schema.builder()
    b.add_text_field("t", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer()
    for body in ("old man sea", "old mice men", "sea wolf old",
                 "nothing here"):
        w.add_document(tt.Document(t=body))
    w.commit()
    return index, index.reader().searcher()


def test_term_explain_matches_score(setup):
    index, s = setup
    q = tt.TermQuery(tt.Term.from_field_text("t", "sea"))
    hits = s.search(q, tt.TopDocs(10))
    for score, addr in hits:
        e = q.explain(s, addr)
        assert np.float32(e.value) == np.float32(score)  # bitwise
        d = e.to_dict()
        assert d["description"] == "TermQuery, product of..."
        descs = [c["description"] for c in d["details"]]
        assert "(K1+1)" in descs[0]
        assert "idf" in descs[1]
        tf_node = d["details"][2]
        consts = {c["description"]: c["value"] for c in tf_node["details"]}
        assert consts["k1, term saturation parameter"] == pytest.approx(1.2)
        assert consts["freq, occurrences of term within document"] == 1.0
        assert d["context"]  # Term=...


def test_boolean_explain_sums_clauses(setup):
    index, s = setup
    q = tt.BooleanQuery.union([
        tt.TermQuery(tt.Term.from_field_text("t", "old")),
        tt.TermQuery(tt.Term.from_field_text("t", "sea")),
    ])
    hits = s.search(q, tt.TopDocs(10))
    for score, addr in hits:
        e = q.explain(s, addr)
        assert np.float32(e.value) == np.float32(score)
        assert e.description.startswith("BooleanClause")
        child_sum = np.float32(0.0)
        for c in e.details or []:
            child_sum = np.float32(child_sum + c.value)
        assert child_sum == np.float32(score)  # clause-order f32 sum


def test_explain_non_match_raises(setup):
    index, s = setup
    q = tt.TermQuery(tt.Term.from_field_text("t", "sea"))
    from tantivy_tpu import DoesNotMatchError
    from tantivy_tpu.searcher import DocAddress

    with pytest.raises(DoesNotMatchError):
        q.explain(s, DocAddress(0, 3))  # "nothing here"


def test_generic_weight_explain(setup):
    index, s = setup
    q = tt.PhraseQuery("t", ["old", "man"])
    hits = s.search(q, tt.TopDocs(10))
    assert hits
    e = q.explain(s, hits[0][1])
    assert np.float32(e.value) == np.float32(hits[0][0])
