"""Batched Count (sorted-column range counting) vs the host Count path."""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.collector import Count
from tantivy_tpu.parallel import BatchExecutor
from tantivy_tpu.query.range_query import RangeQuery


@pytest.fixture(scope="module")
def setup():
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    b.add_u64_field("score", tt.FAST)
    b.add_i64_field("delta", tt.FAST)
    b.add_f64_field("price", tt.FAST)
    index = tt.Index.create_in_ram(b.build())
    rng = np.random.default_rng(17)
    w = index.writer_for_tests()
    for i in range(3000):
        w.add_document(tt.Document(
            body=f"doc w{i % 7}",
            score=int(rng.integers(0, 1000)),
            delta=int(rng.integers(-500, 500)),
            price=float(rng.normal(100.0, 30.0)),
        ))
        if i in (999, 1999):
            w.commit()
    w.commit()
    w.close()
    return index, index.reader().searcher()


def test_range_count_batch_matches_host(setup):
    _, s = setup
    rng = np.random.default_rng(3)
    queries = []
    for _ in range(40):
        lo = int(rng.integers(0, 900))
        queries.append(RangeQuery("score", lower=lo, upper=lo + int(rng.integers(1, 200))))
        dlo = int(rng.integers(-500, 400))
        queries.append(RangeQuery("delta", lower=dlo, upper=dlo + 100,
                                  include_upper=bool(rng.integers(0, 2))))
        plo = float(rng.normal(100.0, 30.0))
        queries.append(RangeQuery("price", lower=plo, upper=plo + 20.0,
                                  include_lower=bool(rng.integers(0, 2))))
    # open-ended + empty + out-of-range bounds
    queries += [
        RangeQuery("score", lower=None, upper=10),
        RangeQuery("score", lower=990, upper=None),
        RangeQuery("score", lower=2000, upper=3000),
        RangeQuery("score", lower=500, upper=400),
    ]
    ex = BatchExecutor(s)
    batched = ex.count_batch(queries)
    for q, c in zip(queries, batched):
        assert c == s.search(q, Count()), repr(q)


def test_count_batch_with_deletes_falls_back(setup):
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    b.add_u64_field("score", tt.FAST)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    for i in range(100):
        w.add_document(tt.Document(body=f"t{i % 3}", score=i))
    w.commit()
    w.delete_term(tt.Term.from_field_text("body", "t0"))
    w.commit()
    w.close()
    s = index.reader().searcher()
    ex = BatchExecutor(s)
    q = RangeQuery("score", lower=0, upper=50)
    assert ex.count_batch([q]) == [s.search(q, Count())]


def test_count_batch_mixed_queries(setup):
    _, s = setup
    ex = BatchExecutor(s)
    qs = [
        tt.TermQuery(tt.Term.from_field_text("body", "w3")),
        RangeQuery("score", lower=100, upper=300),
        tt.AllQuery(),
    ]
    got = ex.count_batch(qs)
    assert got == [s.search(q, Count()) for q in qs]
