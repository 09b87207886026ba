"""Randomized invariants for the probe-based boolean device path.

Thousands of random boolean queries over random Zipf corpora must match the
exhaustive host engine exactly — this hammers the Block-WAND threshold
boundary (phase-1 cut, UB pruning margin, primary-lane dedup) the way the
reference hammers block-max invariants with proptest
(`term_scorer.rs:211-252`).
"""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.parallel import BatchExecutor

from test_device_ops import assert_hits_match, build_random_index


def t(w):
    return tt.TermQuery(tt.Term.from_field_text("body", w))


def random_bool_query(rng, words):
    n = int(rng.integers(2, 5))
    picks = rng.choice(len(words), size=n, replace=False)
    kinds = rng.choice(["must", "should", "must_not"], size=n, p=[0.4, 0.5, 0.1])
    # ensure at least one positive clause
    if not any(k != "must_not" for k in kinds):
        kinds[0] = "should"
    occ = {"must": tt.Occur.MUST, "should": tt.Occur.SHOULD,
           "must_not": tt.Occur.MUST_NOT}
    clauses = [(occ[k], t(words[p])) for k, p in zip(kinds, picks)]
    n_should = sum(1 for k in kinds if k == "should")
    ms = int(rng.integers(0, n_should + 1)) if n_should and rng.random() < 0.3 else 0
    return tt.BooleanQuery(clauses, minimum_number_should_match=ms)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_boolean_exactness(seed):
    rng = np.random.default_rng(seed)
    index, words = build_random_index(
        num_docs=600, vocab=40, num_commits=2, seed=seed
    )
    searcher = index.reader().searcher()
    executor = BatchExecutor(searcher)
    queries = [random_bool_query(rng, words) for _ in range(60)]
    k = int(rng.integers(1, 12))
    device = executor.search_batch(queries, k)
    for q, dev in zip(queries, device):
        host = searcher.search(q, tt.TopDocs(k))
        assert_hits_match(dev, host, context=repr(q))


def test_boolean_exactness_with_deletes():
    rng = np.random.default_rng(7)
    index, words = build_random_index(num_docs=400, vocab=30, num_commits=2, seed=7)
    w = index.writer_for_tests()
    w.delete_term(tt.Term.from_field_text("body", words[2]))
    w.commit()
    w.close()
    searcher = index.reader().searcher()
    executor = BatchExecutor(searcher)
    queries = [random_bool_query(rng, words) for _ in range(40)]
    device = executor.search_batch(queries, 10)
    for q, dev in zip(queries, device):
        host = searcher.search(q, tt.TopDocs(10))
        assert_hits_match(dev, host, context=repr(q))


def test_large_query_no_host_fallback():
    """Queries whose clauses cover many blocks used to fall back to the host
    engine; the probe path must handle them on device, chunked."""
    index, words = build_random_index(
        num_docs=3000, vocab=12, num_commits=1, seed=11
    )
    searcher = index.reader().searcher()
    executor = BatchExecutor(searcher)
    queries = [
        tt.BooleanQuery.union([t(words[0]), t(words[1]), t(words[2])]),
        tt.BooleanQuery.intersection([t(words[0]), t(words[1])]),
    ]
    device = executor.search_boolean_batch(queries, 10)
    for q, dev in zip(queries, device):
        host = searcher.search(q, tt.TopDocs(10))
        assert_hits_match(dev, host, context=repr(q))
