"""The Pallas boolean probe kernel must match the host engine exactly.

Runs in Pallas interpreter mode on the CPU test mesh (the compiled kernel
is exercised on real TPU hardware by bench.py); TANTIVY_TPU_PALLAS=1 forces
the pallas dispatch path.
"""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.parallel import BatchExecutor

from test_device_ops import assert_hits_match, build_random_index
from test_probe_wand import random_bool_query


@pytest.fixture(autouse=True)
def force_pallas(monkeypatch):
    monkeypatch.setenv("TANTIVY_TPU_PALLAS", "1")


def t(w):
    return tt.TermQuery(tt.Term.from_field_text("body", w))


def test_pallas_boolean_exactness():
    rng = np.random.default_rng(21)
    index, words = build_random_index(
        num_docs=500, vocab=30, num_commits=2, seed=21
    )
    searcher = index.reader().searcher()
    ex = BatchExecutor(searcher)
    queries = [random_bool_query(rng, words) for _ in range(25)]
    queries += [
        tt.BooleanQuery.union([t(words[0]), t("zzz_missing")]),
        tt.BooleanQuery.intersection([t(words[1]), t(words[2])]),
    ]
    device = ex.search_boolean_batch(queries, 10)
    for q, dev in zip(queries, device):
        host = searcher.search(q, tt.TopDocs(10))
        assert_hits_match(dev, host, context=repr(q))


def test_pallas_with_deletes():
    index, words = build_random_index(num_docs=300, vocab=15, num_commits=1,
                                      seed=22)
    w = index.writer_for_tests()
    w.delete_term(tt.Term.from_field_text("body", words[2]))
    w.commit()
    w.close()
    searcher = index.reader().searcher()
    ex = BatchExecutor(searcher)
    queries = [
        tt.BooleanQuery.union([t(words[0]), t(words[2])]),
        tt.BooleanQuery.intersection([t(words[0]), t(words[1])]),
    ]
    device = ex.search_boolean_batch(queries, 10)
    for q, dev in zip(queries, device):
        host = searcher.search(q, tt.TopDocs(10))
        assert_hits_match(dev, host, context=repr(q))
