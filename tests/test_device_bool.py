"""Batched device boolean queries vs the host engine."""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.parallel import BatchExecutor

from test_device_ops import assert_hits_match, build_random_index


@pytest.fixture(scope="module")
def setup():
    index, words = build_random_index(num_docs=400, vocab=25, num_commits=2)
    searcher = index.reader().searcher()
    executor = BatchExecutor(searcher)
    return searcher, executor, words


def t(w):
    return tt.TermQuery(tt.Term.from_field_text("body", w))


def check(searcher, executor, queries, k=10):
    device = executor.search_batch(queries, k)
    for q, dev in zip(queries, device):
        host = searcher.search(q, tt.TopDocs(k))
        assert_hits_match(dev, host, context=repr(q))


class TestDeviceBoolean:
    def test_or_batch(self, setup):
        searcher, executor, words = setup
        queries = [
            tt.BooleanQuery.union([t(words[i]), t(words[i + 1])])
            for i in range(0, 20, 2)
        ]
        check(searcher, executor, queries)

    def test_and_batch(self, setup):
        searcher, executor, words = setup
        queries = [
            tt.BooleanQuery.intersection([t(words[i]), t(words[i + 1])])
            for i in range(0, 20, 2)
        ]
        check(searcher, executor, queries)

    def test_three_clause_mixed(self, setup):
        searcher, executor, words = setup
        queries = [
            tt.BooleanQuery(
                [
                    (tt.Occur.MUST, t(words[0])),
                    (tt.Occur.SHOULD, t(words[5])),
                    (tt.Occur.MUST_NOT, t(words[9])),
                ]
            ),
            tt.BooleanQuery(
                [
                    (tt.Occur.SHOULD, t(words[2])),
                    (tt.Occur.SHOULD, t(words[3])),
                    (tt.Occur.SHOULD, t(words[4])),
                ],
                minimum_number_should_match=2,
            ),
        ]
        check(searcher, executor, queries)

    def test_or_with_missing_term(self, setup):
        searcher, executor, words = setup
        queries = [tt.BooleanQuery.union([t(words[0]), t("zzz_missing")])]
        check(searcher, executor, queries)

    def test_and_impossible(self, setup):
        searcher, executor, words = setup
        queries = [tt.BooleanQuery.intersection([t(words[0]), t("zzz_missing")])]
        res = executor.search_batch(queries, 10)
        assert res == [[]]

    def test_mixed_batch_routing(self, setup):
        searcher, executor, words = setup
        queries = [
            t(words[0]),
            tt.BooleanQuery.union([t(words[1]), t(words[2])]),
            tt.PhraseQuery("body", [words[0], words[1]]),  # host route
        ]
        device = executor.search_batch(queries, 10)
        for q, dev in zip(queries, device):
            host = searcher.search(q, tt.TopDocs(10))
            assert_hits_match(dev, host, context=repr(q))

    def test_with_deletes(self, setup):
        index, words = build_random_index(num_docs=200, vocab=15, num_commits=1, seed=9)
        w = index.writer_for_tests()
        w.delete_term(tt.Term.from_field_text("body", words[3]))
        w.commit()
        w.close()
        searcher = index.reader().searcher()
        executor = BatchExecutor(searcher)
        queries = [
            tt.BooleanQuery.union([t(words[0]), t(words[1])]),
            tt.BooleanQuery.intersection([t(words[0]), t(words[2])]),
        ]
        check(searcher, executor, queries)
