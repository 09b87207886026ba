"""Fused pallas phrase kernel (position slabs) vs the host engine.

Interpreter mode on CPU. Covers: multi-segment phrases, 2/3/4-term
phrases, deletes, re-anchoring (forced via tiny caps), and randomized
exactness.
"""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.parallel import BatchExecutor

from test_device_ops import assert_hits_match
from test_device_phrase import build_phrase_index, sample_phrases


@pytest.fixture(autouse=True)
def force_pallas(monkeypatch):
    monkeypatch.setenv("TANTIVY_TPU_PALLAS", "1")


@pytest.fixture(scope="module")
def setup():
    index, words, texts = build_phrase_index()
    searcher = index.reader().searcher()
    return searcher, words, texts


def check(searcher, queries, k=10):
    executor = BatchExecutor(searcher)
    device = executor.search_batch(queries, k)
    for q, dev in zip(queries, device):
        host = searcher.search(q, tt.TopDocs(k))
        assert_hits_match(dev, host, context=repr(q))
    return executor


def test_fused_phrase_bigrams(setup):
    searcher, words, texts = setup
    rng = np.random.default_rng(0)
    queries = [
        tt.PhraseQuery("body", p) for p in sample_phrases(rng, texts, 24, 2)
    ]
    check(searcher, queries)


def test_fused_phrase_trigrams_and_quads(setup):
    searcher, words, texts = setup
    rng = np.random.default_rng(1)
    queries = [
        tt.PhraseQuery("body", p) for p in sample_phrases(rng, texts, 8, 3)
    ] + [
        tt.PhraseQuery("body", p) for p in sample_phrases(rng, texts, 8, 4)
    ]
    check(searcher, queries)


def test_fused_phrase_no_match(setup):
    searcher, words, texts = setup
    executor = BatchExecutor(searcher)
    res = executor.search_batch(
        [tt.PhraseQuery("body", [words[0], "zzz_missing"])], 10
    )
    assert res == [[]]


def test_fused_phrase_reanchor_exact(setup, monkeypatch):
    """Tiny caps force re-anchoring through the denser term (and host
    fallback when both anchors are over-cap); exactness must hold."""
    import tantivy_tpu.ops.pallas_phrase as php

    monkeypatch.setattr(php, "PARTNER_POS_CAP", 64)
    searcher, words, texts = setup
    rng = np.random.default_rng(2)
    queries = [
        tt.PhraseQuery("body", p) for p in sample_phrases(rng, texts, 12, 2)
    ]
    executor = check(searcher, queries)


def test_fused_phrase_with_deletes():
    index, words, texts = build_phrase_index(num_docs=200, seed=7)
    w = index.writer_for_tests()
    w.delete_term(tt.Term.from_field_text("body", words[2]))
    w.commit()
    w.close()
    searcher = index.reader().searcher()
    rng = np.random.default_rng(3)
    queries = [
        tt.PhraseQuery("body", p) for p in sample_phrases(rng, texts, 10, 2)
    ]
    check(searcher, queries)


def test_fused_phrase_mixed_with_booleans(setup):
    searcher, words, texts = setup
    rng = np.random.default_rng(4)

    def t(x):
        return tt.TermQuery(tt.Term.from_field_text("body", x))

    queries = [
        tt.PhraseQuery("body", sample_phrases(rng, texts, 1, 2)[0]),
        tt.BooleanQuery.union([t(words[0]), t(words[1])]),
        t(words[2]),
    ]
    check(searcher, queries)


def test_fused_phrase_sub_batches_past_prow_tier(setup, monkeypatch):
    """Plan rows are one per (query, segment): a batch whose Q x n_segments
    exceeds the fixed plan-row tier must sub-batch, not overflow the padded
    qw table (regression: prefix expansion inflated Q to ~3000 on a
    4-segment index and crashed the fused phrase planner)."""
    searcher, words, texts = setup
    monkeypatch.setattr(
        BatchExecutor, "_prow_tier", staticmethod(lambda n, Tb=2: 8)
    )
    rng = np.random.default_rng(11)
    queries = [
        tt.PhraseQuery("body", p) for p in sample_phrases(rng, texts, 24, 2)
    ]
    # 24 queries x 2 segments = 48 rows > the forced 8-row tier
    check(searcher, queries)
