"""Device phrase(slop=0) path vs the host engine, plus reference-exact slop
semantics for the host sloppy matcher."""

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.parallel import BatchExecutor
from tantivy_tpu.query.phrase_query import (
    _intersection_count_with_carrying_slop,
    _intersection_count_with_slop,
    _phrase_count_for_doc,
)

from test_device_ops import assert_hits_match


def build_phrase_index(num_docs=400, vocab=25, seed=5, num_commits=2,
                       doc_len=(3, 25)):
    rng = np.random.default_rng(seed)
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    schema = b.build()
    index = tt.Index.create_in_ram(schema)
    w = index.writer_for_tests()
    words = [f"w{i}" for i in range(vocab)]
    texts = []
    per = num_docs // num_commits
    for _ in range(num_commits):
        for _ in range(per):
            n = int(rng.integers(*doc_len))
            toks = list(rng.choice(words, n))
            texts.append(toks)
            w.add_document(tt.Document(body=" ".join(toks)))
        w.commit()
    w.close()
    return index, words, texts


@pytest.fixture(scope="module")
def setup():
    index, words, texts = build_phrase_index()
    searcher = index.reader().searcher()
    executor = BatchExecutor(searcher)
    return searcher, executor, words, texts


def sample_phrases(rng, texts, n_phrases, length):
    """Phrases sampled from real doc windows — guaranteed matches."""
    out = []
    while len(out) < n_phrases:
        toks = texts[int(rng.integers(len(texts)))]
        if len(toks) < length:
            continue
        i = int(rng.integers(0, len(toks) - length + 1))
        out.append(toks[i : i + length])
    return out


class TestDevicePhrase:
    @pytest.mark.parametrize("length", [2, 3, 4])
    def test_matching_phrases(self, setup, length):
        searcher, executor, words, texts = setup
        rng = np.random.default_rng(length)
        queries = [
            tt.PhraseQuery("body", p)
            for p in sample_phrases(rng, texts, 12, length)
        ]
        device = executor.search_batch(queries, 10)
        for q, dev in zip(queries, device):
            host = searcher.search(q, tt.TopDocs(10))
            assert len(host) > 0  # sampled from real windows
            assert_hits_match(dev, host, context=repr(q))

    def test_rare_and_missing_phrases(self, setup):
        searcher, executor, words, texts = setup
        queries = [
            tt.PhraseQuery("body", [words[0], "zzz_missing"]),
            tt.PhraseQuery("body", [words[0], words[1]]),
            tt.PhraseQuery("body", [words[3], words[3]]),
        ]
        device = executor.search_batch(queries, 10)
        for q, dev in zip(queries, device):
            host = searcher.search(q, tt.TopDocs(10))
            assert_hits_match(dev, host, context=repr(q))

    def test_high_tf_host_fallback(self):
        """Docs where the leader term repeats > MAX_P times must still be
        exact (host fallback path)."""
        b = tt.Schema.builder()
        b.add_text_field("body", tt.TEXT)
        index = tt.Index.create_in_ram(b.build())
        w = index.writer_for_tests()
        w.add_document(tt.Document(body=" ".join(["ha ho"] * 40)))
        w.add_document(tt.Document(body="ha ho hi"))
        w.add_document(tt.Document(body="ho ha"))
        w.commit()
        w.close()
        searcher = index.reader().searcher()
        executor = BatchExecutor(searcher)
        q = tt.PhraseQuery("body", ["ha", "ho"])
        dev = executor.search_batch([q], 10)[0]
        host = searcher.search(q, tt.TopDocs(10))
        assert_hits_match(dev, host, context="high-tf phrase")

    def test_multi_segment_with_deletes(self):
        index, words, texts = build_phrase_index(seed=11, num_commits=3)
        w = index.writer_for_tests()
        w.delete_term(tt.Term.from_field_text("body", words[4]))
        w.commit()
        w.close()
        searcher = index.reader().searcher()
        executor = BatchExecutor(searcher)
        rng = np.random.default_rng(0)
        queries = [
            tt.PhraseQuery("body", p)
            for p in sample_phrases(rng, texts, 10, 2)
        ]
        device = executor.search_batch(queries, 10)
        for q, dev in zip(queries, device):
            host = searcher.search(q, tt.TopDocs(10))
            assert_hits_match(dev, host, context=repr(q))


class TestSlopSemantics:
    """Reference-exact sloppy matching (`phrase_scorer.rs` ports)."""

    def test_two_term_slop_distance(self):
        # |left - right| <= slop counts; best-match advancement
        count, _ = _intersection_count_with_slop([1, 5], [4], 3, False)
        assert count == 1
        count, _ = _intersection_count_with_slop([1], [5], 3, False)
        assert count == 0
        # best-match advancement consumes left[1]=2 for right=2, so right=3
        # has no left partner within slop (reference semantics)
        count, _ = _intersection_count_with_slop([1, 2], [2, 3], 1, False)
        assert count == 1
        # without the ambiguity both rights match
        count, _ = _intersection_count_with_slop([1, 3], [2, 4], 1, False)
        assert count == 2

    def test_carrying_slop_budget(self):
        # slop is a budget across terms: left=[0], mid=[2], right=[4] with
        # slop 2 fails only if budget carries (0->2 costs 2, 2->4 costs 2)
        _, left, slops = _intersection_count_with_carrying_slop(
            [0], [], [2], 4, True
        )
        count, _, _ = _intersection_count_with_carrying_slop(
            left, slops, [4], 4, False
        )
        assert count == 1
        _, left, slops = _intersection_count_with_carrying_slop(
            [0], [], [2], 2, True
        )
        count, _, _ = _intersection_count_with_carrying_slop(
            left, slops, [4], 2, False
        )
        assert count == 0

    def test_greedy_failure_case_now_matches(self):
        # the old greedy matcher took the first in-window position and could
        # miss a later choice that enables the next term
        pos_lists = [
            np.array([0], dtype=np.uint32),
            np.array([1, 3], dtype=np.uint32),
            np.array([2], dtype=np.uint32),
        ]
        assert _phrase_count_for_doc(pos_lists, [0, 1, 2], 2) >= 1

    def test_slop_query_end_to_end(self):
        b = tt.Schema.builder()
        b.add_text_field("body", tt.TEXT)
        index = tt.Index.create_in_ram(b.build())
        w = index.writer_for_tests()
        w.add_document(tt.Document(body="quick brown lazy fox"))
        w.add_document(tt.Document(body="quick fox"))
        w.add_document(tt.Document(body="fox quick"))
        w.commit()
        w.close()
        searcher = index.reader().searcher()
        assert len(searcher.search(
            tt.PhraseQuery("body", ["quick", "fox"], slop=0), tt.TopDocs(10)
        )) == 1
        # "quick brown lazy fox" has aligned distance 2; "fox quick" too
        assert len(searcher.search(
            tt.PhraseQuery("body", ["quick", "fox"], slop=1), tt.TopDocs(10)
        )) == 1
        assert len(searcher.search(
            tt.PhraseQuery("body", ["quick", "fox"], slop=2), tt.TopDocs(10)
        )) == 3


def test_sparse_leader_dense_partner_wide_window():
    """A near-singleton leader block spanning a dense partner's whole
    region exceeds any device probe window — must resolve exactly (host
    fallback). Regression: tail docs were silently dropped."""
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    rng = np.random.default_rng(3)
    # "common" in every doc; "rare" in a handful spread across the range
    n = 4000
    rare_docs = {1, 977, 1998, 2999, n - 1}
    for i in range(n):
        words = ["common", f"w{int(rng.integers(0, 30))}"]
        if i in rare_docs:
            words = ["common", "rare"]  # adjacency: "common rare"
        w.add_document(tt.Document(body=" ".join(words)))
    w.commit()
    w.close()
    searcher = index.reader().searcher()
    executor = BatchExecutor(searcher)
    q = tt.PhraseQuery("body", ["common", "rare"])
    dev = executor.search_batch([q], 10)[0]
    host = searcher.search(q, tt.TopDocs(10))
    assert len(host) == len(rare_docs)
    assert_hits_match(dev, host, context="wide-window phrase")


def test_high_tf_long_doc_loses_score_argmax():
    """blk_max_tf is the tf of the block-max SCORE pair, not the max tf: a
    high-tf doc in a long field loses the argmax to a low-tf short doc, so
    tf bounds (position windows, MAX_P fallbacks) must use the true
    per-block max tf. Regression: phrase count silently truncated."""
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    # long doc: "union" appears 17 times (once as "labor union"), plus much
    # filler -> large fieldnorm; short doc has tf=1 with tiny norm and wins
    # the block-max score argmax
    long_doc = ("labor union " + "union " * 16 + "filler " * 400).strip()
    w.add_document(tt.Document(body=long_doc))
    w.add_document(tt.Document(body="union dues"))
    w.add_document(tt.Document(body="labor relations"))
    w.commit()
    w.close()
    searcher = index.reader().searcher()
    executor = BatchExecutor(searcher)
    q = tt.PhraseQuery("body", ["labor", "union"])
    dev = executor.search_batch([q], 10)[0]
    host = searcher.search(q, tt.TopDocs(10))
    assert len(host) == 1
    assert_hits_match(dev, host, context="high-tf argmax-loser phrase")
