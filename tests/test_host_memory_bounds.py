"""Host-fallback queries keep bounded working memory (VERDICT r4 item 6;
reference invariant `ARCHITECTURE.md:25-31`: search is O(1) memory).

tracemalloc bounds the PEAK Python/numpy allocation of a host query over a
segment whose total postings vastly exceed max_doc: the old concat-union
paths allocated O(total_postings); the bitmap/fieldnorm paths allocate
O(max_doc) bits + one posting list."""

import tracemalloc

import numpy as np
import pytest

import tantivy_tpu as tt
from tantivy_tpu.collector import Count


N_DOCS = 30_000
TOKENS_PER_DOC = 12  # total postings = 360k >> N_DOCS


@pytest.fixture(scope="module")
def dense_index():
    b = tt.Schema.builder()
    b.add_text_field("body", tt.TEXT)
    b.add_text_field("raw", tt.TextOptions(indexed=True, fieldnorms=False,
                                           tokenizer="raw"))
    b.add_u64_field("num", tt.INDEXED)
    index = tt.Index.create_in_ram(b.build())
    w = index.writer_for_tests()
    rng = np.random.default_rng(5)
    toks = [f"tok{i}" for i in range(500)]
    for d in range(N_DOCS):
        words = " ".join(toks[i] for i in rng.integers(0, 500, TOKENS_PER_DOC))
        w.add_document(tt.Document(body=words, raw=f"k{d % 997}",
                                   num=int(d % 4096)))
    w.commit()
    return index


def _peak_during(fn) -> int:
    tracemalloc.start()
    tracemalloc.reset_peak()
    fn()
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    return peak


def test_exists_fieldnorm_path_bounded(dense_index):
    searcher = dense_index.reader().searcher()
    q = tt.ExistsQuery("body")
    assert searcher.search(q, Count()) == N_DOCS
    peak = _peak_during(lambda: searcher.search(q, Count()))
    # fieldnorm scan: one u8 read + the matching-docs array. The old
    # union path concatenated 360k postings (~2.9MB+).
    assert peak < 24 * N_DOCS, peak


def test_exists_bitmap_union_bounded(dense_index):
    searcher = dense_index.reader().searcher()
    q = tt.ExistsQuery("num")  # indexed, no norms, no fast column
    assert searcher.search(q, Count()) == N_DOCS
    peak = _peak_during(lambda: searcher.search(q, Count()))
    assert peak < 24 * N_DOCS, peak


def test_term_range_bitmap_union_bounded(dense_index):
    searcher = dense_index.reader().searcher()
    q = dense_index.parse_query("raw:[k0 TO k996]", [])
    assert searcher.search(q, Count()) == N_DOCS
    peak = _peak_during(lambda: searcher.search(q, Count()))
    assert peak < 24 * N_DOCS, peak


def test_all_query_count_is_o1(dense_index):
    searcher = dense_index.reader().searcher()
    q = tt.AllQuery()
    assert searcher.search(q, Count()) == N_DOCS
    peak = _peak_during(lambda: searcher.search(q, Count()))
    assert peak < 64_000, peak  # no arange(max_doc) materialization
